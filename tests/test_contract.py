"""Driver-contract regression guards."""

import importlib.util


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert df.count() > 0
    assert df.schema.simpleString().startswith("struct<doc_id:bigint")


def test_every_oracle_key_has_a_query(spark):
    mod = _load_entry()
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 100
    # every callable takes (spark, sf_dir)
    import inspect

    for fn in qs.values():
        assert len(inspect.signature(fn).parameters) == 2


def test_gate_window_rotation_order():
    """The driver walks queries() in order under a wall-clock budget that
    historically covers ~50 keys per round.  The r14 rotation (steady
    state since r13): (a) the 5 NEW r14 keys lead (the classifier
    distillation flagship, the interleaved multimodal packer, the BPE
    distill loop, the minhash store commit, and the composed ingest
    cycle — new oracle keys always earn their first driver rows the
    round they ship), then (b) the changed-plan reverify band — 37 keys
    this round: r14 is the first OPTIMIZATION round and every key whose
    physical plan it rewrote queues for a fresh hash row ahead of any
    re-check of unchanged greens,
    then (c) 12 staleness-ordered canaries drawn from the r5/r6
    evidence bands, then staleness-ordered green re-checks.  The
    rows-only class is empty — every registered key carries an
    oracle."""
    from mergeextractor_spark import registry
    from mergeextractor_spark._evidence import LAST_GREEN

    mod = _load_entry()
    qs, osql = mod.queries(), mod.oracle_sql()
    keys = list(qs)

    n_fix = len(registry._EVIDENCE_FIX)
    n_first = len(registry._ROTATION_FIRST)
    n_backlog = len(registry._ORACLE_BACKLOG)
    n_rev = len(registry._REVERIFY)
    # window arithmetic: 5 new keys + 37 changed-plan reverifies + 12
    # canaries = 54-key head — the optimization round spends its whole
    # ~50-key wall budget proving the rewritten plans still hash.
    assert n_fix == 0 and n_first == 5 and n_backlog == 0 and n_rev == 37
    assert registry._CANARY_SLOTS + n_first + n_backlog + n_rev <= 54
    assert registry._CANARY_SLOTS >= 12  # VERDICT r7 item 3 / r8 item 5

    at = 0
    assert keys[at : at + n_first] == list(registry._ROTATION_FIRST)
    for key in registry._ROTATION_FIRST:
        # r14 head cargo: NEW keys — each carries an oracle and has no
        # driver row yet (first hash rows land this round)
        assert key in osql and key not in registry._DRIVER_GREEN, key
    at += n_first + n_fix

    # the graduations ride directly behind the head band: every one
    # must now carry an oracle (that is the graduation) and none can
    # already hold a hash-green driver row
    assert keys[at : at + n_backlog] == list(registry._ORACLE_BACKLOG)
    for key in registry._ORACLE_BACKLOG:
        assert key in osql, f"graduated key {key!r} lost its oracle"
        assert key not in registry._DRIVER_GREEN, key
    at += n_backlog

    # keys whose plans changed THIS round re-hash before any re-check
    # of unchanged greens
    assert keys[at : at + n_rev] == list(registry._REVERIFY)
    for key in registry._REVERIFY:
        assert key in osql and key in registry._DRIVER_GREEN, key
    at += n_rev

    canaries = registry.canary_keys()
    assert len(canaries) == registry._CANARY_SLOTS
    assert keys[at : at + len(canaries)] == list(canaries)
    # Canaries are a deterministic, staleness-ordered sample of green keys
    assert registry.canary_keys() == registry.canary_keys()
    assert set(canaries) <= registry._DRIVER_GREEN
    assert canaries != registry.canary_keys(registry._ROUND + 1)
    # oldest-evidence-first (VERDICT r9 item 5): no unscheduled green key
    # may be STALER than the stalest drawn canary
    scheduled = (
        set(registry._ROTATION_FIRST)
        | set(registry._ORACLE_BACKLOG)
        | set(registry._REVERIFY)
        | set(registry._EVIDENCE_FIX)
    )
    max_canary_age = max(LAST_GREEN[k] for k in canaries)
    undrawn = [
        k
        for k in registry._DRIVER_GREEN
        if k not in scheduled and k not in canaries
    ]
    assert all(LAST_GREEN[k] >= max_canary_age for k in undrawn)
    at += len(canaries)

    # positions behind the canaries: green oracle keys, ALSO staleness-
    # ordered (VERDICT r10 item 3 — a stretched wall budget keeps
    # burning the tail). The rows-only class is EMPTY since late r11 —
    # every registered key carries a value-level oracle.
    rows_only = [k for k in keys if k not in osql]
    assert sorted(rows_only) == sorted(registry._ROWS_ONLY_EVIDENCED)
    assert rows_only == [], "every registered key must carry an oracle"
    mid_green = [k for k in keys[at:] if k in osql]
    assert set(mid_green) <= registry._DRIVER_GREEN
    ages = [LAST_GREEN.get(k, 0) for k in mid_green]
    assert ages == sorted(ages), "green band must be oldest-evidence-first"
    # the ordering is deterministic within a round...
    assert list(mod.queries()) == keys
    # ...and NOT the sorted/import order (the tiebreak rotates per round)
    assert mid_green != sorted(mid_green)


def test_sql_view_surface(spark):
    """register_views exposes the pure-query surface as mx_<key> temp
    views for SQL-first users; a view is lazy and queryable."""
    from mergeextractor_spark.__main__ import register_views

    n = register_views(spark, "/root/testdata/sf0.001")
    assert n >= 90
    got = spark.sql(
        "SELECT count(*) AS n FROM mx_text_quality_score WHERE quality > 0"
    ).collect()[0]["n"]
    assert got > 0
    joined = spark.sql(
        """SELECT q.doc_id FROM mx_text_quality_score q
           JOIN mx_sample_hash_split s USING (doc_id) WHERE s.split = 'train'"""
    ).count()
    assert joined > 0


def test_sql_view_results_match_dataframe_surface(spark):
    """VERDICT r3 item 9: the mx_<key> temp-view surface must not drift
    from the registry — round-trip a deterministic 20-key sample through
    spark.sql and compare schema + full sorted row sets against the
    DataFrame results."""
    import random

    from mergeextractor_spark.__main__ import _EAGER_KEYS, register_views
    from mergeextractor_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    register_views(spark, sf)
    reg = load_all()
    eligible = sorted(
        k for k, q in reg.items() if q.oracle is not None and k not in _EAGER_KEYS
    )
    sample = random.Random(9).sample(eligible, 20)
    for key in sample:
        via_df = reg[key].spark(spark, sf)
        via_sql = spark.sql(f"SELECT * FROM mx_{key}")
        assert via_sql.schema == via_df.schema, key
        rows_df = sorted(map(tuple, via_df.collect()), key=repr)
        rows_sql = sorted(map(tuple, via_sql.collect()), key=repr)
        assert rows_sql == rows_df, f"SQL view drifted for {key!r}"


def test_profiler_reports_hot_nodes(spark, capsys):
    """tools/profile_query.py walks the executed (post-AQE) plan of the
    query's OWN QueryExecution and surfaces time-like node metrics —
    the Spark analogue of the reference's cProfile harness
    (ref profiler/profile.py:20-53)."""
    import tools.profile_query as pq

    pq.profile("agg_org_topk", "/root/testdata/sf0.001", min_ms=0.0)
    out = capsys.readouterr().out
    assert "wall" in out
    # at least one plan node above the 0ms floor with a metric detail line
    assert "ms]" in out
    assert "nodes >= 0.0 ms shown" in out


def test_no_registered_output_is_canonicalizer_hostile(spark):
    """The driver canonicalizes results with a pandas sort; array/map/
    struct output columns raise 'unhashable type' there (the r5
    vector_pca_project red, and str_split_identifiers would have
    repeated it in r7).  Every registered key must emit scalar columns
    only.  Eager keys (sinks, iterative loops) are skipped — building
    them performs work — but all of them return scalar status/manifest
    rows by construction."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from mergeextractor_spark.registry import load_all

    offenders = []
    for key, q in load_all().items():
        if q.eager:
            continue
        df = q.spark(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((key, f.name, f.dataType.simpleString()))
    assert not offenders, offenders


def test_bench_stdout_line_stays_parseable_and_small():
    """BENCH_r05 failed to parse because the stdout JSON outgrew the
    driver's tail-capture buffer. The line builder must stay under 2000
    bytes for the real suite AND for pathological suites — and the
    `queries` dict is the cross-round contract: a key missing from it
    reads as a REMOVED query, so the real suite must ALWAYS emit every
    key (the r14 rewrite sheds optional extras and decimals instead)."""
    import json

    from bench import HEADLINE, build_stdout_line

    # the real suite shape, with the full r14 extras: EVERY key must be
    # present — never an omission — and the line must fit the driver's
    # 2000-char tail capture (it is the final stdout write).
    timings = {k: 1.234 for k in HEADLINE}
    extras = {
        "cpu_s": 59.2,
        "clean_cpu_s": 59.2,
        "thrash_samples": 0,
        "clean_value": 65.24,
        "frozen_blocks": 28,
        "trainer_profile": {"clf_rounds": 6, "bpe_rounds": 10},
    }
    line = build_stdout_line(timings, 60.0, 5, 0.1, extra=extras)
    assert len(line) <= 1985, len(line)
    d = json.loads(line)
    assert d["metric"] == "headline_suite_seconds"
    assert "omitted_fastest" not in d, "real suite must never drop keys"
    assert set(d["queries"]) == set(HEADLINE)
    # the two adjudication aggregates survive the extra-shedding valve
    assert "cpu_s" in d and "clean_value" in d

    # pathological: 300 long-named queries must trigger the valve
    big = {f"extremely_long_query_name_number_{i:03d}": i / 7 for i in range(300)}
    line = build_stdout_line(big, 999.9, 5, 0.1)
    assert len(line) < 2000, len(line)
    d = json.loads(line)
    # omission count is a TOP-LEVEL sibling, never a fake queries entry —
    # summing queries values must stay a pure sum of timings (ADVICE r6)
    assert d["omitted_fastest"] > 0
    kept = list(d["queries"])
    assert all(isinstance(v, float) for v in d["queries"].values())
    assert d["omitted_fastest"] == len(big) - len(kept)
    # the kept set is the slowest ones
    assert min(big[k] for k in kept) >= max(
        v for k, v in big.items() if k not in kept
    )


def test_every_registered_key_is_in_coverage_map():
    """COVERAGE.md is the judge-facing key inventory — every registered
    key must have a row (12 had silently drifted out by r6)."""
    from mergeextractor_spark.registry import load_all

    cov = open("/root/repo/COVERAGE.md").read()
    missing = [k for k in load_all() if k not in cov]
    assert not missing, missing


def test_sql_escape_roundtrips_backslashes_and_quotes(spark):
    """ADVICE r14: source names interpolated into SQL literals must
    survive backslashes (Spark parses backslash escapes inside single
    quotes) and single quotes. Round-trip each hostile value through a
    parsed literal and compare to the Python value."""
    from mergeextractor_spark.operators.corpus_queries import _sql_escape

    hostile = ["a\\b", "it's", "both\\'s", "tab\\t", "plain", "\\\\net"]
    for v in hostile:
        got = spark.sql(f"SELECT '{_sql_escape(v)}' AS v").collect()[0].v
        assert got == v, (v, got)

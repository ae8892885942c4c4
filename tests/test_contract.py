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


def test_oracle_paired_keys_run_first():
    """The driver walks queries() in order under a wall-clock budget; a
    hash-checked key is stronger evidence than a rows-only key, so every
    oracle-paired key must precede every rows-only key (round-1 lesson:
    the driver's budget ran out mid-registry)."""
    mod = _load_entry()
    qs, osql = mod.queries(), mod.oracle_sql()
    seen_rows_only = False
    for key in qs:
        if key in osql:
            assert not seen_rows_only, f"oracle-paired {key!r} after a rows-only key"
        else:
            seen_rows_only = True


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

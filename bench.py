"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion with the `noop` sink (full plan runs,
rows are consumed, nothing is collected to the driver — the honest way to
time a distributed plan).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

# Timed-suite trainer profile (VERDICT r13 item 5): the two iterative
# trainers were 21% of the r13 suite at their full correctness-gate
# round counts (12 GD rounds / 20 BPE merges) while their per-round
# plan shape — the thing the bench actually guards — is identical at 6
# and 10. setdefault so an explicit caller override (or the correctness
# gate, which never routes through bench.py) still wins; the oracles
# derive from the SAME env-read constants at import, so even a profiled
# run remains hash-consistent with its own oracle.
os.environ.setdefault("SPARK_GRAFT_CLF_ROUNDS", "6")
os.environ.setdefault("SPARK_GRAFT_BPE_ROUNDS", "10")

from mergeextractor_spark.registry import load_all  # noqa: E402
from mergeextractor_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "extract_section_pipeline",  # flagship: chunk→score→rank→assemble
    "join_deal_filing",          # equi join
    "join_anti_incremental",     # anti join
    "agg_org_topk",              # explode + count + top-k
    "rank_hybrid_top1",          # window top-1
    "window_chunk_follow",       # window frame
    "agg_concat_section",        # ordered string agg
    "date_window",               # date battery
    "dedup_exact",               # hash dedup
    "dedup_minhash_lsh",         # minhash + LSH + verify
    "dedup_simhash",             # simhash signatures
    "ann_bruteforce_topk",       # vector search (exact baseline)
    "ann_ivf_topk",              # vector search (cell probing)
    "agg_salted_skew",           # two-phase skew-resistant agg
    "text_quality_score",        # text analysis battery
    "events_tumbling_counts",    # windowed agg (streaming twin)
    "events_sessionize",         # sessionization
    "json_extract_hits",         # json path
    "olap_pricing_summary",      # TPC-H Q1 shape
    "olap_nation_revenue",       # TPC-H Q5 shape (5-way join)
    "join_asof",                 # as-of join (window formulation)
    "join_range_interval",       # bucketed range join
    # round 3 additions
    "ann_pq_topk",               # product-quantization ADC top-k
    "join_salted_skew",          # salt-exploded skew join
    "dedup_bloom_prefilter",     # mapInPandas bloom build + map-side probe
    "sample_domain_cap",         # per-domain cap (WindowGroupLimit)
    "olap_returned_customers",   # TPC-H Q10 shape
    "ann_ivf_pq",                # IVF cells x PQ codes (production ANN combo)
    "curation_pipeline_ingest",  # flagship #3: cap -> TTR gate -> dedup -> mixture
    # round 4 additions
    "ann_ivf_pq_refine",         # ADC shortlist -> exact re-rank (retrieval stack)
    "olap_large_orders",         # TPC-H Q18 shape (HAVING reduction + top-100)
    "text_gopher_rules",         # quality-rule battery, single codegen'd scan
    # round 5 additions
    "join_bucketed_colocated",   # zero-Exchange fact join (ingest shuffle paid once, in the warm run)
    "ann_ivf_pq_refine_probe",   # refine through the partition-pruned IVF store
    "ann_ivf_pq_stored",         # query vs ingest-encoded codes store (vs ann_ivf_pq's per-query encode)
    "text_bm25_topk",            # sparse-retrieval scoring battery
    "dedup_paragraph",           # CCNet paragraph dedup + document rebuild
    "dedup_span_merge",          # dup windows -> maximal removable spans (gaps-and-islands)
    "text_hash_classifier",      # fastText-style hashed linear scorer (pure map stage)
    "sample_logprob_bucket",     # CCNet LM head/middle/tail bucketing
    "agg_source_overlap",        # cross-source 8-gram Jaccard matrix (single fused aggregate)
    "graph_pagerank",            # 5-round damped PageRank (iterative joins, per-round checkpoint)
    "pipeline_pretrain_corpus",  # flagship #4: model-based quality funnel (gates -> survivor LM)
    "sort_zorder",               # Morton clustering key (pure bitwise map stage)
    "rank_rrf_fusion",           # hybrid retrieval: BM25 + cosine pools -> reciprocal-rank fusion
    # round 6 additions
    "pipeline_training_export",  # flagship #7: floor -> exact dedup -> epoch key -> shard -> pack
    "eval_tokenizer_fertility",  # per-language BPE/word fertility (single partial agg)
    "agg_context_window_share",  # per-source fit share + truncation retention at 512/2k/8k
    "sample_epoch_shuffle",      # hash-keyed epoch permutation (WindowGroupLimit-pruned)
    # round 7 additions (VERDICT r6 item 6: perf evidence tracks coverage)
    "pipeline_hybrid_search",    # flagship #5: BM25 + dense pools -> RRF -> MMR diversify
    "agg_market_basket",         # pairwise lift/confidence over order baskets
    "events_top_paths",          # top 3-step paths (lead-windows -> groupBy count)
    "dedup_signature_banded",    # banded-Hamming near-dup stage (7-band x 8-block keys)
    # round 8 additions (VERDICT r7 item 5: Arrow-decode throughput tracked)
    "multimodal_image_phash",    # mapInPandas binary decode -> dHash (codec hot path)
    "dedup_image_phash",         # decode -> signature -> banded near-dup end-to-end
    # round-8 late additions (governance + training-recipe keys)
    "sample_token_budget",       # epoch-capped budget waterfill (1 scan + result-sized window)
    "eval_calibration_bins",     # classifier reliability bins (array-fold map stage + 10-group agg)
    # round 9 additions: the two-phase rank/cumsum shapes (VERDICT r8
    # items 2-3 sweep) — construction cost is charged per run by design
    "sample_anneal_mix",         # partitioned_ntile decile cut + budget split
    "eval_ks_drift",             # global_cumsum two-phase ECDF
    "agg_rfm_segmentation",      # 3 chained global quintile cuts over the user frame
    # round 12 addition: the last coalesce(1) sweep — the vocab-sized
    # rank+cumsum now rides ONE global_cumsum pass (cum-of-ones rank)
    "text_vocab_coverage_curve",  # two-phase rank+cumsum over the vocabulary
    # round 13 additions (VERDICT r12 items 4-5 + flagship #9).  The two
    # trainers run under the reduced bench profile (6 GD rounds / 10 BPE
    # merges — see the env stanza above), so their r14+ numbers are NOT
    # comparable to the r13 full-count records; PERFORMANCE.md r14
    # carries the one-time rebaseline note.
    "pipeline_bpe_train",         # flagship #8: iterative BPE merge loop
    "dedup_minhash_incremental",  # batch probe of the persisted band-bucket store
    "pipeline_classifier_train",  # flagship #9: exact-integer logistic GD
    # round 14 additions (VERDICT r13 items 2 and 4 + the two
    # unordered loop-closers)
    "pipeline_classifier_distill",  # flagship #10: train -> weight store -> apply
    "sample_pack_interleaved",      # mixed text+image-patch cost packing
    "pipeline_bpe_distill",         # flagship #11: train -> merge store -> encode
    "dedup_minhash_store_compact",  # partition-scoped band-store commit
    "pipeline_ingest_cycle",        # flagship #12: exact gate -> probe -> commit
]


def _drain_residue(spark) -> None:
    """Per-block cache isolation (r7 + r11): keys whose plans .cache()
    internally leave relations in the CacheManager (plan-canonicalization
    matching means later constructions reuse them), so residue would
    otherwise grow across the suite — the late-suite agg_source_overlap
    spike (median 2.51 s vs 1.08 s isolated).  The sweep must also drop
    PERSISTENT RDDs: clearCache leaves localCheckpoint blocks pinned,
    one per construction of every two-phase-rank/cumsum key, and their
    accumulation tips storage memory into eviction thrash (measured
    12 s → 278 s between two identical runs at derived sf1 —
    PERFORMANCE.md r11).  The shingle list is popped first so the
    Python-side references are dropped too."""
    from mergeextractor_spark.operators.dedup import _LIVE_SHINGLE_CACHE
    from mergeextractor_spark.operators._util import drain_persistent_rdds

    while _LIVE_SHINGLE_CACHE:
        _LIVE_SHINGLE_CACHE.pop().unpersist(blocking=True)
    # adaptive GC: a heap full of dead session objects turns any
    # allocation-heavy key (the 2 KB-string concat aggregate) into a GC
    # storm — measured 67-91 s in-suite vs 1.6 s settled on identical
    # runs. A full System.gc() per block would cost minutes across the
    # suite, so sweep only when the JVM heap is more than half used.
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    used_frac = (rt.totalMemory() - rt.freeMemory()) / max(rt.maxMemory(), 1)
    if used_frac > 0.5 and os.environ.get("SPARK_GRAFT_BENCH_VERBOSE", "") == "1":
        print(f"    [gc sweep: heap {used_frac:.0%} used]", file=sys.stderr, flush=True)
    drain_persistent_rdds(spark, gc_sweep=used_frac > 0.5)


class _TaskMetrics:
    """Host-steal-immune per-sample counters from Spark's own task
    metrics (VERDICT r12 item 1): four straight rounds of hypervisor
    freeze/drift exhausted wall-clock evidence, so the record now
    carries, per key per sample, the JVM-side counters the scheduler
    already tracks — executorCpuTime (ON-CPU nanoseconds: a frozen vCPU
    accrues none, so a code regression moves it and a freeze window
    does not), executorRunTime, and shuffle read+write bytes — read in
    ONE http GET per snapshot from the /api/v1 status endpoint (the UI
    is re-enabled for the bench session only).

    The ledger is cumulative and keyed by (stageId, attemptId): metric
    increases are accumulated, so stage eviction from the status store
    (spark.ui.retainedStages) can never produce negative deltas, and a
    sample's delta is just snapshot(after) - snapshot(before)."""

    def __init__(self, spark) -> None:
        sc = spark.sparkContext
        self.url = (
            f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
            "/stages?details=false"
        )
        self._seen: dict[tuple[int, int], tuple[int, int, int]] = {}
        # cumulative (cpu_ns, run_ms, shuffle_bytes)
        self._tot = [0, 0, 0]

    def snapshot(self) -> tuple[int, int, int]:
        import urllib.request

        with urllib.request.urlopen(self.url, timeout=30) as r:
            stages = json.load(r)
        for s in stages:
            key = (s["stageId"], s.get("attemptId", 0))
            cur = (
                s.get("executorCpuTime", 0),
                s.get("executorRunTime", 0),
                s.get("shuffleReadBytes", 0) + s.get("shuffleWriteBytes", 0),
            )
            old = self._seen.get(key, (0, 0, 0))
            for i in range(3):
                if cur[i] > old[i]:
                    self._tot[i] += cur[i] - old[i]
            self._seen[key] = tuple(
                max(c, o) for c, o in zip(cur, old)
            )
        return tuple(self._tot)


_HZ = os.sysconf("SC_CLK_TCK")
_JAVA_PIDS: list[str] = []


def _host_split() -> tuple[float, float, float]:
    """(java_utime_s, java_stime_s, box_steal_s) — cumulative, from
    /proc.  The r14 root-cause discriminator (PERFORMANCE.md r14): this
    box is a Firecracker guest with free-page reporting, and during
    host-memory-pressure windows page-fault servicing is charged to the
    faulting JVM threads as SYSTEM time — inflating executorCpuTime
    (user+sys) 10-130x on UNCHANGED work.  The user/system split
    separates that from a real code regression: code moves utime,
    fault-storm windows move stime (measured: a thrash sample's utime
    stays ~17 s normal while stime reads 271-1971 s)."""
    if not _JAVA_PIDS:
        me = str(os.getpid())
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/comm") as f:
                    if f.read().strip() != "java":
                        continue
                st = open(f"/proc/{pid}/stat").read().rsplit(")", 1)[1].split()
                if st[1] == me:
                    _JAVA_PIDS.append(pid)
            except OSError:
                continue
    ju = js = 0
    for pid in _JAVA_PIDS:
        try:
            st = open(f"/proc/{pid}/stat").read().rsplit(")", 1)[1].split()
            ju += int(st[11])
            js += int(st[12])
        except OSError:
            continue
    steal = int(open("/proc/stat").readline().split()[8])
    return ju / _HZ, js / _HZ, steal / _HZ


def _freeze_probe(spark) -> float:
    """Constant JVM work (fixed 2e8-element codegen'd aggregate), timed:
    the per-block host-health stamp (VERDICT r12 item 6). Identical work
    every call, so its wall time moves ONLY with the host — a block
    whose probe reads ~3x the session median ran inside a hypervisor
    freeze/steal window and its wall samples are quarantined from the
    clean medians (they still appear in the raw record)."""
    t0 = time.time()
    spark.range(200_000_000, numPartitions=32).selectExpr(
        "sum(id % 1000) AS s"
    ).collect()
    return time.time() - t0


def _block(spark, q, sf_dir: str, k: int, metrics: _TaskMetrics) -> dict:
    """One BLOCK of one key: drain + probe + warm + k timed samples,
    exactly the per-key semantics every earlier round's bench measured
    (warm run immediately precedes the timed runs and they share the
    key's own cache), so per-key medians stay comparable across rounds.
    Returns {"probe": s, "wall": [s...], "cpu_ms": [...], "mb": [...]}.

    Between timed samples, superseded localCheckpoint blocks are swept
    (they are NEVER reused across constructions — each construct
    re-checkpoints — so this is pure hygiene against the storage-thrash
    cliff PERFORMANCE.md r11 measures at 12 s → 278 s). The sweep skips
    keys holding live shingle-cache frames: those are the one family
    whose SQL cache IS reused across constructions, and they do not
    checkpoint."""
    from mergeextractor_spark.operators.dedup import _LIVE_SHINGLE_CACHE
    from mergeextractor_spark.operators._util import drain_persistent_rdds

    _drain_residue(spark)
    probe = _freeze_probe(spark)
    df = q.spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm
    out = {
        "probe": round(probe, 3), "wall": [], "cpu_ms": [], "mb": [],
        "ju": [], "js": [], "steal": [],
    }
    for i in range(k):
        if i and not _LIVE_SHINGLE_CACHE:
            drain_persistent_rdds(spark, sql_cache=False)
        before = metrics.snapshot()
        hb = _host_split()
        t0 = time.time()
        df = q.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out["wall"].append(time.time() - t0)
        after = metrics.snapshot()
        ha = _host_split()
        out["cpu_ms"].append(round((after[0] - before[0]) / 1e6, 1))
        out["mb"].append(round((after[2] - before[2]) / 1e6, 2))
        out["ju"].append(round(ha[0] - hb[0], 2))
        out["js"].append(round(ha[1] - hb[1], 2))
        out["steal"].append(round(ha[2] - hb[2], 2))
    # POST-block probe too (r13 final-bookend lesson): a degradation that
    # BEGINS inside the block — the GC/eviction-thrash mode entered
    # during pipeline_hybrid_search's own samples (62-118 s CPU at a
    # clean 0.13 s pre-probe, while the NEXT block's pre-probe read
    # 4.6 s) — is invisible to a leading stamp. The block is quarantined
    # if EITHER stamp exceeds the cut.
    out["probe_after"] = round(_freeze_probe(spark), 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    reg = load_all()
    # UI back on for THIS session only: the /api/v1 status endpoint is
    # where _TaskMetrics reads executorCpuTime / shuffle bytes (VERDICT
    # r12 item 1). retainedStages is sized so no stage can complete AND
    # evict between two consecutive per-sample snapshots.
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "3000",
            "spark.ui.retainedJobs": "300",
            # Fixed PRE-TOUCHED heap (r14 thrash root cause —
            # PERFORMANCE.md r14): this box discards freed guest pages
            # host-side (Firecracker free-page reporting), so a lazy
            # 48g heap whose GC uncommits regions re-faults them at
            # fault-storm rates (measured ~4 MiB/s in a bad window)
            # and the stall is charged to task threads as system time.
            # Xms=Xmx + AlwaysPreTouch faults the whole heap ONCE at
            # startup (~3 s quiet) and never releases a page, making
            # the timed suite immune to re-fault churn.  12g is ample
            # for the sf0.1 suite (the old 48g was headroom, not need).
            "spark.driver.memory": "12g",
            "spark.driver.extraJavaOptions": "-Xms12g -XX:+AlwaysPreTouch",
        },
    )
    metrics = _TaskMetrics(spark)

    # BLOCK-INTERLEAVED passes (VERDICT r10 item 4): two consecutive
    # rounds of driver bench records were contaminated by host-load
    # bursts because each key's 5-9 samples ran consecutively — a burst
    # mapped onto a contiguous block of WHOLE keys (r10: positions 35-51
    # at 2-7x).  The suite now runs as N passes of per-key BLOCKS (drain
    # + warm + k timed samples): a key's samples split across N
    # time-separated blocks, so a burst corrupts at most one block =
    # k of n·k samples and the per-key median rejects it, while within a
    # block the old warm-then-timed semantics (and wall cost) are
    # preserved.  Fully per-sample interleaving was measured 3-4x more
    # expensive (every sample re-paid the key's internal cache build) —
    # PERFORMANCE.md r11.  Per-pass load averages and durations in the
    # stderr record let a reader locate a burst window even when the
    # medians absorb it.
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    per_block = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    sub_second_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS_SUBSEC", "9"))
    n_runs = n_passes * per_block

    # Suite-level JVM warmup: the per-block warm run caches plan+IO but
    # the first timed queries still paid whole-process JIT compilation
    # (measured: the suite-leading flagship read 1.6 s at position 1 vs
    # 0.85 s re-measured hot in the same session — a position effect, not
    # code). Burn the JIT on two representative shapes before timing.
    for key in ("extract_section_pipeline", "olap_nation_revenue"):
        for _ in range(2):
            reg[key].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # Warm the freeze probe too: its FIRST execution pays its own
    # whole-stage-codegen + JIT (~3.6 s measured vs ~0.15 s steady on an
    # idle box) — unwarmed, the session's first block would always read
    # as a ~20x "freeze" and lose its samples to the quarantine.
    _freeze_probe(spark)

    # Wall-clock budget guard: a degraded host (the 2-3x sustained-drift
    # mode PERFORMANCE.md documents) must never leave the driver with NO
    # record — once a completed pass would overrun the budget, stop
    # adding passes and report medians over the samples already taken
    # (every key has >= per_block samples after pass 1).
    max_wall = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_S", "1500"))
    t_suite = time.time()

    blocks: dict[str, list[dict]] = {k: [] for k in HEADLINE}
    samples: dict[str, list[float]] = {k: [] for k in HEADLINE}
    pass_load: list[float] = []
    pass_sec: list[float] = []
    truncated = False
    verbose = os.environ.get("SPARK_GRAFT_BENCH_VERBOSE", "") == "1"
    for p in range(n_passes):
        t_pass = time.time()
        for key in HEADLINE:
            t_blk = time.time()
            blk = _block(spark, reg[key], sf_dir, per_block, metrics)
            blocks[key].append(blk)
            samples[key].extend(blk["wall"])
            if verbose:
                print(
                    f"    block {key}: {round(time.time() - t_blk, 2)}s"
                    f" (probe {blk['probe']}s,"
                    f" timed {[round(x, 2) for x in blk['wall']]},"
                    f" cpu {blk['cpu_ms']}ms)",
                    file=sys.stderr,
                    flush=True,
                )
        pass_load.append(round(os.getloadavg()[0], 2))
        pass_sec.append(round(time.time() - t_pass, 1))
        print(
            f"  pass {len(pass_sec)}/{n_passes}: {pass_sec[-1]}s"
            f" load={pass_load[-1]}",
            file=sys.stderr,
            flush=True,
        )
        if p + 1 < n_passes and time.time() - t_suite + pass_sec[-1] > max_wall:
            truncated = True
            print(
                f"  budget: stopping after pass {p + 1}/{n_passes} — "
                f"{round(time.time() - t_suite)}s elapsed + another "
                f"~{pass_sec[-1]}s pass would exceed {max_wall}s",
                file=sys.stderr,
                flush=True,
            )
            break
        # pass-boundary GC sweep: dead session objects (broadcasts,
        # shuffle states) are only released by the ContextCleaner on
        # JVM GC, and a big heap may never GC on its own — measured
        # 15-20 s vs 115-330 s on identical runs (PERFORMANCE.md r11)
        from mergeextractor_spark.operators._util import drain_persistent_rdds as _dpr

        _dpr(spark, gc_sweep=True)
    # Sub-second keys ride a ±20-40% session envelope that cost three
    # adjudications in r9 (VERDICT r9 item 8): the construction/JIT
    # jitter is a fixed absolute cost, so it dominates exactly when the
    # query is fast. Boost those to 9 samples with one extra block over
    # only the sub-second keys — extra runs are cheap precisely because
    # the key is sub-second.
    subsec = [k for k in HEADLINE if statistics.median(samples[k]) < 1.0]
    if truncated or time.time() - t_suite > max_wall:
        subsec = []  # budget-bound: skip the sub-second top-up block
    if subsec and sub_second_runs > n_runs:
        t_pass = time.time()
        for key in subsec:
            blk = _block(
                spark, reg[key], sf_dir, sub_second_runs - n_runs, metrics
            )
            blocks[key].append(blk)
            samples[key].extend(blk["wall"])
        pass_load.append(round(os.getloadavg()[0], 2))
        pass_sec.append(round(time.time() - t_pass, 1))

    timings = {k: round(statistics.median(v), 3) for k, v in samples.items()}
    stdevs = {
        k: round(statistics.stdev(v), 3) if len(v) > 1 else 0.0
        for k, v in samples.items()
    }
    n_samples = {k: len(v) for k, v in samples.items()}

    # Freeze quarantine (VERDICT r12 item 6): a block whose constant-work
    # probe exceeded PROBE_CUT x the session median ran inside a host
    # freeze/steal window — its wall samples are excluded from the CLEAN
    # medians (raw medians and raw samples stay in the record untouched).
    PROBE_CUT = 3.0
    all_probes = [
        p for v in blocks.values() for b in v
        for p in (b["probe"], b.get("probe_after", b["probe"]))
    ]
    probe_med = statistics.median(all_probes) if all_probes else 0.0

    def _hot(b: dict) -> bool:
        return (
            max(b["probe"], b.get("probe_after", b["probe"]))
            > PROBE_CUT * probe_med
        )

    clean_median: dict[str, float] = {}
    frozen_blocks = 0
    for k, v in blocks.items():
        clean = [x for b in v if not _hot(b) for x in b["wall"]]
        frozen_blocks += sum(1 for b in v if _hot(b))
        # a key whose every block was frozen keeps its raw median — an
        # empty clean set must not fabricate a zero
        clean_median[k] = round(
            statistics.median(clean if clean else samples[k]), 3
        )
    # Host-immune counters: per-key medians of executor CPU time and
    # shuffled bytes (VERDICT r12 item 1 — adjudicate on these FIRST;
    # CPU-ns do not accrue while a vCPU is frozen, shuffle bytes are a
    # pure function of the plan and data).
    cpu_ms = {
        k: round(statistics.median(x for b in v for x in b["cpu_ms"]), 1)
        for k, v in blocks.items()
    }
    shuffle_mb = {
        k: round(statistics.median(x for b in v for x in b["mb"]), 2)
        for k, v in blocks.items()
    }
    # Thrash quarantine for the CPU record (r14 root cause —
    # PERFORMANCE.md r14): a sample whose JVM SYSTEM time dwarfs its
    # USER time ran inside a host fault-storm window, where kernel-side
    # page-fault servicing is charged to the task threads and
    # executorCpuTime inflates on unchanged work.  Those samples are
    # excluded from the CLEAN CPU medians the cross-round adjudication
    # uses; the raw lists stay in the record.  Calibration (first r14
    # pre-bookend): Python-UDF-heavy keys (ANN/image families) idle at
    # 3-10 s stime with 1-3 s JVM utime — pipe/shuffle/page-cache
    # kernel work, not storms — while real storms read stime 271-1971 s
    # against flat 12-120 s utime; hence BOTH a dominance ratio and an
    # absolute floor.  A key whose every sample thrashed keeps its raw
    # median — an empty clean set must not fabricate a number.
    def _thrash(b: dict, i: int) -> bool:
        return b["js"][i] > max(3.0 * b["ju"][i], 15.0)

    clean_cpu_ms: dict[str, float] = {}
    thrash_samples = 0
    for k, v in blocks.items():
        clean = [
            b["cpu_ms"][i]
            for b in v
            for i in range(len(b["cpu_ms"]))
            if not _thrash(b, i)
        ]
        thrash_samples += sum(
            1 for b in v for i in range(len(b["cpu_ms"])) if _thrash(b, i)
        )
        clean_cpu_ms[k] = round(
            statistics.median(
                clean if clean else [x for b in v for x in b["cpu_ms"]]
            ),
            1,
        )
    for key in HEADLINE:
        print(
            f"  {key}: {timings[key]}s ±{stdevs[key]} (n={n_samples[key]},"
            f" clean {clean_median[key]}s, cpu {cpu_ms[key]}ms,"
            f" shuffle {shuffle_mb[key]}MB)",
            file=sys.stderr,
            flush=True,
        )

    total = round(sum(timings.values()), 3)
    # Full record (stdev, host context) goes to STDERR — the driver's
    # stdout tail-capture buffer clipped the r5 JSON line once it carried
    # 45 queries x (timing + stdev + host fields), so BENCH_r05 recorded
    # `parsed: null` (VERDICT r5 item 2).  The stdout line stays compact:
    # contract fields only, tightest separators, and a safety valve that
    # keeps only the slowest queries if the line would outgrow the buffer.
    record = (
            {
                "stdev": stdevs,
                # raw per-key samples in block order (r12): a host freeze
                # burst hits a contiguous run of blocks, and the median
                # can only absorb spikes in < half the samples — the raw
                # list lets an adjudicator strip the exact freeze-hit
                # blocks after the fact instead of reconstructing from
                # median+stdev (only exact at n=2). Stderr-only: the
                # driver's stdout line stays compact.
                "samples": {k: [round(x, 3) for x in v] for k, v in samples.items()},
                # host-immune adjudication record (VERDICT r12 items 1+6):
                # per-key medians of executor CPU and shuffle bytes, the
                # freeze-stripped wall medians, and per-block constant-
                # work probe stamps so the quarantine is auditable.
                "executor_cpu_ms": cpu_ms,
                "clean_cpu_ms": clean_cpu_ms,
                "shuffle_mb": shuffle_mb,
                # r14: per-sample JVM user/system seconds + box steal —
                # the host-vs-code discriminator (system-dominated CPU
                # inflation = host fault storm, user movement = code)
                "java_u_samples": {
                    k: [x for b in v for x in b["ju"]]
                    for k, v in blocks.items()
                },
                "java_s_samples": {
                    k: [x for b in v for x in b["js"]]
                    for k, v in blocks.items()
                },
                "steal_samples": {
                    k: [x for b in v for x in b["steal"]]
                    for k, v in blocks.items()
                },
                "clean_median": clean_median,
                "probe_median_s": round(probe_med, 3),
                "frozen_blocks": frozen_blocks,
                "total_blocks": len(all_probes),
                "block_probes": {
                    k: [b["probe"] for b in v] for k, v in blocks.items()
                },
                "block_probes_after": {
                    k: [b.get("probe_after") for b in v]
                    for k, v in blocks.items()
                },
                "cpu_samples": {
                    k: [x for b in v for x in b["cpu_ms"]]
                    for k, v in blocks.items()
                },
                "runs_per_query": n_runs,
                "samples_per_query": n_samples,
                # per-pass host context: a burst shows up as one slow
                # pass with a high load stamp — the record self-
                # identifies its burst window (VERDICT r10 item 4)
                "pass_seconds": pass_sec,
                "pass_load_avg_1m": pass_load,
                "budget_truncated": truncated,
                "load_avg_1m": round(os.getloadavg()[0], 2),
                "uptime_s": round(time.clock_gettime(time.CLOCK_BOOTTIME)),
            }
    )
    record["timings"] = timings  # FULL per-key medians, no valve
    print(json.dumps(record), file=sys.stderr, flush=True)
    # Persist the full record beside the repo (r14): the driver captures
    # only the last 2000 stdout chars, and at 69 keys the compact line
    # can no longer carry every per-key timing — the valve may omit the
    # fastest keys there, but longitudinal per-key adjudication reads
    # THIS file, written on every run regardless of how the process was
    # invoked.
    try:
        with open(os.path.join(_REPO, "bench_last_record.json"), "w") as f:
            json.dump(record, f)
    except OSError:
        pass  # read-only checkout: the stderr copy still exists

    print(
        build_stdout_line(
            timings,
            total,
            n_runs,
            sf,
            extra={
                # the three host-immune suite aggregates ride the compact
                # driver line: total executor CPU seconds (steal-immune),
                # the freeze-stripped wall total, and how many blocks the
                # probe quarantined (0 = a clean record)
                "cpu_s": round(sum(cpu_ms.values()) / 1000.0, 1),
                "clean_cpu_s": round(sum(clean_cpu_ms.values()) / 1000.0, 1),
                "thrash_samples": thrash_samples,
                "clean_value": round(sum(clean_median.values()), 2),
                "frozen_blocks": frozen_blocks,
                # trainer rounds this record ran under (VERDICT r13
                # item 5): r14+ records use the reduced profile, so a
                # cross-round compare of the two trainer keys must check
                # this field first
                "trainer_profile": {
                    "clf_rounds": int(os.environ["SPARK_GRAFT_CLF_ROUNDS"]),
                    "bpe_rounds": int(os.environ["SPARK_GRAFT_BPE_ROUNDS"]),
                },
            },
        ),
        flush=True,
    )


def build_stdout_line(
    timings: dict[str, float],
    total: float,
    n_runs: int,
    sf: float,
    extra: dict | None = None,
) -> str:
    """The ONE stdout JSON line the driver parses. Must stay under its
    tail-capture buffer (exactly the last 2000 stdout chars, learned
    from the r5 parse failure; this line is the process's final stdout
    write, so <= 1999 bytes + newline always lands whole).

    The `queries` dict is the cross-round contract — a key that
    disappears reads as a REMOVED query — so every key is ALWAYS
    emitted.  When the full line outgrows the buffer the valve sheds,
    in order: the optional `extra` diagnostics (least-load-bearing
    first; they all persist in bench_last_record.json and the stderr
    record), then a decimal of per-key precision.  Only a pathological
    suite far beyond the real key count ever reaches the legacy
    keep-the-slowest fallback, which tags the omission count
    explicitly.  ``extra`` carries the compact host-immune suite
    aggregates (r13)."""
    CAP = 1985  # line + "\n" within the 2000-char capture, with slack

    def _line(queries: dict[str, float], xtr: dict, nd: int,
              omitted: int = 0) -> str:
        payload = {
            "metric": "headline_suite_seconds",
            "value": total,
            "unit": "sec",
            # reduced-decimal timings on the COMPACT line only (10 ms is
            # noise at these medians; full 3-decimal values stay in the
            # stderr record and bench_last_record.json)
            "queries": {k: round(v, nd) for k, v in queries.items()},
            "runs_per_query": n_runs,
            "sf": sf,
        }
        payload.update(xtr)
        if omitted:
            # top-level sibling, NOT a fake queries entry — consumers that
            # iterate queries as name->seconds must never see a count
            # masquerading as a timing (ADVICE r6)
            payload["omitted_fastest"] = omitted
        return json.dumps(payload, separators=(",", ":"))

    xtr = dict(extra or {})
    # shed order: diagnostics that also live in the persisted record,
    # least adjudication-critical first (cpu_s + clean_value last)
    shed = ["trainer_profile", "clean_cpu_s", "thrash_samples",
            "frozen_blocks", "cpu_s", "clean_value"]
    for nd in (2, 1):
        out = _line(timings, xtr, nd)
        if len(out) <= CAP:
            return out
        for k in shed:
            if k in xtr:
                del xtr[k]
                out = _line(timings, xtr, nd)
                if len(out) <= CAP:
                    return out
    # pathological fallback (hundreds of keys): keep the slowest, count
    # the rest — never reached by the real suite (pinned in
    # test_contract)
    keep = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    while len(_line(keep, xtr, 1, len(timings) - len(keep))) > CAP and len(keep) > 1:
        keep.pop(next(reversed(keep)))
    return _line(keep, xtr, 1, len(timings) - len(keep))


if __name__ == "__main__":
    main()

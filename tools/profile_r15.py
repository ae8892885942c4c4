"""r15 node/phase profiles (guide §1): isolate the expensive stages of
the heavy-tail keys with the noop sink and wall+JVM-utime stamps.

Usage: python tools/profile_r15.py [cycle|phash|pretrain|compact] ...
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from mergeextractor_spark.registry import load_all  # noqa: E402
from mergeextractor_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_HZ = os.sysconf("SC_CLK_TCK")


def _ju() -> float:
    """This process tree's java utime (driver == executor in local mode)."""
    tot = 0
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
                tot += int(st[11]) + int(st[12])
        except OSError:
            continue
    return tot / _HZ


class P:
    def __init__(self):
        self.rows = []

    def stamp(self, label, t0, u0):
        self.rows.append((label, time.time() - t0, _ju() - u0))

    def run(self, label, fn):
        t0, u0 = time.time(), _ju()
        out = fn()
        self.stamp(label, t0, u0)
        return out

    def report(self, title):
        print(f"== {title} ==")
        for label, w, u in self.rows:
            print(f"  {label:40s} wall {w:6.2f}s  jvm-cpu {u:6.2f}s")
        self.rows = []


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_cycle(spark, n=3):
    """Phase profile of pipeline_ingest_cycle's construction."""
    import functools
    import operator

    from mergeextractor_spark.operators._util import spread, t, truncate_lineage
    from mergeextractor_spark.operators.dedup import (
        INCR_BATCH_MOD,
        _bands_of,
        _cache_shingles,
        _minhash_agg_cols,
        _spread_doc_shingles,
        ensure_minhash_commit_store,
        minhash_store_commit,
        minhash_store_read,
        minhash_verify_pairs,
    )
    from mergeextractor_spark.plans.incremental_pipeline import (
        REKEY_BELOW,
        REKEY_OFFSET,
    )

    M = INCR_BATCH_MOD
    p = P()
    for r in range(n):
        d = t(spark, SF, "documents")
        committed = d.filter(F.col("doc_id") % M != 0).select("doc_id", "text")
        rekeyed = committed.filter(F.col("doc_id") < REKEY_BELOW).select(
            (F.col("doc_id") + REKEY_OFFSET).alias("doc_id"), "text"
        )
        batch = (
            d.filter(F.col("doc_id") % M == 0)
            .select("doc_id", "text")
            .unionByName(rekeyed)
        )
        comm_h = committed.select(F.md5("text").alias("h")).distinct()
        fresh = (
            batch.withColumn("h", F.md5("text")).join(comm_h, "h", "left_anti").drop("h")
        )
        path = p.run("ensure_store", lambda: ensure_minhash_commit_store(spark, SF, tag="cycle"))
        sh_b = _cache_shingles(_spread_doc_shingles(fresh))
        bands_b = p.run(
            "bands checkpoint (sig agg)",
            lambda: truncate_lineage(
                _bands_of(sh_b.groupBy("doc_id").agg(*_minhash_agg_cols()))
            ),
        )
        parts = p.run(
            "parts collect",
            lambda: bands_b.select("band", F.substring("bucket", 1, 1).alias("bpfx"))
            .distinct()
            .collect(),
        )
        pair_pred = functools.reduce(
            operator.or_,
            [(F.col("band") == r_.band) & (F.col("bpfx") == r_.bpfx) for r_ in parts],
        )
        store = minhash_store_read(spark, path).filter(
            pair_pred & (F.col("doc_id") % M != 0)
        )
        pairs = minhash_verify_pairs(spread(committed), sh_b, bands_b, store)
        near = p.run(
            "near checkpoint (probe+verify)",
            lambda: truncate_lineage(pairs.select("doc_id").distinct()),
        )
        survivors_bands = bands_b.join(near, "doc_id", "left_anti")
        p.run("COMMIT", lambda: minhash_store_commit(spark, path, survivors_bands))
        t0, u0 = time.time(), _ju()
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=4) as pool:
            fs = [
                pool.submit(batch.count),
                pool.submit(fresh.count),
                pool.submit(near.count),
                pool.submit(
                    minhash_store_read(spark, path).select("doc_id").distinct().count
                ),
            ]
            [f.result() for f in fs]
        p.stamp("4 counts (concurrent)", t0, u0)
        p.report(f"pipeline_ingest_cycle round {r}")
        from mergeextractor_spark.operators.dedup import _LIVE_SHINGLE_CACHE
        from mergeextractor_spark.operators._util import drain_persistent_rdds

        while _LIVE_SHINGLE_CACHE:
            _LIVE_SHINGLE_CACHE.pop().unpersist(blocking=True)
        drain_persistent_rdds(spark)


def profile_commit_files(spark):
    """VERDICT item 1a: file count per touched partition after a commit."""
    import glob

    from mergeextractor_spark.operators.dedup import (
        ensure_minhash_commit_store,
    )

    path = ensure_minhash_commit_store(spark, SF, tag="cycle")
    counts = {}
    for pdir in glob.glob(os.path.join(path, "band=*", "bpfx=*")):
        n = len(glob.glob(os.path.join(pdir, "*.parquet")))
        counts.setdefault(n, 0)
        counts[n] += 1
    print(f"files-per-partition histogram for {path}: {counts}")


def profile_phash(spark, n=3):
    """Node profile of dedup_image_phash: corpus build+decode UDF vs
    banded join vs join-back."""
    from mergeextractor_spark.operators._util import truncate_lineage
    from mergeextractor_spark.operators.multimodal import (
        _banded_hamming_dedup,
        _image_corpus,
        image_phash,
    )

    p = P()
    for r in range(n):
        corpus = _image_corpus(spark, SF)
        # stage A: payload build only (no Python boundary)
        p.run("payload build (noop)", lambda: noop(corpus.select("media_id", "payload")))
        # stage B: + decode UDF
        sig_plain = image_phash(corpus)
        p.run("decode UDF (noop)", lambda: noop(sig_plain))
        # stage C: checkpointed signatures (what the dedup consumes)
        sig = truncate_lineage(image_phash(corpus), eager=False)
        out = _banded_hamming_dedup(sig)
        p.run("full dedup (noop)", lambda: noop(out))
        # stage D: banded join alone over materialized signatures
        sig2 = truncate_lineage(image_phash(corpus), eager=True)
        out2 = _banded_hamming_dedup(sig2)
        p.run("banded join (sig pre-materialized)", lambda: noop(out2))
        p.report(f"dedup_image_phash round {r}")
        from mergeextractor_spark.operators._util import drain_persistent_rdds

        drain_persistent_rdds(spark)


def profile_pretrain(spark, n=3):
    """Phase profile of pipeline_pretrain_corpus."""
    reg = load_all()
    p = P()
    for r in range(n):
        df = p.run("construct", lambda: reg["pipeline_pretrain_corpus"].spark(spark, SF))
        p.run("action (noop)", lambda: noop(df))
        p.report(f"pipeline_pretrain_corpus round {r}")
        from mergeextractor_spark.operators._util import drain_persistent_rdds

        drain_persistent_rdds(spark)


def profile_key(spark, key, n=3):
    reg = load_all()
    p = P()
    for r in range(n):
        df = p.run("construct", lambda: reg[key].spark(spark, SF))
        p.run("action (noop)", lambda: noop(df))
        p.report(f"{key} round {r}")
        from mergeextractor_spark.operators.dedup import _LIVE_SHINGLE_CACHE
        from mergeextractor_spark.operators._util import drain_persistent_rdds

        while _LIVE_SHINGLE_CACHE:
            _LIVE_SHINGLE_CACHE.pop().unpersist(blocking=True)
        drain_persistent_rdds(spark)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "cycle"
    spark = get_spark("profile-r15")
    load_all()
    if what == "cycle":
        profile_cycle(spark)
        profile_commit_files(spark)
    elif what == "phash":
        profile_phash(spark)
    elif what == "pretrain":
        profile_pretrain(spark)
    elif what == "files":
        profile_commit_files(spark)
    else:
        profile_key(spark, what)


def dump_commit_write_plans(spark):
    """Before/after formatted plans of the commit's merged-write frame
    (the declared compact/cycle keys return the post-commit rollup, so
    the write job's Exchange count is only visible here)."""
    from mergeextractor_spark.operators._util import t, truncate_lineage
    from mergeextractor_spark.operators.dedup import (
        INCR_BATCH_MOD,
        _bands_of,
        _cache_shingles,
        _minhash_agg_cols,
        _spread_doc_shingles,
        ensure_minhash_commit_store,
        minhash_store_read,
    )

    d = t(spark, SF, "documents")
    path = ensure_minhash_commit_store(spark, SF)
    batch = d.filter(F.col("doc_id") % INCR_BATCH_MOD == 0)
    sh_b = _cache_shingles(_spread_doc_shingles(batch))
    bands_b = truncate_lineage(
        _bands_of(sh_b.groupBy("doc_id").agg(*_minhash_agg_cols()))
    )
    new = bands_b.withColumn("bpfx", F.substring("bucket", 1, 1)).select(
        "doc_id", "bucket", "band", "bpfx"
    )
    parts = new.select("band", "bpfx").distinct().collect()
    import functools
    import operator

    pair_pred = functools.reduce(
        operator.or_,
        [(F.col("band") == r.band) & (F.col("bpfx") == r.bpfx) for r in parts],
    )
    existing = minhash_store_read(spark, path).filter(pair_pred)
    variants = {
        "before": existing.unionByName(new).distinct().repartition("band", "bpfx"),
        "after": existing.unionByName(new).repartition("band", "bpfx").dropDuplicates(),
    }
    out_dir = os.path.join(_REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for tag, df in variants.items():
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = os.path.join(out_dir, f"minhash_commit_write_{tag}.txt")
        with open(p, "w") as f:
            f.write(plan)
        import re
        print(f"wrote {p}: Exchange x{len(re.findall(r'Exchange', plan))}")

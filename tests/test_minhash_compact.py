"""dedup_minhash_store_compact pins (r14 — the index COMMIT that
closes the incremental-dedup ingest cycle).

Proofs:
  1. the post-commit store equals the full-corpus band index (the
     registered rollup matches an in-memory recompute over ALL docs);
  2. re-commit is idempotent (DISTINCT union: identical rollup and
     identical store row count on a second run);
  3. the overwrite is PARTITION-SCOPED: committing one document's
     bands into a scratch store rewrites only the partitions that
     document's keys land in — every other partition's files keep
     their mtimes.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rollup(spark):
    from mergeextractor_spark.registry import load_all

    return {
        (r.band, r.bpfx): (r.n_keys, r.n_docs)
        for r in load_all()["dedup_minhash_store_compact"].spark(spark, SF).collect()
    }


def test_post_commit_store_equals_full_corpus_index(spark):
    from mergeextractor_spark.operators._util import t
    from mergeextractor_spark.operators.dedup import (
        _bands_of,
        _minhash_agg_cols,
        _spread_doc_shingles,
    )

    got = _rollup(spark)
    sh = _spread_doc_shingles(t(spark, SF, "documents"))
    bands = _bands_of(sh.groupBy("doc_id").agg(*_minhash_agg_cols()))
    want = {
        (r.band, r.bpfx): (r.n_keys, r.n_docs)
        for r in bands.withColumn("bpfx", F.substring("bucket", 1, 1))
        .groupBy("band", "bpfx")
        .agg(
            F.count("*").alias("n_keys"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .collect()
    }
    assert got == want
    assert got


def test_recommit_is_idempotent(spark):
    from mergeextractor_spark.operators.dedup import (
        ensure_minhash_commit_store,
        minhash_store_read,
    )

    first = _rollup(spark)
    path = ensure_minhash_commit_store(spark, SF)
    n_rows = minhash_store_read(spark, path).count()
    assert _rollup(spark) == first
    assert minhash_store_read(spark, path).count() == n_rows


def test_commit_rewrites_only_touched_partitions(spark, tmp_path):
    from mergeextractor_spark.operators._util import t
    from mergeextractor_spark.operators.dedup import (
        _bands_of,
        _minhash_agg_cols,
        _spread_doc_shingles,
        minhash_store_commit,
        minhash_store_write,
    )

    path = str(tmp_path / "store")
    minhash_store_write(spark, SF, path)

    def part_mtimes():
        out = {}
        for d in glob.glob(os.path.join(path, "band=*", "bpfx=*")):
            files = [
                os.path.getmtime(f)
                for f in glob.glob(os.path.join(d, "*.parquet"))
            ]
            out[os.path.relpath(d, path)] = tuple(sorted(files))
        return out

    before = part_mtimes()
    one = t(spark, SF, "documents").filter(F.col("doc_id") == 5)
    sh = _spread_doc_shingles(one)
    bands = _bands_of(sh.groupBy("doc_id").agg(*_minhash_agg_cols()))
    n_parts = minhash_store_commit(spark, path, bands)
    assert 1 <= n_parts <= 3  # one doc -> at most one key per band
    after = part_mtimes()
    touched = {
        f"band={r.band}/bpfx={r.bucket[:1]}"
        for r in bands.collect()
    }
    assert touched, "doc 5 must produce band keys"
    untouched = set(before) - touched
    assert untouched, "fixture store must have partitions doc 5 misses"
    for p in untouched:
        assert after[p] == before[p], f"untouched partition {p} rewritten"
    for p in touched:
        assert after[p] != before.get(p), f"touched partition {p} not rewritten"

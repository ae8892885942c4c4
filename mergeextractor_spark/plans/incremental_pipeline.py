"""Flagship #6: crash-safe incremental corpus ingest.

The production loop a 100 TB corpus runs daily: an incoming batch is
deduplicated AGAINST THE EXISTING STORE without rescanning or joining
the whole store, gated by quality rules, and appended atomically so a
re-run (retry, replayed batch, crashed driver) cannot double-ingest.

Plan shape per batch:

1. **Bloom prefilter** (curation_queries.bloom_build over the store's
   content hashes): the broadcast bitmap splits the incoming batch
   map-side into definitely-new rows (bit miss — skip the verify join
   entirely) and maybe-dup candidates (bit hit). Only candidates — a
   small fraction of the batch at production FP rates — reach the join.
2. **Exact verify**: candidates anti-join the store ON THE CONTENT HASH
   (32-byte keys, never text). Bloom false positives survive here, so
   the final content is exactly what a full anti-join would produce —
   the bloom only saves work, never changes the answer (pinned in
   tests/test_incremental_ingest.py).
3. **Quality gate**: the Gopher word-count bounds (50..100000 tokens)
   on the surviving new rows — same family as text_gopher_rules, one
   map stage.
4. **Atomic append**: survivors land in a staging directory that is
   RENAMED into the store only after a `_BATCH_<id>` marker commits; a
   marker that already exists short-circuits the whole batch
   (idempotent replay). A crash before the rename leaves the store
   untouched (same discipline as sources/sinks.py merge_kv_store).

Registered as ``pipeline_incremental_ingest`` with a FULL exact oracle
(r11): the bloom is the md5-sliced one, so DuckDB recomputes every
summary count — bit set, probe with false positives, exact-text dedup,
token gate; content-exactness and idempotency stay pytest-pinned.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..operators._util import scratch_dir, t
from ..operators.curation_queries import BLOOM_K, BLOOM_M_BITS

GATE_MIN_TOKENS = 50
GATE_MAX_TOKENS = 100_000


def _hashed(df: DataFrame) -> DataFrame:
    return df.withColumn("h", F.md5(F.col("text")))


def _gate(df: DataFrame) -> DataFrame:
    n_tokens = F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""))
    return df.filter((n_tokens >= GATE_MIN_TOKENS) & (n_tokens <= GATE_MAX_TOKENS))


def ingest_batch(
    spark: SparkSession, store: str, batch: DataFrame, batch_id: str
) -> dict:
    """Ingest ``batch`` into the parquet corpus at ``store``; returns the
    per-stage counts. Idempotent per ``batch_id``: a committed marker
    short-circuits the replay with zero writes."""
    marker = os.path.join(store, f"_BATCH_{batch_id}")
    if os.path.exists(marker):
        return {"batch_id": batch_id, "replayed": True, "appended": 0}

    from ..operators.curation_queries import bloom_build, bloom_probe

    incoming = _hashed(batch)
    n_incoming = incoming.count()

    existing = _hashed(spark.read.parquet(store).select("text"))
    bitmap = bloom_build(existing.select(F.col("h")))
    maybe = bloom_probe(incoming, bitmap, "h")
    # definitely-new rows skip the verify join entirely (zero-FN pinned)
    fresh = maybe.filter(~F.col("maybe_dup")).drop("maybe_dup")
    candidates = maybe.filter(F.col("maybe_dup")).drop("maybe_dup")
    n_candidates = candidates.count()
    verified_new = candidates.join(
        existing.select("h").distinct(), "h", "left_anti"
    )
    survivors = _gate(fresh.unionByName(verified_new)).drop("h")
    n_appended = survivors.count()

    # stage → atomic publish: parquet files land in a scratch dir and are
    # renamed into the store one file at a time AFTER a full write, then
    # the marker commits the batch. A crash mid-stage leaves the store
    # bit-identical; a crash mid-rename is recovered by the replay (the
    # marker is absent, and re-ingest dedups the half-renamed rows
    # against the store content itself).
    stage = scratch_dir(f"ingest_{batch_id}_")
    survivors.write.mode("overwrite").parquet(stage)
    for f in os.listdir(stage):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(stage, f),
                os.path.join(store, f"batch_{batch_id}_{f}"),
            )
    with open(marker, "w") as fh:
        fh.write(batch_id)
    shutil.rmtree(stage, ignore_errors=True)
    return {
        "batch_id": batch_id,
        "replayed": False,
        "incoming": n_incoming,
        "bloom_candidates": n_candidates,
        "appended": n_appended,
    }


@register(
    "pipeline_incremental_ingest",
    # r11 graduation — a FULL exact oracle after all: the pipeline's
    # bloom is the md5-sliced one (curation_queries.bloom_build — the
    # registry note blaming Spark's seeded bloom_filter_agg was stale),
    # so every count in the summary is deterministic and DuckDB
    # recomputes the whole thing: the store-half bit set, the batch-half
    # probe (FPs included), the exact-text dedup, and the token gate.
    # The 20 re-keyed dup rows carry store TEXT, so they probe positive
    # and drop at the verify join regardless of WHICH 20 limit() picked.
    oracle=f"""
    WITH store AS (SELECT text FROM documents WHERE doc_id % 10 < 8),
    batch8 AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8),
    pos AS (SELECT i FROM range({BLOOM_K}) t(i)),
    bits AS (
      SELECT DISTINCT
             CAST(concat('0x', substr(md5(text), 1 + 5 * i, 5)) AS BIGINT) % {BLOOM_M_BITS} AS b
      FROM store CROSS JOIN pos
    ),
    probe8 AS (
      SELECT b8.doc_id, b8.text,
             bool_and(
               CAST(concat('0x', substr(md5(b8.text), 1 + 5 * p.i, 5)) AS BIGINT)
                 % {BLOOM_M_BITS} IN (SELECT b FROM bits)
             ) AS maybe
      FROM batch8 b8 CROSS JOIN pos p GROUP BY 1, 2
    )
    SELECT 'b001' AS batch_id,
           CAST((SELECT count(*) FROM batch8) + 20 AS BIGINT) AS incoming,
           CAST((SELECT count(*) FROM probe8 WHERE maybe) + 20 AS BIGINT) AS bloom_candidates,
           CAST((SELECT count(*) FROM batch8 b
                 WHERE b.text NOT IN (SELECT text FROM store)
                   AND len(list_filter(string_split_regex(lower(b.text), '\\s+'), x -> x <> ''))
                       BETWEEN {GATE_MIN_TOKENS} AND {GATE_MAX_TOKENS}) AS BIGINT) AS appended,
           TRUE AS replay_short_circuited
    """,
    doc="Flagship #6 — crash-safe incremental ingest: an existing store "
    "(documents with doc_id%10<8) receives a batch of the remaining "
    "docs PLUS re-keyed copies of store content; the bloom prefilter "
    "routes definite-new rows around the verify join, the hash "
    "anti-join drops the true dups (bloom FPs survive to here, so "
    "content is exact), the Gopher token gate filters, and the append "
    "commits atomically behind a batch marker — replaying the same "
    "batch appends zero rows. Returns the per-stage count summary, "
    "hash-verified end-to-end (r11): the md5-sliced bloom makes every "
    "count deterministic, so the oracle rebuilds the store bit set, "
    "the probe (false positives included), the exact-text dedup, and "
    "the token gate in SQL; exactness + idempotency + crash-recovery "
    "pinned in tests/test_incremental_ingest.py.",
    eager=True,  # construction writes the store and runs both ingests
)
def pipeline_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    store = os.path.join(scratch_dir("corpus_"), "store")
    docs.filter(F.col("doc_id") % 10 < 8).write.parquet(store)
    dup_part = (
        docs.filter(F.col("doc_id") % 10 < 8)
        .limit(20)
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    batch = docs.filter(F.col("doc_id") % 10 >= 8).unionByName(dup_part)
    first = ingest_batch(spark, store, batch, "b001")
    replay = ingest_batch(spark, store, batch, "b001")
    rows = [
        (
            first["batch_id"],
            first["incoming"],
            first["bloom_candidates"],
            first["appended"],
            replay["replayed"],
        )
    ]
    return spark.createDataFrame(
        rows,
        "batch_id string, incoming bigint, bloom_candidates bigint, "
        "appended bigint, replay_short_circuited boolean",
    )

"""Registered queries for the ML-adjacent operator surface (SURVEY §2.8):
embed_text, rerank_crossencoder (oracle-paired — the overlap stand-in is
SQL-expressible), str_normalize_unicode, abbrev_enrich, and the KV-sink
roundtrip.
"""

from __future__ import annotations

import os
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ._util import golden_path, scratch_dir, t, r4

RERANK_QUERY = "events leading up to the merger agreement between the companies"

_FILINGS_PQ = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "filings.parquet",
)


@register(
    "embed_text",
    # r10 graduation (VERDICT r9 item 2): golden-table oracle — the
    # sequential hash-embedder (with the UDF's float32 element cast)
    # over every testdata text, keyed by md5(text) so one golden file is
    # correct at every sf. tools/make_golden.py regenerates;
    # tests/test_golden_oracles.py drift-guards.
    oracle=f"""
    SELECT d.doc_id, g.dim, g.sq_norm
    FROM documents d
    JOIN read_parquet('{golden_path("embed_text")}') g
      ON md5(d.text) = g.text_md5
    """,
    doc="Pluggable text-embedding stage with the deterministic hash-embedder "
    "stand-in (ref ChunkProcessor.py:233-238; model swap = one callable). "
    "Returns per-doc vector stats so the rows-only check still pins shape.",
)
def embed_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.embedding import embed_text_udf

    udf = embed_text_udf()
    out = t(spark, sf_dir, "documents").select(
        "doc_id", udf(F.col("text")).alias("vec")
    )
    return out.select(
        "doc_id",
        F.size("vec").alias("dim"),
        r4(F.aggregate("vec", F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double"))).alias("sq_norm"),
    )


@register(
    "rerank_crossencoder",
    oracle=f"""
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(len(list_intersect(
             list_distinct(list_filter(string_split(lower('{RERANK_QUERY}'), ' '), x -> x <> '')),
             list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
           )) - 2.0))), 4) AS rerank
    FROM documents
    """,
    doc="Reranker stage with the deterministic overlap-sigmoid stand-in "
    "(ref ChunkProcessor.py:308-317 CrossEncoder + sigmoid). The stand-in "
    "is SQL-expressible, so this UDF-shaped operator still gets a value "
    "oracle — the real model drops into the same pandas UDF.",
)
def rerank_crossencoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.embedding import rerank_udf

    udf = rerank_udf(RERANK_QUERY)
    return t(spark, sf_dir, "documents").select(
        "doc_id", r4(udf(F.col("text"))).alias("rerank")
    )


@register(
    "str_normalize_unicode",
    # r10 graduation: DuckDB has no NFKC, but the sequential unicodedata
    # mirror does — golden-table oracle keyed by md5(text).
    oracle=f"""
    SELECT d.doc_id, g.folded
    FROM documents d
    JOIN read_parquet('{golden_path("str_normalize_unicode")}') g
      ON md5(d.text) = g.text_md5
    """,
    doc="NFKC normalize + ASCII fold (ref Processor.py:132-152). No native "
    "Spark/DuckDB NFKC — Arrow-batched pandas UDF; rows-only check.",
)
def str_normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.StringType())
    def nfkc_fold(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                unicodedata.normalize("NFKC", t or "").encode("ascii", "ignore").decode("ascii")
                for t in texts
            ]
        )

    raw = F.concat(F.lit("ﬁ "), F.substring("text", 1, 60), F.lit("™"))
    return t(spark, sf_dir, "documents").select(
        "doc_id", nfkc_fold(raw).alias("folded")
    )


@register(
    "abbrev_enrich",
    # r10 graduation: golden-table oracle from the sequential
    # top_orgs + find_definition mirror over the filing fixtures.
    oracle=f"""
    SELECT main_index, org, definition_len
    FROM read_parquet('{golden_path("abbrev_enrich")}')
    """,
    doc="Abbreviation enrichment composition (ref ChunkProcessor.py:331-370): "
    "regex-NER top-5 ORGs → definition-paragraph theta join → formatted "
    "preamble rows (main_index, org, definition).",
)
def abbrev_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .chunking import chunk_documents
    from .domain_queries import _filings_df
    from .enrich import find_definition_paragraphs, top_orgs

    filings = _filings_df(spark)
    chunks = chunk_documents(
        filings.select("main_index", "content"), text_col="content", id_cols=["main_index"]
    )
    orgs = top_orgs(
        filings.select("main_index", "content"), "main_index", "content", k=5
    ).select("main_index", "org")
    defs = find_definition_paragraphs(orgs, chunks, org_col="org", id_col="main_index")
    return defs.select("main_index", "org", F.length("definition").cast("long").alias("definition_len"))


@register(
    "sink_kv_roundtrip",
    # r10 graduation: DuckDB recomputes the expected point-lookup row
    # (key 255 = filing 5 under the +250 rekey) from the filing fixture,
    # so the hash row proves the write -> partition-pruned point read
    # preserves values.
    oracle=f"""
    SELECT main_index + 250 AS main_index, company_a,
           CAST(floor((main_index + 250) / 100) AS INTEGER) AS bucket
    FROM read_parquet('{_FILINGS_PQ}')
    WHERE main_index + 250 = 255
    """,
    doc="Bucketed KV-store write→point-read roundtrip (ref Mongo sharding "
    "DatabaseHandler.py:24-34 → partitionBy('bucket') parquet; the read is "
    "partition-pruned).",
    eager=True,  # construction writes to the scratch store
)
def sink_kv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.sinks import scan_kv_point, sink_kv_store
    from .domain_queries import _filings_df

    path = os.path.join(scratch_dir("kvq_"), "store")
    sink_kv_store(_filings_df(spark).withColumn("main_index", F.col("main_index") + 250), path, mode="overwrite")
    got = scan_kv_point(spark, path, 255)
    return got.select("main_index", "company_a", "bucket")


@register(
    "sink_kv_upsert",
    # r10 graduation: DuckDB recomputes the post-MERGE state from the
    # filing fixture — row 0 with the replaced company_a, row 1 intact,
    # row 999 inserted as filing 1's copy — so the hash row proves the
    # MERGE semantics (matched-replace / not-matched-insert / untouched
    # rows intact), not just the row count.
    oracle=f"""
    SELECT main_index,
           CASE WHEN main_index = 0 THEN 'Updated Alpha Holdings'
                ELSE company_a END AS company_a,
           CAST(floor(main_index / 100) AS INTEGER) AS bucket
    FROM read_parquet('{_FILINGS_PQ}') WHERE main_index IN (0, 1)
    UNION ALL
    SELECT CAST(999 AS BIGINT) AS main_index, company_a,
           CAST(9 AS INTEGER) AS bucket
    FROM read_parquet('{_FILINGS_PQ}') WHERE main_index = 1
    """,
    doc="Row-level MERGE upsert into the bucketed store (ref "
    "patchabbrev.py:224-229 Mongo update_one(upsert=True)): one matched "
    "row replaced, one new row inserted, untouched rows intact; only the "
    "affected bucket partitions are read or rewritten.",
    eager=True,  # construction writes to the scratch store
)
def sink_kv_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.sinks import merge_kv_store, sink_kv_store
    from .domain_queries import _filings_df

    path = os.path.join(scratch_dir("kvm_"), "store")
    base = _filings_df(spark)
    sink_kv_store(base, path, mode="overwrite")
    updates = base.filter(F.col("main_index") == 0).withColumn(
        "company_a", F.lit("Updated Alpha Holdings")
    )
    inserts = base.filter(F.col("main_index") == 1).withColumn("main_index", F.lit(999))
    merge_kv_store(spark, updates.unionByName(inserts), path)
    return (
        spark.read.parquet(path)
        .select("main_index", "company_a", "bucket")
        .filter(F.col("main_index").isin(0, 1, 999))
    )

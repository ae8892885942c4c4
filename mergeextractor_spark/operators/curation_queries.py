"""Corpus-curation operators a large-scale training-data pipeline runs
between crawling and tokenization: per-domain caps, mixture weighting,
lexical-diversity scoring, and Bloom-filter novelty prefiltering.

All native Spark SQL; every SQL-expressible key carries a DuckDB oracle.
Scale posture (100 TB): each operator is one scan plus at most one shuffle
on a low-cardinality key (source / lang); nothing shuffles document text
except the explicit per-domain cap, whose shuffle carries (source, doc_id)
pairs only until the final keep-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._util import t, r4

DOMAIN_CAP = 10  # C4-style per-source document cap (fixture default)


@register(
    "sample_domain_cap",
    oracle=f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn <= {DOMAIN_CAP}
    """,
    doc=f"Per-domain document cap (keep the {DOMAIN_CAP} lowest doc_ids per "
    "source) — the C4/RefinedWeb guard against a single domain dominating "
    "the training mixture. Deterministic keep-lowest ordering. Spark "
    "plans this as WindowGroupLimit: each map task pre-prunes to the "
    "cap per source BEFORE the shuffle, so the exchange carries at most "
    f"cap×sources rows per task, never the full corpus. Only (doc_id, "
    "source) ever shuffles — never text.",
)
def sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("source").orderBy("doc_id")
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= DOMAIN_CAP)
        .select("doc_id", "source")
    )


@register(
    "agg_mixture_weights",
    oracle="""
    WITH toks AS (
      SELECT lang,
             sum(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))) AS lang_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(lang_tokens) AS total_tokens, count(*) AS n_langs FROM toks)
    SELECT lang,
           CAST(lang_tokens AS BIGINT) AS lang_tokens,
           round(least(1.0, (t.total_tokens / t.n_langs) / lang_tokens), 4) AS sample_rate
    FROM toks CROSS JOIN tot t
    """,
    doc="Training-mixture weighting: per-language token totals plus the "
    "sampling rate that flattens the corpus to a uniform language mixture "
    "(rate = target_share / actual_share, capped at 1 — languages below "
    "target are kept whole, never upsampled). The shape every data-mixing "
    "recipe (DoReMi-style reweighting, C4 language balancing) needs as its "
    "input. One map-side token count + one 5-row aggregate; the cross join "
    "is against a single global-totals row (broadcast by constant folding).",
)
def agg_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.sum(
                F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""))
            ).alias("lang_tokens")
        )
    )
    tot = toks.agg(
        F.sum("lang_tokens").alias("total_tokens"), F.count("*").alias("n_langs")
    )
    rate = F.least(
        F.lit(1.0),
        (F.col("total_tokens") / F.col("n_langs")) / F.col("lang_tokens"),
    )
    return toks.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("lang_tokens").cast("bigint").alias("lang_tokens"),
        r4(rate).alias("sample_rate"),
    )


@register(
    "text_ttr",
    oracle="""
    WITH ws AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
      FROM documents
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(w)) AS BIGINT) AS n_types,
           round(len(list_distinct(w))::DOUBLE / greatest(len(w), 1), 4) AS ttr
    FROM ws
    """,
    doc="Type-token ratio per document — the lexical-diversity quality "
    "signal (Gopher rule family: near-zero TTR flags keyword-stuffed or "
    "looped text, near-one flags hash soup). Pure map-side: tokenize, "
    "array_distinct, two sizes — no shuffle at all, so it composes into "
    "any curation scan for free.",
)
def text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    d = t(spark, sf_dir, "documents").select("doc_id", w.alias("w"))
    ttr = F.size(F.array_distinct("w")).cast("double") / F.greatest(
        F.size("w"), F.lit(1)
    )
    return d.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("w")).cast("bigint").alias("n_types"),
        r4(ttr).alias("ttr"),
    )


BLOOM_M_BITS = 1 << 17  # bitmap width (16 KiB); production sizes to n·10 bits
BLOOM_K = 6  # hash functions — six disjoint 20-bit slices of the md5


def _bloom_positions(h):
    """K bit positions as NATIVE columns: disjoint 5-hex-char (20-bit)
    slices of the md5, mod m. Computed JVM-side so the probe-side pandas
    UDF receives plain int64 arrays and stays fully numpy-vectorized."""
    return [
        (F.conv(F.substring(h, 1 + 5 * i, 5), 16, 10).cast("long") % BLOOM_M_BITS).alias(
            f"p{i}"
        )
        for i in range(BLOOM_K)
    ]


def bloom_build(hashed: DataFrame):
    """OR-combine per-partition bitmaps into one numpy uint64 bitmap via
    treeAggregate (log-depth combine; driver receives one m-bit array —
    16 KiB here, MBs in production — regardless of corpus size)."""

    words = BLOOM_M_BITS // 64

    def seq(acc, row):
        for p in row:
            acc[p >> 6] |= np.uint64(1 << (p & 63))
        return acc

    return hashed.select(*_bloom_positions(F.col("h"))).rdd.treeAggregate(
        np.zeros(words, dtype=np.uint64), seq, lambda a, b: a | b
    )


@register(
    "dedup_bloom_prefilter",
    oracle=None,  # probabilistic sketch → rows-only (pytest bounds the FP rate)
    doc="Bloom-filter novelty prefilter: how a 100 TB deployment dedups an "
    "incoming crawl batch against the existing corpus WITHOUT joining it. "
    "Bit positions are md5 slices computed natively; the corpus half's "
    "positions tree-aggregate (log-depth OR) into one broadcast numpy "
    "bitmap, and the incoming half probes it with an Arrow-batched "
    "numpy-vectorized pandas UDF. Rows failing every probe are DEFINITELY "
    "novel and skip the verify join entirely; might-contain survivors "
    "(true dups + ~1% FPs) proceed to an exact anti-join. Guarantees: "
    "zero false negatives (pytest-asserted) and candidate volume ≈ dup "
    "volume. Returns the definitely-novel set. No shuffle anywhere: "
    "build is a tree-reduce, probe is map-side.",
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    d = t(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("h"))
    bitmap = spark.sparkContext.broadcast(bloom_build(d.filter(F.col("doc_id") % 2 == 0)))

    @pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        bm = bitmap.value
        pv = np.vstack(pos.to_numpy())  # (batch, K) int64 positions
        bits = (bm[pv >> 6] >> (pv & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    incoming = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "h", F.array(*_bloom_positions(F.col("h"))).alias("pos")
    )
    return incoming.filter(~might_contain(F.col("pos"))).select("doc_id", "h")

"""Query registry feeding ``__spark_entry__.py``.

Each operator from SURVEY.md §2 registers:
  key     — the stable slug (SURVEY §2 `key` column)
  spark   — Callable[(SparkSession, sf_dir) -> DataFrame]
  oracle  — equivalent DuckDB ANSI SQL over the pre-registered views
            (region nation customer supplier part orders lineitem events
            documents embeddings), or None for rows-only checks.

Parity rules (driver compares row-count + schema + order-insensitive
value hash, columns sorted by name):
  * alias every computed column identically on both sides;
  * round floating-point outputs to 4 decimals on both sides;
  * emit dates/timestamps as formatted strings on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    key: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(key: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``key``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if key in REGISTRY:
            raise KeyError(f"duplicate query key {key!r}")
        REGISTRY[key] = Query(key=key, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# Keys that already hold a green hash-checked row in CORRECTNESS_r01/r02
# (historical fact, frozen).  The driver's correctness gate walks the dict
# returned by load_all() front-to-back under a wall-clock budget and in
# round 2 demonstrably covered exactly the first 50 keys — so every
# oracle-paired key that has NEVER had a driver row must sit in positions
# 1..50 this round.  Rotation policy: never-checked oracle keys first
# (flagships leading), then oracle keys added after the r02 snapshot, then
# the already-green keys, then rows-only keys.
_DRIVER_GREEN: frozenset[str] = frozenset({
    # CORRECTNESS_r02.json (50 keys, all green)
    "project_cols", "filter_index_range", "filter_token_floor",
    "filter_company_presence", "filter_hyphen_retry", "filter_skip_terms",
    "filter_min_length", "join_anti_incremental", "join_deal_filing",
    "join_fuzzy_entity", "join_chunk_back", "join_org_definition",
    "join_union_dedup", "agg_count_total", "agg_org_topk",
    "agg_first_match", "agg_concat_section", "rank_hybrid_top1",
    "window_chunk_follow", "sort_by_key", "set_union_hits",
    "set_distinct_urls", "set_distinct_defs", "date_window",
    "str_strip_parens", "str_drop_last_word", "str_first_token",
    "str_replace_dash", "str_cik_battery", "str_urlencode",
    "str_page_clean", "str_truncate", "str_html_to_text",
    "str_normalize_quotes", "date_format_iso", "math_weighted_sum",
    "math_sigmoid", "json_parse_toolcall", "json_extract_hits",
    "json_parse_corrupt_tolerant", "text_lang_id", "text_quality_score",
    "text_token_count", "text_fingerprint", "text_winnow_fingerprint",
    "set_distinct_lines", "chunk_fixed", "ner_orgs_regex", "fuzzy_ratio",
    "text_pii_scrub",
})

# Explicit front-of-window order for the 50 oracle keys with no driver row
# in any round (VERDICT r2 "Next round" item 1).  Flagships first, then the
# dedup/ANN/OLAP/streaming extension surface, then the §2 parity keys.
_ROTATION_FIRST: tuple[str, ...] = (
    "extract_section_pipeline", "curation_pipeline",
    "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_rep",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_neardup",
    "dedup_components", "dedup_embedding_neardup", "dedup_keep_latest",
    "ann_bruteforce_topk", "ann_lsh_buckets", "ann_ivf_topk",
    "math_cosine_sim", "agg_vector_mean", "query_embed_build",
    "vector_quantize_int8", "rerank_crossencoder",
    "text_repetition_ratio", "sample_hash_split", "contamination_ngram",
    "agg_salted_skew", "olap_pricing_summary", "olap_top_revenue_orders",
    "olap_nation_revenue", "agg_rollup", "agg_cube", "agg_pivot",
    "agg_unpivot", "agg_percentile", "agg_count_distinct",
    "join_asof", "join_range_interval", "profile_numeric",
    "events_tumbling_counts", "events_sliding_counts", "events_sessionize",
    "join_stream_static", "scan_csv_deals", "filter_exists_skip",
    "str_regex_extract_cik", "str_lstrip_zeros", "str_build_url",
    "str_drop_pagenums", "str_collapse_newlines", "str_strip_toc",
    "str_html_to_text_v2", "str_company_loose", "str_mojibake_repair",
)


def load_all() -> dict[str, Query]:
    """Import every module that registers queries (idempotent).

    Returned order implements the gate-window rotation documented above:
      1. oracle-paired keys never covered by a CORRECTNESS round, in
         ``_ROTATION_FIRST`` order (flagships first);
      2. oracle-paired keys registered after the r02 snapshot (neither
         list knows them yet — they queue for the next rotation);
      3. oracle-paired keys already green in r01/r02;
      4. rows-only keys.
    """
    from .operators import (  # noqa: F401
        relational,
        scalar_queries,
        text_queries,
        vector_queries,
        dedup,
        streaming_queries,
        domain_queries,
        mlops_queries,
        parity_queries,
        scale_queries,
        olap_queries,
        multimodal,
        curation_queries,
    )
    from .plans import extract_pipeline, curation_pipeline  # noqa: F401

    first = {k: i for i, k in enumerate(_ROTATION_FIRST)}

    def rank(kv: tuple[str, Query]) -> tuple[int, int]:
        key, q = kv
        if q.oracle is None:
            return (3, 0)
        if key in first:
            return (0, first[key])
        if key in _DRIVER_GREEN:
            return (2, 0)
        return (1, 0)  # new oracle key, queued for the next rotation

    return dict(sorted(REGISTRY.items(), key=rank))

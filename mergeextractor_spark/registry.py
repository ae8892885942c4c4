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
    # True when merely CONSTRUCTING the DataFrame performs work (iterative
    # driver loops, warehouse/sink writes).  Declared at registration so
    # surfaces that must stay lazy (temp-view registration) can skip these
    # instead of maintaining a hand-list that drifts (VERDICT r4 item 4).
    eager: bool = False


REGISTRY: dict[str, Query] = {}


def register(key: str, oracle: str | None = None, doc: str = "", eager: bool = False):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``key``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if key in REGISTRY:
            raise KeyError(f"duplicate query key {key!r}")
        REGISTRY[key] = Query(
            key=key, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), eager=eager
        )
        return fn

    return wrap


# Current driver round.  Bumped once per round when the previous round's
# CORRECTNESS file is folded into _DRIVER_GREEN below; seeds the canary
# sample so each round re-checks a different deterministic slice of the
# already-green keys (VERDICT r3 "Next round" item 3).
_ROUND: int = 5

# Keys that already hold a green hash-checked row in CORRECTNESS_r01–r03
# (historical fact, frozen).  The driver's correctness gate walks the dict
# returned by load_all() front-to-back under a wall-clock budget and in
# rounds 2 and 3 demonstrably covered exactly the first 50 keys — so every
# oracle-paired key that has NEVER had a driver row must sit in positions
# 1..50 this round.  Rotation policy: never-checked oracle keys first
# (flagships leading), then oracle keys added after the r03 snapshot, then
# ~10 canary re-checks of previously-green keys, then rows-only keys, then
# the remaining already-green keys.
_DRIVER_GREEN: frozenset[str] = frozenset({
    # CORRECTNESS_r01/r02 (50 distinct keys, all green)
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
    # CORRECTNESS_r03.json (50 keys, all green)
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
    # CORRECTNESS_r04.json (46 hash-green rows: the 36 r04 rotation-first
    # keys below; the other 10 were canary re-passes already listed above)
    "curation_pipeline_ingest", "sample_domain_cap", "agg_mixture_weights",
    "text_ttr", "sample_temperature", "sample_apply_mixture",
    "sample_stratified", "sample_quality_decile", "sample_pack_sequences",
    "dq_expectations", "dedup_url_canonical", "dedup_exact_normalized",
    "ann_pq_topk", "ann_ivf_pq", "olap_order_priority",
    "olap_returned_customers", "olap_shipmode_priority",
    "olap_promo_revenue", "olap_disjunctive_filter", "olap_top_supplier",
    "olap_global_sales_gap", "agg_grouping_sets", "agg_histogram",
    "join_stream_stream", "cdc_scd2_history", "events_session_stats",
    "window_retention_cohort", "agg_funnel", "events_gap_fill",
    "events_moving_zscore", "window_running_total", "join_salted_skew",
    "text_unigram_logprob", "text_token_count_bpe", "text_ngram_topk",
    "text_tfidf_topk",
})

# Explicit front-of-window order for the 19 oracle keys with no driver row
# in any round (VERDICT r4 "Next round" item 3).  The two just-fixed red
# keys lead (first driver evidence doubles as the regression check), then
# the refine/quality flagships (the r5-added CCNet paragraph dedup and
# Lee-et-al span merge slot here), then the TPC-H-shaped OLAP batch.
_ROTATION_FIRST: tuple[str, ...] = (
    "join_bucketed_colocated", "dedup_substring_spans",
    "ann_ivf_pq_refine", "text_gopher_rules", "dedup_paragraph",
    "dedup_span_merge", "text_dsir_select",
    # OLAP (TPC-H Q13/Q17/Q18/Q21-shaped and friends)
    "olap_customer_orders_dist", "olap_small_quantity_revenue",
    "olap_large_orders", "olap_late_sole_supplier",
    "olap_volume_shipping", "olap_market_share", "olap_product_profit",
    "olap_best_supplier_per_part", "olap_important_parts",
    "olap_supplier_part_counts", "olap_forecast_revenue",
    "olap_excess_shippers",
)

# Rows-only keys (oracle=None by contract design) ordered by user impact
# (VERDICT r3 "Next round" item 2): sinks and sources first — they mirror
# the reference's side-effecting surface — then multimodal codecs, then
# cascade/chunking/LLM seams.  This round the whole backlog sits directly
# behind the 16 rotation-first oracle keys (VERDICT r4 item 3) so every
# registered key finally has driver evidence; the 4 keys that got their
# first driver rows in r04 queue at the back.
_ROWS_ONLY_ORDER: tuple[str, ...] = (
    "sink_kv_roundtrip", "sink_kv_upsert", "sink_fs_dump",
    "source_http_fts", "source_http_doc",
    "multimodal_image_meta", "multimodal_audio_meta",
    "multimodal_video_meta", "multimodal_frame_sample",
    "chunk_split_overlap", "header_cascade", "fuzzy_partial_ratio",
    "phrase_catalog", "ner_orgs", "embed_text", "abbrev_enrich",
    "str_normalize_unicode", "llm_classify_doc", "llm_extract_initiator",
    "pipeline_crawler", "pipeline_separator", "ann_ivf_trained",
    "agg_percentile_approx", "dedup_bloom_prefilter",
    "text_compression_ratio", "events_approx_distinct",
    "source_pyds_fts", "agg_hll_daily_union",
    # r5-added rows-only keys (no driver evidence yet)
    "vector_pca_project", "scan_orc_roundtrip", "sink_pyds_kv",
    "pipeline_incremental_ingest",
    # first driver rows recorded in CORRECTNESS_r04 — re-check last
    "sink_csv_append", "sink_csv_union", "sink_kv_store", "scan_kv_store",
)

# Number of previously-green keys re-checked per round.  Sampled
# deterministically from _DRIVER_GREEN seeded by _ROUND so a regression in
# r01-era code cannot stay invisible forever.  3 this round: 19 rotation
# keys + 31 never-evidenced rows-only keys + 3 canaries = a 53-key front
# window; the driver demonstrably covers ~50 under its wall-clock budget
# and most rows-only keys are cheap, so only the r04-evidenced tail (which
# already holds driver rows) risks falling outside.
_CANARY_SLOTS: int = 3


def canary_keys(round_no: int = _ROUND) -> tuple[str, ...]:
    """Deterministic per-round sample of already-green keys to re-check."""
    import random

    pool = sorted(_DRIVER_GREEN)
    return tuple(random.Random(round_no).sample(pool, min(_CANARY_SLOTS, len(pool))))


def load_all() -> dict[str, Query]:
    """Import every module that registers queries (idempotent).

    Returned order implements the gate-window rotation documented above
    (VERDICT r4 "Next round" item 3):
      1. the 19 oracle-paired keys never covered by a CORRECTNESS round,
         in ``_ROTATION_FIRST`` order (the two just-fixed keys first);
      2. the 28 rows-only keys with no driver evidence yet, highest
         impact first — after this round every registered key has
         appeared in some CORRECTNESS file;
      3. 3 canary re-checks of previously-green keys (seeded by round);
      4. the 4 rows-only keys whose first driver rows landed in r04;
      5. oracle-paired keys registered after the r05 snapshot;
      6. the remaining already-green keys.
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
        corpus_queries,
        graph_queries,
    )
    from .plans import (  # noqa: F401
        extract_pipeline,
        curation_pipeline,
        pretrain_pipeline,
        incremental_pipeline,
    )

    first = {k: i for i, k in enumerate(_ROTATION_FIRST)}
    canaries = {k: i for i, k in enumerate(canary_keys())}
    rows_only = {k: i for i, k in enumerate(_ROWS_ONLY_ORDER)}
    n_unevidenced = len(_ROWS_ONLY_ORDER) - 4  # tail 4 already have r04 rows

    def rank(kv: tuple[str, Query]) -> tuple[int, int]:
        key, q = kv
        if q.oracle is None:
            i = rows_only.get(key, len(_ROWS_ONLY_ORDER))
            return (1, i) if i < n_unevidenced else (3, i)
        if key in first:
            return (0, first[key])
        if key in canaries:
            return (2, canaries[key])
        if key in _DRIVER_GREEN:
            return (5, 0)
        return (4, 0)  # new oracle key, queued behind the backlog

    return dict(sorted(REGISTRY.items(), key=rank))

"""Generate PLANS.md: the formatted physical plan of every headline bench
query (plus the de-quadratic'd joins), so the plan audit is a reviewable
artifact instead of a claim.

Usage: python tools/explain_all.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from mergeextractor_spark.registry import load_all  # noqa: E402
from mergeextractor_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "extract_section_pipeline",
    "join_deal_filing",
    "join_anti_incremental",
    "join_fuzzy_entity",
    "agg_org_topk",
    "rank_hybrid_top1",
    "window_chunk_follow",
    "agg_concat_section",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_neardup",
    "dedup_ngram_jaccard",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "agg_salted_skew",
    "contamination_ngram",
    "sample_hash_split",
    "profile_numeric",
    "olap_nation_revenue",
    "join_asof",
    "join_range_interval",
    "events_sliding_counts",
    # round 3
    "ann_pq_topk",
    "join_salted_skew",
    "sample_domain_cap",
    "olap_order_priority",
    "olap_returned_customers",
    "join_stream_stream",
    "ann_ivf_pq",
    "olap_shipmode_priority",
    "olap_promo_revenue",
    "olap_disjunctive_filter",
    "cdc_scd2_history",
    "curation_pipeline_ingest",
    "window_retention_cohort",
    "agg_funnel",
    "events_gap_fill",
    "events_moving_zscore",
    "text_tfidf_topk",
    "olap_global_sales_gap",
    # round 4
    "ann_ivf_pq_refine",
    "olap_customer_orders_dist",
    "olap_small_quantity_revenue",
    "olap_large_orders",
    "olap_late_sole_supplier",
    "text_gopher_rules",
    # round 5
    "join_bucketed_colocated",
    "ann_ivf_pq_refine_probe",
    "ann_ivf_pq_stored",
    "text_bm25_topk",
    "text_bpe_merge_candidates",
    "dedup_semantic_semdedup",
    "dedup_paragraph",
    "dedup_span_merge",
    "text_hash_classifier",
    "sample_logprob_bucket",
    "agg_source_overlap",
    "text_zipf_slope",
    "graph_item_transitions",
    "graph_pagerank",
    "pipeline_pretrain_corpus",
    "sort_zorder",
    "agg_market_basket",
    "dq_skew_report",
    "dedup_containment",
    "json_variant_extract",
    "olap_pricing_pipe",
    "join_scd2_pointintime",
    "agg_cms_estimate",
    "agg_embedding_covariance",
    "eval_ann_recall",
    # round-5 late additions
    "pipeline_hybrid_search",
    "sample_reservoir_weighted",
    "events_attribution",
    "events_anomaly_mad",
    "join_asof_forward",
    "text_bpe_encode",
    "events_funnel_windowed",
    "entity_resolution_clusters",
    "text_keyphrase_rake",
    "text_c4_line_filter",
    "agg_ab_test_stats",
    "agg_incremental_maintain",
    "eval_minhash_accuracy",
    "eval_matryoshka_recall",
    "olap_abc_analysis",
    "events_slo_burn_rate",
    "text_collocation_pmi",
    "text_ngram_novelty",
    "text_boilerplate_lines",
    "agg_rfm_segmentation",
    # round 6
    "pipeline_training_export",
    "eval_tokenizer_fertility",
    "agg_context_window_share",
    "sample_epoch_shuffle",
    "dedup_image_phash",
    "dedup_audio_fingerprint",
    "dedup_video_fingerprint",
    "pipeline_crawler_audit",
    # round 7
    "dedup_signature_banded",
    "events_top_paths",
    # round 8
    "multimodal_image_phash",
    "cascade_title_check",
    "cascade_toc_check",
    "join_asof_tolerance",
    "eval_dedup_cluster_profile",
    "agg_dedup_impact_by_source",
    "ner_orgs",
    "sample_hard_negatives",
    "eval_ndcg_quantized",
    "join_interval_overlap",
    # round-8 late additions (governance + training-recipe keys)
    "sample_token_budget",
    "agg_source_gini",
    "eval_calibration_bins",
    "dq_k_anonymity",
    "dq_freshness_lag",
    "graph_triangle_count",
    "eval_ks_drift",
    "sample_anneal_mix",
    # round 9: the two-phase rank/cumsum/lag rewrites (plan evidence for
    # the no-single-task-window sweep)
    "sample_quality_decile",
    "sample_logprob_bucket",
    "agg_rfm_segmentation",
    "window_value_percentiles",
    "eval_langid_auc",
    "dq_skew_report",
    "events_interarrival_profile",
    "sample_pack_sequences",
    "dq_chi_square_independence",
    "text_zipf_slope",
    # r13 additions: the BPE trainer's registered plan is the driver-side
    # merge table (the loop's work is in construction, like pagerank),
    # so the reviewable plans are the store pair's — the partition-
    # pruned probe + candidate-bounded verify are the audit targets
    "dedup_minhash_store_write",
    "dedup_minhash_incremental",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(_REPO, "PLANS.md"))
    args = ap.parse_args()

    spark = get_spark("explain-all")
    reg = load_all()

    lines = [
        "# PLANS — formatted physical plans (generated by tools/explain_all.py)",
        "",
        f"Source fixtures: `{args.sf}`. Regenerate with "
        "`python tools/explain_all.py`. What to look for: `PushedFilters`/"
        "`ReadSchema` on scans, `BroadcastHashJoin` on bounded sides, no "
        "`CartesianProduct` outside deliberately tiny BNLJ catalogs, "
        "`WholeStageCodegen` spans covering the expression work.",
        "",
    ]
    import contextlib
    import io

    def clean(plan: str) -> str:
        # strip per-run codegen ids so regenerated artifacts diff cleanly
        plan = re.sub(r"\[codegen id : \d+\]", "[codegen]", plan)
        plan = re.sub(r"#\d+L?", "#", plan)
        plan = re.sub(r"state info \[ checkpoint = [^,]+,", "state info [ checkpoint = <ckpt>,", plan)
        plan = re.sub(r"runId = [0-9a-f-]+", "runId = <run>", plan)
        return plan.rstrip()

    for key in HEADLINE:
        df = reg[key].spark(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        lines += [f"## {key}", "", "```", clean(buf.getvalue()), "```", ""]

    # Micro-batch plans (VERDICT r3 item 10): run each streaming form to
    # completion with availableNow, then capture the LAST EXECUTED
    # micro-batch physical plan from the StreamingQuery itself — the
    # artifact that shows stateful operator placement (StateStoreSave,
    # StreamingSymmetricHashJoin, SessionWindowStateStore) and watermark
    # eviction, which the batch twins cannot.
    lines += [
        "# Micro-batch plans (streaming forms, availableNow-drained)",
        "",
        "Mapping to gate keys: `stream_stream_attribution` is the streaming "
        "form of `join_stream_stream`; `session_stats` of "
        "`events_session_stats`; `stream_upsert_to_kv` is the foreachBatch "
        "MERGE twin of `cdc_scd2_history` (current-state maintenance; the "
        "batch form materializes full history); `dedup_within_watermark` "
        "pairs with `dedup_keep_latest`. What to look for: "
        "StreamingSymmetricHashJoin with both-side watermarks, "
        "SessionWindowStateStoreSave/Restore around the merging aggregate, "
        "StateStore* operators bounding state, and the same scan/filter "
        "pushdown as the batch twins.",
        "",
    ]
    import tempfile

    from mergeextractor_spark.streaming.events import (
        dedup_within_watermark,
        read_events_stream,
        session_stats,
        stream_stream_attribution,
        stream_upsert_to_kv,
    )

    events = read_events_stream(spark, args.sf)
    tmp = tempfile.mkdtemp(prefix="mx_explain_stream_")

    def drain(stream_df, name: str, output_mode: str):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    def drain_upsert():
        q = stream_upsert_to_kv(
            events.select(events.event_id.alias("main_index"), "event_type", "value"),
            os.path.join(tmp, "kv"),
            key="main_index",
            checkpoint=os.path.join(tmp, "ckpt"),
        )
        q.awaitTermination()
        return q

    streaming_queries = {
        "stream_stream_attribution": lambda: drain(
            stream_stream_attribution(events), "xp_attr", "append"
        ),
        "session_stats": lambda: drain(session_stats(events), "xp_sessions", "complete"),
        "dedup_within_watermark": lambda: drain(
            dedup_within_watermark(events), "xp_dedup", "append"
        ),
        "stream_upsert_to_kv": drain_upsert,
    }
    for name, run in streaming_queries.items():
        q = run()
        lines += [f"## {name} (micro-batch)", ""]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.explain()  # physical plan of the last executed micro-batch
        lines += ["```", clean(buf.getvalue()), "```", ""]

    with open(args.out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {args.out} ({len(HEADLINE)} batch + {len(streaming_queries)} micro-batch plans)")


if __name__ == "__main__":
    main()

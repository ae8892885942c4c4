"""Whole-contract plan red-flag audit (r14, detection fixed r15): build
every registered key's DataFrame (skipping eager keys' construction side
effects is not possible — they run; at sf0.001 that is cheap) and scan
its FORMATTED physical plan for the scale red flags the optimization
guide names:

  - BatchEvalPython / ArrowEvalPython duplicated for one UDF (guide §4.4)
  - CartesianProduct / BroadcastNestedLoopJoin (accidental cross joins;
    known-intentional keys are allowlisted with the reason)
  - Exchange SinglePartition (global sort/window/keyless-agg funnels).
    r15 fix for the r14 vacuous regex: in FORMATTED explain output the
    partitioning lives on a separate detail line ("Arguments:
    SinglePartition, ENSURE_REQUIREMENTS, ..."), never on the operator
    line, so the old `Exchange SinglePartition` pattern could not match
    anything.  scan_plan() now counts the Arguments lines (and keeps the
    simple-mode form for robustness); result-sized keyless-aggregate
    finals are allowlisted per key WITH the reason, and the allowlist is
    actually consulted (ADVICE r14).  A seeded data-sized global window
    must be flagged — pinned in tests/test_plans.py.
  - ObjectHashAggregate (sort-fallback risk class; report count)

Prints one line per flagged key -> plans_audit_<round>.txt.

Usage: python tools/plan_audit.py [--sf /root/testdata/sf0.001]
                                  [--out plans_audit_r15.txt]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# intentional / result-sized exceptions, each with the reason pinned
ALLOW = {
    "CartesianProduct": {
        # nation x region broadcast cross join, 25 x 5 rows (documented)
        "fuzzy_partial_ratio",
    },
    "BroadcastNestedLoopJoin": {
        "fuzzy_partial_ratio",
    },
}

# SinglePartition exchanges that are RESULT-SIZED by construction (the
# final stage of a keyless aggregate over an already-reduced frame, or a
# window over a <= num_partitions-row offsets frame) — key -> reason.
# Everything NOT listed here is reported as a red flag.  The r14 audit
# claimed "0 SinglePartition" because its regex could never match
# formatted plans; this list is the honest accounting of what actually
# exists, each entry source-verified result-sized.
ALLOW_SINGLE_PARTITION: dict[str, str] = {}


def _allow_sp(reason: str, *keys: str) -> None:
    for k in keys:
        ALLOW_SINGLE_PARTITION[k] = reason


_allow_sp(
    "two-phase rank/cumsum offsets: single-partition window over the "
    "<= num_partitions-row per-pid count aggregate (bounded by partition "
    "COUNT, never data — _util.global_row_number/global_cumsum)",
    "agg_rfm_segmentation", "agg_source_gini", "eval_ks_drift",
    "eval_ndcg_quantized", "sample_anneal_mix", "sample_logprob_bucket",
    "sample_token_budget", "text_dsir_select", "text_vocab_coverage_curve",
    "pipeline_pretrain_corpus", "agg_ltv_curve", "events_changepoint_cusum",
    "text_ttr_percentiles", "sample_pack_interleaved", "agg_percentile_approx",
    "window_retention_cohort", "text_unigram_logprob",
)
_allow_sp(
    "1-row keyless-aggregate final (codebook packer / grand-total / "
    "count-if summary) — the exchange moves one row per upstream "
    "partition into the result stage",
    "ann_ivf_pq", "ann_ivf_pq_refine", "ann_ivf_pq_refine_probe",
    "ann_ivf_pq_stored", "ann_ivf_topk", "ann_ivf_trained", "ann_pq_topk",
    "dedup_semantic_semdedup", "eval_minhash_accuracy",
    "olap_small_quantity_revenue", "agg_count_total",
    "eval_tokenizer_fertility", "agg_embedding_covariance",
    "eval_matryoshka_recall", "eval_retrieval_rank_corr",
    "agg_vector_mean", "text_zipf_slope", "eval_calibration_bins",
)
_allow_sp(
    "result-sized global top-k / ordered result emit (the frame entering "
    "the exchange is already reduced to <= k rows or a bounded report)",
    "agg_org_topk", "olap_top_supplier", "text_ngram_topk",
    "events_top_paths", "text_bm25_topk", "rank_rrf_fusion",
)


def scan_plan(key: str, plan: str) -> tuple[list[str], dict[str, int]]:
    """Scan ONE formatted physical plan for the red flags; returns
    (flag strings, per-pattern counts).  Pure text function so the
    detection rules themselves are pytest-pinned (a seeded global-window
    plan MUST produce a SinglePartition flag — the r14 audit's regex
    could never match formatted mode and its '0 SinglePartition'
    headline was vacuous)."""
    row: list[str] = []
    counts = {k: 0 for k in (
        "BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
        "BroadcastNestedLoopJoin", "SinglePartition", "ObjectHashAggregate",
    )}
    for pat in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        n = len(re.findall(rf"\b{pat}\b", plan))
        if n:
            counts[pat] += n
            if key not in ALLOW.get(pat, set()):
                row.append(f"{pat} x{n}")
    for pat in ("BatchEvalPython", "ArrowEvalPython"):
        n = len(re.findall(rf"\b{pat}\b", plan))
        counts[pat] += n
        # duplicated evaluation of the SAME udf = the §4.4 trap
        udfs = re.findall(rf"{pat} \[([a-zA-Z0-9_]+)\(", plan)
        dups = {u for u in udfs if udfs.count(u) > 1}
        if dups:
            row.append(f"{pat} duplicated: {sorted(dups)}")
    # formatted mode: partitioning is an "Arguments:" detail line of the
    # Exchange node; simple mode: inline "Exchange SinglePartition".
    # Count both forms (a plan is one mode, so they never double-count).
    n = len(re.findall(r"Arguments: SinglePartition", plan)) + len(
        re.findall(r"Exchange SinglePartition", plan)
    )
    if n:
        counts["SinglePartition"] += n
        if key in ALLOW_SINGLE_PARTITION:
            row.append(f"SinglePartition x{n} (allowed: result-sized)")
        else:
            row.append(f"SinglePartition x{n} UNEXPLAINED")
    counts["ObjectHashAggregate"] += len(
        re.findall(r"\bObjectHashAggregate\b", plan)
    )
    return row, counts


def main() -> None:
    from mergeextractor_spark.registry import load_all
    from mergeextractor_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="plans_audit_r15.txt")
    args = ap.parse_args()
    spark = get_spark("plan-audit")
    reg = load_all()
    flags: dict[str, list[str]] = {}
    counts = {k: 0 for k in (
        "BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
        "BroadcastNestedLoopJoin", "SinglePartition", "ObjectHashAggregate",
    )}
    unexplained_sp: list[str] = []
    for key, q in sorted(reg.items()):
        try:
            df = q.spark(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            flags.setdefault(key, []).append(f"EXPLAIN-ERROR {type(e).__name__}")
            continue
        row, c = scan_plan(key, plan)
        for k, v in c.items():
            counts[k] += v
        if row:
            flags[key] = row
            if any("UNEXPLAINED" in r for r in row):
                unexplained_sp.append(key)
    out = [f"== plan red-flag audit over {len(reg)} keys at {args.sf} =="]
    for key in sorted(flags):
        out.append(f"{key}: {'; '.join(flags[key])}")
    out.append(f"== totals: {counts} ==")
    out.append(
        f"== SinglePartition UNEXPLAINED keys: {unexplained_sp or 'none'} =="
    )
    txt = "\n".join(out)
    print(txt)
    with open(os.path.join(_REPO, args.out), "w") as f:
        f.write(txt + "\n")


if __name__ == "__main__":
    main()

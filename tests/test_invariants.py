"""Cross-metric invariants for the late-round operators — cheap
assertions that hold for ANY input, so they catch formula regressions
the fixture-specific oracles might coincidentally miss."""

from pyspark.sql import functions as F

from mergeextractor_spark.operators.dedup import dedup_containment
from mergeextractor_spark.operators.graph_queries import agg_market_basket
from mergeextractor_spark.operators.scale_queries import Z_BITS, _zvalue_spark

SF = "/root/testdata/sf0.001"


def test_containment_dominates_jaccard(spark):
    # |A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| for every pair, with equality
    # only when the smaller set is contained in the larger
    rows = dedup_containment(spark, SF).collect()
    assert rows, "no containment pairs at fixture scale"
    for r in rows:
        assert r.containment >= r.jaccard - 1e-9, r
        assert 0.0 < r.containment <= 1.0 + 1e-9


def test_market_basket_bounds(spark):
    rows = agg_market_basket(spark, SF).collect()
    assert rows, "no frequent pairs at fixture scale"
    for r in rows:
        assert r.item_a < r.item_b
        # confidence and support are probabilities; support <= confidence
        # (confidence divides by a subset count)
        assert 0.0 < r.support <= 1.0 + 1e-9
        assert r.support <= r.confidence + 1e-9
        assert r.confidence <= 1.0 + 1e-9
        assert r.lift > 0.0


def test_market_basket_power_user_cap(spark):
    """VERDICT r7 item 2: the per-user basket cap must be enforced IN the
    operator — a power user with far more distinct items than the cap
    contributes at most C(cap, 2) pairs, and only over the first `cap`
    items of the sorted distinct set (deterministic truncation)."""
    from mergeextractor_spark.operators.graph_queries import market_basket_frame

    cap = 10
    n_items = 250  # 25× the cap: uncapped expansion would be C(250,2)
    rows = [(u, i) for u in (1, 2, 3) for i in range(n_items)]
    ev = spark.createDataFrame(rows, "user_id long, item int")
    out = market_basket_frame(ev, min_users=2, cap=cap).collect()
    # every user shares the same capped basket {0..cap-1}: exactly
    # C(cap,2) pairs survive, none touching an item beyond the cap
    assert len(out) == cap * (cap - 1) // 2
    for r in out:
        assert r.item_a < r.item_b < cap
        assert r.n_both == 3
        assert abs(r.support - 1.0) < 1e-9 and abs(r.confidence - 1.0) < 1e-9


def test_zvalue_bit_interleave_roundtrip(spark):
    # the Morton key must be exactly de-interleavable back to (x, y)
    pts = [(x, y) for x in (0, 1, 5, 511, 1023) for y in (0, 2, 7, 512, 1023)]
    df = spark.createDataFrame(pts, "x int, y int").select(
        "x", "y", _zvalue_spark(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        x = y = 0
        for i in range(Z_BITS):
            x |= ((r.z >> (2 * i)) & 1) << i
            y |= ((r.z >> (2 * i + 1)) & 1) << i
        assert (x, y) == (r.x, r.y), (r.x, r.y, r.z)


def test_pca_projection_diagonalizes_covariance(spark):
    import numpy as np

    from mergeextractor_spark.operators.vector_queries import vector_pca_project

    rows = vector_pca_project(spark, SF).collect()
    # output is exploded (vec_id, component, value) — rebuild the matrix
    ids = sorted({r.vec_id for r in rows})
    k = max(r.component for r in rows) + 1
    idx = {v: i for i, v in enumerate(ids)}
    P = np.zeros((len(ids), k))
    for r in rows:
        P[idx[r.vec_id], r.component] = r.value
    C = np.cov(P, rowvar=False)
    diag = np.diag(C).copy()
    # components ordered by explained variance, covariance ~diagonal
    assert all(diag[i] >= diag[i + 1] - 1e-6 for i in range(len(diag) - 1)), diag
    off = C - np.diag(diag)
    assert np.abs(off).max() < 1e-2 * diag[0], np.abs(off).max()


def test_cms_never_underestimates(spark):
    from mergeextractor_spark.registry import load_all

    rows = load_all()["agg_cms_estimate"].spark(spark, SF).collect()
    assert rows
    assert all(r.n_est >= r.n_exact for r in rows)
    # with width >> active keys per row, most estimates are exact
    exact_frac = sum(r.n_est == r.n_exact for r in rows) / len(rows)
    assert exact_frac > 0.5, exact_frac


def test_attribution_conserves_purchases_and_revenue(spark):
    # channel rows must partition the purchase set exactly: counts and
    # revenue across channels equal the unattributed totals, channels
    # come from the event-type universe (plus 'direct')
    from mergeextractor_spark.operators.streaming_queries import events_attribution
    from mergeextractor_spark.sources.fixtures import table

    rows = events_attribution(spark, SF).collect()
    ev = table(spark, SF, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").agg(
        F.count("*").alias("n"), F.sum("value").alias("rev")
    ).collect()[0]
    assert sum(r.n_purchases for r in rows) == purchases.n
    assert abs(sum(r.revenue for r in rows) - purchases.rev) < 1e-2
    types = {r.event_type for r in ev.select("event_type").distinct().collect()}
    assert {r.channel for r in rows} <= (types - {"purchase"}) | {"direct"}


def test_funnel_counts_are_monotone(spark):
    from mergeextractor_spark.operators.streaming_queries import (
        events_funnel_windowed,
    )

    r = events_funnel_windowed(spark, SF).collect()[0]
    assert r.n_views >= r.n_clicked >= r.n_converted >= 0
    assert 0.0 <= r.conversion_rate <= 1.0


def test_rrf_both_lists_beat_single_list(spark):
    # a doc present in BOTH pools at rank r scores strictly above a doc
    # present in one pool at the same rank — the defining RRF property
    from mergeextractor_spark.operators.vector_queries import rank_rrf_fusion

    rows = rank_rrf_fusion(spark, SF).collect()
    assert rows
    both = [r for r in rows if r.sparse_rank is not None and r.dense_rank is not None]
    single = [r for r in rows if (r.sparse_rank is None) != (r.dense_rank is None)]
    for b in both:
        for s in single:
            worst_b = max(b.sparse_rank, b.dense_rank)
            s_rank = s.sparse_rank if s.sparse_rank is not None else s.dense_rank
            if worst_b <= s_rank:
                assert b.rrf_score > s.rrf_score, (b, s)


def test_incremental_merge_equals_full_recompute(spark):
    from mergeextractor_spark.operators.streaming_queries import (
        agg_incremental_maintain,
    )
    from mergeextractor_spark.sources.fixtures import table

    merged = {r.event_type: r for r in agg_incremental_maintain(spark, SF).collect()}
    full = {
        r.event_type: r
        for r in table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert merged.keys() == full.keys()
    for k, m in merged.items():
        assert m.n_events == full[k].n
        assert abs(m.sum_value - full[k].s) < 1e-2


def test_asof_tolerance_bounds(spark):
    """Tolerance semantics: every non-null match is at most TOL old and
    never in the future; stale implies null match."""
    from mergeextractor_spark.operators.olap_queries import (
        ASOF_TOLERANCE_SEC,
        join_asof_tolerance,
    )

    rows = join_asof_tolerance(spark, SF).collect()
    assert rows
    assert any(r.prev_purchase_es is not None for r in rows)
    for r in rows:
        if r.prev_purchase_es is not None:
            gap = r.es - r.prev_purchase_es
            assert 0 <= gap <= ASOF_TOLERANCE_SEC, r
            assert not r.stale
        elif r.stale:
            assert r.prev_purchase_es is None


def test_dedup_cluster_profile_accounts_for_every_doc(spark):
    """Per unit, Σ cluster_size × n_clusters must equal the corpus size —
    the profile is a partition of the documents, whatever the dup
    structure."""
    from mergeextractor_spark.operators.dedup import eval_dedup_cluster_profile
    from mergeextractor_spark.sources.fixtures import table

    n = table(spark, SF, "documents").count()
    rows = eval_dedup_cluster_profile(spark, SF).collect()
    per_unit = {}
    for r in rows:
        per_unit[r.unit] = per_unit.get(r.unit, 0) + r.n_docs
        assert r.n_docs == r.cluster_size * r.n_clusters
    assert per_unit == {"exact": n, "head80": n}


def test_hard_negatives_band_structure(spark):
    """Per query: exactly HN_HARD_K hard + HN_RAND_K random rows, no
    overlap with the positives band, and every random negative scores at
    or below the weakest hard negative (randoms draw from strictly
    deeper ranks)."""
    from mergeextractor_spark.operators.vector_queries import (
        HN_HARD_K,
        HN_RAND_K,
        sample_hard_negatives,
    )

    rows = sample_hard_negatives(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {"hard": [], "random": []})[r.role].append(r)
    for qid, bands in by_q.items():
        assert len(bands["hard"]) == HN_HARD_K, qid
        assert len(bands["random"]) == HN_RAND_K, qid
        ids = [r.neighbor_id for r in bands["hard"] + bands["random"]]
        assert len(set(ids)) == len(ids), qid  # bands disjoint
        assert qid not in ids
        min_hard = min(r.cos for r in bands["hard"])
        assert all(r.cos <= min_hard + 1e-9 for r in bands["random"]), qid


def test_ndcg_bounds_and_consistency(spark):
    """NDCG in (0, 1], dcg consistent with the overlap count (at most
    the ideal gain for that many hits), overlap at most k."""
    from mergeextractor_spark.operators.vector_queries import (
        NDCG_K,
        eval_ndcg_quantized,
    )

    rows = eval_ndcg_quantized(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9, r
        assert 0 <= r.n_overlap <= NDCG_K, r
        assert r.dcg >= 0.0
        if r.n_overlap == 0:
            assert r.dcg == 0.0

"""ANN retrieval-quality guards: the approximate paths must stay close to
the exact brute-force baseline, not just run (VERDICT r1: nprobe=1 gave
recall 0.67, which is not production-grade retrieval)."""

from mergeextractor_spark.registry import load_all

SF = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_recall_vs_bruteforce(spark):
    reg = load_all()
    truth_top3 = {
        (r["query_id"], r["neighbor_id"])
        for r in reg["ann_bruteforce_topk"].spark(spark, SF).collect()
        if r["rank"] <= 3
    }
    ivf = _pairs(reg["ann_ivf_topk"].spark(spark, SF))
    recall = len(ivf & truth_top3) / len(truth_top3)
    assert recall >= 0.9, f"IVF recall {recall:.3f} < 0.9"


def test_ivf_no_cartesian_over_vectors(spark):
    # the candidate join must be an equi-join on the cell id, never a
    # vector-vector cartesian (the centroid crossJoin is the one allowed
    # broadcast-nested-loop: N_CENTROIDS rows on the build side).
    plan = (
        load_all()["ann_ivf_topk"]
        .spark(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan

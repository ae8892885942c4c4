"""Physical-plan regression guards (PERFORMANCE.md audit as assertions):
if a future change loses pushdown, pruning, or a broadcast, these fail."""

from mergeextractor_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def plan_of(spark, key: str) -> str:
    reg = load_all()
    return reg[key].spark(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "filter_index_range")
    assert "PushedFilters: [IsNotNull(o_orderkey), GreaterThanOrEqual(o_orderkey,100)" in plan


def test_column_pruning(spark):
    plan = plan_of(spark, "project_cols")
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>" in plan


def test_dim_join_broadcasts(spark):
    assert "BroadcastHashJoin" in plan_of(spark, "join_deal_filing")


def test_theta_join_is_bnlj(spark):
    assert "BroadcastNestedLoopJoin" in plan_of(spark, "join_org_definition")


def test_topk_avoids_global_sort(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "agg_org_topk")


def test_anti_join_shape(spark):
    assert "LeftAnti" in plan_of(spark, "join_anti_incremental")


def test_text_filter_pushed_to_scan(spark):
    plan = plan_of(spark, "filter_company_presence")
    # the rlike conjunction must sit in the scan's data filters, not a
    # separate post-shuffle stage
    assert "RLIKE(lower(substring(text" in plan


def test_minhash_broadcasts_candidates(spark):
    plan = plan_of(spark, "dedup_minhash_lsh")
    assert "BroadcastHashJoin" in plan

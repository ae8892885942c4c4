"""Bucketed-table co-located joins (SURVEY §4 O3 / the 100 TB join story):
writing both sides bucketed on the join key lets Spark plan the join with
NO shuffle exchange on either side."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is a static conf — use the session's default (covered
    # by .gitignore when it lands in the repo cwd)
    from mergeextractor_spark.sources.fixtures import table

    sf = "/root/testdata/sf0.001"
    orders = table(spark, sf, "orders")
    lineitem = table(spark, sf, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a previous session may have left orphaned managed-table locations the
    # fresh in-memory catalog doesn't know about
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    return "b_orders", "b_lineitem"


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    bo, bl = bucketed_tables
    # disable broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(bo).join(
            spark.table(bl), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right answer
        n = joined.count()
        from mergeextractor_spark.sources.fixtures import table

        sf = "/root/testdata/sf0.001"
        expect = (
            table(spark, sf, "orders")
            .join(table(spark, sf, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
            .count()
        )
        assert n == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_would_shuffle(spark):
    """Control: the same join over plain parquet plans an Exchange."""
    from mergeextractor_spark.sources.fixtures import table

    sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = table(spark, sf, "orders").join(
            table(spark, sf, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

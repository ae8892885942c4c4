"""Sinks (SURVEY §2.1): ordered CSV append, bucketed keyed store, per-row
file dump.

The reference's MongoDB store shards collections by ``main_index // 100``
(DatabaseHandler.py:24-34, hard-coded at 5 more call sites); here that is
a single partition column and Catalyst prunes it (O3). The "update" site
(patchabbrev.py:224-229) becomes dynamic partition overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_SIZE = 100  # ref DatabaseHandler.py:24-34


def with_bucket(df: DataFrame, key: str = "main_index") -> DataFrame:
    return df.withColumn("bucket", F.floor(F.col(key) / BUCKET_SIZE).cast("long"))


def sink_kv_store(df: DataFrame, path: str, mode: str = "append") -> None:
    """Keyed document store: parquet partitioned by bucket (replaces the
    Mongo batch_{k*100}_{k*100+99} collections; insert sites
    Processor.py:288-297, 375-390, SeperatorHandler.py:80-88)."""
    with_bucket(df).write.mode(mode).partitionBy("bucket").parquet(path)


def scan_kv_point(spark: SparkSession, path: str, main_index: int) -> DataFrame:
    """Point lookup (ref find_one at SeperatorHandler.py:53-64): the bucket
    predicate prunes to one partition directory before the key filter."""
    bucket = main_index // BUCKET_SIZE
    return (
        spark.read.parquet(path)
        .filter((F.col("bucket") == bucket) & (F.col("main_index") == main_index))
    )


def update_kv_partition(df: DataFrame, path: str) -> None:
    """Keyed update (ref patchabbrev.py:224-229 update_one): overwrite only
    the partitions present in ``df`` (dynamic partition overwrite — the
    MERGE INTO stand-in without Delta on the classpath)."""
    (
        with_bucket(df)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(path)
    )


def sink_csv_ordered(df: DataFrame, path: str, order_col: str = "main_index") -> None:
    """Ordered CSV sink with header (ref CrawlerHandler.py:21-49 sort at
    139; InitiatorIdentifier.py:26-50 sort at 166). coalesce(1) gives the
    reference's single-file layout — callers that don't need one file
    should drop it and keep the parallel write."""
    df.orderBy(order_col).coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def sink_fs_dump(df: DataFrame, path: str) -> None:
    """Store → one text file per row, directory per bucket (ref
    tools/dumpdata.py:4-38: filename {index}_{A}_&_{B}.txt, body
    'URL: ...\\n\\n{content}'). Expressed as a partitioned text write of
    pre-formatted lines — the scalable form of a per-row file dump."""
    body = F.concat(
        F.lit("FILE: "),
        F.col("main_index").cast("string"),
        F.lit("_"),
        F.col("company_a"),
        F.lit("_&_"),
        F.col("company_b"),
        F.lit(".txt\nURL: "),
        F.col("url"),
        F.lit("\n\n"),
        F.col("content"),
    )
    with_bucket(df).select("bucket", body.alias("value")).write.mode(
        "overwrite"
    ).partitionBy("bucket").text(path)

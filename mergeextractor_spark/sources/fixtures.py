"""Loaders for the driver-generated synthetic parquet tables.

See /root/repo/TESTDATA.md — tables live at ``{sf_dir}/{name}.parquet``.
Parquet scans get predicate pushdown + column pruning from Catalyst for
free; loaders deliberately do NOT cache so each query plans its own
pruned scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # The driver hands queries its own (untuned) session; timestamp↔string
    # and unix-epoch conversions must agree with DuckDB's UTC-naive view,
    # so pin the session timezone at every load (runtime conf, idempotent).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects. Read it as raw long nanos (legacy conf, runtime
        # settable) and convert to a microsecond timestamp with exact
        # integer arithmetic — matching DuckDB's ns→us truncation.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
            )
        return df
    return spark.read.parquet(path)

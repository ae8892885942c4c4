"""SparkSession factory.

Local testing runs on local[$SPARK_GRAFT_CPUS] (single JVM); the configs
below are chosen so the same logical plans survive a 1000-executor cluster:
AQE on (runtime coalesce + skew-join), shuffle partitions sized to cores
locally (on a real cluster AQE re-coalesces), Arrow enabled for the few
pandas-UDF stages, UTC session timezone for oracle parity.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mergeextractor-spark",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """``extra_conf`` overrides builder confs (bench.py re-enables the UI
    so the /api/v1 status endpoint serves per-stage executorCpuTime /
    shuffle bytes — the host-steal-immune counters VERDICT r12 item 1
    adjudicates on; everything else keeps the UI off: it is pure
    overhead for tests and the driver gate)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_session_tuning(spark: SparkSession) -> SparkSession:
    """Idempotent runtime tuning for a session we did not create (the driver
    hands us one in ``__spark_entry__``). Only runtime-settable confs."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    except Exception:
        pass
    return spark

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


def _default_local_dir() -> str | None:
    """Pick spark.local.dir: the SPARK_GRAFT_LOCAL_DIR override wins
    (empty string = explicitly keep Spark's default), else RAM-backed
    /dev/shm/spark-local — but ONLY when the tmpfs has headroom
    (VERDICT r14 item 3: a default that silently points shuffle scratch
    at RAM would ENOSPC a genuinely large local job whose spills exceed
    free shm).  The floor is SPARK_GRAFT_SCRATCH_MIN_GB (default 4 GiB
    free); below it the factory falls back to the Spark default
    (disk-backed java.io.tmpdir) and warns once."""
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override is not None:
        return override or None
    if not os.path.isdir("/dev/shm"):
        return None
    import shutil

    try:
        free = shutil.disk_usage("/dev/shm").free
    except OSError:
        return None
    min_gb = float(os.environ.get("SPARK_GRAFT_SCRATCH_MIN_GB", "4"))
    if free < min_gb * (1 << 30):
        import warnings

        warnings.warn(
            f"/dev/shm has only {free / (1 << 30):.1f} GiB free "
            f"(< {min_gb} GiB floor); leaving spark.local.dir on the "
            "disk-backed default. Set SPARK_GRAFT_LOCAL_DIR to force a "
            "scratch path, or SPARK_GRAFT_SCRATCH_MIN_GB to move the "
            "floor.",
            stacklevel=2,
        )
        return None
    d = "/dev/shm/spark-local"
    os.makedirs(d, exist_ok=True)
    return d


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
    # Shuffle/spill scratch on tmpfs (guide §2.1: local disk bandwidth can
    # be the tighter limit for shuffle files; here it is by far).  On this
    # sandbox the root disk is a Firecracker virtio volume whose page-cache
    # pages are reclaimed host-side (free-page reporting — the r14 thrash
    # root cause, PERFORMANCE.md r14), so every shuffle write/read re-faults
    # pages at fault-storm rates charged to task threads as SYSTEM time:
    # a bare 5000-row repartition measured 5.5-7.1 s executor-CPU on the
    # default /tmp vs 0.6-0.8 s on /dev/shm (OPTIMIZATION_r14.md, ~10x).
    # RAM-backed scratch is the sandbox analogue of the fast local NVMe a
    # real cluster mounts for spark.local.dir; SPARK_GRAFT_LOCAL_DIR
    # overrides (set it to the NVMe array in production; spills larger
    # than RAM need a disk-backed dir), and a free-space floor guards the
    # tmpfs default (_default_local_dir).
    local_dir = _default_local_dir()
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
        # DataFrame-debugging call-site capture costs 1-2 py4j round
        # trips + a Python stack walk on EVERY DataFrame API call (r15,
        # guide §1 empirical loop: plan CONSTRUCTION was a third to half
        # of several ANN/rank keys' bench medians; this conf alone cut
        # warm construction 25-50% across the suite).  Debug-only
        # feature — it enriches error messages with the user call site;
        # results and plans are unchanged.  Flip it back on when
        # debugging a failing query.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
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
        # driver-side construction overhead — see get_spark (r15)
        spark.conf.set("spark.python.sql.dataFrameDebugging.enabled", "false")
    except Exception:
        pass
    return spark

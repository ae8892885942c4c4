"""Session-storage hygiene pins (VERDICT r11 item 5).

The r11 benchmark-session storage-thrash cliff: ``localCheckpoint``
blocks survive ``spark.catalog.clearCache()`` — the catalog call only
clears the SQL CacheManager, while the RDD storage blocks pinned by
every ``truncate_lineage``/``partitioned_*`` construction accumulate
until a driver GC the ContextCleaner may never get on a large heap
(measured 12 s → 278 s between two IDENTICAL runs at derived-sf1;
PERFORMANCE.md r11).  ``_util.drain_persistent_rdds`` is the fix, wired
into bench.py and tools/bench_scaling.py; these pins make sure neither
half of the behavior silently rots: (a) clearCache alone really does
leave the blocks behind (if a Spark upgrade changes that, the sweep can
be simplified), and (b) the sweep really does drop them.
"""

from __future__ import annotations

import pytest


def _n_persistent(spark) -> int:
    # Reaches through the py4j gateway (private API) — classic-session
    # only.  Under Spark Connect there is no _jsc; skip rather than
    # crash so a Connect-based CI run degrades gracefully (ADVICE r12).
    if not hasattr(spark, "sparkContext") or not hasattr(
        spark.sparkContext, "_jsc"
    ):
        pytest.skip("persistent-RDD introspection needs a classic session")
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_drain_persistent_rdds_clears_what_clearcache_leaks(spark):
    from mergeextractor_spark.operators._util import (
        drain_persistent_rdds,
        truncate_lineage,
    )

    # start from a known-clean session (leftover checkpoints from earlier
    # tests are dead — every construction re-checkpoints its own frame)
    drain_persistent_rdds(spark)
    assert _n_persistent(spark) == 0

    ck = truncate_lineage(spark.range(1000).selectExpr("id AS v"), eager=True)
    assert ck.count() == 1000
    before = _n_persistent(spark)
    assert before > 0, "truncate_lineage must pin localCheckpoint blocks"

    # the r11 cliff: the catalog sweep does NOT free checkpoint blocks
    spark.catalog.clearCache()
    assert _n_persistent(spark) == before, (
        "clearCache() now frees localCheckpoint blocks — the Spark "
        "behavior drain_persistent_rdds works around has changed; "
        "re-evaluate the sweep (and celebrate)"
    )

    # the sweep frees them, and reports how many it dropped
    n = drain_persistent_rdds(spark)
    assert n >= before
    assert _n_persistent(spark) == 0
    # the checkpointed frame stays usable for already-materialized reads?
    # No — its lineage is gone by design; callers drain only BETWEEN
    # timed runs, never under a live plan (docstring contract).


def test_drain_survives_empty_session(spark):
    from mergeextractor_spark.operators._util import drain_persistent_rdds

    drain_persistent_rdds(spark)
    assert drain_persistent_rdds(spark) == 0
    assert drain_persistent_rdds(spark, sql_cache=False, gc_sweep=False) == 0


def test_scratch_default_falls_back_when_shm_is_small(monkeypatch):
    """VERDICT r14 item 3: the tmpfs spark.local.dir default must not
    point shuffle scratch at a nearly-full /dev/shm — below the
    free-space floor the factory returns None (Spark default), and the
    SPARK_GRAFT_LOCAL_DIR override always wins."""
    import shutil
    from collections import namedtuple

    from mergeextractor_spark.session import _default_local_dir

    usage = namedtuple("usage", "total used free")

    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH_MIN_GB", raising=False)

    # plenty of headroom -> tmpfs path
    monkeypatch.setattr(
        shutil, "disk_usage", lambda p: usage(64 << 30, 0, 64 << 30)
    )
    assert _default_local_dir() == "/dev/shm/spark-local"

    # below the floor -> Spark default, with a warning
    monkeypatch.setattr(
        shutil, "disk_usage", lambda p: usage(64 << 30, 63 << 30, 1 << 30)
    )
    with pytest.warns(UserWarning, match="GiB free"):
        assert _default_local_dir() is None

    # explicit override wins regardless of headroom; empty = Spark default
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "/somewhere/nvme")
    assert _default_local_dir() == "/somewhere/nvme"
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "")
    assert _default_local_dir() is None

"""Execute the reliable-checkpoint seam end-to-end (VERDICT r9 item 6).

Every other test runs ``truncate_lineage`` in localCheckpoint mode; on a
real 100 TB cluster executor loss makes localCheckpointed RDDs
unrecoverable, so _util.truncate_lineage switches to durable
``df.checkpoint`` when ``spark.mergeextractor.checkpointDir`` is set.
Until r10 that seam was documented but never executed.

Setting a checkpoint dir is GLOBAL on the SparkContext (it cannot be
unset), so the reliable leg runs in a SUBPROCESS with its own session:
it computes dedup_components (the deepest iterative truncate_lineage
user) and a partitioned_ntile cut in reliable mode, asserts checkpoint
files were actually written to the durable dir, asserts the one-time
cleaner warning fires when spark.cleaner.referenceTracking.cleanCheckpoints
is unset, and prints both results as JSON.  The parent test computes the
same queries in the default localCheckpoint session and pins value
identity across the two modes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

SF = os.environ.get("SELF_SF_DIR", "/root/testdata/sf0.001")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUBPROC = textwrap.dedent(
    """
    import json, os, sys, tempfile, warnings
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession, functions as F

    ckpt = tempfile.mkdtemp(prefix="mx_reliable_ckpt_")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("reliable-checkpoint-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.mergeextractor.checkpointDir", ckpt)
        .getOrCreate()
    )
    from mergeextractor_spark.operators import _util
    from mergeextractor_spark.registry import load_all

    # the cleaner warning must fire exactly once when the startup conf is
    # absent (truncate_lineage's reliable-mode lifecycle guard)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        probe = _util.truncate_lineage(spark.range(10).toDF("x"))
        probe.count()
        _util.truncate_lineage(spark.range(5).toDF("x")).count()
    msgs = [str(w.message) for w in caught if "cleanCheckpoints" in str(w.message)]
    assert len(msgs) == 1, f"expected one cleaner warning, got {{len(msgs)}}"
    assert spark.sparkContext.getCheckpointDir(), "reliable mode not active"

    reg = load_all()
    comp = reg["dedup_components"].spark(spark, {sf!r})
    comp_rows = sorted(tuple(r) for r in comp.collect())

    docs = (
        spark.read.parquet(os.path.join({sf!r}, "documents.parquet"))
        .select("doc_id", "lang", "n_chars")
    )
    tiled = _util.partitioned_ntile(
        docs, ["lang"], [F.desc("n_chars"), F.asc("doc_id")], 10, out="decile"
    )
    nt_rows = sorted((r.doc_id, r.decile) for r in tiled.collect())

    # reliable mode must have written durable checkpoint files
    n_files = sum(len(fs) for _, _, fs in os.walk(ckpt))
    assert n_files > 0, "no checkpoint files written to the durable dir"

    print("RESULT " + json.dumps({{"comp": comp_rows, "ntile": nt_rows}}))
    spark.stop()
    """
)


def test_reliable_checkpoint_matches_local_mode(spark):
    from pyspark.sql import functions as F

    from mergeextractor_spark.operators import _util
    from mergeextractor_spark.registry import load_all

    assert not spark.sparkContext.getCheckpointDir(), (
        "test session unexpectedly in reliable mode"
    )
    reg = load_all()
    comp_rows = sorted(
        tuple(r) for r in reg["dedup_components"].spark(spark, SF).collect()
    )
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "lang", "n_chars"
    )
    nt_rows = sorted(
        (r.doc_id, r.decile)
        for r in _util.partitioned_ntile(
            docs, ["lang"], [F.desc("n_chars"), F.asc("doc_id")], 10, out="decile"
        ).collect()
    )

    proc = subprocess.run(
        [sys.executable, "-c", _SUBPROC.format(repo=REPO, sf=SF)],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT "))
    got = json.loads(line[len("RESULT ") :])

    assert [list(r) for r in comp_rows] == got["comp"]
    assert [list(r) for r in nt_rows] == got["ntile"]

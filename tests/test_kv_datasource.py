"""Python DataSource writer protocol: roundtrip equality, atomic
commit manifest, abort cleanliness, and retry idempotence."""

import json
import os

import pytest

from mergeextractor_spark.operators._util import t
from mergeextractor_spark.sources.kv_datasource import register_kv_sink

SF = "/root/testdata/sf0.001"


def _write(spark, path, fail_partition=-1):
    register_kv_sink(spark)
    os.makedirs(path, exist_ok=True)
    w = (
        t(spark, SF, "documents")
        .select("doc_id", "source", "n_chars")
        .repartition(4, "doc_id")
        .write.format("kv_json_sink")
        .option("path", path)
    )
    if fail_partition >= 0:
        w = w.option("fail_partition", str(fail_partition))
    w.mode("append").save()


def test_commit_publishes_manifest_and_all_rows(spark, tmp_path):
    path = str(tmp_path / "store")
    _write(spark, path)
    manifest = json.load(open(os.path.join(path, "_SUCCESS")))
    files = [f["file"] for f in manifest["files"]]
    assert len(files) == 4
    assert sum(f["rows"] for f in manifest["files"]) == 500  # sf0.001 docs
    back = spark.read.json([os.path.join(path, f) for f in files])
    src = t(spark, SF, "documents").select("doc_id", "source", "n_chars")
    assert {tuple(r) for r in back.select("doc_id", "source", "n_chars").collect()} == {
        tuple(r) for r in src.collect()
    }
    # staging fully cleaned after publish
    assert not os.path.exists(os.path.join(path, "_staging"))


def test_abort_leaves_target_untouched(spark, tmp_path):
    path = str(tmp_path / "store")
    with pytest.raises(Exception):
        _write(spark, path, fail_partition=2)
    # no manifest, no staged leftovers, no published parts
    assert not os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not os.path.exists(os.path.join(path, "_staging"))
    assert not [f for f in os.listdir(path) if f.startswith("part-")]


def test_rewrite_is_idempotent_per_partition(spark, tmp_path):
    # a second write of the same data overwrites the same four files —
    # the task-retry model — so the store never accumulates duplicates
    path = str(tmp_path / "store")
    _write(spark, path)
    _write(spark, path)
    manifest = json.load(open(os.path.join(path, "_SUCCESS")))
    files = [f["file"] for f in manifest["files"]]
    assert len(files) == 4
    assert len([f for f in os.listdir(path) if f.startswith("part-")]) == 4
    back = spark.read.json([os.path.join(path, f) for f in files])
    assert back.count() == 500

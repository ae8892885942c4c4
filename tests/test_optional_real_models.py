"""End-to-end tests for REAL model integrations behind the pluggable seams.

Two tiers (VERDICT r3 item 4):

* ALWAYS RUN — an external numpy model package (plugins/
  hashing_projection_embedder.py, deliberately outside the engine
  package) loaded through the plugin seam ``load_external_model`` and
  driven through the batched per-worker-singleton UDFs
  (``embed_text_batched_udf`` / ``rerank_batched_udf``). This proves the
  plumbing a torch model needs — checkpoint IO, plugin import by path,
  lazy per-worker init, Arrow-batched inference — with a non-fake model.

* OPT-IN SKIPS — sentence-transformers / langchain-text-splitters runs.
  This container has no pip and no network, so these record explicit
  skips (documented sandbox blocker, PERFORMANCE.md); in a full
  environment they run for real. The langchain byte-parity surface is
  meanwhile pinned by the vendored golden fixture
  (tests/test_golden_chunks.py).
"""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLUGIN = os.path.join(REPO, "plugins", "hashing_projection_embedder.py")

HAS_ST = importlib.util.find_spec("sentence_transformers") is not None
HAS_LC = importlib.util.find_spec("langchain_text_splitters") is not None


def test_external_plugin_checkpoint_roundtrip(tmp_path):
    """The plugin's save/load checkpoint IO is lossless: loaded weights
    and encodings are bit-identical to the saved model's."""
    import numpy as np

    from mergeextractor_spark.functions.embedding import load_external_model

    model = load_external_model(f"{PLUGIN}:HashingProjectionEmbedder")
    ckpt = str(tmp_path / "ckpt")
    model.save(ckpt)
    loaded = type(model).load(ckpt)
    assert np.array_equal(model.weights, loaded.weights)
    texts = ["background of the merger", "shipping manifest", ""]
    assert np.array_equal(model.encode(texts), loaded.encode(texts))
    with pytest.raises(ValueError):
        load_external_model("no-colon-in-spec")


def test_external_plugin_through_batched_embedder_seam(spark, tmp_path):
    """A checkpointed external model flows through the production embed
    seam: plugin loaded by file path inside the worker, model built once
    per worker from the checkpoint, batches encoded via model.encode —
    and the distributed result matches driver-side inference exactly."""
    import numpy as np

    from mergeextractor_spark.functions.embedding import (
        embed_text_batched_udf,
        load_external_model,
    )

    model = load_external_model(f"{PLUGIN}:HashingProjectionEmbedder")
    ckpt = str(tmp_path / "ckpt")
    model.save(ckpt)
    plugin_path, ckpt_path = PLUGIN, ckpt

    def loader():
        # runs ON THE WORKER: import the plugin by path, restore from the
        # checkpoint — the exact lifecycle of a torch model in production
        from mergeextractor_spark.functions.embedding import load_external_model

        m = load_external_model(f"{plugin_path}:HashingProjectionEmbedder")
        return type(m).load(ckpt_path)

    texts = [
        (1, "background of the merger agreement between the parties"),
        (2, "lineitem shipping manifest quantities"),
        (3, None),
        (4, "the board of directors approved the merger"),
    ]
    df = spark.createDataFrame(texts, ["id", "text"]).repartition(2)
    out = {r.id: r.emb for r in df.withColumn(
        "emb", embed_text_batched_udf(loader)("text")
    ).collect()}

    assert all(len(v) == model.dim for v in out.values())
    want = model.encode([t or "" for _, t in texts])
    for (i, _), w in zip(texts, want):
        assert np.allclose(np.array(out[i], dtype=np.float32), w), i
    # unit-norm contract (null text hashes as "" — still a valid vector)
    for i, _ in texts:
        norm = sum(x * x for x in out[i]) ** 0.5
        assert abs(norm - 1.0) < 1e-3


def test_external_plugin_through_batched_reranker_seam(spark):
    """The CrossEncoder-shaped plugin scorer flows through the batched
    rerank seam and orders a relevant chunk above an unrelated one."""
    from mergeextractor_spark.functions.embedding import (
        load_external_model,
        rerank_batched_udf,
    )

    plugin_path = PLUGIN
    query = "background of the merger"

    def loader():
        from mergeextractor_spark.functions.embedding import load_external_model

        return load_external_model(f"{plugin_path}:HashingCrossScorer")

    df = spark.createDataFrame(
        [
            (1, "this section describes the background of the merger in detail"),
            (2, "quarterly depreciation of manufacturing equipment"),
        ],
        ["id", "chunk"],
    )
    scores = {r.id: r.score for r in df.withColumn(
        "score", rerank_batched_udf(query, loader)("chunk")
    ).collect()}
    assert 0.0 < scores[2] < scores[1] < 1.0
    # distributed result matches driver-side inference
    driver = load_external_model(f"{PLUGIN}:HashingCrossScorer")
    want = driver.predict([(query, "this section describes the background of the merger in detail")])
    assert abs(scores[1] - float(want[0])) < 1e-6


@pytest.mark.slow
@pytest.mark.skipif(not HAS_ST, reason="sentence-transformers not installed (sandbox has no pip/network)")
def test_sentence_transformers_through_embedder_seam(spark):
    from sentence_transformers import SentenceTransformer

    from mergeextractor_spark.functions.embedding import embed_text_udf

    _model = {}

    def st_embed(text: str):
        # lazy per-process singleton — the production seam contract
        if "m" not in _model:
            _model["m"] = SentenceTransformer("all-MiniLM-L6-v2")
        return [float(x) for x in _model["m"].encode([text], normalize_embeddings=True)[0]]

    df = spark.createDataFrame(
        [(1, "merger agreement background"), (2, "lineitem shipping manifest")],
        ["id", "text"],
    )
    out = df.withColumn("emb", embed_text_udf(st_embed)("text")).collect()
    assert all(len(r.emb) == 384 for r in out)
    for r in out:
        norm = sum(x * x for x in r.emb) ** 0.5
        assert abs(norm - 1.0) < 1e-3


@pytest.mark.slow
@pytest.mark.skipif(not HAS_LC, reason="langchain-text-splitters not installed (sandbox has no pip/network)")
def test_chunker_byte_parity_with_langchain():
    from langchain_text_splitters import RecursiveCharacterTextSplitter

    from mergeextractor_spark.operators.chunking import CHUNK_OVERLAP, CHUNK_SIZE, split_text
    from tests.fixtures.filings import build_filings

    splitter = RecursiveCharacterTextSplitter(
        chunk_size=CHUNK_SIZE, chunk_overlap=CHUNK_OVERLAP
    )
    for doc in build_filings():
        text = doc["content"]
        assert split_text(text) == splitter.split_text(text), doc["main_index"]

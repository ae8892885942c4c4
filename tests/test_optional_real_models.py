"""Opt-in end-to-end tests for the REAL model/library integrations behind
the pluggable seams (VERDICT r2 items 8 and 9).

This container has no network and no pip, so sentence-transformers /
langchain are absent and every test here records an explicit skip. In a
full environment (`pip install sentence-transformers langchain-text-splitters`)
they run for real, proving:

  * the Embedder seam (functions/embedding.py embed_text_udf) accepts a
    non-fake model — a per-executor sentence-transformers singleton —
    and produces unit-ish-norm vectors of the model's dimension;
  * split_text (operators/chunking.py) is byte-identical to langchain's
    RecursiveCharacterTextSplitter on the golden cascade corpus at the
    reference's exact parameters (chunk_size=2048, chunk_overlap=400 —
    ref ChunkProcessor.py:200-211), closing SURVEY §7.4 risk 1.
"""

import importlib.util

import pytest

HAS_ST = importlib.util.find_spec("sentence_transformers") is not None
HAS_LC = importlib.util.find_spec("langchain_text_splitters") is not None


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

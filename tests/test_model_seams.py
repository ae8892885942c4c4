"""Pluggable heavy-model seam checks (VERDICT r1 item 7): inject fake
spaCy / CrossEncoder / OpenAI-style model objects through the production
seams and assert the pipeline output shape — proving the real-model path
without the dependencies.

Reference seams being mirrored:
  spaCy sentence segmentation  — ChunkProcessor.py:26-27, 36 (nlp(chunk).sents)
  CrossEncoder.predict         — ChunkProcessor.py:308-317
  OpenAI tool-call client      — Processor.py:309-395, InitiatorIdentifier.py:71-83
  embedding model              — ChunkProcessor.py:233-238

The fakes are defined INSIDE each test so cloudpickle ships them to
executors by value — exactly how a notebook user would inject a model
wrapper without installing it on every worker's PYTHONPATH.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from mergeextractor_spark.functions.embedding import embed_text_udf, rerank_udf
from mergeextractor_spark.operators.cascade import START_PHRASES, locate_chunk_header
from mergeextractor_spark.operators.llm import INITIATOR_SCHEMA, LLMFunctionCall


def test_spacy_seam_in_cascade():
    """cascade's sentence_splitter seam accepts a spaCy-shaped pipeline via
    the standard adapter: lambda text: [s.text for s in nlp(text).sents]."""

    class FakeSpan:
        def __init__(self, text):
            self.text = text

    class FakeDoc:
        def __init__(self, text):
            self.sents = [FakeSpan(s) for s in text.split(". ") if s.strip()]

    class FakeSpacyNLP:
        def __call__(self, text):
            return FakeDoc(text)

    nlp = FakeSpacyNLP()
    splitter = lambda text: [s.text for s in nlp(text).sents]  # noqa: E731
    chunk = "Intro sentence. Background of the Merger\n\nLong narrative follows here."
    hit = locate_chunk_header(chunk, START_PHRASES, sentence_splitter=splitter)
    assert hit is not None and "background" in hit.lower()


def test_crossencoder_seam_in_rerank(spark):
    class FakeCrossEncoder:
        """sentence_transformers.CrossEncoder shape: predict([(q, c), ...])."""

        def predict(self, pairs):
            return [0.25 * len(set(q.split()) & set(c.split())) for q, c in pairs]

    model = FakeCrossEncoder()

    def scorer(query, chunk):
        return float(model.predict([(query, chunk)])[0])

    udf = rerank_udf("merger agreement between companies", scorer=scorer)
    df = spark.createDataFrame(
        [("merger agreement was signed between the companies",), ("unrelated text",)],
        ["txt"],
    ).coalesce(1)
    rows = df.select(udf(F.col("txt")).alias("score")).collect()
    assert rows[0]["score"] > rows[1]["score"]
    assert all(isinstance(r["score"], float) for r in rows)


def test_openai_seam_in_llm_function_call(spark):
    payload = json.dumps(
        {
            "initiator": "Acme Corp",
            "date_of_initiation": "January 5, 2001",
            "type_of_initiation": "Acquirer-Initiated Deal",
            "stated_reasons": "expand market reach",
        }
    )

    class FakeToolFunction:
        arguments = payload

    class FakeOpenAIClient:
        """Minimal chat.completions.create(...) surface returning a tool call."""

        class _Completions:
            def create(self, **kwargs):
                class Resp:
                    class _Choice:
                        class _Msg:
                            tool_calls = [
                                type("TC", (), {"function": FakeToolFunction()})()
                            ]

                        message = _Msg()

                    choices = [_Choice()]

                return Resp()

        def __init__(self):
            self.chat = type("Chat", (), {"completions": self._Completions()})()

    client = FakeOpenAIClient()

    def llm_client(prompt):
        resp = client.chat.completions.create(
            model="fake", messages=[{"role": "user", "content": prompt}]
        )
        return resp.choices[0].message.tool_calls[0].function.arguments

    op = LLMFunctionCall(INITIATOR_SCHEMA, llm_client)
    df = spark.createDataFrame([("some merger narrative",)], ["content"]).coalesce(1)
    out = op.apply(df, "content", "init").select("init.*").collect()[0]
    assert out["initiator"] == "Acme Corp"
    assert out["type_of_initiation"] == "Acquirer-Initiated Deal"


def test_embedding_model_seam(spark):
    def fake_model_embed(text):
        # stands in for an API or sentence-transformers encode() call
        return [float(len(text) % 7)] * 8

    udf = embed_text_udf(embedder=fake_model_embed)
    df = spark.createDataFrame([("abc",), ("defghij",)], ["txt"]).coalesce(1)
    rows = df.select(udf(F.col("txt")).alias("vec")).collect()
    assert all(len(r["vec"]) == 8 for r in rows)

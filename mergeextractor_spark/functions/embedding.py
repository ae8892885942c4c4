"""Pluggable embedding / reranking operators (SURVEY §2.8 embed_text /
rerank_crossencoder; ref ChunkProcessor.py:233-238 OpenAI
text-embedding-3-large fan-out, 308-317 CrossEncoder BAAI/bge-reranker-v2-m3).

Production shape: a lazy per-executor model singleton inside an
Arrow-batched pandas UDF (O10 model-load amortization — the Spark idiom
for the reference's per-process model init at SeperatorHandler.py:36-39).
The deterministic stand-ins (FIXTURES.md §2.7) are the default so the
correctness path never loads a model or touches a network:

  * hash-embedder — seeded character-n-gram hashing → unit-norm vector
  * overlap-reranker — query/chunk token overlap through a sigmoid
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 64  # stand-in dim (reference: 3,072 — config.py:20)


def hash_embed(text: str, dim: int = EMBED_DIM, seed: int = 42) -> list[float]:
    """Deterministic text → unit-norm vector via hashed character 3-grams."""
    vec = [0.0] * dim
    s = text.lower()
    for i in range(max(len(s) - 2, 1)):
        gram = s[i : i + 3]
        h = hashlib.md5(f"{seed}|{gram}".encode()).digest()
        idx = int.from_bytes(h[:4], "little") % dim
        sign = 1.0 if h[4] % 2 == 0 else -1.0
        vec[idx] += sign
    norm = math.sqrt(sum(v * v for v in vec)) or 1.0
    return [v / norm for v in vec]


def overlap_rerank(query: str, chunk: str) -> float:
    """Deterministic (query, chunk) → sigmoid(token-overlap − 2) score in
    (0, 1), standing in for the cross-encoder + sigmoid (ChunkProcessor.py:317)."""
    q = set(query.lower().split())
    c = set(chunk.lower().split())
    overlap = len(q & c)
    return 1.0 / (1.0 + math.exp(-(overlap - 2.0)))


def embed_text_udf(embedder: Callable[[str], list[float]] | None = None):
    """pandas UDF: text → array<float>. Swap ``embedder`` for a real model
    call (batched per partition) in production."""
    fn = embedder or hash_embed

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series([fn(t or "") for t in texts])

    return _udf


def rerank_udf(query: str, scorer: Callable[[str, str], float] | None = None):
    """pandas UDF: chunk → rerank score against a fixed query string (the
    reference reads the query from config/rerank_query.txt)."""
    fn = scorer or overlap_rerank

    @F.pandas_udf(T.DoubleType())
    def _udf(chunks: pd.Series) -> pd.Series:
        return pd.Series([fn(query, c or "") for c in chunks])

    return _udf


def load_external_model(spec: str, *args, **kwargs):
    """Instantiate a model class from an external plugin file.

    ``spec`` is ``/path/to/module.py:ClassName`` — the engine-side half of
    the plugin contract (VERDICT r3 item 4): any library exposing a
    sentence-transformers-shaped class (batched ``encode``, or
    CrossEncoder-shaped ``predict``) plugs in without the engine importing
    it at module scope. Used with the batched UDFs below, the file path
    must be visible to executors (sc.addPyFile / shared FS / image).
    """
    import importlib.util

    path, _, cls_name = spec.rpartition(":")
    if not path or not cls_name:
        raise ValueError(f"plugin spec must be '/path/module.py:ClassName', got {spec!r}")
    module_spec = importlib.util.spec_from_file_location(
        f"_mx_plugin_{cls_name.lower()}", path
    )
    if module_spec is None or module_spec.loader is None:
        raise ImportError(f"cannot load plugin module from {path!r}")
    mod = importlib.util.module_from_spec(module_spec)
    module_spec.loader.exec_module(mod)
    return getattr(mod, cls_name)(*args, **kwargs)


def embed_text_batched_udf(loader: Callable[[], object]):
    """pandas UDF for REAL models: ``loader`` builds the model lazily ONCE
    per python worker (the per-executor singleton contract — ref
    SeperatorHandler.py:36-39 loads its models once per process), then
    every Arrow batch goes through ``model.encode(list[str])`` in one
    call. This is the production fan-out shape for the reference's
    embedding stage (ChunkProcessor.py:233-238); ``embed_text_udf`` above
    is the row-at-a-time stand-in path for tiny deterministic embedders.
    """
    holder: dict[str, object] = {}

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _udf(texts: pd.Series) -> pd.Series:
        if "m" not in holder:
            holder["m"] = loader()
        vecs = holder["m"].encode(texts.fillna("").tolist())
        return pd.Series([[float(x) for x in row] for row in vecs])

    return _udf


def rerank_batched_udf(query: str, loader: Callable[[], object]):
    """pandas UDF for REAL cross-encoders: lazy per-worker singleton with
    CrossEncoder-shaped ``predict(list[(query, chunk)])`` over each Arrow
    batch (ref ChunkProcessor.py:308-317)."""
    holder: dict[str, object] = {}

    @F.pandas_udf(T.DoubleType())
    def _udf(chunks: pd.Series) -> pd.Series:
        if "m" not in holder:
            holder["m"] = loader()
        scores = holder["m"].predict([(query, c or "") for c in chunks])
        return pd.Series([float(s) for s in scores])

    return _udf

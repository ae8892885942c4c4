"""Query registry feeding ``__spark_entry__.py``.

Each operator from SURVEY.md §2 registers:
  key     — the stable slug (SURVEY §2 `key` column)
  spark   — Callable[(SparkSession, sf_dir) -> DataFrame]
  oracle  — equivalent DuckDB ANSI SQL over the pre-registered views
            (region nation customer supplier part orders lineitem events
            documents embeddings), or None for rows-only checks.

Parity rules (driver compares row-count + schema + order-insensitive
value hash, columns sorted by name):
  * alias every computed column identically on both sides;
  * round floating-point outputs to 4 decimals on both sides;
  * emit dates/timestamps as formatted strings on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    key: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(key: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``key``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if key in REGISTRY:
            raise KeyError(f"duplicate query key {key!r}")
        REGISTRY[key] = Query(key=key, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def load_all() -> dict[str, Query]:
    """Import every module that registers queries (idempotent).

    Returned order puts every oracle-paired key BEFORE the rows-only keys
    (stable within each group): the driver walks this dict in order under a
    wall-clock budget, and a hash-checked row is strictly stronger evidence
    than a rows-only row, so the hard checks must never starve behind
    mock-HTTP sources, sinks, and streaming keys.
    """
    from .operators import (  # noqa: F401
        relational,
        scalar_queries,
        text_queries,
        vector_queries,
        dedup,
        streaming_queries,
        domain_queries,
        mlops_queries,
        parity_queries,
        scale_queries,
        olap_queries,
        multimodal,
    )
    from .plans import extract_pipeline, curation_pipeline  # noqa: F401

    return dict(
        sorted(REGISTRY.items(), key=lambda kv: kv[1].oracle is None)
    )

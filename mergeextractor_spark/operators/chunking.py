"""Recursive character chunking with langchain-compatible semantics
(SURVEY §2.8 chunk_split_overlap; ref ChunkProcessor.py:195-231, params
chunk_size=2048, chunk_overlap=400 at 200-201, 207-211).

The splitting algorithm reproduces the public langchain
``RecursiveCharacterTextSplitter`` behavior (separator hierarchy
["\\n\\n", "\\n", " ", ""], keep_separator, greedy merge with overlap
carry-back) so extraction results match the reference byte-for-byte.
Pure Python → exposed to Spark as an Arrow-batched UDF returning
``array<struct<idx int, text string>>`` and exploded with ``posexplode``;
the SQL-native fixed-stride variant for bulk 100 TB chunking is
``text_queries.chunk_fixed``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SEPARATORS = ["\n\n", "\n", " ", ""]
CHUNK_SIZE = 2048  # ref ChunkProcessor.py:200
CHUNK_OVERLAP = 400  # ref ChunkProcessor.py:201


def _split_with_separator(text: str, separator: str) -> list[str]:
    """Split keeping the separator attached to the start of the following
    piece (langchain keep_separator=True semantics)."""
    if separator == "":
        return [c for c in text]
    parts = re.split(f"({re.escape(separator)})", text)
    splits = [parts[i] + parts[i + 1] for i in range(1, len(parts), 2)]
    if len(parts) % 2 == 0:
        splits += parts[-1:]
    splits = [parts[0]] + splits
    return [s for s in splits if s != ""]


def _join_docs(docs: list[str], separator: str) -> str | None:
    text = separator.join(docs).strip()
    return text if text else None


def _merge_splits(
    splits: list[str], separator: str, chunk_size: int, chunk_overlap: int
) -> list[str]:
    """Greedy merge of small splits into ≤chunk_size chunks, carrying back
    up to chunk_overlap characters into the next chunk."""
    separator_len = len(separator)
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for d in splits:
        d_len = len(d)
        if total + d_len + (separator_len if current else 0) > chunk_size:
            if current:
                doc = _join_docs(current, separator)
                if doc is not None:
                    docs.append(doc)
                while total > chunk_overlap or (
                    total + d_len + (separator_len if current else 0) > chunk_size
                    and total > 0
                ):
                    total -= len(current[0]) + (
                        separator_len if len(current) > 1 else 0
                    )
                    current = current[1:]
        current.append(d)
        total += d_len + (separator_len if len(current) > 1 else 0)
    doc = _join_docs(current, separator)
    if doc is not None:
        docs.append(doc)
    return docs


def split_text(
    text: str,
    chunk_size: int = CHUNK_SIZE,
    chunk_overlap: int = CHUNK_OVERLAP,
    separators: list[str] | None = None,
) -> list[str]:
    """Recursive split: try the coarsest separator present; pieces still
    over chunk_size recurse with the finer separators."""
    separators = separators if separators is not None else DEFAULT_SEPARATORS
    final_chunks: list[str] = []
    separator = separators[-1]
    new_separators: list[str] = []
    for i, s in enumerate(separators):
        if s == "":
            separator = s
            break
        if re.search(re.escape(s), text):
            separator = s
            new_separators = separators[i + 1 :]
            break

    splits = _split_with_separator(text, separator)
    good: list[str] = []
    merge_sep = ""  # keep_separator → separator already attached to pieces
    for s in splits:
        if len(s) < chunk_size:
            good.append(s)
        else:
            if good:
                final_chunks.extend(_merge_splits(good, merge_sep, chunk_size, chunk_overlap))
                good = []
            if not new_separators:
                final_chunks.append(s)
            else:
                final_chunks.extend(
                    split_text(s, chunk_size, chunk_overlap, new_separators)
                )
    if good:
        final_chunks.extend(_merge_splits(good, merge_sep, chunk_size, chunk_overlap))
    return final_chunks


_CHUNKS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
)


def chunk_split_overlap_udf(chunk_size: int = CHUNK_SIZE, chunk_overlap: int = CHUNK_OVERLAP):
    """Arrow-batched UDF: text → array<struct<idx,text>> of recursive chunks."""

    @F.pandas_udf(_CHUNKS_TYPE)
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [
                    {"idx": i, "text": c}
                    for i, c in enumerate(split_text(t or "", chunk_size, chunk_overlap))
                ]
                for t in texts
            ]
        )

    return _udf


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    chunk_size: int = CHUNK_SIZE,
    chunk_overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """documents → one row per (id, chunk_idx, chunk), reference-parity
    chunking. The UDF fans out inside the scan stage (no shuffle)."""
    id_cols = id_cols or ["doc_id"]
    udf = chunk_split_overlap_udf(chunk_size, chunk_overlap)
    exploded = docs.select(*id_cols, F.explode(udf(F.col(text_col))).alias("c"))
    return exploded.select(
        *id_cols,
        F.col("c.idx").alias("chunk_idx"),
        F.col("c.text").alias("chunk"),
    )

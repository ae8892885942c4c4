"""Header-cascade extraction predicate (SURVEY §2.8 header_cascade /
phrase_catalog; ref ChunkProcessor.py:34-169, config.py:32-62).

Three boolean stages per chunk, exactly mirroring the reference:
  (a) locate_chunk_header  — sentence-level literal phrase match with a
      "background" co-check, line-level containment/fuzzy>85 match, exact
      "background" line for the bare phrase     (ChunkProcessor.py:34-73)
  (b) has_section_title    — the phrase must sit in a paragraph of ≤2
      lines (standalone-number lines dropped)   (ChunkProcessor.py:75-114)
  (c) is_not_toc           — "line+blank" (TOC-like) vs consecutive-line
      (paragraph-like) pattern counting         (ChunkProcessor.py:116-140)
then the passage from the header line onward must exceed 200 chars and the
header line must avoid title stop-terms        (ChunkProcessor.py:142-169).

The reference gates (a) on spaCy sentence segmentation; per SURVEY §7.4
we use a deterministic regex sentence splitter (spaCy optional behind the
``sentence_splitter`` argument — never on the test path). Pure-Python
core functions (unit-testable) wrapped in one Arrow-batched pandas UDF.
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.fuzzy import fuzz_ratio

# Ref config.py:32-62 — the 29-phrase catalog; bare "Background" is the
# two-pass fallback (Processor.py:266-269).
START_PHRASES = [
    "Background of the transaction",
    "Background of the merger",
    "Background of the offer",
    "Background of the acquisition",
    "Background of the consolidation",
    "Background of the Asset Sale",
    "Background of the Combination",
    "Background of the Proposal",
    "Background of the Offer and the Merger",
    "Background and negotiation of the merger",
    "Background to the merger",
    "Background to the acquisition",
    "Background to the offer",
    "Background to the transaction",
    "Background to the consolidation",
    "Background to the Asset Sale",
    "Background to the Combination",
    "Background to the Proposal",
    "Background of Offer",
    "Background of Acquisition",
    "Background of Transaction",
    "Background of Merger",
    "Background of Consolidation",
    "Background of Asset Sale",
    "Background of Combination",
    "Background of Proposal",
    "Background of the Proposed Transaction",
    "Background of the Open Market Merger",
]
FALLBACK_PHRASES = ["Background"]

SKIP_IF_CONTAINS = ["schedule to", "amended", "restated", "included", "incorporated by reference"]
PARA_BAD_PHRASES = ["amended", "restated", "schedule to", "as follow"]
TITLE_STOP_TERMS = ["industry", "identity", "filing", "corporate", "opinion", "overview"]
MIN_PASSAGE_LEN = 200

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+|\n{2,}")


def regex_sentences(text: str) -> list[str]:
    """Deterministic sentence segmentation (stands in for spaCy sents)."""
    return [s for s in _SENT_SPLIT.split(text) if s and s.strip()]


def locate_chunk_header(
    chunk: str,
    start_phrases: list[str],
    sentence_splitter: Callable[[str], list[str]] = regex_sentences,
) -> str | None:
    """Stage (a). Returns the matched phrase / header line, or None.
    Ref ChunkProcessor.py:34-73."""
    phrases_lower = [p.lower() for p in start_phrases]
    background_only = len(start_phrases) == 1 and phrases_lower[0] == "background"

    for sent in sentence_splitter(chunk):
        sentence_text = sent.strip()
        sentence_lower = sentence_text.lower()
        lines = [ln.strip() for ln in sentence_text.splitlines() if ln.strip()]

        if not background_only:
            for phrase in phrases_lower:
                if phrase in sentence_lower and "background" in sentence_lower:
                    if any(skip in sentence_lower for skip in SKIP_IF_CONTAINS):
                        continue
                    return phrase

        for line in lines:
            line_lower = line.lower().strip()
            if background_only:
                if line_lower == "background":
                    return line
            else:
                for phrase in phrases_lower:
                    if phrase in line_lower or fuzz_ratio(line_lower, phrase) > 85:
                        if "background" in line_lower:
                            return line
    return None


def has_section_title(chunk: str, phrase: str) -> bool:
    """Stage (b): phrase sits in a ≤2-line paragraph. Ref ChunkProcessor.py:75-114."""
    paragraphs: list[list[str]] = []
    buffer: list[str] = []
    for line in chunk.splitlines():
        line = line.strip()
        if line == "":
            if buffer:
                paragraphs.append(buffer)
                buffer = []
        elif len(line) >= 4:  # drop standalone numbers like '11.'
            buffer.append(line)
    if buffer:
        paragraphs.append(buffer)

    phrase_lower = phrase.lower()
    for para_lines in paragraphs:
        joined_lower = "\n".join(para_lines).lower()
        if any(bad in joined_lower for bad in PARA_BAD_PHRASES):
            continue
        if phrase_lower in joined_lower and len(para_lines) <= 2:
            return True
    return False


def is_not_toc(chunk: str, phrase: str) -> bool:
    """Stage (c): TOC-pattern counting. Ref ChunkProcessor.py:116-140."""
    lines = [line.strip() for line in chunk.splitlines()]
    phrase_lower = phrase.lower()
    start_index = next((i for i, ln in enumerate(lines) if phrase_lower in ln.lower()), 0)

    toc_like = 0
    para_like = 0
    i = start_index
    while i < len(lines) - 1:
        if lines[i] and not lines[i + 1]:
            toc_like += 1
            i += 2
        elif lines[i] and lines[i + 1]:
            para_like += 1
            i += 2
        else:
            i += 1
    return not (toc_like >= 3 and para_like < 3)


def extract_passage(chunk: str, start_phrases: list[str]) -> str | None:
    """Full cascade on one chunk → passage from the header line onward, or
    None. Ref ChunkProcessor.py:142-169 (_process_single_chunk)."""
    phrase = locate_chunk_header(chunk, start_phrases)
    if not phrase:
        return None
    if not has_section_title(chunk, phrase):
        return None
    if not is_not_toc(chunk, phrase):
        return None

    lines = chunk.splitlines()
    phrase_lower = phrase.lower()
    for i, raw in enumerate(lines):
        line = raw.strip()
        if not line or phrase_lower not in line.lower():
            continue
        if any(term in line.lower() for term in TITLE_STOP_TERMS):
            continue
        passage = "\n".join(lines[i:])
        if len(passage) > MIN_PASSAGE_LEN:
            return passage
    return None


def two_pass_passage(chunk: str) -> str | None:
    """Specific phrases first; bare 'Background' only as the fallback pass
    (ref Processor.py:266-269). This is the CRAWLER's locate."""
    return extract_passage(chunk, START_PHRASES) or extract_passage(chunk, FALLBACK_PHRASES)


# The SEPARATOR's phrase list: the full catalog with bare "Background"
# LAST (ref config.py:32-62 lists it as the final entry;
# SeperatorHandler.py:68 passes the whole list in ONE locate call — only
# the crawler splits it into two passes, Processor.py:266-269).
SEPARATOR_PHRASES = START_PHRASES + FALLBACK_PHRASES


def separator_passage(chunk: str) -> str | None:
    """Single-pass locate with the full catalog (SeperatorHandler.py:68).

    Inside a multi-phrase list the bare 'Background' entry matches by
    CONTAINMENT (the exact-line rule only applies to a single-phrase
    list, ChunkProcessor.py:63-66), so an early sentence that merely
    mentions 'background' can win the locate and anchor the TOC check on
    that decoy line — the deterministic core of the reference's
    '[x] FLAGGED for Manual Inspection' separator outcomes
    (SeperatorHandler.py:69-77; 20 occurrences in logs.txt). Documents
    the crawler accepted via a specific title phrase can therefore fail
    here, exactly as the reference's separator stage can fail on
    crawler-accepted documents."""
    return extract_passage(chunk, SEPARATOR_PHRASES)


_PASSAGE_TYPE = T.StringType()


@F.pandas_udf(_PASSAGE_TYPE)
def cascade_passage_udf(chunks: pd.Series) -> pd.Series:
    """chunk text → extracted passage (NULL when the cascade rejects)."""
    return pd.Series([two_pass_passage(c or "") for c in chunks])


def filter_background_chunks(chunks: DataFrame, chunk_col: str = "chunk") -> DataFrame:
    """Apply the cascade as a filter stage: keeps rows whose chunk yields a
    passage, adding the ``passage`` column. Cheap-to-expensive order is
    preserved by running a native prefilter first (any catalog phrase OR
    the word 'background' present, case-insensitive) so the Python UDF
    only sees plausible chunks — the O5 cascade posture from SURVEY §4."""
    prefilter = F.lower(F.col(chunk_col)).contains("background")
    return (
        chunks.filter(prefilter)
        .withColumn("passage", cascade_passage_udf(F.col(chunk_col)))
        .filter(F.col("passage").isNotNull())
    )


def chunk_and_cascade(
    docs: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    chunk_size: int | None = None,
    chunk_overlap: int | None = None,
    passage_fn: Callable[[str], str | None] | None = None,
) -> DataFrame:
    """Fused chunk + cascade: ONE ``mapInPandas`` pass emitting every chunk
    of every document together with its cascade passage (NULL when the
    cascade rejects).

    Equivalent to ``chunk_documents`` followed by the cascade UDF, minus a
    full Arrow round-trip of the chunk text (chunks serialized out of the
    chunker UDF and back into the cascade UDF — VERDICT r2 item 6). The
    native 'background' prefilter runs as the same cheap substring test in
    Python, so the cascade still only executes on plausible chunks.
    Pipelines that need both the chunk set and the cascade hits (crawler /
    separator, plans/filing_pipeline.py) read both from this single output:
    ``passage IS NOT NULL`` selects the hits.
    """
    from .chunking import CHUNK_OVERLAP, CHUNK_SIZE, split_text

    id_cols = id_cols or ["doc_id"]
    size = chunk_size or CHUNK_SIZE
    overlap = chunk_overlap or CHUNK_OVERLAP
    # crawler two-pass by default; separator callers pass separator_passage
    locate = passage_fn or two_pass_passage
    out_schema = T.StructType(
        [docs.schema[c] for c in id_cols]
        + [
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("chunk", T.StringType()),
            T.StructField("passage", T.StringType()),
        ]
    )
    cols = [f.name for f in out_schema.fields]

    def gen(batches):
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for row in pdf.to_dict("records"):
                text = row[text_col] or ""
                for i, c in enumerate(split_text(text, size, overlap)):
                    passage = (
                        locate(c) if "background" in c.lower() else None
                    )
                    for ic in id_cols:
                        out[ic].append(row[ic])
                    out["chunk_idx"].append(i)
                    out["chunk"].append(c)
                    out["passage"].append(passage)
            if out["chunk"]:
                yield pd.DataFrame(out)

    return docs.select(*id_cols, text_col).mapInPandas(gen, schema=out_schema)

"""Property tests for the r8 cascade oracle twins: the SQL-expressible
reformulations registered as cascade_title_check / cascade_toc_check
(parity_queries.py) must agree with the reference-parity pure-Python
stages (cascade.py, ref ChunkProcessor.py:75-140) on ARBITRARY chunks,
not just the fixture distribution.

The reimplementations below mirror the SQL algorithms 1:1 in Python
(regex paragraph split / blank-ness regex tokenization), so hypothesis
exercises the EQUIVALENCE CLAIM the oracles rest on. Inputs use plain
'\n' separators and space-only intra-line whitespace — the same
envelope as the SQL twins (trim() strips spaces, not tabs; splitlines'
exotic terminators never appear in the fixture text).
"""

from __future__ import annotations

import re

from hypothesis import example, given, settings
from hypothesis import strategies as st

from mergeextractor_spark.operators.cascade import (
    PARA_BAD_PHRASES,
    has_section_title,
    is_not_toc,
)

PHRASE = "Background of the Merger"

_LINES = st.sampled_from(
    [
        "",
        "  ",
        "Background of the Merger",
        "BACKGROUND OF THE MERGER",
        "background of the merger....17",
        "Item 7.",
        "11.",
        "A",
        "As amended herein",
        "schedule to the agreement",
        "the parties negotiated the exchange ratio and retention terms",
        "Summary of the Transaction....3",
        "Opinion of the Financial Advisor",
        "on may 14 2002 the board approved the proposed terms",
        "x" * 80,
    ]
)

_CHUNKS = st.lists(_LINES, min_size=0, max_size=25).map("\n".join)


def _has_section_title_sql(chunk: str, phrase: str) -> bool:
    """Python mirror of the cascade_title_check SQL: regex split on blank
    lines, kept lines = trimmed length >= 4, poison-term skip, phrase in
    a <= 2-kept-line paragraph."""
    phrase_lower = phrase.lower()
    for para in re.split(r"\n\s*\n", chunk):
        kept = [ln.strip(" ") for ln in para.split("\n")]
        kept = [ln for ln in kept if len(ln) >= 4]
        joined = "\n".join(kept).lower()
        if any(bad in joined for bad in PARA_BAD_PHRASES):
            continue
        if phrase_lower in joined and len(kept) <= 2:
            return True
    return False


def _is_not_toc_sql(chunk: str, phrase: str) -> bool:
    """Python mirror of the cascade_toc_check SQL: lines from the first
    phrase hit map to a '1'/'0' blank-ness string; regexp tokenization
    '1.|0' reproduces the reference loop's greedy two-step scan."""
    raw = chunk.split("\n")
    # splitlines() parity: drop the phantom trailing empty line that
    # split('\n') keeps when the chunk ends in a newline (the r8
    # Hypothesis counterexample pinned below)
    if chunk.endswith("\n"):
        raw = raw[:-1]
    lines = [ln.strip(" ") for ln in raw]
    phrase_lower = phrase.lower()
    start = next((i for i, ln in enumerate(lines) if phrase_lower in ln.lower()), 0)
    bits = "".join("1" if ln else "0" for ln in lines[start:])
    toks = re.findall(r"1.|0", bits)
    return not (toks.count("10") >= 3 and toks.count("11") < 3)


@settings(max_examples=400, deadline=None)
@given(_CHUNKS)
def test_title_check_sql_form_equals_reference(chunk):
    assert _has_section_title_sql(chunk, PHRASE) == has_section_title(chunk, PHRASE)


@settings(max_examples=400, deadline=None)
@given(_CHUNKS)
@example(
    chunk="Background of the Merger\n\nBackground of the Merger\n\nBackground of the Merger\n",
).via("discovered failure")
@example(chunk="")
@example(chunk="\n")
@example(chunk="Background of the Merger\n")
def test_toc_check_sql_form_equals_reference(chunk):
    assert _is_not_toc_sql(chunk, PHRASE) == is_not_toc(chunk, PHRASE)

"""Vendored golden fixture for the recursive chunker (VERDICT r2 item 8 /
SURVEY §7.4 risk 1).

``fixtures/golden_chunks.json`` holds the exact chunk lists (plus their
sha256 digests) for every filing in the golden cascade corpus at the
reference parameters (2048/400, ref ChunkProcessor.py:200-201) and at a
small 300/60 setting that forces deep recursion through every separator
level. The fixture was generated ONCE and committed; this test
byte-compares fresh ``split_text`` output against it, so any behavioral
drift in the splitter — merge logic, overlap carry-back, separator
attachment — fails loudly with the first diverging chunk.

What this does and does not prove: it pins today's behavior permanently
(regression oracle) and gives the opt-in langchain byte-parity test
(test_optional_real_models.py) a stable corpus to certify in a full
environment; it is NOT itself independent evidence of langchain parity,
because the fixture came from this implementation. The independent checks
are the hypothesis property suite (test_chunking_properties.py) and the
opt-in real-library comparison.
"""

from __future__ import annotations

import hashlib
import json
import os

JSON_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "golden_chunks.json")


def _corpus():
    from fixtures.filings import build_filings

    return {r["main_index"]: r["content"] for r in build_filings()}


def test_golden_chunks_byte_parity():
    from mergeextractor_spark.operators.chunking import split_text

    with open(JSON_PATH, encoding="utf-8") as f:
        golden = json.load(f)
    assert golden, "empty golden fixture"
    texts = _corpus()
    for entry in golden:
        txt = texts[entry["main_index"]]
        chunks = split_text(txt, entry["chunk_size"], entry["chunk_overlap"])
        key = f"{entry['main_index']} @{entry['chunk_size']}/{entry['chunk_overlap']}"
        assert len(chunks) == entry["n_chunks"], f"{key}: chunk count drifted"
        for i, (got, want) in enumerate(zip(chunks, entry["chunks"])):
            assert got == want, f"{key}: chunk {i} diverged"
        # digests guard the fixture file itself against silent edits
        for i, (c, h) in enumerate(zip(chunks, entry["sha256"])):
            assert hashlib.sha256(c.encode()).hexdigest() == h, (
                f"{key}: sha mismatch at {i}"
            )


def test_golden_covers_deep_recursion():
    """The 300/60 entries must actually exercise multi-chunk recursion —
    otherwise the fixture silently degrades to single-chunk no-ops."""
    with open(JSON_PATH, encoding="utf-8") as f:
        golden = json.load(f)
    small = [g for g in golden if g["chunk_size"] == 300]
    assert small and all(g["n_chunks"] >= 5 for g in small)

"""Drift guards for the golden-table oracles (r10 graduations).

The committed parquet fixtures under tests/fixtures/golden/ are what the
DuckDB oracles SELECT from; they were generated ONCE by the sequential
pure-Python mirror in tools/make_golden.py and committed. These tests
re-run the mirror and byte-compare against the committed files, so:

  * a behavior change in the shared core functions (split_text,
    two_pass_passage, separator_passage, mock clients, hash_embed,
    fuzz_partial_ratio) fails here with the first diverging row instead
    of silently invalidating a driver oracle;
  * a driver-testdata regeneration (the md5(text)-keyed goldens bake in
    the union of sf0.001/0.01/0.1 texts) fails here, prompting a
    `python tools/make_golden.py` re-run.

What this proves vs what the driver proves: the driver's hash row checks
the DISTRIBUTED plan against the committed golden; these tests check the
SEQUENTIAL mirror against the same golden. Together they pin
distributed == sequential without either side being self-referential.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "fixtures", "golden")
sys.path.insert(0, os.path.join(REPO, "tools"))

FIXTURE_KEYS = [
    "multimodal_image_phash",
    "dedup_image_phash",
    "dedup_audio_fingerprint",
    "dedup_video_fingerprint",
    "multimodal_image_meta",
    "multimodal_audio_meta",
    "multimodal_video_meta",
    "multimodal_frame_sample",
    "multimodal_audio_fingerprint",
    "multimodal_video_fingerprint",
    "header_cascade",
    "llm_classify_doc",
    "abbrev_enrich",
    "pipeline_separator",
    "llm_extract_initiator",
    "pipeline_crawler",
    "pipeline_crawler_audit",
    "fuzzy_partial_ratio",
]
TESTDATA_KEYS = [
    "chunk_split_overlap",
    "embed_text",
    "str_normalize_unicode",
    "text_compression_ratio",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def rebuilt():
    import make_golden

    return make_golden.build_all()


@pytest.mark.parametrize("key", FIXTURE_KEYS + TESTDATA_KEYS)
def test_golden_matches_mirror(rebuilt, key):
    path = os.path.join(GOLDEN_DIR, f"{key}.parquet")
    assert os.path.exists(path), f"missing committed golden for {key}"
    committed = pd.read_parquet(path)
    fresh = rebuilt[key]
    assert list(committed.columns) == list(fresh.columns), key
    a, b = _norm(committed), _norm(fresh)
    assert len(a) == len(b), f"{key}: row count drifted {len(a)} -> {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=True, obj=key)


def test_goldens_are_nonempty(rebuilt):
    """A silently-empty golden would make its oracle vacuously green on an
    empty Spark result — every golden must carry rows."""
    for key, df in rebuilt.items():
        assert len(df) > 0, key


def test_crawler_audit_covers_taxonomy(rebuilt):
    """The audit golden must exercise more than one outcome class, or the
    status logic isn't really being checked."""
    statuses = set(rebuilt["pipeline_crawler_audit"]["status"])
    assert "accepted" in statuses and len(statuses) >= 2, statuses

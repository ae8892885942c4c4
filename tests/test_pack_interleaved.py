"""sample_pack_interleaved pins (r14 — VERDICT r13 item 4).

Boundary proofs over the factored pack_interleaved helper (the exact
production path, synthetic items):
  1. an image-heavy document EXACTLY filling the budget closes its pack
     on the boundary — the next document starts a new pack;
  2. a document COSTLIER than the budget overflows: it occupies its own
     pack span (concat-and-chunk never splits a document) and the
     stream resumes in the next pack;
  3. mixed-cost accounting: pack_cost == pack_text_tokens +
     pack_image_tokens, and totals are conserved across packs;
  4. the registered key's patch arithmetic is the exact integer
     ceil-div against the image golden, and the packed corpus conserves
     the fixture's total token mass.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"
BUDGET = 100


def _pack(spark, rows):
    from mergeextractor_spark.operators.curation_queries import pack_interleaved

    items = spark.createDataFrame(
        rows, "doc_id long, lang string, text_tokens long, image_tokens long, n_images long"
    )
    return {
        (r.lang, r.pack_id): r
        for r in pack_interleaved(items, budget=BUDGET).collect()
    }


def test_image_exactly_filling_a_pack_closes_it(spark):
    # doc 1: 40 text + 60 image = exactly the 100 budget → pack 0 alone;
    # doc 2 starts at preceding mass 100 → pack 1
    got = _pack(
        spark,
        [(1, "en", 40, 60, 1), (2, "en", 10, 0, 0)],
    )
    assert got[("en", 0)].n_docs == 1 and got[("en", 0)].pack_cost == 100
    assert got[("en", 1)].n_docs == 1 and got[("en", 1)].pack_cost == 10


def test_oversized_document_overflows_into_own_span(spark):
    # doc 1 costs 150 > budget: starts pack 0 (never split); doc 2 at
    # preceding mass 150 → pack 1; doc 3 at 160 → still pack 1; doc 4 at
    # 220 → pack 2
    got = _pack(
        spark,
        [
            (1, "en", 50, 100, 2),
            (2, "en", 10, 0, 0),
            (3, "en", 0, 60, 1),
            (4, "en", 60, 0, 0),
        ],
    )
    assert got[("en", 0)].n_docs == 1 and got[("en", 0)].pack_cost == 150
    assert got[("en", 1)].n_docs == 2 and got[("en", 1)].pack_cost == 70
    assert got[("en", 2)].n_docs == 1 and got[("en", 2)].pack_cost == 60


def test_mixed_cost_accounting_and_lang_isolation(spark):
    got = _pack(
        spark,
        [(1, "en", 30, 20, 1), (2, "en", 70, 0, 0), (3, "fr", 5, 95, 3)],
    )
    for r in got.values():
        assert r.pack_cost == r.pack_text_tokens + r.pack_image_tokens
    # langs pack independently: fr's exactly-full doc is pack 0 of fr
    assert got[("fr", 0)].n_images == 3 and got[("fr", 0)].pack_cost == 100
    # en: 50 + 70 = 120 → doc 2 overflows pack 0 (preceding mass 50)
    assert got[("en", 0)].n_docs == 2 and got[("en", 0)].pack_cost == 120


def test_registered_key_conserves_fixture_mass(spark):
    from pyspark.sql import functions as F

    from mergeextractor_spark.operators._util import t
    from mergeextractor_spark.operators.curation_queries import (
        IMG_ATTACH_MOD,
        INTERLEAVE_PATCH,
    )
    from mergeextractor_spark.operators.multimodal import (
        _media_df,
        image_metadata,
    )
    from mergeextractor_spark.registry import load_all

    packs = load_all()["sample_pack_interleaved"].spark(spark, SF).collect()
    assert packs
    # text mass: every fixture doc appears exactly once across packs
    docs = t(spark, SF, "documents")
    n_docs = docs.count()
    assert sum(p.n_docs for p in packs) == n_docs
    # image mass: the exact integer ceil-div patch arithmetic over the
    # decoded dims, attached by media_id % IMG_ATTACH_MOD (every
    # attachment lands on a real doc at every sf: doc_id < mod <= n_docs)
    meta = image_metadata(_media_df(spark)).filter(F.col("width") > 0).collect()
    P = INTERLEAVE_PATCH
    want_img = sum(
        -(-m.width // P) * -(-m.height // P)
        for m in meta
        if m.media_id % IMG_ATTACH_MOD < n_docs
    )
    assert sum(p.pack_image_tokens for p in packs) == want_img
    assert sum(p.n_images for p in packs) == sum(
        1 for m in meta if m.media_id % IMG_ATTACH_MOD < n_docs
    )
    for p in packs:
        assert p.pack_cost == p.pack_text_tokens + p.pack_image_tokens

"""pipeline_bpe_distill pins (r14 flagship #11 — the BPE
train→persist→encode loop, the tokenizer twin of the classifier
distill).

Proofs:
  1. the store round-trip is exact: encoding a fresh seed with the
     PERSISTED merge table reproduces the training loop's in-loop final
     segmentation bit-identically (the tests/test_bpe_train.py
     round-trip property, here THROUGH DISK);
  2. the oracle precondition holds: the vocabulary does not exhaust
     before BPE_TRAIN_ROUNDS merges at fixture scale (an exhausted
     best{k} would empty the oracle's seg{rounds});
  3. the merge store is real persistence (reuse without retrain;
     parameter-fingerprinted directory);
  4. segmentation invariants: pieces reconstruct the word, and
     1 <= n_pieces <= len(word).
"""

from __future__ import annotations

import os

SF = "/root/testdata/sf0.001"


def _distill_rows(spark):
    from mergeextractor_spark.registry import load_all

    return load_all()["pipeline_bpe_distill"].spark(spark, SF).collect()


def test_store_roundtrip_matches_in_loop_segmentation(spark):
    from mergeextractor_spark.plans.bpe_pipeline import bpe_train, seed_vocab

    _merges, final = bpe_train(seed_vocab(spark, SF))
    want = {r.w: r.s.strip() for r in final.collect()}
    got = {r.word: r.pieces for r in _distill_rows(spark)}
    assert got == want
    assert got, "distill must cover the vocabulary"


def test_vocabulary_does_not_exhaust(spark):
    from mergeextractor_spark.plans.bpe_pipeline import (
        BPE_TRAIN_ROUNDS,
        bpe_train,
        seed_vocab,
    )

    merges, _final = bpe_train(seed_vocab(spark, SF))
    assert len(merges) == BPE_TRAIN_ROUNDS


def test_merge_store_is_persisted_and_fingerprinted(spark):
    from mergeextractor_spark.plans.bpe_pipeline import ensure_bpe_store

    path = ensure_bpe_store(spark, SF)
    success = os.path.join(path, "_SUCCESS")
    assert os.path.isfile(success)
    before = os.path.getmtime(success)
    assert ensure_bpe_store(spark, SF) == path
    assert os.path.getmtime(success) == before, "second ensure retrained"
    assert ensure_bpe_store(spark, SF, rounds=7) != path


def test_segmentation_invariants(spark):
    for r in _distill_rows(spark):
        assert r.pieces.replace(" ", "") == r.word, r
        assert 1 <= r.n_pieces <= len(r.word), r
        assert r.n_pieces == len(r.pieces.split(" ")), r

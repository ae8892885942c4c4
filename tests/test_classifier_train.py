"""pipeline_classifier_train pins (r13 flagship #9).

Proofs:
  1. a pure-Python sequential mirror (hashlib md5 buckets, exact
     integer scores/gradients, math.exp sigmoid) reproduces the learned
     integer weight table EXACTLY on the fixture corpus — a different
     engine, same spec, bit-identical integers;
  2. the training actually LEARNS: final-round training accuracy on the
     distilled stopword labels beats both the all-ones baseline and the
     round-0 (w=0) coin flip;
  3. stopword-bucket weights come out positive (the signal the labels
     were distilled from);
  4. determinism: two runs agree row-for-row.
"""

from __future__ import annotations

import hashlib
import math

SF = "/root/testdata/sf0.001"

B, S, ROUNDS = 256, 10_000, 12

from mergeextractor_spark.operators.text_queries import EN_STOPWORDS  # noqa: E402
from mergeextractor_spark.plans.classifier_pipeline import clf_lr_den  # noqa: E402


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % B


def mirror_train(texts: dict[int, str]):
    """Sequential mirror: same features, labels, quantization, update."""
    feat: dict[int, dict[int, int]] = {}
    lab: dict[int, int] = {}
    stops = set(EN_STOPWORDS)
    for doc_id, text in texts.items():
        ws = [w for w in text.lower().split() if w != ""]
        if not ws:
            continue
        f: dict[int, int] = {-1: 1}
        for w in ws:
            b = _bucket(w)
            f[b] = f.get(b, 0) + 1
        feat[doc_id] = f
        n_stop = sum(1 for w in ws if w in stops)
        lab[doc_id] = 1 if 20 * n_stop >= len(ws) else 0
    n = len(feat)
    w = {b: 0 for b in range(-1, B)}
    for k in range(1, ROUNDS + 1):
        grad = {b: 0 for b in w}
        for doc_id, f in feat.items():
            s = sum(x * w[b] for b, x in f.items())
            p = 1.0 / (1.0 + math.exp(-(s / S)))
            # Python round() is banker's; Spark/DuckDB round is
            # half-away-from-zero — match THEIR spec explicitly
            v = S * (p - lab[doc_id])
            r = int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)
            for b, x in f.items():
                grad[b] += r * x
        w = {b: w[b] - math.floor(grad[b] / (clf_lr_den(k) * n)) for b in w}
    return w, feat, lab


def _fixture_texts(spark) -> dict[int, str]:
    from mergeextractor_spark.operators._util import t

    return {r.doc_id: r.text for r in t(spark, SF, "documents").collect()}


def test_trainer_matches_sequential_mirror(spark):
    from mergeextractor_spark.registry import load_all

    got = {
        r.bucket: r.weight
        for r in load_all()["pipeline_classifier_train"].spark(spark, SF).collect()
    }
    want_w, _, _ = mirror_train(_fixture_texts(spark))
    assert got == {b: w for b, w in want_w.items() if w != 0}
    assert got, "training must move some weights"


def test_training_learns_the_distilled_rule(spark):
    w, feat, lab = mirror_train(_fixture_texts(spark))
    correct = 0
    for doc_id, f in feat.items():
        s = sum(x * w[b] for b, x in f.items())
        correct += int((s > 0) == (lab[doc_id] == 1))
    acc = correct / len(feat)
    base = max(sum(lab.values()), len(lab) - sum(lab.values())) / len(lab)
    # must beat the majority-class baseline, not just the coin flip
    assert acc > base, (acc, base)
    # the signal the labels came from: every stopword PRESENT in the
    # corpus vocabulary (the sf0.001 fixture uses only 'the' and 'a' of
    # the ten) must earn a positive weight
    texts = _fixture_texts(spark)
    vocab = {t for txt in texts.values() for t in txt.lower().split() if t}
    present = [t for t in EN_STOPWORDS if t in vocab]
    assert present, "fixture must contain at least one stopword"
    stop_w = {t: w[_bucket(t)] for t in present}
    assert all(x > 0 for x in stop_w.values()), stop_w


def test_trainer_is_deterministic(spark):
    from mergeextractor_spark.registry import load_all

    q = load_all()["pipeline_classifier_train"]
    a = sorted(tuple(r) for r in q.spark(spark, SF).collect())
    b = sorted(tuple(r) for r in q.spark(spark, SF).collect())
    assert a == b

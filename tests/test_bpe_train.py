"""pipeline_bpe_train pins (VERDICT r12 item 4).

Three independent proofs of the iterative trainer:
  1. a pure-Python sequential mirror (dict + str.replace — a different
     engine with the same spec) reproduces the learned merge table AND
     the final segmentation on a hand-built corpus that exercises ties,
     overlapping pairs (runs like "aaaa"), and merged-symbol collisions;
  2. the learned merge table ROUND-TRIPS through the text_bpe_encode
     apply semantics: replaying the table (two literal replaces per
     merge, in rank order) over the seed segmentation reproduces the
     trainer's final vocabulary exactly — table out == tokenizer in;
  3. determinism: two runs over the fixture corpus agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def mirror_train(word_freq: dict[str, int], rounds: int):
    """Sequential pure-Python mirror of bpe_train: same seeding, same
    pair counting (all adjacent positions, frequency-weighted), same
    (freq desc, pair asc) argmax, same double str.replace apply."""
    seg = {w: " " + " ".join(w) + " " for w in word_freq}
    merges = []
    for k in range(1, rounds + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, f in word_freq.items():
            sy = seg[w].split()
            for i in range(len(sy) - 1):
                pc[(sy[i], sy[i + 1])] = pc.get((sy[i], sy[i + 1]), 0) + f
        if not pc:
            break
        (a, b), pf = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((k, a, b, a + b, pf))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        for w in seg:
            seg[w] = seg[w].replace(pat, rep).replace(pat, rep)
    return merges, seg


def _train_on(spark, rows: list[tuple[str, int]], rounds: int):
    from mergeextractor_spark.plans.bpe_pipeline import bpe_train

    vocab = spark.createDataFrame(rows, "w string, freq long").select(
        "w",
        "freq",
        F.concat(
            F.lit(" "),
            F.array_join(F.filter(F.split("w", ""), lambda x: x != ""), " "),
            F.lit(" "),
        ).alias("s"),
    )
    return bpe_train(vocab, rounds=rounds)


CORPUS = {
    # runs of one char: overlap semantics (greedy-with-resume, 2 passes)
    "aaaa": 7,
    "aaa": 5,
    # alternating pattern: the case the second replace pass exists for
    "ababab": 6,
    # tie bait: distinct pairs with equal weighted counts at some round
    "abcd": 4,
    "bcda": 4,
    # ordinary words sharing fragments
    "the": 9,
    "then": 3,
    "them": 3,
    "hen": 2,
}


def test_trainer_matches_sequential_mirror(spark):
    rounds = 8
    got_merges, got_final = _train_on(spark, list(CORPUS.items()), rounds)
    want_merges, want_seg = mirror_train(CORPUS, rounds)
    assert got_merges == want_merges
    got_seg = {r.w: r.s for r in got_final.collect()}
    assert got_seg == want_seg


def test_merge_table_roundtrips_through_encoder_apply(spark):
    """Replaying the LEARNED table with text_bpe_encode's apply (two
    ' a b '→' ab ' replaces per merge, rank order) over the seed
    segmentation must reproduce the trainer's final state — the trainer
    output is directly consumable as the encoder's merge program."""
    from mergeextractor_spark.plans.bpe_pipeline import bpe_train, seed_vocab

    seed = seed_vocab(spark, SF)
    merges, final = bpe_train(seed, rounds=10)
    assert len(merges) == 10

    s = F.col("s")
    for _rank, a, b, _m, _f in merges:  # rank order preserved by the list
        for _ in range(2):
            s = F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    replayed = {r.w: r.s for r in seed.select("w", s.alias("s")).collect()}
    want = {r.w: r.s for r in final.collect()}
    assert replayed == want


def test_trainer_is_deterministic_on_fixture(spark):
    from mergeextractor_spark.registry import load_all

    q = load_all()["pipeline_bpe_train"]
    a = [tuple(r) for r in q.spark(spark, SF).collect()]
    b = [tuple(r) for r in q.spark(spark, SF).collect()]
    assert a == b
    assert len(a) == 20
    # ranks are 1..20 and merged symbols grow out of earlier ones
    assert [r[0] for r in sorted(a)] == list(range(1, 21))


def test_trainer_handles_exhausted_vocabulary(spark):
    """Single-char vocabulary has no pairs → zero merges, seed returned
    unchanged (the oracle's empty-CROSS-JOIN cascade twin)."""
    merges, final = _train_on(spark, [("a", 3), ("b", 2)], rounds=5)
    assert merges == []
    assert {r.s for r in final.collect()} == {" a ", " b "}

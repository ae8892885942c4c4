"""MinHash parameterization (VERDICT r2 item 5) and SimHash compound-band
recall (VERDICT r2 item 4) guards."""

import random

import pytest

from mergeextractor_spark.operators.dedup import (
    BAND_SIZE,
    N_HASHES,
    lsh_collision_prob,
    lsh_threshold,
    minhash_pairs,
)

SF = "/root/testdata/sf0.001"


def test_lsh_threshold_formula():
    # t = (1/b)^(1/r), b = n//r
    assert lsh_threshold(6, 2) == pytest.approx((1 / 3) ** 0.5)  # fixture: 0.577
    assert lsh_threshold(128, 13) == pytest.approx((1 / 9) ** (1 / 13))
    assert lsh_threshold(128, 8) == pytest.approx((1 / 16) ** (1 / 8))


def test_lsh_s_curve_is_steep_around_threshold():
    # collision probability must be low well below t and high well above it,
    # and monotone in s — the property that makes banding a filter at all
    for n, r in [(6, 2), (128, 13), (128, 8)]:
        t = lsh_threshold(n, r)
        below = lsh_collision_prob(max(t - 0.3, 0.01), n, r)
        at = lsh_collision_prob(t, n, r)
        above = lsh_collision_prob(min(t + 0.3, 0.99), n, r)
        assert below < at < above
        assert at == pytest.approx(1 - (1 - 1 / (n // r)) ** (n // r), abs=0.02)
    # production shape is a far sharper filter than the fixture default
    assert lsh_collision_prob(0.3, 128, 13) < 1e-4
    assert lsh_collision_prob(0.95, 128, 13) > 0.99


def test_minhash_pairs_accepts_production_parameters(spark):
    # non-default (n, r) must build and run; a tighter S-curve (higher t)
    # can only shrink the candidate set, and exact-Jaccard verification
    # makes every surviving pair correct regardless of banding
    fixture = {tuple(r) for r in minhash_pairs(spark, SF).select("doc_a", "doc_b").collect()}
    tight = {tuple(r) for r in
             minhash_pairs(spark, SF, n_hashes=12, band_size=4)
             .select("doc_a", "doc_b").collect()}
    assert tight <= fixture
    assert lsh_threshold(12, 4) > lsh_threshold(N_HASHES, BAND_SIZE)


def _compound_keys(sig: int):
    """The 16 (band, sub, band_value, sub_value) keys dedup_simhash_neardup
    emits for a 64-bit signature (4 bands of 16 bits; for each band k, the
    other 48 bits split into 4 12-bit sub-blocks)."""
    b = [(sig >> (16 * k)) & 0xFFFF for k in range(4)]
    keys = set()
    for k in range(4):
        others = [o for o in range(4) if o != k]
        rem48 = (b[others[0]] << 32) | (b[others[1]] << 16) | b[others[2]]
        for j in range(4):
            keys.add((k, j, b[k], (rem48 >> (12 * j)) & 0xFFF))
    return keys


def test_simhash_compound_band_recall_is_exact():
    # double pigeonhole: ANY pair of 64-bit signatures within hamming<=3
    # shares at least one compound key — recall of the banded join equals
    # the all-pairs scan by construction, for every flip pattern
    rng = random.Random(7)
    for _ in range(500):
        a = rng.getrandbits(64)
        flips = rng.sample(range(64), rng.randint(0, 3))
        c = a
        for f in flips:
            c ^= 1 << f
        assert _compound_keys(a) & _compound_keys(c), (
            f"hamming-{len(flips)} pair shares no compound key: {a:016x} {c:016x}"
        )


def test_connected_components_survives_long_chains(spark):
    # VERDICT r3 item 6: a path-shaped component with diameter > 64 made
    # plain min-label propagation hit the round cap and raise; pointer
    # doubling must converge in ~log2(diameter) rounds. 300-node path +
    # a disjoint triangle + two isolated-from-each-other extra nodes.
    from pyspark.sql import functions as F

    from mergeextractor_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(1000, 1300)]          # diameter 300
    tri = [(1, 2), (2, 3), (3, 1)]
    pairs = spark.createDataFrame(chain + tri, "src: long, dst: long")
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    labels = connected_components(edges, max_rounds=16).collect()
    got = {r.doc_id: r.component_id for r in labels}
    assert len(got) == 301 + 3
    assert all(got[i] == 1000 for i in range(1000, 1301))
    assert all(got[i] == 1 for i in (1, 2, 3))

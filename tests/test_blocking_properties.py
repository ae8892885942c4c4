"""Property tests for the two blocking constructions r8 ships as
executable code: the banded-Hamming compound keys (both widths) and the
interval-overlap bucket decomposition. Pure-Python mirrors of the
column expressions, so hypothesis can hammer the MATH the operators'
recall/exactly-once claims rest on without spinning Spark per example.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mergeextractor_spark.operators.multimodal import (
    _BAND_OFFSETS,
    _N_BLOCKS,
    PHASH_HAMMING_MAX,
)
from mergeextractor_spark.operators.olap_queries import IVL_BUCKET_SEC

MASK64 = (1 << 64) - 1


def _keys_56(sig: int) -> set[int]:
    """Python mirror of _band_block_entries: tag | band value | block."""
    out = set()
    for k, (off, size) in enumerate(_BAND_OFFSETS):
        band = (sig >> off) & ((1 << size) - 1)
        for j in range(_N_BLOCKS):
            block = (sig >> (8 * j)) & 0xFF
            out.add(((k * _N_BLOCKS + j) << 18) + (band << 8) + block)
    return out


def _keys_196(sig: int) -> set[int]:
    """Python mirror of _band_blockpair_entries."""
    pairs = [(i, j) for i in range(_N_BLOCKS) for j in range(i + 1, _N_BLOCKS)]
    out = set()
    for k, (off, size) in enumerate(_BAND_OFFSETS):
        band = (sig >> off) & ((1 << size) - 1)
        for p, (i, j) in enumerate(pairs):
            bi = (sig >> (8 * i)) & 0xFF
            bj = (sig >> (8 * j)) & 0xFF
            out.add(((k * len(pairs) + p) << 26) + (band << 16) + (bi << 8) + bj)
    return out


@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=0, max_value=MASK64),
    st.sets(st.integers(min_value=0, max_value=63), max_size=PHASH_HAMMING_MAX),
)
def test_pigeonhole_recall_both_widths(sig, flip_positions):
    """ANY pair within hamming <= 6 shares at least one compound key in
    BOTH schemes (the double-pigeonhole recall guarantee), and keys only
    ever match when the underlying (band, block) values match — a shared
    key is never a packing accident."""
    mask = 0
    for pos in flip_positions:
        mask |= 1 << pos
    other = sig ^ mask
    assert _keys_56(sig) & _keys_56(other), (sig, mask)
    assert _keys_196(sig) & _keys_196(other), (sig, mask)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=MASK64),
    st.sets(st.integers(min_value=0, max_value=63), min_size=7, max_size=16),
)
def test_beyond_threshold_flips_may_share_nothing(sig, flip_positions):
    """Sanity direction: the packing never creates a FALSE key match —
    two signatures share a key iff they agree on that key's band AND
    block(s). (Beyond-threshold pairs may still legitimately collide on
    an untouched band+block; this asserts agreement, not disjointness.)"""
    mask = 0
    for pos in flip_positions:
        mask |= 1 << pos
    other = sig ^ mask
    for key in _keys_56(sig) & _keys_56(other):
        tag = key >> 18
        k, j = divmod(tag, _N_BLOCKS)
        off, size = _BAND_OFFSETS[k]
        assert (sig >> off) & ((1 << size) - 1) == (other >> off) & ((1 << size) - 1)
        assert (sig >> (8 * j)) & 0xFF == (other >> (8 * j)) & 0xFF


def _overlap_pairs_naive(a_ivls, b_ivls):
    return {
        (ai, bi)
        for ai, (s1, e1) in enumerate(a_ivls)
        for bi, (s2, e2) in enumerate(b_ivls)
        if s1 <= e2 and s2 <= e1
    }


def _overlap_pairs_bucketed(a_ivls, b_ivls, w=IVL_BUCKET_SEC):
    """Python mirror of join_interval_overlap: register each interval
    under every touched bucket, equi-join on bucket, residual overlap
    predicate, keep only the overlap-start bucket (exactly-once)."""
    from collections import defaultdict

    b_by_bucket = defaultdict(list)
    for bi, (s2, e2) in enumerate(b_ivls):
        for bk in range(s2 // w, e2 // w + 1):
            b_by_bucket[bk].append(bi)
    out = []
    for ai, (s1, e1) in enumerate(a_ivls):
        for bk in range(s1 // w, e1 // w + 1):
            for bi in b_by_bucket[bk]:
                s2, e2 = b_ivls[bi]
                if s1 <= e2 and s2 <= e1 and bk == max(s1, s2) // w:
                    out.append((ai, bi))
    assert len(out) == len(set(out)), "pair emitted more than once"
    return set(out)


_IVL = st.tuples(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=4_000),
).map(lambda t: (t[0], t[0] + t[1]))


@settings(max_examples=300, deadline=None)
@given(st.lists(_IVL, max_size=8), st.lists(_IVL, max_size=8))
def test_interval_bucket_join_exactly_once(a_ivls, b_ivls):
    """The bucket decomposition emits EXACTLY the naive overlap pairs,
    each exactly once, for arbitrary interval sets — including intervals
    spanning many buckets and zero-length intervals."""
    assert _overlap_pairs_bucketed(a_ivls, b_ivls) == _overlap_pairs_naive(
        a_ivls, b_ivls
    )

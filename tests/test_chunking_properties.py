"""Property-based invariants for the recursive chunker (hypothesis)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from mergeextractor_spark.operators.chunking import split_text

text_strategy = st.text(
    alphabet=st.sampled_from(list("abcdef \n.")), min_size=0, max_size=2000
)


@settings(max_examples=150, deadline=None)
@given(text=text_strategy)
def test_chunks_nonempty_and_stripped(text):
    chunks = split_text(text, 100, 25)
    for c in chunks:
        assert c != ""
        assert c == c.strip() or c.strip() == ""  # join_docs strips


@settings(max_examples=150, deadline=None)
@given(text=text_strategy)
def test_chunks_bounded_when_splittable(text):
    chunks = split_text(text, 100, 25)
    for c in chunks:
        # a chunk can only exceed the size if it contains no separator at
        # all (a single unsplittable run) — with "" in the hierarchy even
        # those are char-split, so everything is bounded
        assert len(c) <= 100


@settings(max_examples=100, deadline=None)
@given(text=text_strategy)
def test_content_preserved(text):
    """Every non-whitespace character sequence survives chunking (order
    preserved, overlap may duplicate)."""
    chunks = split_text(text, 100, 25)
    wanted = re.sub(r"\s+", "", text)
    # greedy in-order scan over concatenated chunks
    hay = re.sub(r"\s+", "", "".join(chunks))
    i = 0
    for ch in wanted:
        j = hay.find(ch, i)
        assert j != -1, f"lost char {ch!r}"
        i = j + 1


@settings(max_examples=50, deadline=None)
@given(
    text=st.text(alphabet=st.sampled_from(list("ab \n")), min_size=200, max_size=1500),
    size=st.integers(min_value=20, max_value=200),
)
def test_overlap_le_size(text, size):
    overlap = size // 4
    chunks = split_text(text, size, overlap)
    assert all(len(c) <= size for c in chunks)

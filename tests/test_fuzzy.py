from mergeextractor_spark.functions.fuzzy import fuzz_partial_ratio, fuzz_ratio


def test_ratio_identity():
    assert fuzz_ratio("background of the merger", "background of the merger") == 100.0


def test_ratio_empty():
    assert fuzz_ratio("", "") == 100.0
    assert fuzz_ratio("a", "") == 0.0


def test_ratio_indel_semantics():
    # LCS("abcd","abce")=3 → indel=2 → 100·(1−2/8)=75
    assert fuzz_ratio("abcd", "abce") == 75.0


def test_ratio_header_case():
    # the cascade's >85 gate: near-identical header lines pass
    assert fuzz_ratio("background of the mergers", "background of the merger") > 85


def test_partial_ratio_substring():
    assert fuzz_partial_ratio("abc", "xxabcxx") == 100.0


def test_partial_ratio_entity_case():
    # CIK entity matching gate (>90): company name inside a longer entity
    assert fuzz_partial_ratio("cybear inc", "cybear inc (cik 0001234567)") > 90


# --- bit-parallel LCS equivalence (hypothesis) -----------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from mergeextractor_spark.functions.fuzzy import _lcs_len


def _lcs_dp_reference(a: str, b: str) -> int:
    """Classic two-row DP, kept as the test oracle for the bit-parallel
    implementation."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcdef X.&-", max_size=64),
    st.text(alphabet="abcdef X.&-", max_size=64),
)
def test_bitparallel_lcs_matches_dp(a, b):
    assert _lcs_len(a, b) == _lcs_dp_reference(a, b)


def _partial_ratio_bruteforce(a: str, b: str) -> float:
    """Independent mirror of fuzz_partial_ratio's documented semantics
    (best fuzz.ratio of the shorter string against every same-length
    window of the longer), built on the classic DP LCS rather than the
    bit-parallel scan — pins the optimized implementation including its
    early-exit and mask-reuse paths."""
    if not a or not b:
        return 100.0 if (not a and not b) else 0.0
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    m = len(short)
    best = 0.0
    for start in range(len(long_) - m + 1):
        lcs = _lcs_dp_reference(short, long_[start : start + m])
        best = max(best, 100.0 * (1.0 - (2 * m - 2 * lcs) / (2 * m)))
    return best


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="ab X.&", max_size=24),
    st.text(alphabet="ab X.&", max_size=48),
)
def test_partial_ratio_matches_bruteforce(a, b):
    assert fuzz_partial_ratio(a, b) == _partial_ratio_bruteforce(a, b)

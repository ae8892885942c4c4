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

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

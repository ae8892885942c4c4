"""Fuzzy string similarity (SURVEY §2.8 fuzzy_ratio / fuzzy_partial_ratio).

The reference uses rapidfuzz (``ChunkProcessor.py:69`` fuzz.ratio > 85,
``CrawlerSupport.py:144-147`` fuzz.partial_ratio > 90). rapidfuzz's
``ratio`` is the normalized **indel** similarity (insert/delete only —
equivalently 1 − indel_dist/(len_a+len_b), with indel_dist =
len_a + len_b − 2·LCS); ``partial_ratio`` is the best ``ratio`` over all
substring windows of the longer string. Both are re-implemented here in
pure Python (public algorithm) so they can run inside Arrow-batched
pandas UDFs — the hot relational path uses native ``levenshtein()``
instead (see text_queries.fuzzy_ratio), these exact variants are for the
domain cascade and the fuzzy entity join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _lcs_len(a: str, b: str) -> int:
    """Length of the longest common subsequence, O(len_a·len_b) two-row DP."""
    if not a or not b:
        return 0
    if len(b) > len(a):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def fuzz_ratio(a: str, b: str) -> float:
    """rapidfuzz-compatible fuzz.ratio in [0, 100]."""
    if not a and not b:
        return 100.0
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    indel = total - 2 * _lcs_len(a, b)
    return 100.0 * (1.0 - indel / total)


def fuzz_partial_ratio(a: str, b: str) -> float:
    """rapidfuzz-compatible fuzz.partial_ratio in [0, 100]: best ratio of the
    shorter string against any same-length window of the longer one."""
    if not a or not b:
        return 100.0 if (not a and not b) else 0.0
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    if len(short) == len(long_):
        return fuzz_ratio(short, long_)
    best = 0.0
    for start in range(len(long_) - len(short) + 1):
        window = long_[start : start + len(short)]
        score = fuzz_ratio(short, window)
        if score > best:
            best = score
            if best == 100.0:
                break
    return best


@F.pandas_udf(T.DoubleType())
def fuzz_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([fuzz_ratio(x or "", y or "") for x, y in zip(a, b)])


@F.pandas_udf(T.DoubleType())
def fuzz_partial_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([fuzz_partial_ratio(x or "", y or "") for x, y in zip(a, b)])

"""Rate-limited HTTP acquisition utilities (SURVEY §2.1 source_http_fts /
source_http_doc, §4 O8; ref CrawlerSupport.py:116-132, Processor.py:66-93,
TokenBucket.py:3-31).

Strictly an ingestion utility, never a relational operator (SURVEY §7.4
risk 6): the correctness suite reads the documents fixture and never
touches the network. The fetch stage is ``mapInPandas`` over a URL
DataFrame — each partition holds a token bucket whose rate is the global
budget divided by the number of partitions, which is how a cross-process
limiter (the reference's multiprocessing.Manager bucket) translates to
executors that share no memory. Use ``df.coalesce(n)`` on the URL frame
to bound concurrency (the reference's batch_size).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class TokenBucket:
    """Per-partition token bucket (ref TokenBucket.py:10-31): refill
    ``rate`` tokens/sec up to ``capacity``; wait() blocks until a token
    is available."""

    def __init__(self, rate: float, capacity: float | None = None):
        self.rate = rate
        # capacity must admit at least ONE whole token: with capacity =
        # rate < 1 (a sub-1/sec global rate split across partitions),
        # wait() caps tokens below 1 and can never hand one out — every
        # task would spin forever (caught in round-5 review).
        self.capacity = max(capacity if capacity is not None else rate, 1.0)
        self.tokens = self.capacity
        self.last = time.monotonic()

    def wait(self) -> None:
        while True:
            now = time.monotonic()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1:
                self.tokens -= 1
                return
            time.sleep((1 - self.tokens) / self.rate)


FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("body", T.StringType()),
    ]
)


def fetch_stage(
    urls: DataFrame,
    global_rate: float = 5.0,
    url_col: str = "url",
    timeout: float = 10.0,
    fetcher=None,
    n_partitions: int | None = None,
) -> DataFrame:
    """URL DataFrame → (url, status, body). ``fetcher(url) -> (status,
    body)`` is injectable for tests; the default uses urllib and is only
    exercised when explicitly pointed at a live endpoint.

    ``n_partitions`` divides the global rate limit among concurrent
    tasks. When omitted it falls back to the session's default
    parallelism — deliberately NOT ``urls.rdd.getNumPartitions()``, which
    silently converts the frame to an RDD (deoptimizing the plan) just to
    read a number the caller usually knows."""
    if n_partitions is None:
        n_partitions = urls.sparkSession.sparkContext.defaultParallelism
    per_partition_rate = max(global_rate / max(n_partitions, 1), 0.1)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(per_partition_rate)
        fetch = fetcher
        if fetch is None:

            def fetch(url: str):
                import urllib.request

                try:
                    with urllib.request.urlopen(url, timeout=timeout) as resp:
                        return resp.status, resp.read().decode("utf-8", "replace")
                except Exception as exc:  # noqa: BLE001 — status-coded failure row
                    return -1, str(exc)

        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                bucket.wait()
                status, body = fetch(url)
                rows.append({"url": url, "status": status, "body": body})
            yield pd.DataFrame(rows, columns=["url", "status", "body"])

    return urls.select(url_col).mapInPandas(_run, FETCH_SCHEMA)


def edgar_fts_params(company: str, date_lb: str, date_ub: str, forms: list[str]) -> str:
    """EDGAR full-text-search query string (ref CrawlerSupport.py:116-118;
    O1: pushdown-by-construction — the predicate is precomputed into the
    request instead of post-filtered)."""
    q = company.replace(" ", "%20")
    forms_param = "%2C".join(forms)
    return (
        "https://efts.sec.gov/LATEST/search-index?q=%22" + q + "%22"
        f"&dateRange=custom&startdt={date_lb}&enddt={date_ub}&forms={forms_param}"
    )

"""Spark 4 Python DataSource for paged full-text-search ingestion
(SURVEY §2.1 source_http_fts surface; ref CrawlerSupport.py:116-132).

Where ``fetch_stage`` (http.py) maps URLs that already sit in a
DataFrame, this source makes the PAGINATION itself the table:
``spark.read.format("fts_pages")`` plans one input partition per page
slice, so a crawl of N result pages fans out across the cluster with no
driver-side loop, and Spark's scheduler owns retries/locality exactly as
it does for files. Each partition throttles with the same per-partition
token-bucket discipline as fetch_stage (global rate ÷ partitions).

Hermetic by default: the built-in fetcher synthesizes deterministic
result rows (seeded by page) so no test touches the network — a real
deployment passes ``fetcher`` = "module:function" resolving to
``fn(query, page, page_size) -> list[dict]`` (the EDGAR FTS JSON shape),
loaded lazily ON THE EXECUTOR, mirroring the injectable-fetcher seam of
http.fetch_stage.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .http import TokenBucket

FTS_PAGES_SCHEMA = "page BIGINT, idx BIGINT, doc_url STRING, title STRING, snippet STRING"


def synthetic_fetch_page(query: str, page: int, page_size: int) -> list[dict]:
    """Deterministic stand-in for the FTS endpoint: row content is a pure
    function of (query, page, idx), so reads are reproducible across
    partitions, retries, and sessions."""
    out = []
    for idx in range(page_size):
        h = hashlib.md5(f"{query}|{page}|{idx}".encode()).hexdigest()
        out.append(
            {
                "doc_url": f"https://example.test/filings/{h[:12]}.htm",
                "title": f"filing {h[:8]}",
                "snippet": f"... {query} excerpt {h[8:16]} ...",
            }
        )
    return out


def _load_fetcher(spec: str | None):
    if not spec:
        return synthetic_fetch_page
    mod_name, _, fn_name = spec.partition(":")
    import importlib

    return getattr(importlib.import_module(mod_name), fn_name or "fetch_page")


class PageSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class FtsPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.pages = int(options.get("pages", "8"))
        self.page_size = int(options.get("pagesize", "25"))
        self.query = options.get("query", "background of the merger")
        self.rate = float(options.get("rate", "5.0"))
        self.slices = max(1, int(options.get("slices", "4")))
        self.fetcher_spec = options.get("fetcher")

    def partitions(self):
        per = max(1, math.ceil(self.pages / self.slices))
        return [
            PageSlice(s, min(s + per, self.pages)) for s in range(0, self.pages, per)
        ]

    def read(self, partition: PageSlice):
        # Runs on the executor: lazy fetcher resolution + per-partition
        # token bucket at the global rate divided across slices (the same
        # translation of a cross-process limiter as http.fetch_stage).
        bucket = TokenBucket(max(self.rate / len(self.partitions()), 0.1))
        fetch = _load_fetcher(self.fetcher_spec)
        for page in range(partition.start, partition.end):
            bucket.wait()
            for idx, row in enumerate(fetch(self.query, page, self.page_size)):
                yield (page, idx, row["doc_url"], row["title"], row["snippet"])


class FtsPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fts_pages"

    def schema(self) -> str:
        return FTS_PAGES_SCHEMA

    def reader(self, schema) -> FtsPagesReader:
        return FtsPagesReader(self.options)


def register_fts_datasource(spark) -> None:
    """Idempotently register the ``fts_pages`` format on the session."""
    spark.dataSource.register(FtsPagesDataSource)

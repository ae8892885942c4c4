import time

from mergeextractor_spark.sources.http import TokenBucket, edgar_fts_params, fetch_stage


def test_token_bucket_rate():
    bucket = TokenBucket(rate=50.0, capacity=1.0)
    t0 = time.monotonic()
    for _ in range(6):
        bucket.wait()
    elapsed = time.monotonic() - t0
    # 6 requests at 50/s with capacity 1 → ≥ ~0.1s (5 refills)
    assert elapsed >= 0.08


def test_fetch_stage_injected_fetcher(spark):
    urls = spark.createDataFrame([(f"https://example.invalid/{i}",) for i in range(5)], "url string")

    def fake(url):
        return 200, f"body-of-{url.rsplit('/', 1)[-1]}"

    out = fetch_stage(urls, global_rate=1000.0, fetcher=fake).collect()
    assert len(out) == 5
    assert all(r.status == 200 for r in out)
    assert {r.body for r in out} == {f"body-of-{i}" for i in range(5)}


def test_fetch_stage_failure_rows(spark):
    urls = spark.createDataFrame([("https://example.invalid/x",)], "url string")

    def boom(url):
        raise RuntimeError("nope")

    # fetcher exceptions inside mapInPandas would kill the task; the
    # contract is that fetchers return coded failures instead — mirror the
    # default fetcher's behavior with a wrapping fake
    def coded(url):
        try:
            return boom(url)
        except Exception as exc:
            return -1, str(exc)

    out = fetch_stage(urls, global_rate=1000.0, fetcher=coded).collect()
    assert out[0].status == -1 and "nope" in out[0].body


def test_edgar_params_pushdown_by_construction():
    url = edgar_fts_params("CyBear Inc", "2001-06-01", "2002-02-01", ["PREM14A", "S-4"])
    assert "CyBear%20Inc" in url
    assert "startdt=2001-06-01" in url and "enddt=2002-02-01" in url
    assert "forms=PREM14A%2CS-4" in url


def test_fts_pages_datasource(spark):
    """The Spark 4 Python DataSource plans one input partition per page
    slice, reads deterministically, and honors the injectable-fetcher
    option contract."""
    from mergeextractor_spark.sources.fts_datasource import (
        FtsPagesReader,
        register_fts_datasource,
        synthetic_fetch_page,
    )

    register_fts_datasource(spark)
    df = (
        spark.read.format("fts_pages")
        .option("pages", "6").option("pagesize", "20").option("slices", "3")
        .option("rate", "1000").option("query", "merger")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one per page slice
    rows = df.collect()
    assert len(rows) == 6 * 20
    # deterministic content: row (page, idx) matches the synthetic fetcher
    want = synthetic_fetch_page("merger", 3, 20)[7]
    got = [r for r in rows if r.page == 3 and r.idx == 7][0]
    assert got.doc_url == want["doc_url"] and got.title == want["title"]
    # re-registration is idempotent; reads are stable across plans
    register_fts_datasource(spark)
    assert df.count() == 120

    # partition math covers ragged tails
    r = FtsPagesReader({"pages": "7", "slices": "3"})
    parts = r.partitions()
    assert [(p.start, p.end) for p in parts] == [(0, 3), (3, 6), (6, 7)]


def test_token_bucket_sub_unit_rate_terminates(monkeypatch):
    """A per-partition rate below 1/sec (a small global budget split
    across many partitions) must still hand out tokens: capacity clamps
    to >= 1 so wait() terminates (round-5 review — capacity=rate<1 could
    never accumulate a full token and spun forever). Fake clock: no real
    sleeping."""
    import mergeextractor_spark.sources.http as http

    clock = {"t": 0.0}
    monkeypatch.setattr(http.time, "monotonic", lambda: clock["t"])
    monkeypatch.setattr(
        http.time, "sleep", lambda s: clock.__setitem__("t", clock["t"] + s)
    )
    bucket = http.TokenBucket(rate=0.25)
    assert bucket.capacity >= 1.0
    for _ in range(3):  # three sequential acquisitions, each terminates
        bucket.wait()
    # total simulated wait for 2 post-burst tokens at 0.25/s is ~8s
    assert clock["t"] >= 7.0

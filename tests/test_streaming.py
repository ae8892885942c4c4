import pytest
from mergeextractor_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_result(spark):
    events = read_events_stream(spark, SF)
    agg = tumbling_counts(events)
    return run_available_now(agg, "stream_counts")


def test_streaming_matches_batch_twin(spark, stream_result):
    from mergeextractor_spark.operators.streaming_queries import events_tumbling_counts

    batch = events_tumbling_counts(spark, SF)
    s = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 4))
        for r in stream_result.collect()
    }
    b = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 4))
        for r in batch.collect()
    }
    assert s == b


def test_streaming_is_streaming(spark):
    events = read_events_stream(spark, SF)
    assert events.isStreaming
    assert tumbling_counts(events).isStreaming


def test_sliding_stream_matches_batch_twin(spark):
    from mergeextractor_spark.operators.streaming_queries import events_sliding_counts
    from mergeextractor_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        sliding_counts,
    )

    events = read_events_stream(spark, SF)
    got = run_available_now(sliding_counts(events), "stream_sliding")
    s = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 4))
        for r in got.collect()
    }
    b = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 4))
        for r in events_sliding_counts(spark, SF).collect()
    }
    assert s == b


def test_stream_static_join_matches_batch_twin(spark):
    from pyspark.sql import functions as F

    from mergeextractor_spark.operators.streaming_queries import join_stream_static
    from mergeextractor_spark.sources.fixtures import table
    from mergeextractor_spark.streaming.events import (
        enrich_with_static,
        read_events_stream,
        run_available_now,
    )

    dim = (
        table(spark, SF, "events")
        .select("event_type", F.substring(F.md5("event_type"), 1, 4).alias("type_code"))
        .distinct()
    )
    stream = enrich_with_static(read_events_stream(spark, SF), dim)
    assert stream.isStreaming
    got = run_available_now(stream, "stream_enriched", output_mode="append")
    s = {(r.event_id, r.type_code) for r in got.collect()}
    b = {(r.event_id, r.type_code) for r in join_stream_static(spark, SF).collect()}
    assert s == b


def test_stream_upsert_foreachbatch(spark, tmp_path):
    """foreachBatch + merge_kv_store: the streamed events land in the
    bucketed store with MERGE semantics (latest write per key wins,
    store readable mid-pipeline)."""
    from pyspark.sql import functions as F

    from mergeextractor_spark.streaming.events import (
        read_events_stream,
        stream_upsert_to_kv,
    )

    path = str(tmp_path / "kvstream")
    events = read_events_stream(spark, SF).select(
        F.col("event_id").alias("main_index"), "event_type", "value"
    )
    q = stream_upsert_to_kv(
        events, path, key="main_index", checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    back = spark.read.parquet(path)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert back.count() == n_events  # every event upserted exactly once
    assert back.select("main_index").distinct().count() == n_events

    # a second run over the same input must be idempotent (MERGE, not append)
    q2 = stream_upsert_to_kv(
        events, path, key="main_index", checkpoint=str(tmp_path / "ckpt2")
    )
    q2.awaitTermination()
    assert spark.read.parquet(path).count() == n_events


def test_stream_stream_join_matches_batch_twin(spark):
    """Watermarked stream-stream interval join (append mode) must emit
    exactly the batch twin's attribution pairs — availableNow drains the
    fixture, and every event is within the watermark horizon of the final
    batch, so nothing is dropped as late."""
    from mergeextractor_spark.operators.streaming_queries import join_stream_stream
    from mergeextractor_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        stream_stream_attribution,
    )

    events = read_events_stream(spark, SF)
    joined = stream_stream_attribution(events)
    assert joined.isStreaming
    got = run_available_now(joined, "stream_stream_attr", output_mode="append")
    s = {(r.purchase_id, r.click_id): r.gap_sec for r in got.collect()}
    b = {
        (r.purchase_id, r.click_id): r.gap_sec
        for r in join_stream_stream(spark, SF).collect()
    }
    assert s == b


def test_dedup_within_watermark_matches_batch_keys(spark):
    """Native dropDuplicatesWithinWatermark: one row per key over the
    bounded fixture run, with exactly the batch-distinct key set."""
    from mergeextractor_spark.streaming.events import (
        dedup_within_watermark,
        read_events_stream,
        run_available_now,
    )
    from mergeextractor_spark.sources.fixtures import table

    events = read_events_stream(spark, SF)
    got = run_available_now(
        dedup_within_watermark(events), "stream_dd_wm", output_mode="append"
    )
    rows = got.collect()
    keys = [(r.user_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))  # one survivor per key
    batch_keys = {
        (r.user_id, r.event_type)
        for r in table(spark, SF, "events").select("user_id", "event_type").distinct().collect()
    }
    assert set(keys) == batch_keys


def test_session_window_stream_matches_batch_sessions(spark):
    """Native session_window streaming aggregation must produce the same
    (user, session_start, n_events) triples as the batch lag+cumsum
    twin — the two formulations define the same gap semantics. The
    session_window end is start-of-last-event + gap (not max event time),
    so only starts and counts are compared."""
    from mergeextractor_spark.operators.streaming_queries import events_session_stats
    from mergeextractor_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        session_stats,
    )

    events = read_events_stream(spark, SF)
    got = run_available_now(session_stats(events), "stream_sessions")
    s = {(r.user_id, r.session_start): r.n_events for r in got.collect()}
    b = {
        (r.user_id, r.session_start): r.n_events
        for r in events_session_stats(spark, SF).collect()
    }
    assert s == b


def test_hll_daily_union_bounds_error(spark):
    """DataSketches HLL: per-day estimates and the re-unioned total must
    sit within 5% of exact distinct counts (tighter than the registered
    query's 25% hashable bound), and the union row must cover every day
    (sketches are additive — the 100 TB rollup property). The sketches
    are rebuilt inline here because the registered query now emits the
    bounded-error contract shape (day, n_exact, within_bound)."""
    from mergeextractor_spark.registry import load_all
    import pyspark.sql.functions as F
    from mergeextractor_spark.sources.fixtures import table

    sf = "/root/testdata/sf0.001"
    e = table(spark, sf, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    got = {
        r.day: r.est
        for r in daily.select(
            "day", F.hll_sketch_estimate("sk").cast("bigint").alias("est")
        ).collect()
    }
    got[None] = (
        daily.agg(F.hll_union_agg("sk").alias("u"))
        .select(F.hll_sketch_estimate("u").cast("bigint").alias("est"))
        .collect()[0]
        .est
    )
    exact_daily = {
        r.day: r.n
        for r in e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_total = e.select("user_id").distinct().count()
    assert set(got) == set(exact_daily) | {None}
    for day, n in exact_daily.items():
        assert abs(got[day] - n) <= max(0.05 * n, 2), (day, got[day], n)
    assert abs(got[None] - exact_total) <= max(0.05 * exact_total, 2)

    # and the registered bounded-error contract shape holds end-to-end:
    # one row per day plus the NULL-day union row, every row in bound
    rows = load_all()["agg_hll_daily_union"].spark(spark, sf).collect()
    assert len(rows) == len(exact_daily) + 1
    assert all(r.within_bound for r in rows)
    total_row = [r for r in rows if r.day is None]
    assert len(total_row) == 1 and total_row[0].n_exact == exact_total


def test_checkpoint_makes_restarts_incremental(spark, tmp_path):
    """Exactly-once across restarts: a second availableNow run sharing the
    first run's checkpointLocation must process ONLY files that arrived
    after the first run — no reprocessing, no duplicates. This is the
    recovery contract a production ingest relies on (the memory-sink
    harness elsewhere cannot show it; the file sink + checkpoint pair
    does)."""
    import shutil

    from mergeextractor_spark.sources.fixtures import table

    ev = table(spark, SF, "events").select("event_id", "user_id", "event_type")
    landing = tmp_path / "landing"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()

    def drop_file(df, name):
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(part, landing / f"{name}.parquet")

    a = ev.filter("event_id < 400")
    b = ev.filter("event_id >= 400")
    drop_file(a, "a")

    schema = spark.read.parquet(str(landing)).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(str(landing))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_a = spark.read.parquet(str(out)).count()
    assert n_a == a.count()

    drop_file(b, "b")
    run_once()  # same checkpoint -> only file b is new
    final = spark.read.parquet(str(out))
    assert final.count() == a.count() + b.count()
    # no duplicates: every event_id appears exactly once
    assert final.select("event_id").distinct().count() == final.count()


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """Late-data semantics: after batch 1 advances the event-time
    watermark, a batch-2 row older than (max event time − watermark) must
    be DROPPED from the aggregation, while an in-horizon batch-2 row is
    counted. Needs two triggered runs over a checkpoint — within a single
    availableNow batch the watermark starts at -inf and nothing is late."""
    import shutil

    landing = tmp_path / "landing"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()

    def drop_file(rows, name):
        df = spark.createDataFrame(rows, "ts timestamp, k string")
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(part, landing / f"{name}.parquet")

    import datetime as dt

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    drop_file([(m(0), "early"), (m(60), "head")], "a")

    from pyspark.sql import functions as F

    captured = []

    def run_once():
        schema = spark.read.parquet(str(landing)).schema
        agg = (
            spark.readStream.schema(schema)
            .parquet(str(landing))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"), F.col("k"))
            .count()
        )
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: captured.extend(df.collect()))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # watermark advances to max(ts) - 10 min = t0 + 50 min
    keys_b1 = {r.k for r in captured}
    assert keys_b1 == {"early", "head"}

    captured.clear()
    # batch 2: one row 30 min BEHIND the watermark (late -> dropped), one
    # in-horizon row
    drop_file([(m(20), "late"), (m(61), "fresh")], "b")
    run_once()
    keys_b2 = {r.k for r in captured}
    assert "fresh" in keys_b2
    assert "late" not in keys_b2, "row behind the watermark leaked into state"

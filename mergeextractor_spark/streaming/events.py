"""Structured Streaming over the events table (SURVEY §2.9 — an extension,
not reference parity: the reference is batch with resume-by-anti-join).

The batch twins in operators/streaming_queries.py are the oracle-checked
semantics; these jobs run the same logical plans as micro-batches with
watermarked state. Tests drive them with ``availableNow`` over the parquet
fixture and compare against the batch twin.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos (nanosAsLong read)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (nanos ts → timestamp, same exact
    integer conversion as the batch loader). The file-stream source needs a
    directory; the fixture is a single file, so it is symlinked into a
    scratch dir (a real deployment points at the landing directory)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isfile(src):
        stream_dir = os.path.join(
            tempfile.gettempdir(), f"events_stream_{abs(hash(sf_dir))}"
        )
        os.makedirs(stream_dir, exist_ok=True)
        link = os.path.join(stream_dir, "events.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
        src = stream_dir
    raw = spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(src)
    # Same shared ns-or-us normalization (and documented supported range)
    # as the batch loader — one definition, no drift (ADVICE r4).
    from ..sources.fixtures import normalize_ns_or_us_ts

    return raw.withColumn("ts", normalize_ns_or_us_ts("ts"))


def tumbling_counts(events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the streaming
    form of events_tumbling_counts. Late rows beyond the watermark are
    dropped; state is bounded by watermark horizon × window count."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str | None = None
) -> DataFrame:
    """Drive a streaming plan to completion over the currently-available
    input (availableNow trigger + memory sink) and return the result as a
    batch DataFrame. This is the local-test harness; production would use
    a real sink + checkpointLocation. ``output_mode`` defaults to
    "complete" (right for aggregations); stateless plans (projections,
    stream-static joins) must pass "append"."""
    if output_mode is None:
        output_mode = "complete" if stream_df.isStreaming else "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding-window counts (window > slide → each event lands
    in window/slide overlapping windows). Streaming form of
    events_sliding_counts; state is bounded by watermark horizon × number
    of open windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def enrich_with_static(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static broadcast join: the canonical enrichment pattern (a
    streaming fact joined to a slowly-changing dimension read as a batch
    frame). No watermark needed — the static side is re-read per
    micro-batch and broadcast."""
    return events.join(F.broadcast(dim), "event_type").select(
        "event_id", "event_type", "type_code"
    )


def stream_upsert_to_kv(
    events: DataFrame, path: str, key: str = "event_id", checkpoint: str | None = None
):
    """Streaming upsert sink: every micro-batch MERGEs into the bucketed
    parquet store via foreachBatch + merge_kv_store — the production
    pattern for maintaining current state from a change stream without a
    lakehouse format. Returns the started StreamingQuery (availableNow)."""
    from ..sources.sinks import merge_kv_store

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_kv_store(batch_df.sparkSession, batch_df, path, key=key)

    writer = (
        events.writeStream.foreachBatch(_merge)
        .trigger(availableNow=True)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def stream_stream_attribution(
    events: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: every purchase matched to
    the clicks by the same user in the preceding ``horizon`` — the
    canonical attribution shape. Both sides carry a watermark and the join
    condition bounds event time on both sides, so each side's state store
    evicts rows older than watermark + horizon (bounded state, the
    requirement for an unbounded run). Append-mode output; results are
    identical to the batch twin ``join_stream_stream`` (pytest-asserted)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return clicks.join(purchases, cond).select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("gap_sec"),
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Native streaming dedup: first event per key, with state bounded by
    the watermark (Spark 3.5+ ``dropDuplicatesWithinWatermark``). The
    engine evicts a key's dedup state once the watermark passes it, so an
    unbounded stream holds only the watermark horizon's keys — the
    managed-state alternative to the applyInPandasWithState first-seen
    operator in streaming/stateful.py (which keeps custom per-key
    payloads; this one is the right tool when "seen within horizon" is
    the whole requirement)."""
    keys = keys or ["user_id", "event_type"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def session_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session-window aggregation: Spark merges events within
    ``gap`` of each other into one growing window per user, emitting the
    closed session once the watermark passes its end — bounded state, the
    streaming form of events_session_stats' lag+cumsum batch shape
    (boundary equivalence pytest-asserted)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
            "n_events",
        )
    )

"""Native session_window streaming aggregation (the production form of
events_sessionize's lag+cumsum batch shape)."""

from pyspark.sql import functions as F

from mergeextractor_spark.streaming.events import read_events_stream

SF = "/root/testdata/sf0.001"


def test_session_window_stream_counts(spark):
    events = read_events_stream(spark, SF)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n"))
        .select("user_id", "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT user_id, sum(n) AS total FROM sess_out GROUP BY user_id")
    got_map = {r.user_id: r.total for r in got.collect()}

    # every event lands in exactly one session → totals match raw counts
    from mergeextractor_spark.sources.fixtures import table

    expect = {
        r.user_id: r.cnt
        for r in table(spark, SF, "events").groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert got_map == expect

    # session count per user equals the batch sessionize twin's n_sessions
    from mergeextractor_spark.operators.streaming_queries import events_sessionize

    batch = {r.user_id: r.n_sessions for r in events_sessionize(spark, SF).collect()}
    sessions = spark.sql("SELECT user_id, count(*) AS s FROM sess_out GROUP BY user_id")
    stream_sessions = {r.user_id: r.s for r in sessions.collect()}
    assert stream_sessions == batch

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

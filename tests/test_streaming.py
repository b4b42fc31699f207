"""Batch/stream parity: the streaming tumbling window over the events
parquet (availableNow backfill) must produce exactly the batch t01
result, and streaming dedup must keep one row per key."""

from __future__ import annotations

from big_data_bowl_spark.queries.temporal import t01_tumbling_window
from big_data_bowl_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    streaming_dedup,
    tumbling_counts,
)


def canon(rows):
    return sorted(
        (r.window_start, r.window_end, r.event_type, r.n_events, r.sum_value)
        for r in rows
    )


def test_stream_matches_batch_tumbling(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    # complete mode: windowed agg on a bounded backlog emits final rows
    run_to_memory(
        tumbling_counts(stream), "stream_tumbling", output_mode="complete"
    )
    got = canon(spark.table("stream_tumbling").collect())
    want = canon(t01_tumbling_window(spark, sf_dir).collect())
    assert got == want


def test_streaming_dedup_unique_keys(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    deduped = streaming_dedup(stream, keys=["user_id"])
    run_to_memory(deduped, "stream_dedup", output_mode="append")
    rows = spark.table("stream_dedup").collect()
    user_ids = [r.user_id for r in rows]
    assert len(user_ids) == len(set(user_ids))
    assert len(user_ids) > 0


def test_stream_matches_batch_sliding(spark, sf_dir):
    from big_data_bowl_spark.queries.temporal import t02_sliding_window
    from big_data_bowl_spark.streaming.windows import sliding_sums

    stream = read_events_stream(spark, sf_dir)
    run_to_memory(
        sliding_sums(stream), "stream_sliding", output_mode="complete"
    )
    canon2 = lambda rows: sorted(  # noqa: E731
        (r.window_start, r.window_end, r.n_events, r.sum_value)
        for r in rows
    )
    got = canon2(spark.table("stream_sliding").collect())
    want = canon2(t02_sliding_window(spark, sf_dir).collect())
    assert got == want
    # every event lands in exactly 2 sliding buckets
    n_events = sum(n for _ws, _we, n, _s in want)
    from big_data_bowl_spark.sources.io import load_table
    assert n_events == 2 * load_table(spark, sf_dir, "events").count()

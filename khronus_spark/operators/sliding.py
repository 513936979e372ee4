"""Sliding-window event analytics — one builder for batch AND streaming.

`F.window(ts, dur, slide)` produces the identical logical shape in both
modes (each event replicated into dur/slide windows, then one hash
aggregation), so the same builder serves the batch registry entry and
the Structured Streaming job; the streaming caller only inserts
`withWatermark` between frame and aggregation
(`tests/test_streaming.py::test_streaming_sliding_counts_match_batch`).

One deliberate difference: exact `count_distinct` is not allowed in
streaming append mode (its partial state is unbounded), so the builder
takes `with_users=False` for streams — the scale path for streaming
distincts is the mergeable sketch (`operators/sketches.py`,
`approx_count_distinct`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_event_frame(events: DataFrame) -> DataFrame:
    """events with epoch-ns `ts` → (event_ts timestamp, user_id, value)."""
    ts = F.timestamp_micros(F.call_function("div", F.col("ts"), F.lit(1000)))
    return events.select(ts.alias("event_ts"), "user_id", "value")


def sliding_event_counts(frame: DataFrame, with_users: bool = True) -> DataFrame:
    """10-minute windows every 5 minutes over a frame from
    ``sliding_event_frame`` (optionally watermarked for streaming)."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if with_users:
        aggs.append(F.count_distinct("user_id").alias("n_users"))
    aggs.append(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value")
    )
    w = F.window(F.col("event_ts"), "10 minutes", "5 minutes")
    out = frame.groupBy(w.alias("w")).agg(*aggs)
    cols = [F.unix_millis(F.col("w.start")).alias("win_start_ms"), "n_events"]
    if with_users:
        cols.append("n_users")
    cols.append("total_value")
    return out.select(*cols)

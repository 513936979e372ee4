"""Streaming threshold alerting: `operators/alerts.py`'s state
machine carried across micro-batches — the live face of the
Kapacitor-shape alert rule, running on the SAME pure fold
(`fold_alerts`) so the two faces cannot drift.

State per metric is three scalars (last bucket ts, alert flag, breach
counter) — bounded regardless of stream length; the shuffle is the
same metric-key exchange the batch fold uses. Ordering contract (the
streaming_ewma/zscore contract verbatim): buckets must arrive
per-metric in non-decreasing ts order across micro-batches; within a
batch rows sort first, and a row at-or-behind the per-metric
high-water mark is DROPPED — its state effect was already consumed
(replays change nothing: the stream==batch + replay tests pin both).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from khronus_spark.operators.alerts import OK, fold_alerts

STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("alert", LongType()),
        StructField("consec", LongType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("ts_ms", LongType()),
        StructField("from_state", StringType()),
        StructField("to_state", StringType()),
        StructField("value", LongType()),
    ]
)


def streaming_threshold_alerts(
    stream: DataFrame,
    enter: int,
    exit_below: int,
    min_breach: int = 1,
) -> DataFrame:
    """Input stream columns: (metric string, ts_ms long, value long) —
    a bucket-summary stream (one row per metric per bucket); output:
    transition events, exactly the batch face's shape."""
    if exit_below > enter:
        raise ValueError(
            f"exit_below={exit_below} must be <= enter={enter}"
        )
    if min_breach < 1:
        raise ValueError("min_breach must be >= 1")

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            last_ts, alert, consec = state.get
        else:
            last_ts, alert, consec = -(1 << 62), OK, 0
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "ts_ms", kind="mergesort"
        )
        # advance the high-water mark PER ROW, not once per batch: an
        # at-least-once redelivery can land both copies of a bucket in
        # the SAME micro-batch, and a batch-scoped filter would fold
        # the duplicate — double-incrementing consec, so whether a
        # spurious ALERT fires depends on batch chunking (r13 review;
        # the ewma/zscore siblings always dropped per-row)
        fresh = []
        mark = last_ts
        for t, v in zip(
            rows["ts_ms"].astype("int64"), rows["value"].astype("int64")
        ):
            t = int(t)
            if t > mark:  # at-or-behind the high-water mark: drop
                fresh.append((t, int(v)))
                mark = t
        events, alert, consec = fold_alerts(
            fresh, int(alert), int(consec), enter, exit_below, min_breach
        )
        last_ts = mark
        state.update((last_ts, int(alert), int(consec)))
        if events:
            frame = pd.DataFrame(
                events, columns=["ts_ms", "from_state", "to_state", "value"]
            )
            frame.insert(0, "metric", key[0])
            yield frame

    return stream.groupBy("metric").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_alerts(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    enter: int,
    exit_below: int,
    min_breach: int = 1,
):
    """Drive the streaming alerter with an availableNow trigger into a
    parquet sink (idempotent via checkpoint — T5)."""
    events = streaming_threshold_alerts(stream, enter, exit_below, min_breach)
    return (
        events.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )

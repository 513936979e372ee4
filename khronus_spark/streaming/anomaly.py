"""Streaming rolling 3σ anomaly detection: the batch entry
`events_anomaly_zscore`'s trailing-window inequality carried across
micro-batches.

The batch operator evaluates, per metric, a trailing `window`-event
frame (n, Σx, Σx²) and flags |z| > σ via the integer inequality
(n·x − Σx)² > σ²·(n·Σx² − (Σx)²) with an n ≥ min_n warm-up. The
streaming twin keeps the last `window − 1` values per metric as a ring
in the state store (bounded: 99 longs + the high-water order key) and
evaluates each arriving event against exactly the same frame —
flagged rows are emitted bit-identical to the batch operator over the
full history (pinned by the stream==batch test).

Ordering contract (the streaming_ewma contract verbatim): events must
arrive per-metric in non-decreasing (ts, event_id) order across
micro-batches; within a batch rows are sorted first, and a row
at-or-behind the per-metric high-water mark is DROPPED — its trailing
window was already consumed by later emissions (replays change
nothing).

Scale notes: state per metric is ≤ window longs — bounded regardless
of stream length; the shuffle is the same metric-key hash exchange the
batch window uses, without the batch's per-partition sort over
history. NoTimeout: dormant metrics hold a ≤ 800-byte row.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("last_eid", LongType()),
        StructField("ring", ArrayType(LongType())),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("metric", StringType()),
        StructField("ts_ms", LongType()),
        StructField("value", LongType()),
        StructField("win_n", LongType()),
    ]
)


def streaming_zscore_anomalies(
    stream: DataFrame,
    window: int = 100,
    min_n: int = 20,
    sigma: int = 3,
) -> DataFrame:
    """Input stream columns: (metric string, ts_ns long, event_id long,
    x long); output: the flagged rows (event_id, metric, ts_ms, value,
    win_n), exactly the batch entry's shape."""
    if window < 2 or min_n < 1 or sigma < 1:
        raise ValueError("need window >= 2, min_n >= 1, sigma >= 1")
    sig2 = sigma * sigma

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            last_ts, last_eid, ring_list = state.get
            ring = deque(ring_list, maxlen=window - 1)
        else:
            last_ts, last_eid = -(1 << 62), -(1 << 62)
            ring = deque(maxlen=window - 1)
        rs = sum(ring)
        rq = sum(v * v for v in ring)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts_ns", "event_id"], kind="mergesort"
        )
        out = {k: [] for k in ("event_id", "ts_ms", "value", "win_n")}
        for ts, eid, x in zip(
            rows["ts_ns"].astype("int64"),
            rows["event_id"].astype("int64"),
            rows["x"].astype("int64"),
        ):
            ts, eid, x = int(ts), int(eid), int(x)
            if (ts, eid) <= (last_ts, last_eid):
                continue  # at-or-behind the high-water mark (contract)
            n = len(ring) + 1
            s = rs + x
            q = rq + x * x
            if n >= min_n and (n * x - s) ** 2 > sig2 * (n * q - s * s):
                out["event_id"].append(eid)
                # Spark `div` truncates toward ZERO; Python // floors.
                # They agree for ts >= 0 but differ on pre-1970
                # timestamps, which would break the pinned stream==batch
                # bit-identity — so match div explicitly.
                out["ts_ms"].append(
                    ts // 1_000_000 if ts >= 0 else -((-ts) // 1_000_000)
                )
                out["value"].append(x)
                out["win_n"].append(n)
            if len(ring) == window - 1:
                old = ring[0]
                rs -= old
                rq -= old * old
            ring.append(x)
            rs += x
            rq += x * x
            last_ts, last_eid = ts, eid
        state.update((last_ts, last_eid, list(ring)))
        if out["event_id"]:
            frame = pd.DataFrame(out)
            frame.insert(1, "metric", key[0])
            yield frame

    return stream.groupBy("metric").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_zscore(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    window: int = 100,
    min_n: int = 20,
    sigma: int = 3,
):
    """Drive the streaming detector with an availableNow trigger into a
    parquet sink (idempotent via checkpoint — T5)."""
    flagged = streaming_zscore_anomalies(stream, window, min_n, sigma)
    return (
        flagged.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )

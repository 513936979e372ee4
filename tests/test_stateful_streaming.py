"""Custom stateful streaming operator (applyInPandasWithState): per-
(metric, bucket) histogram state across micro-batches, finalized by
event-time timeout — compared against the batch HDR-state path."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from khronus_spark.operators.hdr_rollup import histogram_state, state_summary
from khronus_spark.sources.tables import measurements_from_events
from khronus_spark.streaming.stateful import run_stateful_rollup

WINDOW_MS = 3_600_000


@pytest.fixture(scope="module")
def staged_multi(spark, sf_dir):
    """Timer measurements staged as several files, ordered by time, so
    the availableNow run processes multiple micro-batches and groups
    genuinely accumulate state across batches."""
    tmp = tempfile.mkdtemp(prefix="khronus_stateful_")
    m = measurements_from_events(spark, sf_dir).where(F.col("mtype") == "timer")
    # split the time axis into 4 chunks → 4 files → 4 micro-batches
    lo, hi = m.agg(F.min("ts_ms"), F.max("ts_ms")).first()
    span = (hi - lo) + 1
    chunked = m.withColumn(
        "chunk", ((F.col("ts_ms") - lo) * 4 / span).cast("int")
    )
    for i in range(4):
        chunked.where(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/in/chunk={i}")
    return tmp, m


def test_stateful_matches_batch_hdr(spark, staged_multi):
    tmp, batch_m = staged_multi
    schema = batch_m.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/in/*")
    )
    q = run_stateful_rollup(
        stream,
        out_path=f"{tmp}/out",
        checkpoint_path=f"{tmp}/ckpt",
        window_ms=WINDOW_MS,
    )
    q.awaitTermination(180)

    got = spark.read.parquet(f"{tmp}/out")
    rows = {(r["metric"], r["ts"]): r for r in got.collect()}
    assert rows, "stateful stream emitted no summaries"

    expected = {
        (r["metric"], r["ts"]): r
        for r in state_summary(histogram_state(batch_m, WINDOW_MS)).collect()
    }
    # groups emit when the watermark passes the bucket end; the trailing
    # bucket(s) per metric stay open at end-of-stream (tick-delay)
    missing = set(expected) - set(rows)
    for metric, ts in missing:
        max_ts = max(t for (m2, t) in expected if m2 == metric)
        assert ts >= max_ts - WINDOW_MS, f"non-trailing bucket missing: {(metric, ts)}"
    for key, r in rows.items():
        e = expected[key]
        for col in ("p50", "p80", "p90", "p95", "p99", "p999",
                    "min", "max", "count", "mean"):
            assert r[col] == e[col], f"{key} {col}: stream {r[col]} != batch {e[col]}"


def test_stateful_emits_nothing_twice(spark, staged_multi):
    """Restarting from the checkpoint with no new input emits nothing —
    idempotent summaries (T5, `store/BucketStore.scala:159-167`)."""
    tmp, _ = staged_multi
    stream = (
        spark.readStream.schema(
            measurements_from_events(spark, "/root/testdata/sf0.001").schema
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/in/*")
    )
    before = spark.read.parquet(f"{tmp}/out").count()
    q = run_stateful_rollup(
        stream,
        out_path=f"{tmp}/out",
        checkpoint_path=f"{tmp}/ckpt",
        window_ms=WINDOW_MS,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(f"{tmp}/out").count() == before

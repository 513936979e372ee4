"""Streaming rolling-z-score anomalies (applyInPandasWithState): the
flagged set must equal the batch entry over the full history, and a
replayed chunk must add nothing."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from khronus_spark.sources.tables import load_table
from khronus_spark.streaming.anomaly import run_streaming_zscore

QUERIES = entry_mod.queries()


def _staged(spark, sf_dir, tmp, replay_chunk=None):
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("metric"),
        F.col("ts").alias("ts_ns"),
        "event_id",
        F.floor("value").cast("long").alias("x"),
    )
    lo, hi = ev.agg(F.min("ts_ns"), F.max("ts_ns")).first()
    span = (hi - lo) + 1
    chunked = ev.withColumn("chunk", ((F.col("ts_ns") - lo) * 4 / span).cast("int"))
    for i in range(4):
        chunked.where(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/in/chunk={i}")
    if replay_chunk is not None:
        chunked.where(F.col("chunk") == replay_chunk).drop("chunk").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{tmp}/in/chunk=9replay")
    return spark.readStream.schema(
        "metric string, ts_ns long, event_id long, x long"
    ).option("maxFilesPerTrigger", "1").parquet(f"{tmp}/in/*")


def test_streaming_anomalies_match_batch(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="khronus_szscore_")
    stream = _staged(spark, sf_dir, tmp)
    q = run_streaming_zscore(
        stream, out_path=f"{tmp}/out", checkpoint_path=f"{tmp}/ckpt"
    )
    q.awaitTermination(180)
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{tmp}/out")
        .select("event_id", "metric", "ts_ms", "value", "win_n")
        .collect()
    }
    want = {
        tuple(r)
        for r in QUERIES["events_anomaly_zscore"](spark, sf_dir).collect()
    }
    assert got == want
    assert got  # the fixture really flags rows


def test_streaming_anomalies_ignore_replayed_chunk(spark, sf_dir):
    """A producer replay (chunk 0 staged again as a later file) is
    entirely at-or-behind the high-water mark: the flagged set is
    unchanged."""
    tmp = tempfile.mkdtemp(prefix="khronus_szscore_replay_")
    stream = _staged(spark, sf_dir, tmp, replay_chunk=0)
    q = run_streaming_zscore(
        stream, out_path=f"{tmp}/out", checkpoint_path=f"{tmp}/ckpt"
    )
    q.awaitTermination(180)
    got = {
        tuple(r) for r in spark.read.parquet(f"{tmp}/out").collect()
    }
    want = {
        tuple(r)
        for r in QUERIES["events_anomaly_zscore"](spark, sf_dir).collect()
    }
    assert got == want


def test_window_validation():
    import pytest

    from khronus_spark.streaming.anomaly import streaming_zscore_anomalies

    with pytest.raises(ValueError):
        streaming_zscore_anomalies(None, window=1)

"""Streaming rollup end-to-end: file-source stream → watermarked window
aggregation → parquet summary sink, compared against the batch engine."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from khronus_spark.functions.summary import counter_summary
from khronus_spark.sources.tables import measurements_from_events
from khronus_spark.streaming.ingest import run_streaming_rollup


@pytest.fixture(scope="module")
def staged(spark, sf_dir):
    """Stage measurements as a parquet dir usable as a file stream."""
    tmp = tempfile.mkdtemp(prefix="khronus_stream_")
    m = measurements_from_events(spark, sf_dir)
    m.write.mode("overwrite").parquet(f"{tmp}/in")
    schema = m.schema
    return tmp, schema, m


def test_streaming_counter_rollup_matches_batch(spark, staged):
    tmp, schema, batch_m = staged
    stream = spark.readStream.schema(schema).parquet(f"{tmp}/in")
    q = run_streaming_rollup(
        stream.where(F.col("mtype") == "counter"),
        base_path=f"{tmp}/out",
        checkpoint_path=f"{tmp}/ckpt",
        window_ms=300_000,
        family="counter",
    )
    q.awaitTermination(120)

    got = spark.read.parquet(f"{tmp}/out/counter_summary/5m")
    expected = counter_summary(batch_m.where(F.col("mtype") == "counter"), 300_000)
    g = {(r["metric"], r["ts"]): r["count"] for r in got.collect()}
    e = {(r["metric"], r["ts"]): r["count"] for r in expected.collect()}
    # append mode only emits buckets the watermark has passed; with
    # availableNow the final watermark is max(ts)-30s, so at most the
    # trailing bucket(s) per metric may be unfinalized.
    assert g, "stream produced no summaries"
    missing = set(e) - set(g)
    for metric, ts in missing:
        max_ts = max(t for (m2, t) in e if m2 == metric)
        assert ts >= max_ts - 600_000, f"non-trailing bucket missing: {(metric, ts)}"
    for k, v in g.items():
        assert e[k] == v, f"bucket {k}: stream {v} != batch {e[k]}"


def test_streaming_histogram_rollup_runs(spark, staged):
    tmp, schema, batch_m = staged
    stream = spark.readStream.schema(schema).parquet(f"{tmp}/in")
    q = run_streaming_rollup(
        stream.where(F.col("mtype") == "timer"),
        base_path=f"{tmp}/out2",
        checkpoint_path=f"{tmp}/ckpt2",
        window_ms=3_600_000,
        family="histogram",
    )
    q.awaitTermination(120)
    got = spark.read.parquet(f"{tmp}/out2/histogram_summary/1h")
    rows = got.collect()
    assert rows
    cols = set(got.columns)
    assert {"metric", "ts", "p50", "p999", "min", "max", "count", "mean"} <= cols
    # sketch percentiles bounded by min/max
    for r in rows:
        assert r["min"] <= r["p50"] <= r["max"]


def test_duplicate_deliveries_deduped(spark, staged):
    """At-least-once redelivery: the same file staged twice must yield
    the same counter rollup as a single delivery (T5 effectively-once
    via dropDuplicatesWithinWatermark)."""
    import tempfile

    from pyspark.sql import functions as F2

    from khronus_spark.streaming.ingest import dedupe_deliveries

    tmp, schema, batch_m = staged
    dup_dir = tempfile.mkdtemp(prefix="khronus_dup_")
    with_id = batch_m.withColumn(
        "delivery_id",
        F2.concat_ws("#", "metric", "ts_ms", F2.monotonically_increasing_id()),
    )
    with_id.coalesce(1).write.mode("overwrite").parquet(f"{dup_dir}/in/copy=0")
    with_id.coalesce(1).write.mode("overwrite").parquet(f"{dup_dir}/in/copy=1")

    id_schema = with_id.schema
    stream = spark.readStream.schema(id_schema).parquet(f"{dup_dir}/in/*")
    deduped = dedupe_deliveries(
        stream.where(F2.col("mtype") == "counter"), watermark="45 days"
    )
    interval_sums = (
        deduped.groupBy("metric")
        .agg(F2.sum("value").alias("total"))
    )
    q = (
        interval_sums.writeStream.outputMode("complete")
        .format("memory")
        .queryName("dedup_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["metric"]: r["total"]
        for r in spark.sql("select * from dedup_totals").collect()
    }
    expected = {
        r["metric"]: r["total"]
        for r in batch_m.where(F2.col("mtype") == "counter")
        .groupBy("metric")
        .agg(F2.sum("value").alias("total"))
        .collect()
    }
    assert got == expected, f"{got} != {expected}"

"""Streaming EWMA (applyInPandasWithState): state carried across
micro-batches must reproduce the batch recurrence bit-for-bit, and a
replayed/out-of-order prefix must be dropped, not re-smoothed."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from khronus_spark.operators.smoothing import ewma_int
from khronus_spark.sources.tables import load_table, ns_to_ms
from khronus_spark.streaming.smoothing import run_streaming_ewma

HOUR_MS = 3_600_000


def _hourly_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            (
                F.call_function("div", ns_to_ms(F.col("ts")), F.lit(HOUR_MS))
                * HOUR_MS
            ).alias("ts_ms"),
        )
        .groupBy("event_type", "ts_ms")
        .agg(F.count(F.lit(1)).alias("x"))
    )


def test_streaming_ewma_matches_batch(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="khronus_sewma_")
    hourly = _hourly_counts(spark, sf_dir)
    lo, hi = hourly.agg(F.min("ts_ms"), F.max("ts_ms")).first()
    span = (hi - lo) + 1
    chunked = hourly.withColumn(
        "chunk", ((F.col("ts_ms") - lo) * 4 / span).cast("int")
    )
    # time-ordered chunk files -> ordered micro-batches (the contract)
    for i in range(4):
        chunked.where(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/in/chunk={i}")

    stream = (
        spark.readStream.schema("event_type string, ts_ms long, x long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/in/*")
    )
    q = run_streaming_ewma(
        stream,
        out_path=f"{tmp}/out",
        checkpoint_path=f"{tmp}/ckpt",
        series_cols=["event_type"],
        order_col="ts_ms",
        value_col="x",
    )
    q.awaitTermination(180)

    got = {
        (r["event_type"], r["ts_ms"]): (r["x"], r["ewma"])
        for r in spark.read.parquet(f"{tmp}/out").collect()
    }
    want = {
        (r["event_type"], r["ts_ms"]): (r["x"], r["ewma"])
        for r in ewma_int(hourly, ["event_type"], "ts_ms", "x").collect()
    }
    assert got == want  # every row exactly once, values bit-identical


def test_streaming_ewma_drops_replayed_prefix(spark, sf_dir):
    """Feeding chunk 0 again AFTER chunks 0..3 (a producer replay)
    must emit nothing new: every replayed row is at-or-behind the
    high-water mark."""
    tmp = tempfile.mkdtemp(prefix="khronus_sewma_replay_")
    hourly = _hourly_counts(spark, sf_dir)
    lo, hi = hourly.agg(F.min("ts_ms"), F.max("ts_ms")).first()
    span = (hi - lo) + 1
    chunked = hourly.withColumn(
        "chunk", ((F.col("ts_ms") - lo) * 4 / span).cast("int")
    )
    for i in range(4):
        chunked.where(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/in/chunk={i}")
    # the replay: chunk 0's rows staged again as a LATER file
    chunked.where(F.col("chunk") == 0).drop("chunk").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/in/chunk=4_replay0")

    stream = (
        spark.readStream.schema("event_type string, ts_ms long, x long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/in/*")
    )
    q = run_streaming_ewma(
        stream,
        out_path=f"{tmp}/out",
        checkpoint_path=f"{tmp}/ckpt",
        series_cols=["event_type"],
        order_col="ts_ms",
        value_col="x",
    )
    q.awaitTermination(180)

    out = spark.read.parquet(f"{tmp}/out")
    # no duplicates: one row per (series, bucket), and the totals match
    # the clean batch run exactly
    assert out.count() == hourly.count()
    assert (
        out.groupBy("event_type", "ts_ms").count().where("count > 1").count()
        == 0
    )


def test_streaming_holt_winters_matches_batch_across_warmup_cut(
    spark, sf_dir
):
    """The seasonal twin (r10): 30 daily-sized micro-batches over the
    hourly series with season_len=48, so the chunk boundaries cut BOTH
    inside the warm-up season (the first-season buffer must survive
    the state store) and mid-recurrence (the rotating seasonal history
    must survive it). Output must equal the batch fold bit-for-bit."""
    import tempfile

    from khronus_spark.operators.smoothing import holt_winters_int
    from khronus_spark.streaming.smoothing import streaming_holt_winters

    tmp = tempfile.mkdtemp(prefix="khronus_shw_")
    hourly = _hourly_counts(spark, sf_dir)
    lo, hi = hourly.agg(F.min("ts_ms"), F.max("ts_ms")).first()
    span = (hi - lo) + 1
    n_chunks = 30
    chunked = hourly.withColumn(
        "chunk", ((F.col("ts_ms") - lo) * n_chunks / span).cast("int")
    )
    for i in range(n_chunks):
        chunked.where(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/in/chunk={i:02d}")

    stream = (
        spark.readStream.schema("event_type string, ts_ms long, x long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/in/*")
    )
    smoothed = streaming_holt_winters(
        stream, ["event_type"], "ts_ms", "x", season_len=48
    )
    q = (
        smoothed.writeStream.format("parquet")
        .option("path", f"{tmp}/out")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["event_type"], r["ts_ms"]): (
            r["x"], r["level"], r["trend"], r["seasonal"], r["forecast_next"]
        )
        for r in spark.read.parquet(f"{tmp}/out").collect()
    }
    want = {
        (r["event_type"], r["ts_ms"]): (
            r["x"], r["level"], r["trend"], r["seasonal"], r["forecast_next"]
        )
        for r in holt_winters_int(
            hourly, ["event_type"], "ts_ms", "x", season_len=48
        ).collect()
    }
    assert got == want

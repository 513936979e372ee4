#!/usr/bin/env python
"""Streaming soak at the reference cadence (round-4 directive 6).

Drives `run_streaming_rollup` with `Trigger.ProcessingTime("30 seconds")`
— the reference's leader-cron tick (`cluster/Master.scala:169-242`) — for
>= 10 triggers at sf0.1 ingest volume:

- the sf0.1 measurement stream is split into N_CHUNKS time-ordered
  parquet chunks; a feeder thread lands one chunk every 30 s (so each
  trigger ingests ~1/N of the corpus and the event-time watermark
  advances monotonically, as it would on live ingest);
- TWO rollup streams run concurrently against the landing dir — the
  counter family at 1m and the histogram family (sketch percentiles)
  at the finest 30 s resolution, the reference's heaviest tick;
- per-trigger durations are read from each query's recentProgress and
  every micro-batch must finish inside the 30 s budget
  (`BASELINE.md`: rollup micro-batch <= 30 s);
- afterwards the store is compared bucket-for-bucket against the batch
  engine (append mode may withhold watermark-trailing buckets only).

Prints one JSON line; paste the numbers into ROUND4_NOTES.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import threading
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"
N_CHUNKS = 12
CADENCE_SEC = 30.0
BUDGET_MS = 30_000


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("khronus-soak")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.functions.summary import counter_summary, histogram_summary
    from khronus_spark.sources.tables import measurements_from_events
    from khronus_spark.streaming.ingest import run_streaming_rollup

    tmp = tempfile.mkdtemp(prefix="khronus_soak_")
    m = measurements_from_events(spark, SF_DIR)
    n_rows = m.count()

    # time-ordered chunks: chunk i holds the i-th twelfth of the stream
    # by event time, so landing them in order advances the watermark
    chunked = m.withColumn("chunk", F.ntile(N_CHUNKS).over(Window.orderBy("ts_ms")))
    for i in range(1, N_CHUNKS + 1):
        (
            chunked.where(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(f"{tmp}/stage/{i}")
        )
    schema = m.schema
    landing = f"{tmp}/landing"
    Path(landing).mkdir()

    land_log: list[float] = []

    def feeder() -> None:
        for i in range(1, N_CHUNKS + 1):
            t0 = time.perf_counter()
            for f in Path(f"{tmp}/stage/{i}").glob("*.parquet"):
                shutil.copy(str(f), f"{landing}/chunk{i}_{f.name}")
            land_log.append(round(time.perf_counter() - t0, 3))
            if i < N_CHUNKS:
                time.sleep(CADENCE_SEC)

    stream = spark.readStream.schema(schema).parquet(landing)
    trigger = {"processingTime": "30 seconds"}
    q_counter = run_streaming_rollup(
        stream.where(F.col("mtype") == "counter"),
        base_path=f"{tmp}/out",
        checkpoint_path=f"{tmp}/ckpt_counter",
        window_ms=60_000,
        family="counter",
        trigger=trigger,
    )
    q_hist = run_streaming_rollup(
        stream.where(F.col("mtype").isin("timer", "gauge")),
        base_path=f"{tmp}/out",
        checkpoint_path=f"{tmp}/ckpt_hist",
        window_ms=30_000,
        family="histogram",
        trigger=trigger,
    )

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    th.join()
    # two extra triggers to drain the final chunk through the watermark
    time.sleep(2.5 * CADENCE_SEC)

    def batch_stats(q):
        # triggers that actually processed data (idle ticks are ~ms no-ops)
        out = []
        for p in q.recentProgress:
            if p is None:
                continue
            d = p.get("durationMs", {}).get("triggerExecution")
            if d is not None:
                out.append((int(p.get("numInputRows", 0)), int(d)))
        return out

    stats_counter = batch_stats(q_counter)
    stats_hist = batch_stats(q_hist)
    q_counter.stop()
    q_hist.stop()
    q_counter.awaitTermination(60)
    q_hist.awaitTermination(60)

    # store vs batch (append mode may withhold watermark-trailing buckets)
    got = {
        (r["metric"], r["ts"]): r["count"]
        for r in spark.read.parquet(f"{tmp}/out/counter_summary/1m").collect()
    }
    expected = {
        (r["metric"], r["ts"]): r["count"]
        for r in counter_summary(
            m.where(F.col("mtype") == "counter"), 60_000
        ).collect()
    }
    mismatches = [k for k, v in got.items() if expected.get(k) != v]
    missing_non_trailing = []
    for metric, ts in set(expected) - set(got):
        max_ts = max(t for (m2, t) in expected if m2 == metric)
        if ts < max_ts - 2 * 60_000:
            missing_non_trailing.append((metric, ts))

    hgot = spark.read.parquet(f"{tmp}/out/histogram_summary/30s")
    hrows = hgot.count()
    hexp = histogram_summary(
        m.where(F.col("mtype").isin("timer", "gauge")), 30_000, approx=True
    ).count()

    active = [s for s in stats_counter + stats_hist if s[0] > 0]
    result = {
        "metric": "khronus_spark streaming soak (30s cadence, sf0.1)",
        "rows_fed": n_rows,
        "chunks": N_CHUNKS,
        "counter_triggers": stats_counter,
        "hist_triggers": stats_hist,
        "data_triggers": len(active),
        "max_batch_ms": max(d for _, d in active) if active else None,
        "budget_ms": BUDGET_MS,
        "within_budget": bool(active) and all(d < BUDGET_MS for _, d in active),
        "counter_buckets_checked": len(got),
        "counter_mismatches": mismatches[:5],
        "counter_missing_non_trailing": missing_non_trailing[:5],
        "hist_buckets_stream_vs_batch": [hrows, hexp],
        "land_copy_sec": land_log,
    }
    print(json.dumps(result), flush=True)
    spark.stop()
    ok = (
        result["within_budget"]
        and not mismatches
        and not missing_non_trailing
        and result["data_triggers"] >= 10
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

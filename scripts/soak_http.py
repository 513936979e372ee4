#!/usr/bin/env python
"""End-to-end streaming soak through the REAL HTTP ingest path at
pressure (round-4 verdict directive 6).

Where scripts/soak.py lands parquet chunks directly, this drives the
full wire path the reference exposes: gzip MetricBatch JSON POSTed to
`/khronus/metrics` (service.py → parquet landing dir → Structured
Streaming rollup), at >= 2x the sf0.1 ingest rate (the whole corpus in
half the round-4 soak's wall time), with deliberately OUT-OF-ORDER and
LATE batches spanning the watermark:

- the sf0.1 measurement stream splits into N_CHUNKS event-time-ordered
  chunks; one chunk's ON-TIME wave posts every CADENCE_SEC = 15 s
  (trigger stays at the reference's 30 s — each tick ingests ~2 chunks);
- per chunk, ~2.7% of rows are held back as wave A (posted 1 tick late
  — inside the watermark: MUST land, T2) and another ~2.7% as wave B
  (posted 8 ticks late — beyond the watermark: overwhelmingly dropped,
  T2);
- the watermark is sized to the expected lateness (1.6x one chunk's
  event span), exactly how a production deployment sizes it — sf0.1's
  event time is wall-compressed, so a wall-clock "30 seconds" would
  drop even same-tick reordering. Sizing note, measured with a scaled
  probe: Spark's EFFECTIVE watermark lags the data by about two
  micro-batches (the wm a batch uses derives from earlier batches'
  max event time), so wave B must be later than delay + ~2 batches of
  event progress to be droppable — 8 ticks against a 1.6-span delay
  gives wave A a 0.6-span landing margin and wave B a >1.4-span
  dropping margin;
- after the feed drains (plus two idle triggers, so every real file
  has processed), one far-future "closer" row per family advances the
  watermark past every real bucket, so append mode emits them ALL and
  the store check needs no trailing allowance;
- the verification pins Spark's ACTUAL T2 contract, bucket for bucket:
  `landed <= got <= full`, where `landed` is the batch summary over
  on-time + wave A rows and `full` adds wave B — i.e. NO on-time or
  within-watermark row may ever be lost (got >= landed: the losable
  side), nothing may double-count (got <= full), and wave B lands only
  to still-open buckets. Because the watermark advances with a
  one-trigger lag off the PREVIOUS batch's max event time, a bounded
  tail of each chunk's wave B legitimately lands — the soak asserts
  the beyond-watermark DROP is the dominant outcome (>= 70% of wave-B
  mass) and reports the measured split;
- the query half of the wire contract is exercised too: a post-soak
  GET /khronus/db/influx/series against the same landing dir must
  answer 200 with points.

Prints one JSON line; paste the numbers into ROUND5_NOTES.md.
"""

from __future__ import annotations

import gzip
import json
import sys
import threading
import time
import urllib.parse
import urllib.request
from collections import defaultdict
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"
N_CHUNKS = 12
CADENCE_SEC = 15.0
BUDGET_MS = 30_000
WAVE_A_TICKS = 1  # inside the watermark -> must land
WAVE_B_TICKS = 8  # beyond the watermark -> must be (mostly) dropped
POST_ROWS = 4_000


def post_rows(port: int, rows: list[tuple]) -> int:
    """rows (metric, mtype, ts_ms, value) → gzip MetricBatch POSTs."""
    n_posts = 0
    for i in range(0, len(rows), POST_ROWS):
        by_metric: dict[tuple, list] = defaultdict(list)
        for metric, mtype, ts, v in rows[i : i + POST_ROWS]:
            by_metric[(metric, mtype)].append({"ts": ts, "values": [v]})
        payload = {
            "metrics": [
                {"name": k[0], "mtype": k[1], "measurements": ms}
                for k, ms in by_metric.items()
            ]
        }
        body = gzip.compress(json.dumps(payload).encode())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/khronus/metrics",
            data=body,
            headers={"Content-Encoding": "gzip"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200, resp.status
        n_posts += 1
    return n_posts


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("khronus-soak-http")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.functions.summary import counter_summary
    from khronus_spark.service import _SCHEMA, KhronusHttpService
    from khronus_spark.sources.tables import measurements_from_events
    from khronus_spark.streaming.ingest import run_streaming_rollup

    tmp = tempfile.mkdtemp(prefix="khronus_soak_http_")
    landing = f"{tmp}/landing"
    Path(landing).mkdir()

    m = measurements_from_events(spark, SF_DIR).select(
        "metric", "mtype", "ts_ms", "value"
    )
    all_rows = [tuple(r) for r in m.orderBy("ts_ms", "metric", "value").collect()]
    n_rows = len(all_rows)
    min_ts, max_ts = all_rows[0][2], all_rows[-1][2]
    chunk_span = (max_ts - min_ts) // N_CHUNKS + 1
    watermark_ms = int(1.6 * chunk_span)

    # deterministic wave split per chunk: idx%37==0 -> A, ==1 -> B
    chunks: list[dict] = []
    for c in range(N_CHUNKS):
        lo = c * len(all_rows) // N_CHUNKS
        hi = (c + 1) * len(all_rows) // N_CHUNKS
        rows = all_rows[lo:hi]
        chunks.append(
            {
                "ontime": [r for i, r in enumerate(rows) if i % 37 > 1],
                "a": [r for i, r in enumerate(rows) if i % 37 == 0],
                "b": [r for i, r in enumerate(rows) if i % 37 == 1],
            }
        )
    n_a = sum(len(c["a"]) for c in chunks)
    n_b = sum(len(c["b"]) for c in chunks)

    service = KhronusHttpService(spark, landing)
    service.start()

    stream = spark.readStream.schema(_SCHEMA).parquet(landing)
    trigger = {"processingTime": "30 seconds"}
    wm = f"{watermark_ms // 1000} seconds"
    q_counter = run_streaming_rollup(
        stream.where(F.col("mtype") == "counter"),
        base_path=f"{tmp}/out",
        checkpoint_path=f"{tmp}/ckpt_counter",
        window_ms=60_000,
        family="counter",
        watermark=wm,
        trigger=trigger,
    )
    q_hist = run_streaming_rollup(
        stream.where(F.col("mtype").isin("timer", "gauge")),
        base_path=f"{tmp}/out",
        checkpoint_path=f"{tmp}/ckpt_hist",
        window_ms=30_000,
        family="histogram",
        watermark=wm,
        trigger=trigger,
    )

    # feeder: tick t posts chunk t's on-time wave, chunk t-1's wave A,
    # chunk t-8's wave B — all through the HTTP endpoint
    post_log: list[dict] = []
    feed_t0 = time.perf_counter()
    n_ticks = N_CHUNKS + WAVE_B_TICKS
    for t in range(n_ticks):
        tick_rows: list[tuple[str, list]] = []
        if t < N_CHUNKS:
            tick_rows.append(("ontime", chunks[t]["ontime"]))
        if 0 <= t - WAVE_A_TICKS < N_CHUNKS:
            tick_rows.append(("late_a", chunks[t - WAVE_A_TICKS]["a"]))
        if 0 <= t - WAVE_B_TICKS < N_CHUNKS:
            tick_rows.append(("late_b", chunks[t - WAVE_B_TICKS]["b"]))
        t0 = time.perf_counter()
        posts = sum(post_rows(service.port, rows) for _, rows in tick_rows)
        post_log.append(
            {
                "tick": t,
                "waves": [w for w, _ in tick_rows],
                "rows": sum(len(r) for _, r in tick_rows),
                "posts": posts,
                "post_sec": round(time.perf_counter() - t0, 3),
            }
        )
        if t < n_ticks - 1:
            time.sleep(max(0.0, CADENCE_SEC * (t + 1) - (time.perf_counter() - feed_t0)))
    feed_sec = round(time.perf_counter() - feed_t0, 1)
    service.wait_idle()
    # let every already-landed file process BEFORE the watermark jump:
    # a straggler file deferred past a closer-advanced watermark would
    # be dropped wholesale
    time.sleep(2.2 * 30.0)

    # closer rows: advance the watermark past every real bucket so
    # append mode emits them all (one row per family stream)
    closer_ts = max_ts + watermark_ms + 10 * 60_000
    post_rows(
        service.port,
        [("click", "counter", closer_ts, 0), ("purchase", "timer", closer_ts, 0)],
    )
    service.wait_idle()
    time.sleep(2.5 * 30.0)

    def batch_stats(q):
        out = []
        for p in q.recentProgress:
            if p is None:
                continue
            d = p.get("durationMs", {}).get("triggerExecution")
            if d is not None:
                dropped = sum(
                    int(s.get("numRowsDroppedByWatermark", 0))
                    for s in p.get("stateOperators", [])
                )
                out.append((int(p.get("numInputRows", 0)), int(d), dropped))
        return out

    stats_counter = batch_stats(q_counter)
    stats_hist = batch_stats(q_hist)

    # wire-contract query check against the same landing data
    # group-by windows accept ms|s|m|h only (reference parity:
    # `InfluxQueryParser.scala:210` — d/w are for now() offsets)
    q = (
        'select count from "click" where time between '
        f"{min_ts} and {max_ts} group by time(2h)"
    )
    url = (
        f"http://127.0.0.1:{service.port}/khronus/db/influx/series?q="
        + urllib.parse.quote(q)
    )
    with urllib.request.urlopen(url, timeout=600) as resp:
        query_ok = resp.status == 200
        series = json.loads(resp.read())
        query_points = sum(len(s["points"]) for s in series)

    q_counter.stop()
    q_hist.stop()
    q_counter.awaitTermination(60)
    q_hist.awaitTermination(60)
    service.stop()

    # bucket-exact verification: the store must equal the batch summary
    # over on-time + wave A (landed) rows; wave B (beyond watermark)
    # must have been dropped — no trailing allowance thanks to the closer
    landed_rows = [
        r
        for c in chunks
        for wave in ("ontime", "a")
        for r in c[wave]
    ]
    landed_df = spark.createDataFrame(landed_rows, _SCHEMA)
    full_df = spark.createDataFrame(all_rows, _SCHEMA)

    def buckets(df, window_ms):
        return {
            (r["metric"], r["ts"]): r["count"]
            for r in counter_summary(
                df.where(F.col("mtype") == "counter"), window_ms
            ).collect()
        }

    got = {
        (r["metric"], r["ts"]): r["count"]
        for r in spark.read.parquet(f"{tmp}/out/counter_summary/1m").collect()
        if r["ts"] <= max_ts  # exclude the synthetic closer bucket
    }
    expect_landed = buckets(landed_df, 60_000)
    expect_full = buckets(full_df, 60_000)
    exact = sum(1 for k, v in got.items() if expect_landed.get(k) == v)
    with_all_b = sum(
        1
        for k, v in got.items()
        if expect_landed.get(k) != v and expect_full.get(k) == v
    )
    # T2 contract violations: a bucket below `landed` lost an on-time /
    # within-watermark row; above `full` double-counted
    lost = [
        (k, v, expect_landed.get(k), expect_full.get(k))
        for k, v in got.items()
        if not (expect_landed.get(k, 0) <= v <= expect_full.get(k, 0))
    ]
    missing = sorted(set(expect_landed) - set(got))
    unknown = sorted(set(got) - set(expect_full))  # must be empty
    # wave-B mass accounting: landed B = sum(got - landed); posted B
    # mass = sum(full - landed) — the beyond-watermark drop must dominate
    b_mass = sum(
        v - expect_landed.get(k, 0) for k, v in expect_full.items()
    )
    b_landed_mass = sum(
        v - expect_landed.get(k, 0) for k, v in got.items()
    )
    b_drop_pct = (
        round(100.0 * (b_mass - b_landed_mass) / b_mass, 1) if b_mass else None
    )

    hrows = spark.read.parquet(f"{tmp}/out/histogram_summary/30s").where(
        F.col("ts") <= max_ts
    )
    h_got = {(r["metric"], r["ts"]): r["count"] for r in hrows.collect()}

    def h_buckets(df):
        return {
            (r["metric"], r["ts"]): r["count"]
            for r in df.where(F.col("mtype").isin("timer", "gauge"))
            .groupBy(
                "metric",
                (F.col("ts_ms") - F.col("ts_ms") % 30_000).alias("ts"),
            )
            .agg(F.count("value").alias("count"))
            .collect()
        }

    h_landed = h_buckets(landed_df)
    h_full = h_buckets(full_df)
    h_lost = [
        (k, v, h_landed.get(k), h_full.get(k))
        for k, v in h_got.items()
        if not (h_landed.get(k, 0) <= v <= h_full.get(k, 0))
    ]
    h_missing = sorted(set(h_landed) - set(h_got))

    active = [s for s in stats_counter + stats_hist if s[0] > 0]
    wm_dropped_rows = sum(s[2] for s in stats_counter + stats_hist)
    result = {
        "metric": "khronus_spark HTTP-path streaming soak (2x rate, late waves)",
        "rows_fed": n_rows,
        "rate_rows_per_sec": round(n_rows / feed_sec, 1),
        "feed_sec": feed_sec,
        "chunks": N_CHUNKS,
        "cadence_sec": CADENCE_SEC,
        "watermark_ms": watermark_ms,
        "late_wave_a_rows": n_a,
        "late_wave_b_rows": n_b,
        "post_log": post_log,
        "counter_triggers": stats_counter,
        "hist_triggers": stats_hist,
        "data_triggers": len(active),
        "max_batch_ms": max(d for _, d, _ in active) if active else None,
        "wm_dropped_rows_reported": wm_dropped_rows,
        "budget_ms": BUDGET_MS,
        "within_budget": bool(active) and all(d < BUDGET_MS for _, d, _ in active),
        "counter_buckets": len(got),
        "counter_exact_vs_landed": exact,
        "counter_with_all_wave_b": with_all_b,
        "counter_t2_violations": lost[:5],
        "counter_missing": missing[:5],
        "counter_unknown_buckets": unknown[:5],
        "wave_b_mass": b_mass,
        "wave_b_landed_mass": b_landed_mass,
        "wave_b_drop_pct": b_drop_pct,
        "hist_buckets": len(h_got),
        "hist_t2_violations": h_lost[:5],
        "hist_missing": h_missing[:5],
        "query_endpoint_ok": query_ok,
        "query_points": query_points,
    }
    print(json.dumps(result), flush=True)
    spark.stop()
    ok = (
        result["within_budget"]
        and result["data_triggers"] >= 8
        and not lost
        and not missing
        and not unknown
        and (b_drop_pct is None or b_drop_pct >= 70.0)
        and not h_lost
        and not h_missing
        and query_ok
        and query_points > 0
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

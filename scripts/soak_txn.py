#!/usr/bin/env python
"""Transactional streaming soak (round-7 verdict directive 4).

The round-6 soak proved the PLAIN upsert path holds the reference's
30 s leader-cron cadence at sf0.1 ingest volume; the transactional
face (`run_streaming_rollup_upsert_txn`) adds a commit-log write and
a compare-and-swap per micro-batch and had only unit/race tests. This
soak drives the txn path under the same load WITH the adversaries the
commit log exists for, concurrently:

- the sf0.1 measurement stream lands in 12 time-ordered chunks at the
  30 s cadence; two rollup streams (counter@1m, histogram@30s) upsert
  into two `TxnTable`s via CAS commits;
- a COMPACTOR thread repeatedly compacts the currently-touched day
  partitions through the commit log (`compact_partition_txn`) — every
  compaction races the stream's next CAS commit by construction;
- a READER thread pins a version, reads the whole table, waits while
  more commits land, re-reads AT THE SAME VERSION and compares — any
  difference is a torn/unstable snapshot (must be zero);
- CAS conflicts are counted via a wrapper around `TxnTable.commit`
  (they are EXPECTED — the point is they are retried and survived,
  not avoided);
- afterwards both tables are compared bucket-for-bucket against the
  batch rollup (update-mode upsert withholds nothing, so equality is
  exact), and the commit log is checked gap-free.

Prints one JSON line; paste the numbers into ROUND8_NOTES.md.
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
        .appName("khronus-soak-txn")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        # a deep-recursion regex in Spark's stream-thread internals
        # overflowed a default 1 MiB stack once (post-drain, no data
        # impact); headroom costs nothing
        .config("spark.driver.extraJavaOptions", "-Xss16m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.functions.summary import counter_summary, histogram_summary
    from khronus_spark.operators.rollup import compact_partition_txn
    from khronus_spark.sources.tables import measurements_from_events
    from khronus_spark.sources.txnlog import CommitConflict, TxnTable
    from khronus_spark.streaming.ingest import run_streaming_rollup_upsert_txn

    tmp = tempfile.mkdtemp(prefix="khronus_soak_txn_")
    m = measurements_from_events(spark, SF_DIR)
    n_rows = m.count()

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

    conflicts = {"counter": 0, "hist": 0}
    commits = {"counter": 0, "hist": 0}

    def counting_table(root: str, tag: str) -> TxnTable:
        table = TxnTable(root)
        orig = table.commit

        def commit(parts, expect_version=None, **kw):
            try:
                v = orig(parts, expect_version=expect_version, **kw)
            except CommitConflict:
                conflicts[tag] += 1
                raise
            commits[tag] += 1
            return v

        table.commit = commit
        return table

    t_counter = counting_table(f"{tmp}/table_counter", "counter")
    t_hist = counting_table(f"{tmp}/table_hist", "hist")

    def feeder() -> None:
        for i in range(1, N_CHUNKS + 1):
            for f in Path(f"{tmp}/stage/{i}").glob("*.parquet"):
                shutil.copy(str(f), f"{landing}/chunk{i}_{f.name}")
            if i < N_CHUNKS:
                time.sleep(CADENCE_SEC)

    stream = spark.readStream.schema(schema).parquet(landing)
    trigger = {"processingTime": "30 seconds"}
    q_counter = run_streaming_rollup_upsert_txn(
        stream.where(F.col("mtype") == "counter"),
        table=t_counter,
        checkpoint_path=f"{tmp}/ckpt_counter",
        window_ms=60_000,
        family="counter",
        trigger=trigger,
    )
    q_hist = run_streaming_rollup_upsert_txn(
        stream.where(F.col("mtype").isin("timer", "gauge")),
        table=t_hist,
        checkpoint_path=f"{tmp}/ckpt_hist",
        window_ms=30_000,
        family="histogram",
        trigger=trigger,
    )

    stop = threading.Event()
    compactions = {"n": 0}
    torn = {"n": 0, "checks": 0}

    def compactor() -> None:
        # race the stream's CAS commits on purpose: compact whatever
        # day partitions currently exist, round-robin, until drained
        while not stop.is_set():
            for table in (t_counter, t_hist):
                keys = sorted(table.snapshot_files(table.version()))
                for key in keys[:2]:
                    try:
                        if compact_partition_txn(spark, table, key, n_files=2):
                            compactions["n"] += 1
                    except Exception:
                        if not stop.is_set():
                            raise
            stop.wait(10.0)

    def reader() -> None:
        # snapshot stability under concurrent commits + compaction:
        # the SAME pinned version must read identically before/after
        # more commits land — any drift is a torn read
        while not stop.is_set():
            for table in (t_counter, t_hist):
                v = table.version()
                if v == 0:
                    continue
                df = table.read_all(spark, version=v)
                before = {tuple(r) for r in df.collect()}
                stop.wait(3.0)
                again = {
                    tuple(r)
                    for r in table.read_all(spark, version=v).collect()
                }
                torn["checks"] += 1
                if before != again:
                    torn["n"] += 1
            stop.wait(4.0)

    th_feed = threading.Thread(target=feeder, daemon=True)
    th_comp = threading.Thread(target=compactor, daemon=True)
    th_read = threading.Thread(target=reader, daemon=True)
    th_feed.start()
    time.sleep(5)  # let the first commit land before compacting/reading
    th_comp.start()
    th_read.start()
    th_feed.join()
    time.sleep(2.5 * CADENCE_SEC)  # drain the final chunk

    def batch_stats(q):
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
    stop.set()
    th_comp.join(60)
    th_read.join(60)

    # final content vs the batch rollup — exact (update mode withholds
    # nothing; every amended bucket was re-upserted)
    got_c = {
        (r["metric"], r["ts"]): r["count"]
        for r in t_counter.read_all(spark).collect()
    }
    exp_c = {
        (r["metric"], r["ts"]): r["count"]
        for r in counter_summary(
            m.where(F.col("mtype") == "counter"), 60_000
        ).collect()
    }
    hist_rows = t_hist.read_all(spark).count()
    hist_exp = histogram_summary(
        m.where(F.col("mtype").isin("timer", "gauge")), 30_000, approx=True
    ).count()

    # gap-free log: versions 1..V all present (the linearizable claim)
    def log_gapless(table) -> bool:
        v = table.version()
        return len(table._commits_upto(v)) == v

    active = [s for s in stats_counter + stats_hist if s[0] > 0]
    result = {
        "metric": "khronus_spark txn streaming soak (30s cadence, sf0.1)",
        "rows_fed": n_rows,
        "chunks": N_CHUNKS,
        "data_triggers": len(active),
        "max_batch_ms": max(d for _, d in active) if active else None,
        "budget_ms": BUDGET_MS,
        "within_budget": bool(active) and all(d < BUDGET_MS for _, d in active),
        "commits": commits,
        "cas_conflicts_survived": conflicts,
        "compactions": compactions["n"],
        "snapshot_checks": torn["checks"],
        "torn_reads": torn["n"],
        "counter_buckets": len(got_c),
        "counter_exact_match": got_c == exp_c,
        "hist_rows": hist_rows,
        "hist_rows_expected": hist_exp,
        "log_gapless": log_gapless(t_counter) and log_gapless(t_hist),
        "versions": {
            "counter": t_counter.version(),
            "hist": t_hist.version(),
        },
        "counter_triggers": stats_counter,
        "hist_triggers": stats_hist,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

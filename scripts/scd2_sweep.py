#!/usr/bin/env python
"""Scaling measurement for SCD2 late-arriving-fact correction.

`scd2_apply_backfill`'s pitch: an out-of-order backfill invalidates
only the users it touches, so the correction's recompute is bounded by
the BACKFILL footprint while a naive full rebuild re-shuffles the whole
fact history. This sweep grows the dimension (events replicated with
per-copy user/event-id offsets) while holding the backfill fixed (the
late events of the base copy's user_id % 100 == 7 slice — ~1% of base
users), and measures both paths end-to-end (count() forces the plan).

Expectation: rebuild cost grows with the corpus; the correction's cost
approaches a floor set by the backfill's own users (plus the anti-join
pass over the standing dimension, which is interval-sized — far
smaller than facts). Prints one JSON line per size; paste into notes.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = [1, 2, 4, 8]


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from khronus_spark.operators import scd2 as scd2_ops
    from khronus_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scd2-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    n_base = base.count()

    def best_of(fn, n=3):
        xs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            xs.append(time.perf_counter() - t0)
        return round(min(xs), 2)

    for reps in REPLICAS:
        parts = None
        for r in range(reps):
            c = base.select(
                (F.col("event_id") + F.lit(r * 100_000_000)).alias("event_id"),
                (F.col("user_id") + F.lit(r * 10_000_000)).alias("user_id"),
                "ts",
                "event_type",
            )
            parts = c if parts is None else parts.unionAll(c)
        ev = parts.localCheckpoint(eager=True)

        # the fixed late batch: base-copy users ending in 07 — the
        # backfill does NOT grow with the dimension
        is_late = (F.col("user_id") % 100 == 7) & (
            F.col("user_id") < 10_000_000
        ) & (F.col("event_id") % 10 == 0)
        backfill = ev.where(is_late)
        initial = ev.where(~is_late)
        n_late_users = backfill.select("user_id").distinct().count()

        base_iv = scd2_ops.scd2_intervals(initial).localCheckpoint(eager=True)

        t_correct = best_of(
            lambda: scd2_ops.scd2_apply_backfill(base_iv, ev, backfill).count()
        )
        t_rebuild = best_of(lambda: scd2_ops.scd2_intervals(ev).count())

        print(
            json.dumps(
                {
                    "n_events": n_base * reps,
                    "n_late_users": n_late_users,
                    "correct_s": t_correct,
                    "rebuild_s": t_rebuild,
                    "rebuild_over_correct": round(
                        t_rebuild / max(t_correct, 1e-9), 2
                    ),
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scaling measurement for events_type_affinity (round-7 verdict
directive 6: the basket self-join's C(|types|, 2) fan-out is fine at
|types| = 7 — measure the curve instead of asserting it).

Two growth axes, independently:

- BASKETS: replicate the event stream with user_id offsets (baskets
  grow linearly, |types| fixed). The pair join is co-partitioned on
  (user, day) with per-basket fan-out C(b, 2) for basket size b ≤
  |types|, so wall should grow ~linearly with basket count; the
  docstring's int64 lift contract (support_ab·n_baskets ≤ 2^63/10^4)
  is re-checked at each size.
- TYPES: diversify event_type by a per-event deterministic suffix
  (|types| grows ×T; baskets keep their row counts, so per-basket
  fan-out is unchanged, but pair cardinality — the aggregate keyspace
  and output — grows toward min(C(|types|,2), observed pairs)).

Per point: wall (best of 3), output pair rows, n_baskets, the
max support_ab·n_baskets operand vs the int64 bound, and rows-in /
rows-out of the pair aggregate. Prints one JSON line per point;
paste into ROUND8_NOTES.md.
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
BASKET_REPS = [1, 4, 10, 20]
TYPE_MULTS = [1, 4, 16, 64]
INT64_BOUND = (2**63) // 10_000


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from khronus_spark.sources.tables import load_table, ns_to_ms

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("affinity-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id",
        F.call_function("div", ns_to_ms(F.col("ts")), F.lit(86_400_000)).alias(
            "day"
        ),
        "event_type",
    )

    def affinity(baskets):
        baskets = baskets.distinct().localCheckpoint(eager=True)
        n_baskets = baskets.select("user_id", "day").distinct().count()
        supp = baskets.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("support")
        )
        a = baskets.select("user_id", "day", F.col("event_type").alias("type_a"))
        b = baskets.select("user_id", "day", F.col("event_type").alias("type_b"))
        pair_supp = (
            a.join(b, ["user_id", "day"])
            .where(F.col("type_a") < F.col("type_b"))
            .groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).alias("support_ab"))
        )
        out = (
            pair_supp.join(
                F.broadcast(supp.withColumnRenamed("event_type", "type_a")), "type_a"
            )
            .withColumnRenamed("support", "support_a")
            .join(
                F.broadcast(
                    supp.select(
                        F.col("event_type").alias("type_b"),
                        F.col("support").alias("support_b"),
                    )
                ),
                "type_b",
            )
            .select(
                "type_a",
                "type_b",
                "support_ab",
                F.expr(
                    f"CAST(support_ab * {n_baskets}L * 10000 div "
                    "(support_a * support_b) AS BIGINT)"
                ).alias("lift_bp"),
            )
        )
        return out, n_baskets

    def measure(baskets, label, extra):
        out, n_baskets = affinity(baskets)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        stats = out.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.max("support_ab").alias("max_ab"),
        ).first()
        rec = {
            "axis": label,
            **extra,
            "n_baskets": n_baskets,
            "pair_rows": stats["pairs"],
            "wall_s": round(min(walls), 2),
            "max_operand": int(stats["max_ab"] or 0) * n_baskets,
            "int64_bound": INT64_BOUND,
            "int64_ok": int(stats["max_ab"] or 0) * n_baskets <= INT64_BOUND,
        }
        print(json.dumps(rec), flush=True)

    for reps in BASKET_REPS:
        parts = None
        for r in range(reps):
            c = ev.select(
                (F.col("user_id") + F.lit(r * 10_000_000)).alias("user_id"),
                "day",
                "event_type",
            )
            parts = c if parts is None else parts.unionAll(c)
        measure(parts, "baskets", {"reps": reps, "type_mult": 1})

    for mult in TYPE_MULTS:
        # per-event deterministic suffix: |types| -> 7 * mult while each
        # basket keeps its row count (fan-out per basket unchanged)
        diversified = ev.select(
            "user_id",
            "day",
            F.concat(
                F.col("event_type"),
                F.lit("#"),
                (
                    F.xxhash64("user_id", "day", "event_type") % mult
                ).cast("string"),
            ).alias("event_type"),
        )
        measure(diversified, "types", {"reps": 1, "type_mult": mult})


if __name__ == "__main__":
    main()

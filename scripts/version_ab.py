#!/usr/bin/env python
"""Three-point code-version A/B on pinned-plan slots (r14, VERDICT item 1).

Usage: python scripts/version_ab.py <repo_checkout_path> <label>

Times three slots whose code and plans are PINNED across r12..HEAD
(tpch_q3, text_quality, rollup_hist_30s) against the given checkout,
under ONE uniform session conf (the r13 bench conf, including
hugeMethodLimit=8000, applied to every version so the measurement
isolates CODE differences, not session conf). Prints one JSON line
with wall + JVM cpu medians per slot; the caller interleaves versions
A,B,C,A,B,C so host drift cannot masquerade as a version effect.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo, label = sys.argv[1], sys.argv[2]
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "5"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"version-ab-{label}")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark import entry_queries as eq
    from khronus_spark.functions.summary import histogram_summary
    from khronus_spark.sources.tables import load_table, measurements_from_events

    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "events").count()

    def run_df(df):
        df.write.format("noop").mode("overwrite").save()

    q = eq.queries()
    slots = {
        "tpch_q3": lambda: run_df(q["tpch_q3_top_orders"](spark, sf_dir)),
        "text_quality": lambda: run_df(q["quality_score"](spark, sf_dir)),
        "rollup_hist_30s": lambda: run_df(
            histogram_summary(
                measurements_from_events(spark, sf_dir).where(
                    "mtype IN ('timer','gauge')"
                ),
                30_000,
            )
        ),
        "calibrate": lambda: run_df(
            spark.range(0, 200_000_000, 1, int(cpus)).selectExpr(
                "sum(id * 3 + (id & 255)) AS s"
            )
        ),
    }

    hz = os.sysconf("SC_CLK_TCK")
    jvm_pid = int(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())

    def jvm_cpu() -> float:
        with open(f"/proc/{jvm_pid}/stat") as fh:
            parts = fh.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / hz

    for fn in slots.values():  # warm-up, untimed
        fn()
    wall: dict[str, list[float]] = {k: [] for k in slots}
    cpu: dict[str, list[float]] = {k: [] for k in slots}
    for _ in range(runs):
        for name, fn in slots.items():
            c0, t0 = jvm_cpu(), time.perf_counter()
            fn()
            wall[name].append(round(time.perf_counter() - t0, 3))
            cpu[name].append(round(jvm_cpu() - c0, 3))

    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else round((s[m - 1] + s[m]) / 2, 3)

    print(
        json.dumps(
            {
                "label": label,
                "repo": repo,
                "runs": runs,
                "wall": {k: med(v) for k, v in wall.items()},
                "cpu": {k: med(v) for k, v in cpu.items()},
                "wall_all": wall,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

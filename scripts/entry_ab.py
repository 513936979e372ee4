#!/usr/bin/env python
"""Interleaved code-version A/B over registry ENTRIES (r14 tooling).

Usage: python scripts/entry_ab.py <repo_checkout> <label> <entry> [...]

One process = one (checkout, pass): times each named `queries()` entry
end-to-end with the noop sink, median of $SPARK_GRAFT_AB_RUNS (default
5) interleaved at the entry level, under the bench session conf.
Prints one JSON line {label, repo, wall:{entry: median}, cpu:{...},
wall_all:{...}}. The caller interleaves passes A,B,A,B so host drift
cannot masquerade as a version effect (the r13/r14 version_ab design,
generalized to arbitrary entries).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo, label = sys.argv[1], sys.argv[2]
    entries = sys.argv[3:]
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "5"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"entry-ab-{label}")
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
    from khronus_spark.sources.tables import load_table

    load_table(spark, sf_dir, "documents").count()

    def run_df(df):
        df.write.format("noop").mode("overwrite").save()

    hz = os.sysconf("SC_CLK_TCK")
    jvm_pid = int(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())

    def jvm_cpu() -> float:
        with open(f"/proc/{jvm_pid}/stat") as fh:
            parts = fh.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / hz

    q = eq.queries()
    for name in entries:  # warm-up pass, untimed
        run_df(q[name](spark, sf_dir))

    wall_all = {name: [] for name in entries}
    cpu_all = {name: [] for name in entries}
    for _ in range(runs):
        for name in entries:
            c0 = jvm_cpu()
            t0 = time.perf_counter()
            run_df(q[name](spark, sf_dir))
            wall_all[name].append(round(time.perf_counter() - t0, 3))
            cpu_all[name].append(round(jvm_cpu() - c0, 3))

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
                "wall": {n: med(v) for n, v in wall_all.items()},
                "cpu": {n: med(v) for n, v in cpu_all.items()},
                "wall_all": wall_all,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

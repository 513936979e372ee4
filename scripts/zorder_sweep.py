#!/usr/bin/env python
"""Measure Z-order layout pruning on REAL parquet footers.

Writes events twice — hour-sorted (the single-key default) and
Morton-ranked over (user, hour) — one file per range partition, then
reads the actual parquet row-group min/max statistics back with pyarrow
and counts the files a predicate box would have to touch. This is the
exact pruning decision a 100 TB scan makes at plan time; the in-memory
version lives in tests/test_zorder.py, this script pins it to the file
format.

Usage: python scripts/zorder_sweep.py [sf_dir] [n_partitions]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators import zorder
    from khronus_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("ua"),
        F.expr("ts div 1000000 div 3600000").alias("hb"),
        "value",
    )
    n_rows = ev.count()

    out = tempfile.mkdtemp(prefix="zorder_sweep_")
    lin_dir, z_dir = f"{out}/linear", f"{out}/zorder"
    ev.repartitionByRange(n_parts, "hb").sortWithinPartitions("hb").write.mode(
        "overwrite"
    ).parquet(lin_dir)
    zorder.zorder_layout_ranked(ev, "ua", "hb", bits=8, n_partitions=n_parts).write.mode(
        "overwrite"
    ).parquet(z_dir)

    import pyarrow.parquet as pq

    def file_boxes(d: str):
        boxes = []
        for f in sorted(Path(d).glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            a_lo = a_hi = b_lo = b_hi = None
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                cols = {row.column(i).path_in_schema: row.column(i).statistics
                        for i in range(row.num_columns)}
                sa, sb = cols["ua"], cols["hb"]
                a_lo = sa.min if a_lo is None else min(a_lo, sa.min)
                a_hi = sa.max if a_hi is None else max(a_hi, sa.max)
                b_lo = sb.min if b_lo is None else min(b_lo, sb.min)
                b_hi = sb.max if b_hi is None else max(b_hi, sb.max)
            boxes.append((a_lo, a_hi, b_lo, b_hi))
        return boxes

    def touched(boxes, a_lo, a_hi, b_lo, b_hi):
        return sum(
            1
            for (xa, xb, ya, yb) in boxes
            if not (xb < a_lo or xa > a_hi or yb < b_lo or ya > b_hi)
        )

    lin, zb = file_boxes(lin_dir), file_boxes(z_dir)
    users = sorted(r.ua for r in ev.select("ua").distinct().collect())
    hours = sorted(r.hb for r in ev.select("hb").distinct().collect())
    FULL = (-(1 << 62), 1 << 62)
    u_box = (users[3 * len(users) // 4], users[-1])
    h_mid = hours[len(hours) // 2]
    h_box = (h_mid - 5, h_mid + 5)

    workloads = {
        "user-only (top quartile)": (*u_box, *FULL),
        "hour-only (±5h)": (*FULL, *h_box),
        "user × hour box": (*u_box, *h_box),
    }
    print(f"rows={n_rows} files/layout={len(lin)}/{len(zb)} sf_dir={sf_dir}")
    print(f"{'workload':28} {'linear':>8} {'zorder':>8}")
    for name, box in workloads.items():
        print(f"{name:28} {touched(lin, *box):>8} {touched(zb, *box):>8}")
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""SemDeDup scaling sweep: proves the assignment-stage shuffle is ~N rows.

Round-3 finding: the k-means nearest-centroid argmin was a
`row_number()` window over the N×k broadcast-cross expansion, forcing
the whole expansion through an exchange — at the derived k=⌈√N⌉ that is
an N^1.5-row shuffle. The fix (clustering.py:_assign) takes the argmin
with a map-side-combinable `min_by` aggregate instead, so the exchange
carries ≤N rows.

This script measures, per corpus size N:
  - the records written by the assignment stage's shuffle exchange,
    read from the executed plan's SQLMetrics, for BOTH forms
    (current `min_by` vs the legacy window re-created inline),
  - the wall time of each assignment form, and
  - end-to-end wall time of `semantic_dedup` at derived k.

Measured outcome (recorded in ROUND4_NOTES.md): Spark 4's
WindowGroupLimit rule already rescued the shuffle VOLUME of the window
form (a map-side group-limit runs below the exchange when the plan
matches `row_number()==1`-after-window), so both forms shuffle ~N rows
— but the window form still SORTS the full N×k expansion per partition
before the group-limit and again after the exchange, and its safety
hangs on an optimizer pattern-match that disappears under any
refactoring of the filter. The `min_by` aggregate needs no sort at all
(hash partial agg over the expansion) and is structurally ≤N rows
through the exchange on any engine.

Corpora beyond the 2 000 real sf0.1 vectors are deterministic replicas
(vec_id offset + a per-replica scalar shrink, values stay in [-1, 1]).

Usage: python scripts/semdedup_sweep.py  [prints one JSON line per N]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

NS = [500, 2000, 20000, 100000]
END_TO_END_MAX_N = 20000  # pair stage at derived k is ~N^1.5/2 rows; cap the slow part
SF_DIR = "/root/testdata/sf0.1"


def corpus(spark, n: int):
    from pyspark.sql import functions as F

    from khronus_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.count()
    if n <= base:
        return emb.where(F.col("vec_id") < n)
    reps = -(-n // base)
    r = spark.range(reps).select(F.col("id").alias("rep"))
    return (
        emb.crossJoin(F.broadcast(r))
        .select(
            (F.col("vec_id") + F.col("rep") * base).alias("vec_id"),
            F.expr(
                "transform(embedding, x -> CAST(x * (1.0D - rep * 0.001D) AS FLOAT))"
            ).alias("embedding"),
        )
        .where(F.col("vec_id") < n)
    )


def walk(jvm, node, out):
    name = node.getClass().getSimpleName()
    out.append((name, node))
    if name == "AdaptiveSparkPlanExec":
        walk(jvm, node.executedPlan(), out)
    elif name.endswith("QueryStageExec"):
        walk(jvm, node.plan(), out)
    else:
        for c in jvm.scala.collection.JavaConverters.seqAsJavaList(node.children()):
            walk(jvm, c, out)
    return out


def shuffle_records(spark, df) -> int:
    """Total shuffleRecordsWritten across the df's exchanges, after
    executing the df's OWN query execution (collect, not a write — a
    write creates a fresh QueryExecution with untouched metrics)."""
    df.collect()
    jvm = spark._jvm
    nodes = walk(jvm, df._jdf.queryExecution().executedPlan(), [])
    total = 0
    for name, node in nodes:
        if name == "ShuffleExchangeExec":
            m = jvm.scala.collection.JavaConverters.mapAsJavaMap(node.metrics())
            if "shuffleRecordsWritten" in m:
                total += m["shuffleRecordsWritten"].value()
    return total


def legacy_window_assign(q, centroids):
    """The round-3 form, kept ONLY as the sweep's control: argmin via a
    window over the expansion — shuffles all N×k scored rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from khronus_spark.operators.clustering import _DIST

    scored = q.crossJoin(F.broadcast(centroids)).withColumn("d", F.expr(_DIST))
    w = Window.partitionBy("vec_id").orderBy(F.col("d").asc(), F.col("cid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("semdedup-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators.clustering import (
        _assign,
        _kmeans_state,
        derive_k,
        semantic_dedup,
    )

    for n in NS:
        emb = corpus(spark, n).localCheckpoint(eager=True)
        k = derive_k(n)
        q, cents = _kmeans_state(emb, k=k, iters=1)
        q = q.localCheckpoint(eager=True)
        cents = cents.localCheckpoint(eager=True)

        t0 = time.perf_counter()
        rec_arrow = shuffle_records(spark, _assign(q, cents, mode="arrow"))
        t_arrow = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        rec_minby = shuffle_records(spark, _assign(q, cents, mode="sql"))
        t_minby = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        rec_window = shuffle_records(spark, legacy_window_assign(q, cents))
        t_window = round(time.perf_counter() - t0, 3)

        wall = None
        if n <= END_TO_END_MAX_N:
            t0 = time.perf_counter()
            semantic_dedup(emb).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 3)

        print(
            json.dumps(
                {
                    "n": n,
                    "k": k,
                    "assign_shuffle_rows_arrow": rec_arrow,
                    "assign_shuffle_rows_min_by": rec_minby,
                    "assign_shuffle_rows_window": rec_window,
                    "expansion_rows_nk": n * k,
                    "assign_wall_arrow_sec": t_arrow,
                    "assign_wall_min_by_sec": t_minby,
                    "assign_wall_window_sec": t_window,
                    "semantic_dedup_wall_sec": wall,
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""PQ scan-cost sweep: what the 8-byte codes buy at query time.

Per corpus size N (replicated from the sf0.1 embeddings like
semdedup_sweep), with 5 probes and the PRODUCTION sizing (sub=8, k=16,
iters=2):

  - train_s: one-off codebook training + code packing (amortized over
    every query until the next index rebuild);
  - adc_scan_s: ADC top-3 over the PREBUILT code table (LUT build +
    scan + top-k window) — the per-query cost;
  - brute_scan_s: exact integer-L2 top-3 over the full 64-dim vectors
    (the uncompressed baseline, same probes);
  - bytes ratio: code table vs raw float32 vectors (8 B vs 256 B/row).

Codes/LUT shapes are identical to the registry entry; only sizes
differ. Usage: python scripts/pq_sweep.py  [one JSON line per N]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

NS = [2_000, 20_000, 100_000]
SF_DIR = "/root/testdata/sf0.1"
PROBES = [0, 1, 2, 3, 4]


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


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from khronus_spark.operators import pq

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("pq-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sub, k, iters = 8, 16, 2
    for n in NS:
        emb = corpus(spark, n).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        state = pq._pq_state(emb, sub, k, iters, None)
        books = pq._books_from_state(state).localCheckpoint(eager=True)
        codes = pq._codes_from_state(state, k, None).localCheckpoint(eager=True)
        train_s = round(time.perf_counter() - t0, 3)

        pvec = emb.where(F.col("vec_id").isin(PROBES)).select(
            F.col("vec_id").alias("probe_id"), F.expr(pq._QUANT).alias("pe")
        )
        t0 = time.perf_counter()
        luts = pq._adc_luts(pvec, books, sub, k)
        w = Window.partitionBy("probe_id").orderBy(
            F.col("d2_adc").asc(), F.col("neighbor_id").asc()
        )
        adc = (
            codes.select(F.col("vec_id").alias("neighbor_id"), "pq_code")
            .join(F.broadcast(luts), F.col("neighbor_id") != F.col("probe_id"))
            .withColumn("d2_adc", F.expr(pq._adc_score_expr(sub, k)))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
        )
        n_adc = adc.count()
        adc_scan_s = round(time.perf_counter() - t0, 3)

        from khronus_spark.operators.projection import exact_l2_topk

        t0 = time.perf_counter()
        n_brute = exact_l2_topk(emb, PROBES, 3).count()
        brute_scan_s = round(time.perf_counter() - t0, 3)

        print(
            json.dumps(
                {
                    "corpus_n": n,
                    "train_s": train_s,
                    "adc_scan_s": adc_scan_s,
                    "brute_scan_s": brute_scan_s,
                    "rows": [n_adc, n_brute],
                    "code_bytes_per_vec": 8,
                    "raw_bytes_per_vec": 256,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

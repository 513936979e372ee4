#!/usr/bin/env python
"""Incremental-dedup scaling sweep: proves the batch probe cost is flat
in corpus size, even under a worst-case mega-bucket.

The operator's claim (operators/dedup.py::incremental_dedup): for
presence + canonical attribution, the probe side needs only the
PER-BUCKET MINIMUM doc id of the corpus index, so the new-vs-old join
probes a unique-key table — a bucket holding B corpus docs costs 1 probe
row instead of B. This sweep builds the nastiest case (EVERY corpus doc
shares one text → one LSH bucket holds the whole corpus), persists the
banded index to parquet (the production shape), and measures per corpus
size N:

  - wall time of the full incremental_dedup over a FIXED 200-doc batch
    (reading the persisted index);
  - the size of the pre-aggregated build side (computed as
    index.groupBy(band, bucket).count() — the same aggregate the
    operator's bucket_min builds), which must stay ~bands x distinct
    buckets;
  - the CONTROL: rows produced by joining the batch's banded rows
    against the RAW index (what a naive implementation shuffles) —
    grows ~ N x colliding batch rows (capped at N=100k; at 1M the
    control would materialize ~4x10^8 rows).

Usage: python scripts/incremental_sweep.py   [one JSON line per N]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

NS = [10_000, 100_000, 1_000_000]
CONTROL_MAX_N = 100_000
BATCH = 200  # 100 mega-text collisions + 100 unique docs

MEGA = "the same boilerplate header text repeated across every mirror page"


def corpus(spark, n: int):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(MEGA).alias("text")
    )


def batch_docs(spark):
    from pyspark.sql import functions as F

    half = BATCH // 2
    mega = spark.range(half).select(
        (F.col("id") + 10_000_000).alias("doc_id"), F.lit(MEGA).alias("text")
    )
    uniq = spark.range(half).select(
        (F.col("id") + 20_000_000).alias("doc_id"),
        F.concat(
            F.lit("unique u"), F.col("id"), F.lit("a u"), F.col("id"),
            F.lit("b u"), F.col("id"), F.lit("c end of document"),
        ).alias("text"),
    )
    return mega.unionByName(uniq)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from khronus_spark.operators.dedup import incremental_dedup, minhash_md5_banded

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("incremental-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="incr_index_")
    try:
        batch = batch_docs(spark).localCheckpoint(eager=True)
        for n in NS:
            index_path = f"{tmp}/index_{n}"
            t0 = time.perf_counter()
            minhash_md5_banded(corpus(spark, n)).write.mode("overwrite").parquet(
                index_path
            )
            build_s = round(time.perf_counter() - t0, 3)

            index = spark.read.parquet(index_path)
            t0 = time.perf_counter()
            out = incremental_dedup(index, batch)
            rows = out.collect()
            probe_s = round(time.perf_counter() - t0, 3)
            n_dup_corpus = sum(1 for r in rows if r.dup_src == "corpus")

            bucket_min_rows = (
                index.groupBy("band", "bucket").agg(F.min("doc_id")).count()
            )
            control_rows = None
            if n <= CONTROL_MAX_N:
                control_rows = (
                    minhash_md5_banded(batch)
                    .join(
                        index.select(
                            "band", "bucket", F.col("doc_id").alias("old_id")
                        ),
                        ["band", "bucket"],
                    )
                    .count()
                )
            print(
                json.dumps(
                    {
                        "corpus_n": n,
                        "index_build_s": build_s,
                        "probe_wall_s": probe_s,
                        "preagg_build_rows": bucket_min_rows,
                        "naive_join_rows": control_rows,
                        "batch_corpus_dups": n_dup_corpus,
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

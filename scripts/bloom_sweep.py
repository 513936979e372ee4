#!/usr/bin/env python
"""Bloom vs exact decontamination build-side sweep.

The claim behind `decontamination_bloom`: the exact scan must broadcast
every distinct eval shingle (grows linearly with the eval suite), while
the Bloom path broadcasts a bitmap capped at 2 048 words no matter how
large the suite gets — at some eval size the exact broadcast stops
fitting and the Bloom filter keeps working (with a measurable FP rate).

This sweep synthesizes corpora with eval splits of growing size and
records, for both paths: build-side rows (the thing that is or isn't
broadcastable), wall time, and the Bloom overcount (false positives) vs
the exact answer. Run: python scripts/bloom_sweep.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def synth_docs(spark, n_docs: int):
    """n_docs documents of 40 unique-ish tokens each (every doc brings
    ~38 fresh 3-gram shingles, so eval shingles grow linearly)."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(0, 39),"
            " i -> concat('w', CAST(id * 40 + i AS STRING))))"
        ).alias("text"),
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bloom-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators.dedup import (
        _tokens,
        bloom_decontamination,
        decontamination,
        shingle_array,
    )
    from khronus_spark.operators.sketches import bloom_build

    print(
        f"{'docs':>8} {'eval_shingles':>13} {'bits':>9} {'bloom_words':>11} "
        f"{'exact_s':>8} {'bloom_s':>8} {'fp_docs':>8} {'fp_hits':>8}"
    )
    for n_docs in (1_000, 10_000, 100_000):
        docs = synth_docs(spark, n_docs).cache()
        docs.count()
        is_eval = F.col("doc_id") % 11 == 0
        ev_shingles = (
            docs.where(is_eval)
            .select(_tokens().alias("t"))
            .select(F.explode(F.array_distinct(shingle_array(3))).alias("key"))
            .distinct()
        )
        n_ev = ev_shingles.count()  # the exact path's build-side rows

        t0 = time.perf_counter()
        exact = {
            r["doc_id"]: r["n_overlap"] for r in decontamination(docs).collect()
        }
        t_exact = time.perf_counter() - t0

        # undersized (2^16, saturates past ~16k keys) vs sized (>= 16n)
        sized = 1 << max(16, (16 * n_ev - 1).bit_length())
        for bits in (1 << 16, sized):
            n_words = bloom_build(ev_shingles, "key", bits).count()
            t0 = time.perf_counter()
            bloomed = {
                r["doc_id"]: r["n_bloom_hits"]
                for r in bloom_decontamination(docs, bits=bits).collect()
            }
            t_bloom = time.perf_counter() - t0

            assert set(exact) == set(bloomed)
            under = [d for d in exact if bloomed[d] < exact[d]]
            assert not under, f"false negatives: {under[:5]}"
            fp_docs = sum(1 for d in exact if bloomed[d] > exact[d])
            fp_hits = sum(bloomed[d] - exact[d] for d in exact)
            print(
                f"{n_docs:>8} {n_ev:>13} {bits:>9} {n_words:>11} "
                f"{t_exact:>8.2f} {t_bloom:>8.2f} {fp_docs:>8} {fp_hits:>8}"
            )
            if bits == sized:
                break  # fixed == sized at the smallest scale
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

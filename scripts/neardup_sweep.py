#!/usr/bin/env python
"""Scaling measurement for the round-5 near-dup rewire.

`near_duplicates_jaccard` used to block candidates on identical char
length — a self-join whose common-length classes grow toward B²/2 pairs
per class. Round 5 rewired it onto star-capped banded-LSH candidates
with exact Jaccard only on candidates. This sweep measures both
formulations on growing corpora built by replicating sf0.1 documents
with per-copy suffix tokens (each copy stays a NEAR-dup of its original
— shingle similarity high, byte-identity broken, lengths perturbed),
so the LSH path faces real candidate mass, not an empty graph.

The old formulation is reproduced inline (it no longer exists in the
library) and only run while it stays measurable.

Prints one JSON line per corpus size; paste into the round notes.
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
OLD_PATH_MAX_N = 20_000  # beyond this the length-blocked join is the point


def main() -> None:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("khronus-neardup-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators.dedup import near_duplicates_jaccard, _tokens
    from khronus_spark.sources.tables import load_table

    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    n_base = base.count()

    def corpus(copies: int) -> DataFrame:
        parts = []
        for c in range(copies):
            part = base.select(
                (F.col("doc_id") + c * n_base).alias("doc_id"),
                (
                    F.col("text")
                    if c == 0
                    else F.concat(F.col("text"), F.lit(f" copytag{c}"))
                ).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + (len(f" copytag{c}") if c else 0)).alias(
                    "n_chars"
                ),
            )
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def old_near_dup(docs: DataFrame, threshold_bp: int = 3000) -> DataFrame:
        """The pre-round-5 length-blocked formulation, verbatim."""
        toks = docs.select(
            "doc_id",
            F.col("n_chars"),
            F.array_sort(F.array_distinct(_tokens())).alias("tokens"),
        )
        a, b = toks.alias("a"), toks.alias("b")
        pairs = a.join(
            b,
            (F.col("a.n_chars") == F.col("b.n_chars"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        jac = F.expr(
            "size(array_intersect(a.tokens, b.tokens)) * 10000L "
            "div size(array_union(a.tokens, b.tokens))"
        )
        return pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard_bp"),
        ).where(F.col("jaccard_bp") >= 3000)

    for copies in (1, 4, 16, 64):
        docs = corpus(copies).localCheckpoint(eager=True)
        n = docs.count()
        t0 = time.perf_counter()
        pairs_lsh = near_duplicates_jaccard(docs).count()
        t_lsh = round(time.perf_counter() - t0, 2)
        t_old = pairs_old = None
        if n <= OLD_PATH_MAX_N:
            t0 = time.perf_counter()
            pairs_old = old_near_dup(docs).count()
            t_old = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "lsh_pairs": pairs_lsh,
                    "lsh_sec": t_lsh,
                    "length_blocked_pairs": pairs_old,
                    "length_blocked_sec": t_old,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

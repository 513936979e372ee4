#!/usr/bin/env python
"""Scaling measurement for the round-6 map-side quality rewire.

`curated_docs` (and corpus_prep / canonical_by_quality /
source_health_report) used to attach per-doc quality metrics by
joining `quality_score(docs)` back on doc_id. That join LOOKS free at
test scale because the derived side fits the 10 MB
autoBroadcastJoinThreshold — but the derived side grows with the
corpus, so past the threshold the optimizer flips it to a full-corpus
sort-merge self-join: two extra shuffles of the whole table to attach
columns a projection computes for free. Round 6 replaced the join
with `text.with_quality` (map-side column attach).

This sweep reproduces the old join form inline and measures both on
corpora built by replicating sf0.1 documents with distinct doc_ids,
recording wall time AND which join strategy the optimizer actually
picked — the point is the STRATEGY FLIP at the broadcast threshold,
which the small-scale bench never shows.

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
QUALITY_MIN_BP = 5000
MIN_TOKENS = 10


def main() -> None:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("khronus-curation-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators.text import quality_score, with_quality
    from khronus_spark.sources.tables import load_table

    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    n_base = base.count()

    def corpus(copies: int) -> DataFrame:
        parts = []
        for c in range(copies):
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(c * 10_000_000)).alias("doc_id"),
                    "text",
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    gate = (F.col("quality_bp") >= QUALITY_MIN_BP) & (
        F.col("n_tokens") >= MIN_TOKENS
    )

    def join_form(docs: DataFrame) -> DataFrame:
        # the pre-round-6 formulation, reproduced inline
        q = quality_score(docs).select("doc_id", "n_tokens", "quality_bp")
        return docs.join(q, "doc_id").where(gate)

    def map_form(docs: DataFrame) -> DataFrame:
        return with_quality(docs).where(gate)

    def run(df: DataFrame) -> tuple[float, str]:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "SortMergeJoin" in plan:
            strategy = "SortMergeJoin"
        elif "BroadcastHashJoin" in plan:
            strategy = "BroadcastHashJoin"
        else:
            strategy = "none"
        return wall, strategy

    # the derived quality side is ~24 B/doc: it crosses the 10 MB
    # autoBroadcastJoinThreshold around ~400k docs — the sweep brackets
    # that flip (1× warms the JIT and is reported for completeness)
    for copies in (1, 4, 16, 64, 256):
        docs = corpus(copies)
        n_docs = n_base * copies
        jw, js = run(join_form(docs))
        mw, ms = run(map_form(docs))
        print(
            json.dumps(
                {
                    "docs": n_docs,
                    "join_wall_s": round(jw, 2),
                    "join_strategy": js,
                    "mapside_wall_s": round(mw, 2),
                    "mapside_strategy": ms,
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()

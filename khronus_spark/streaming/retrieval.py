"""Streaming inverted-index maintenance: keep the BM25 postings table
current as documents arrive, without ever re-tokenizing the corpus.

`operators/text.py::bm25_build_postings` builds the (doc_id, dl, w, tf)
table for a corpus at rest; a continuous crawl wants the retrieval
index to GROW with each micro-batch — the same production loop as
`streaming/dedup.py::run_streaming_incremental_dedup` ("new crawl
lands → index grows, corpus never re-scanned") applied to the sparse
retrieval index instead of the LSH bucket index. The reference has no
analogue (its streams are metric measurements); this is the
Spark-native extension of its incremental-processing posture
(`model/TimeWindowChain.scala:42-55`).

Correctness shape: a document lives wholly inside one micro-batch and
the postings group key is (doc_id, dl, w), so per-batch postings are
DISJOINT by doc and their union equals `bm25_build_postings` over the
union of all batches — no merge step, no double counting (pinned
part-for-part in tests/test_streaming_retrieval.py, and the scores
from the streamed index are pinned bit-identical to batch
`bm25_rank`). Each batch writes mode("overwrite") into its own
`batch=<id>` subdir, so a replayed micro-batch (checkpoint recovery)
rewrites exactly its own part — replay-idempotent, like the dedup
index loop.

Scale shape: per trigger the work is one map-side-combinable shuffle
over THAT batch only; the accumulated index grows by ≤ batch tokens
short rows. Query-time `bm25_rank_indexed` reads the accumulated
parquet directly; compact the parts offline whenever file count
matters (plain parquet rewrite — the table is already unique-keyed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khronus_spark.operators.text import bm25_build_postings


def run_streaming_postings_update(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
):
    """Fold each arriving micro-batch of documents into the persisted
    postings index (one `batch=<id>` parquet subdir per trigger;
    availableNow so tests and backfills drain deterministically)."""

    def process(batch_docs: DataFrame, batch_id: int) -> None:
        bm25_build_postings(batch_docs).write.mode("overwrite").parquet(
            f"{index_path}/batch={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_streamed_postings(
    spark, index_path: str, upto_batch: int | None = None
) -> DataFrame:
    """The accumulated postings table across landed batches — feed
    straight into `bm25_rank_indexed`. `upto_batch` pins the
    index-as-of-refresh SNAPSHOT (batches ≤ the bound; Hive-style
    partition pruning, no late dirs touched) — REQUIRED when serving
    the exact-pruned path against periodically refreshed constants:
    ceilings upper-bound only the postings they were built from, so
    the pruned query must see exactly that snapshot
    (`text.write_bm25_constants` docstring states the contract)."""
    df = spark.read.parquet(index_path)
    if upto_batch is not None:
        df = df.where(F.col("batch") <= upto_batch)
    return df.select("doc_id", "dl", "w", "tf")

"""Streaming ANN index maintenance — the DENSE twin of the streamed
BM25 postings (`streaming/retrieval.py`): continuously fold arriving
embedding micro-batches into a persisted IVF-PQ index.

The index's trained state (PQ codebooks + coarse centroids) is FROZEN
at build time — the FAISS deployment contract: `index.add()` never
retrains, and `operators/pq.py::ivf_pq_encode` is that add(), pinned
bit-identical to encoding in one shot. Each trigger lands its encoded
rows as a `coded_stream/batch=<id>` parquet subdir: append-only,
batch-keyed, so a checkpoint replay REPLACES a batch dir with
recomputed-identical content (effectively-once by content — the same
discipline as the postings twin), and `read_streamed_coded`'s
`upto_batch` bound gives queries a pinned snapshot (Hive-style
partition pruning; late dirs untouched) for serving consistency.

Drift caveat, stated not hidden: frozen codebooks quantize NEW vectors
with the training distribution's geometry. If the embedding
distribution drifts, ADC error grows silently — production retrains
periodically and swaps indexes atomically (the
`refresh_streamed_constants` generation-dir pattern applies verbatim);
`quantize.embedding_dim_stats` over the new batches is the drift
detector this repo ships.

Scale shape per trigger: PQ encode is a broadcast-books map pass;
coarse routing is a broadcast-centroids max_by (shuffle carries ≤N
rows); the write is one batch-sized dir. Nothing re-reads the standing
index to add to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khronus_spark.operators.pq import ivf_pq_encode


def run_streaming_ivf_pq_add(
    vectors_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
):
    """Fold each arriving micro-batch of (vec_id, embedding) rows into
    the persisted IVF-PQ index at `index_path` (as written by
    `write_ivf_pq_index`). Precondition: streamed vec_ids are new
    (disjoint from the base index and earlier batches) — the crawl
    ingest contract shared with the incremental-dedup index."""

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        books = spark.read.parquet(f"{index_path}/books")
        cents = spark.read.parquet(f"{index_path}/centroids")
        ivf_pq_encode(batch, books, cents).write.mode("overwrite").parquet(
            f"{index_path}/coded_stream/batch={batch_id}"
        )

    return (
        vectors_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_streamed_coded(
    spark, index_path: str, upto_batch: int | None = None
) -> DataFrame:
    """The standing coded table: the build-time inverted lists plus
    every streamed batch (≤ `upto_batch` when pinning a serving
    snapshot) — feed straight into `ivf_pq_topk_indexed`."""
    import os

    base = spark.read.parquet(f"{index_path}/coded")
    stream_dir = f"{index_path}/coded_stream"
    if not os.path.isdir(stream_dir):
        return base
    added = spark.read.parquet(stream_dir)
    if upto_batch is not None:
        added = added.where(F.col("batch") <= upto_batch)
    return base.unionByName(
        added.select("vec_id", "pq_code", "centroid_id")
    )

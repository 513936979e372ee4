"""Streaming IVF-PQ maintenance: streamed adds == one-shot encode over
the same frozen books (content-level stream==batch), replay
idempotence, and snapshot pinning via upto_batch."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from khronus_spark.operators.pq import (
    ivf_pq_build_index,
    ivf_pq_encode,
    ivf_pq_topk_indexed,
    write_ivf_pq_index,
)
from khronus_spark.sources.tables import load_table
from khronus_spark.streaming.ann import (
    read_streamed_coded,
    run_streaming_ivf_pq_add,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _stream_chunks(spark, tmp, chunks, index_path, ckpt):
    landing = f"{tmp}/landing_{ckpt}"
    os.makedirs(landing, exist_ok=True)
    schema = chunks[0].schema
    stream = spark.readStream.schema(schema).parquet(landing)
    for i, chunk in enumerate(chunks):
        stage = f"{tmp}/stage_{ckpt}_{i}"
        chunk.coalesce(1).write.mode("overwrite").parquet(stage)
        for j, f in enumerate(sorted(os.listdir(stage))):
            if f.endswith(".parquet"):
                shutil.copy(f"{stage}/{f}", f"{landing}/c{i}_{j}.parquet")
        q = run_streaming_ivf_pq_add(stream, index_path, f"{tmp}/{ckpt}")
        q.awaitTermination(120)


def test_streamed_adds_match_one_shot_encode_and_queries_agree(
    spark, sf_dir, tmp_path
):
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") < 300)
    new = emb.where(F.col("vec_id") >= 300).select("vec_id", "embedding")
    index_path = str(tmp_path / "ivfpq")

    books, coded, cents = ivf_pq_build_index(base)
    write_ivf_pq_index(books, coded, cents, index_path)

    # two in-order chunks of new vectors
    chunks = [
        new.where(F.col("vec_id") < 400),
        new.where(F.col("vec_id") >= 400),
    ]
    _stream_chunks(spark, str(tmp_path), chunks, index_path, "ck1")

    spark_books = spark.read.parquet(f"{index_path}/books")
    spark_cents = spark.read.parquet(f"{index_path}/centroids")
    got = read_streamed_coded(spark, index_path)
    # content-level stream==batch: the streamed rows equal ONE encode
    # call over all new vectors against the same frozen books
    want = spark.read.parquet(f"{index_path}/coded").unionByName(
        ivf_pq_encode(new, spark_books, spark_cents)
    )
    assert _rows(got) == _rows(want)

    # and the query face agrees row-for-row on the two coded tables
    probes = [5, 310, 450]
    pv = emb.where(F.col("vec_id").isin(probes)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    q_stream = ivf_pq_topk_indexed(spark_books, got, spark_cents, pv)
    q_batch = ivf_pq_topk_indexed(spark_books, want, spark_cents, pv)
    assert _rows(q_stream) == _rows(q_batch) and q_stream.count() > 0


def test_replay_replaces_batches_identically_and_snapshot_pins(
    spark, sf_dir, tmp_path
):
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") < 300)
    new = emb.where(F.col("vec_id") >= 300).select("vec_id", "embedding")
    index_path = str(tmp_path / "ivfpq")
    books, coded, cents = ivf_pq_build_index(base)
    write_ivf_pq_index(books, coded, cents, index_path)

    chunks = [
        new.where(F.col("vec_id") < 400),
        new.where(F.col("vec_id") >= 400),
    ]
    _stream_chunks(spark, str(tmp_path), chunks, index_path, "ck1")
    before = _rows(read_streamed_coded(spark, index_path))

    # full redelivery from a fresh checkpoint: batch dirs REPLACED
    # with recomputed-identical content
    _stream_chunks(spark, str(tmp_path), chunks, index_path, "ck2")
    assert _rows(read_streamed_coded(spark, index_path)) == before

    # snapshot pinning: upto_batch=0 sees base + chunk 1 only
    pinned = read_streamed_coded(spark, index_path, upto_batch=0)
    ids = {r["vec_id"] for r in pinned.select("vec_id").collect()}
    assert max(i for i in ids if i >= 300) < 400
    assert any(i < 300 for i in ids)

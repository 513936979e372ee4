"""Streaming corpus preparation: cumulative accounting == the batch
`corpus_prep` under in-order delivery, cross-batch dedup claims,
replay idempotence, and claims+accounting landing as one commit."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from khronus_spark.operators.curation import corpus_prep
from khronus_spark.sources.tables import load_table
from khronus_spark.sources.txnlog import TxnTable
from khronus_spark.streaming.corpus import (
    read_corpus_prep,
    run_streaming_corpus_prep,
)

EVAL_MOD = 11


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _stream_chunks(spark, tmp, table, chunks, eval_docs, ckpt, **kw):
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
        q = run_streaming_corpus_prep(
            stream, table, eval_docs, f"{tmp}/{ckpt}", eval_mod=EVAL_MOD, **kw
        )
        q.awaitTermination(180)


def test_stream_equals_batch_corpus_prep(spark, sf_dir, tmp_path):
    """In-order chunked delivery reproduces the batch accounting
    EXACTLY (keep-first == keep-min under ascending doc_ids), with the
    eval split frozen up front."""
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.where(F.col("doc_id") % EVAL_MOD == 0)
    train = docs.where(F.col("doc_id") % EVAL_MOD != 0)
    # three in-order chunks by doc_id terciles
    ids = sorted(r["doc_id"] for r in train.select("doc_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    chunks = [
        train.where(F.col("doc_id") <= c1),
        train.where((F.col("doc_id") > c1) & (F.col("doc_id") <= c2)),
        train.where(F.col("doc_id") > c2),
    ]
    table = TxnTable(str(tmp_path / "t"))
    _stream_chunks(spark, str(tmp_path), table, chunks, eval_docs, "ck1")

    got = read_corpus_prep(spark, table)
    want = corpus_prep(docs, eval_mod=EVAL_MOD)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)
    # one commit per non-empty micro-batch, each carrying BOTH
    # namespaces (claims + accounting move together)
    v = table.version()
    assert v >= 3
    for ver in range(1, v + 1):
        keys = set(table.commit_info(ver)["partitions"])
        assert any(k.startswith("md5/") for k in keys), keys
        assert any(k.startswith("acct/") for k in keys), keys


def test_cross_batch_dup_claims_and_replay(spark, tmp_path):
    """A text repeated in a LATER batch is dup_drop'd there (the claim
    index crossed the batch boundary); full redelivery from a fresh
    checkpoint replaces the batch partitions with identical content —
    the accounting does not change."""
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    mk = lambda rows: spark.createDataFrame(rows, schema)
    good = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet field while the morning light rises slowly"
    )
    other = (
        "a completely different document about spark engines and their "
        "query optimizers which keeps the planner busy all day long"
    )
    chunks = [
        mk([(1, good, "en", "web", 120), (2, other, "en", "web", 118)]),
        mk([(3, good, "en", "web", 120)]),  # dup of batch-1's doc 1
    ]
    eval_docs = mk([(0, "held out benchmark text entirely disjoint", "en", "eval", 40)])
    table = TxnTable(str(tmp_path / "t"))
    # synthetic prose scores ~2000-2300 bp on the quality ladder; gate
    # at 1000 so the dedup path (not the quality gate) decides
    _stream_chunks(
        spark, str(tmp_path), table, chunks, eval_docs, "ck1",
        quality_min_bp=1000,
    )

    acct = {r["lang"]: r for r in read_corpus_prep(spark, table).collect()}
    assert acct["en"]["n_docs_dup_drop"] == 1
    assert acct["en"]["n_docs_kept"] == 2
    before = _rows(read_corpus_prep(spark, table))

    # full redelivery, fresh checkpoint: same content, claims replaced
    _stream_chunks(
        spark, str(tmp_path), table, chunks, eval_docs, "ck2",
        quality_min_bp=1000,
    )
    assert _rows(read_corpus_prep(spark, table)) == before

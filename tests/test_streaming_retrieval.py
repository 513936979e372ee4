"""Streaming postings maintenance == batch index build, bit for bit.

Three contracts:
1. build/query split identity — `bm25_rank_indexed` over a
   parquet-round-tripped `bm25_build_postings` table equals
   `bm25_rank` over the raw corpus, row for row (the split changes no
   value);
2. streamed index == batch index — the union of per-micro-batch
   postings parts equals one batch build over all documents (a doc
   lives wholly in one batch, so parts are disjoint by doc);
3. replay idempotence — re-running the drained stream with the same
   checkpoint adds nothing.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from khronus_spark.operators.text import (
    bm25_build_postings,
    bm25_rank,
    bm25_rank_indexed,
    read_bm25_index,
    write_bm25_index,
)
from khronus_spark.sources.tables import load_table
from khronus_spark.streaming.retrieval import (
    read_streamed_postings,
    run_streaming_postings_update,
)

EVAL_MOD = 97


def _corpus_and_queries(docs):
    corpus = docs.where(F.col("doc_id") % EVAL_MOD != 0)
    queries = docs.where(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return corpus, queries


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_indexed_query_equals_inline_rank(spark, oracle_sf_dir):
    docs = load_table(spark, oracle_sf_dir, "documents")
    corpus, queries = _corpus_and_queries(docs)
    tmp = tempfile.mkdtemp(prefix="khronus_bm25idx_")
    write_bm25_index(bm25_build_postings(corpus), f"{tmp}/postings")
    got = bm25_rank_indexed(
        read_bm25_index(spark, f"{tmp}/postings"), queries
    )
    want = bm25_rank(docs, eval_mod=EVAL_MOD)
    assert _rows(got) == _rows(want)


@pytest.fixture(scope="module")
def staged_docs(spark, sf_dir):
    """Corpus documents staged as 3 files → 3 micro-batches."""
    tmp = tempfile.mkdtemp(prefix="khronus_sbm25_")
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % EVAL_MOD != 0)
    lo, hi = corpus.agg(F.min("doc_id"), F.max("doc_id")).first()
    span = (hi - lo) + 1
    chunked = corpus.withColumn(
        "chunk", ((F.col("doc_id") - lo) * 3 / span).cast("int")
    )
    for i in range(3):
        chunked.where(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/in/chunk={i}")
    return tmp, docs


def test_streamed_postings_equal_batch_build_and_scores(spark, staged_docs):
    tmp, docs = staged_docs
    corpus, queries = _corpus_and_queries(docs)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/in/*")
    )
    q = run_streaming_postings_update(
        stream, index_path=f"{tmp}/idx", checkpoint_path=f"{tmp}/ckpt"
    )
    q.awaitTermination(300)

    streamed = read_streamed_postings(spark, f"{tmp}/idx")
    batch = bm25_build_postings(corpus)
    assert _rows(streamed) == _rows(batch)

    # scores from the streamed index == the batch rank, bit for bit
    got = bm25_rank_indexed(streamed, queries)
    want = bm25_rank(docs, eval_mod=EVAL_MOD)
    assert _rows(got) == _rows(want)

    # replay idempotence: draining the same (exhausted) stream with the
    # same checkpoint must not change the index
    before = _rows(streamed)
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/in/*")
    )
    q2 = run_streaming_postings_update(
        stream2, index_path=f"{tmp}/idx", checkpoint_path=f"{tmp}/ckpt"
    )
    q2.awaitTermination(300)
    assert _rows(read_streamed_postings(spark, f"{tmp}/idx")) == before


def test_hybrid_from_streamed_postings_matches_batch_face(
    spark, staged_docs, sf_dir
):
    """The continuously-maintained lexical index is a drop-in for the
    batch-built one inside the PRODUCTION hybrid face: fusing the
    streamed postings (df/stats derived at query time — the streamed
    layout carries postings only) with the persisted PQ semantic
    branch yields bit-identical fused ranks to the batch-indexed
    hybrid. Stream==batch, composed one level up."""
    from khronus_spark.operators import pq as pq_ops
    from khronus_spark.operators import retrieval as ret

    tmp, docs = staged_docs
    corpus, queries = _corpus_and_queries(docs)
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") % EVAL_MOD == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    books, codes = pq_ops.pq_build_index(emb, sub=4, k=8, iters=1)

    # drive an independent stream into this test's own index dir (no
    # ordering dependency on the other test's checkpoint)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/in/*")
    )
    q = run_streaming_postings_update(
        stream, index_path=f"{tmp}/idx_h", checkpoint_path=f"{tmp}/ckpt_h"
    )
    q.awaitTermination(300)
    streamed = read_streamed_postings(spark, f"{tmp}/idx_h")
    got = ret.hybrid_rrf_topk_indexed(
        streamed, books, codes, queries, probes
    )
    want = ret.hybrid_rrf_topk_indexed(
        bm25_build_postings(corpus), books, codes, queries, probes
    )
    assert _rows(got) == _rows(want) and _rows(got)


def test_refreshed_constants_enable_pruned_path_on_streamed_index(
    spark, staged_docs
):
    """A hot streamed index gains the exact-pruned query path by a
    periodic constants refresh (`write_bm25_constants` over the
    accumulated postings into a sibling dir): pruned scores from the
    streamed postings + refreshed constants equal the batch rank and
    the unpruned indexed face, bit for bit."""
    from khronus_spark.operators.text import (
        bm25_rank_indexed_pruned,
        read_bm25_max_impact,
        read_bm25_stats,
        write_bm25_constants,
    )

    tmp, docs = staged_docs
    corpus, queries = _corpus_and_queries(docs)
    # own stream run (no dependence on sibling tests' index dirs)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/in/*")
    )
    q = run_streaming_postings_update(
        stream, index_path=f"{tmp}/idx_c", checkpoint_path=f"{tmp}/ckpt_c"
    )
    q.awaitTermination(300)
    streamed = read_streamed_postings(spark, f"{tmp}/idx_c")
    write_bm25_constants(streamed, f"{tmp}/const")
    df_t, n_docs, avgdl_m = read_bm25_stats(spark, f"{tmp}/const")
    mi = read_bm25_max_impact(spark, f"{tmp}/const")
    got = bm25_rank_indexed_pruned(
        streamed, mi, queries, df_t=df_t, collection_stats=(n_docs, avgdl_m)
    )
    want = bm25_rank(docs, eval_mod=EVAL_MOD)
    assert _rows(got) == _rows(want)


def test_empty_corpus_index_builds_and_reads(spark, tmp_path):
    """Degenerate but reachable (empty carve; constants refresh before
    the first micro-batch): the index build and the stats read-back
    must complete with (0, 0) instead of dying on a NULL avgdl."""
    import tempfile

    from khronus_spark.operators.text import (
        read_bm25_max_impact,
        read_bm25_stats,
        write_bm25_index,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "empty_idx")
    write_bm25_index(bm25_build_postings(docs.where("doc_id < 0")), path)
    df_t, n_docs, avgdl_m = read_bm25_stats(spark, path)
    assert (n_docs, avgdl_m) == (0, 0) and df_t.count() == 0
    assert read_bm25_max_impact(spark, path).count() == 0


def test_refresh_boundary_pins_the_pruned_snapshot(spark, staged_docs):
    """The recorded-boundary loop: refresh_streamed_constants pins the
    snapshot; batches landing AFTER the refresh are invisible to the
    pruned read (index-as-of-refresh) until the next refresh picks
    them up; constants without a boundary are refused."""
    from khronus_spark.operators.text import bm25_rank_indexed_pruned
    from khronus_spark.streaming.retrieval import (
        landed_batches,
        read_pruned_snapshot,
        refresh_streamed_constants,
    )

    tmp, docs = staged_docs
    corpus, queries = _corpus_and_queries(docs)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/in/*")
    )
    q = run_streaming_postings_update(
        stream, index_path=f"{tmp}/idx_b", checkpoint_path=f"{tmp}/ckpt_b"
    )
    q.awaitTermination(300)
    boundary = refresh_streamed_constants(spark, f"{tmp}/idx_b", f"{tmp}/cb")
    assert boundary == landed_batches(f"{tmp}/idx_b")[-1]

    # a late batch lands AFTER the refresh (simulated directly)
    late = spark.createDataFrame(
        [(424242, "zyzzyva " * 5, "en", "s", 40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    bm25_build_postings(late).write.mode("overwrite").parquet(
        f"{tmp}/idx_b/batch={boundary + 1}"
    )

    postings, df_t, stats, mi = read_pruned_snapshot(
        spark, f"{tmp}/idx_b", f"{tmp}/cb"
    )
    got = bm25_rank_indexed_pruned(
        postings, mi, queries, df_t=df_t, collection_stats=stats
    )
    # the pinned snapshot equals the pre-late-batch batch rank, and
    # the late doc is invisible
    want = bm25_rank(docs, eval_mod=EVAL_MOD)
    assert _rows(got) == _rows(want)
    assert postings.where("doc_id = 424242").count() == 0

    # next refresh picks the late batch up
    b2 = refresh_streamed_constants(spark, f"{tmp}/idx_b", f"{tmp}/cb2")
    assert b2 == boundary + 1
    p2, _, _, _ = read_pruned_snapshot(spark, f"{tmp}/idx_b", f"{tmp}/cb2")
    assert p2.where("doc_id = 424242").count() > 0

    # boundary-less constants refuse the pruned snapshot read
    from khronus_spark.operators.text import write_bm25_constants

    write_bm25_constants(postings, f"{tmp}/cnb")
    with pytest.raises(ValueError, match="boundary"):
        read_pruned_snapshot(spark, f"{tmp}/idx_b", f"{tmp}/cnb")


def test_refresh_in_place_swaps_generations_atomically(spark, staged_docs):
    """Refreshing a const_path that live queries read concurrently:
    each refresh lands in a fresh generation dir published by an
    atomic CURRENT-pointer swap — a reader that resolved the old
    generation keeps a complete, consistent view (the dir is retained
    one refresh), a crashed refresh (generation written, pointer
    never swapped) leaves serving untouched, and generations two
    refreshes old are pruned."""
    import os

    from khronus_spark.streaming.retrieval import (
        _resolve_const_dir,
        read_pruned_snapshot,
        refresh_streamed_constants,
    )

    tmp, docs = staged_docs
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/in/*")
    )
    q = run_streaming_postings_update(
        stream, index_path=f"{tmp}/idx_g", checkpoint_path=f"{tmp}/ckpt_g"
    )
    q.awaitTermination(300)
    cpath = f"{tmp}/cg"
    b1 = refresh_streamed_constants(spark, f"{tmp}/idx_g", cpath)
    gen1 = _resolve_const_dir(cpath)
    assert gen1 != cpath and os.path.isdir(gen1)

    # an in-flight reader resolved gen1; a late batch + second refresh
    # must not disturb it
    late = spark.createDataFrame(
        [(535353, "xylophone " * 4, "en", "s", 40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from khronus_spark.operators.text import bm25_build_postings

    bm25_build_postings(late).write.mode("overwrite").parquet(
        f"{tmp}/idx_g/batch={b1 + 1}"
    )
    b2 = refresh_streamed_constants(spark, f"{tmp}/idx_g", cpath)
    assert b2 == b1 + 1
    gen2 = _resolve_const_dir(cpath)
    assert gen2 != gen1
    # old generation retained and complete (in-flight reader's view)
    from khronus_spark.operators.text import read_bm25_boundary

    assert read_bm25_boundary(spark, gen1) == b1
    # the published snapshot serves the new boundary
    p2, _, _, _ = read_pruned_snapshot(spark, f"{tmp}/idx_g", cpath)
    assert p2.where("doc_id = 535353").count() > 0

    # crash simulation: a half-written generation without the pointer
    # swap is invisible — serving stays on gen2
    os.makedirs(os.path.join(cpath, "gen-999999999999-deadbeef"))
    assert _resolve_const_dir(cpath) == gen2

    # a third refresh in quick succession must NOT prune gen1 under
    # the default age grace — two back-to-back refreshes (or a query
    # slower than one refresh interval) could otherwise rmtree a
    # generation an in-flight reader already resolved via CURRENT
    refresh_streamed_constants(spark, f"{tmp}/idx_g", cpath)
    assert os.path.isdir(gen1)
    assert os.path.isdir(gen2)

    # with the grace waived (reader quiescence externally guaranteed)
    # superseded generations beyond current+previous are pruned
    gen3 = _resolve_const_dir(cpath)
    refresh_streamed_constants(spark, f"{tmp}/idx_g", cpath, grace_seconds=0)
    assert not os.path.isdir(gen1)
    assert not os.path.isdir(gen2)
    assert os.path.isdir(gen3)  # previous of the newest: always kept


def test_refresh_boundary_skips_mid_commit_batch(spark, staged_docs, tmp_path):
    """r13 review finding: the refresh boundary came from directory
    NAMES alone, so a postings batch dir mid-overwrite by a hot
    trigger (no _SUCCESS yet) was counted as covered while its rows
    were partially visible — the recorded ceilings then under-state
    that batch and the pruned path silently drops documents once the
    trigger commits. landed_batches now counts committed dirs only."""
    import os

    from khronus_spark.operators.text import bm25_build_postings
    from khronus_spark.streaming.retrieval import (
        landed_batches,
        refresh_streamed_constants,
    )

    _tmp, docs = staged_docs
    index_path = str(tmp_path / "postings")
    bm25_build_postings(docs.where("doc_id % 2 = 0")).write.parquet(
        f"{index_path}/batch=0"
    )
    # a MID-COMMIT batch dir: exists, has data files, no _SUCCESS yet
    # (Spark's overwrite deletes the marker first and commits it last)
    bm25_build_postings(docs.where("doc_id % 2 = 1")).write.parquet(
        f"{index_path}/batch=1"
    )
    os.remove(f"{index_path}/batch=1/_SUCCESS")

    assert landed_batches(index_path) == [0]
    assert landed_batches(index_path, committed_only=False) == [0, 1]

    const_path = str(tmp_path / "const")
    boundary = refresh_streamed_constants(spark, index_path, const_path)
    assert boundary == 0  # the uncommitted batch stays past the boundary

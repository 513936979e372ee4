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
    # explicit schema on the self-owned postings layout — no
    # footer-inference job per read (the r13 reader-schema pattern);
    # `batch` stays a declared partition column so upto_batch pruning
    # is unchanged
    df = spark.read.schema(
        "doc_id long, dl long, w string, tf long, batch int"
    ).parquet(index_path)
    if upto_batch is not None:
        df = df.where(F.col("batch") <= upto_batch)
    return df.select("doc_id", "dl", "w", "tf")


def landed_batches(index_path: str, committed_only: bool = True) -> list[int]:
    """Batch ids with landed postings parts (directory names, no data
    read) — the refresh boundary source. Only COMMITTED dirs count
    (Spark's `_SUCCESS` marker, default on): a dir mid-overwrite by a
    hot trigger is partially (or not at all) visible, and counting it
    would let `refresh_streamed_constants` record a snapshot boundary
    whose ceilings under-state that batch's postings — after the
    trigger commits, the pruned query pairs the FULL postings with the
    too-low ceilings and silently drops documents that should score
    (the r13 review finding; `streaming/ann.py::_carry_forward` guards
    the same race the same way). The skipped batch is simply past the
    boundary: the next refresh covers it."""
    import os

    out = []
    for name in os.listdir(index_path):
        if name.startswith("batch="):
            try:
                b = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if committed_only and not os.path.isfile(
                os.path.join(index_path, name, "_SUCCESS")
            ):
                continue
            out.append(b)
    return sorted(out)


def resolve_generation_dir(path: str) -> str:
    """The directory a generation-published artifact actually lives
    in: a refreshed layout publishes generations under `path` with a
    CURRENT pointer file (atomic swap — see `publish_generation`); a
    flat layout (batch-built straight into the dir) is itself. Shared
    by the constants refresh here and the trained-state refresh in
    `streaming/ann.py`."""
    import os

    cur = os.path.join(path, "CURRENT")
    if os.path.isfile(cur):
        with open(cur) as fh:
            return os.path.join(path, fh.read().strip())
    return path


# historical private name, still used by tests
_resolve_const_dir = resolve_generation_dir


def new_generation(root: str) -> tuple[str, str]:
    """A fresh UNPUBLISHED generation under `root`: returns (name,
    dir). The single source of the `gen-<token>` naming convention
    that `resolve_generation_dir` dereferences and
    `publish_generation` prunes — writers (`operators/pq.py`'s two
    index writers, `streaming/ann.py`'s refresh) build their artifacts
    into the returned dir and then make them visible with ONE
    `publish_generation` call."""
    import os
    import uuid

    os.makedirs(root, exist_ok=True)
    gen = f"gen-{uuid.uuid4().hex[:12]}"
    return gen, os.path.join(root, gen)


def publish_generation(root: str, gen: str, grace_seconds: float) -> None:
    """Atomically publish generation dir `gen` (already fully written
    under `root`) as CURRENT, then prune superseded generations by AGE
    (see the REFRESH-WHILE-SERVING contract on
    `refresh_streamed_constants`: the current and immediately-previous
    generations are kept unconditionally; anything else only falls
    past `grace_seconds` of mtime age, so an in-flight reader that
    resolved CURRENT before this publish keeps a consistent view)."""
    import os
    import shutil
    import time
    import uuid

    prev = None
    cur = os.path.join(root, "CURRENT")
    if os.path.isfile(cur):
        with open(cur) as fh:
            prev = fh.read().strip()
    tmp = os.path.join(root, f".CURRENT.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(gen)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, cur)  # the atomic publish
    now = time.time()
    for name in os.listdir(root):
        full = os.path.join(root, name)
        if (
            name.startswith("gen-")
            and name not in (gen, prev)
            and os.path.isdir(full)
        ):
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue  # raced with a concurrent prune
            if age >= grace_seconds:
                shutil.rmtree(full, ignore_errors=True)


def refresh_streamed_constants(
    spark, index_path: str, const_path: str, grace_seconds: float = 600.0
) -> int:
    """The periodic constants refresh of a hot streamed index, with
    the snapshot boundary RECORDED: read the postings as of the
    currently landed batches, write df/stats/max-impact ceilings plus
    that boundary into `const_path`, and return the boundary.
    `read_pruned_snapshot` then reconstructs a self-consistent
    (postings, constants) pair — the exactness contract of the pruned
    path without the caller tracking batch ids by hand.

    REFRESH-WHILE-SERVING safety: each refresh writes its four tables
    into a FRESH generation dir (`gen-<boundary>-<token>/`) and then
    publishes it by atomically replacing the CURRENT pointer file
    (os.replace — POSIX rename atomicity). A live query resolved its
    generation dir at read start and keeps a consistent view; a crash
    mid-refresh leaves CURRENT on the previous complete generation
    (the half-written one is unreachable garbage, overwritten-by-name
    never). Superseded generations are pruned by AGE, not by count:
    only generations older than `grace_seconds` (mtime-based, vacuum's
    convention) are removed, so two refreshes in quick succession — or
    a query slower than one refresh interval — can never rmtree a
    generation an in-flight reader already resolved via CURRENT. The
    current and immediately-previous generations are additionally kept
    unconditionally. Pass grace_seconds=0 only when reader quiescence
    is externally guaranteed."""
    import os
    import uuid

    from khronus_spark.operators.text import write_bm25_constants

    batches = landed_batches(index_path)
    if not batches:
        raise ValueError(f"no landed postings batches under {index_path}")
    boundary = batches[-1]
    os.makedirs(const_path, exist_ok=True)
    gen = f"gen-{boundary:012d}-{uuid.uuid4().hex[:8]}"
    write_bm25_constants(
        read_streamed_postings(spark, index_path, upto_batch=boundary),
        os.path.join(const_path, gen),
        upto_batch=boundary,
    )
    publish_generation(const_path, gen, grace_seconds)
    return boundary


def read_pruned_snapshot(spark, index_path: str, const_path: str):
    """(postings, df_t, collection_stats, max_impact) at the
    RECORDED refresh boundary — everything `bm25_rank_indexed_pruned`
    needs, guaranteed self-consistent: the postings read is pinned to
    the batches the constants were built from (ceilings upper-bound
    exactly these postings; batches landed since the refresh are
    invisible until the next one — index-as-of-refresh semantics).
    Refuses constants that recorded no boundary: over a growing index
    they cannot prove which snapshot they describe."""
    from khronus_spark.operators.text import (
        read_bm25_boundary,
        read_bm25_max_impact,
        read_bm25_stats,
    )

    const_path = _resolve_const_dir(const_path)
    boundary = read_bm25_boundary(spark, const_path)
    if boundary is None:
        raise ValueError(
            f"constants at {const_path} record no snapshot boundary; "
            "refresh with refresh_streamed_constants (or "
            "write_bm25_constants(upto_batch=…)) — the pruned path "
            "needs ceilings provably consistent with the postings"
        )
    postings = read_streamed_postings(spark, index_path, upto_batch=boundary)
    df_t, n_docs, avgdl_m = read_bm25_stats(spark, const_path)
    mi = read_bm25_max_impact(spark, const_path)
    return postings, df_t, (n_docs, avgdl_m), mi

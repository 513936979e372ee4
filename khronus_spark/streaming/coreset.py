"""STREAMING k-center coreset maintenance — the single-pass twin of
`operators/coreset.py::kcenter_select` (Gonzalez needs m passes over
the full corpus; a stream gets ONE look at each vector).

Algorithm: the doubling algorithm (Charikar, Chekuri, Feder, Motwani
— "Incremental clustering and dynamic information retrieval", STOC
1997), deterministic variant on the shared ×10⁶ integer grid:

    state = (centers C, |C| ≤ m, squared threshold T2)
    invariant: every point seen so far is within √T2·(expansion) of
    some center, and centers are pairwise > √T2 apart.

    per batch:
      - fold the batch against C (ONE broadcast map pass: running
        mind2 = least over the ≤ m centers);
      - while some point sits farther than T2:
          - room in C  → admit the FARTHEST such point (argmax mind2,
            ties to smaller vec_id — the Gonzalez pick, one
            map-side-combinable aggregate), fold only the new center
            into the running mind2;
          - C full     → RAISE the scale: T2 ← max(4·T2, min pairwise
            d² among C) and greedily merge centers within the new T2
            (keep smaller vec_id; driver-side over ≤ m rows). The max
            guarantees ≥ 1 merge, so the loop always makes progress.

Approximation: the distance-domain algorithm guarantees radius ≤
8·OPT(m) over any arrival order; the d²-domain variant inherits it
(4·T2 is exactly the doubled distance). The MEASURED factor vs batch
Gonzalez on the anisotropic corpus is pinned in
tests/test_streaming_coreset.py — far tighter than the worst case.

Scale shape per batch: one broadcast-assign map pass over the batch +
one small aggregate per admitted center (≤ m per batch, usually 0
once the scale settles) — the bpe_merges driver-loop class with
batch-sized frames. Driver state is ≤ m quantized vectors; nothing
ever re-reads earlier batches, which is the point.

Replay contract (the streaming-EWMA high-water-mark discipline):
`meta.json` records the last folded batch id; a replayed trigger with
batch_id ≤ the high-water mark is a NO-OP, so checkpoint recovery
cannot double-fold a batch. State publishes as centers_v<batch_id>
parquet + an os.replace of meta.json — the meta swap is the commit
point, so a crash between the two leaves the old state readable and
the replay rewrites the orphan dir with identical content.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: shared quantization grid (coreset/pq/clustering convention)
_QUANT = (
    "transform(embedding, x -> floor((CAST(x AS DOUBLE) + 1.0D) * 1000000.0D))"
)

_D2 = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def _arr(e: list[int]) -> str:
    return "array(" + ", ".join(f"{int(x)}L" for x in e) + ")"


def _read_meta(state_path: str) -> dict | None:
    p = os.path.join(state_path, "meta.json")
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _write_state(
    spark, state_path: str, centers: list[tuple[int, list[int]]],
    t2: int, batch_id: int,
) -> None:
    os.makedirs(state_path, exist_ok=True)
    cdir = os.path.join(state_path, f"centers_v{batch_id}")
    spark.createDataFrame(
        [(vid, [int(x) for x in e]) for vid, e in centers],
        "vec_id long, e array<long>",
    ).coalesce(1).write.mode("overwrite").parquet(cdir)
    tmp = os.path.join(state_path, ".meta.tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {"t2": int(t2), "last_batch": int(batch_id),
             "centers_dir": f"centers_v{batch_id}", "m": len(centers)},
            fh,
        )
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(state_path, "meta.json"))
    # prune superseded versions, KEEPING current + previous (the
    # publish_generation convention): a reader that resolved meta to
    # the previous version just before this swap still holds an
    # intact dir; only versions at least two commits old go. Over a
    # long stream the per-batch dirs would otherwise accumulate
    # unbounded.
    import shutil

    versions = sorted(
        (n for n in os.listdir(state_path) if n.startswith("centers_v")),
        key=lambda n: int(n.rsplit("v", 1)[1]),
    )
    # the just-written version is the max-numbered entry, so the slice
    # can never touch it or its predecessor — no extra guard needed
    for name in versions[:-2]:
        shutil.rmtree(os.path.join(state_path, name), ignore_errors=True)


def read_streaming_kcenter(
    spark, state_path: str
) -> tuple[DataFrame | None, dict | None]:
    """(centers, meta) of the current committed state — centers is
    (vec_id, e) on the integer grid, meta carries t2/last_batch; both
    None before the first committed batch. Feed the vec_ids into
    `operators/coreset.py::coreset_assign` for the coverage audit."""
    meta = _read_meta(state_path)
    if meta is None:
        return None, None
    return (
        spark.read.parquet(os.path.join(state_path, meta["centers_dir"])),
        meta,
    )


def _fold_batch(
    spark,
    batch: DataFrame,
    centers: list[tuple[int, list[int]]],
    t2: int,
    m: int,
) -> tuple[list[tuple[int, list[int]]], int]:
    """Fold one batch into (centers, t2) — the per-trigger body,
    module-level so tests drive it directly (the _process_add
    convention)."""
    q = batch.select("vec_id", F.expr(_QUANT).alias("e"))
    if centers:
        folds = [
            F.expr(_D2.format(a="e", b=_arr(e))) for _, e in centers
        ]
        mind2 = folds[0]
        for f_ in folds[1:]:
            mind2 = F.least(mind2, f_)
        state = q.select("vec_id", "e", mind2.alias("mind2"))
    else:
        first = q.orderBy(F.col("vec_id").asc()).limit(1).collect()
        if not first:
            return centers, t2
        centers = [(int(first[0]["vec_id"]), list(first[0]["e"]))]
        d0 = F.expr(_D2.format(a="e", b=_arr(centers[0][1])))
        state = q.where(F.col("vec_id") != centers[0][0]).select(
            "vec_id", "e", d0.alias("mind2")
        )
    state = state.localCheckpoint(eager=False)
    while True:
        win = (
            state.where(F.col("mind2") > t2)
            .agg(
                F.max_by(
                    F.struct("vec_id", "mind2", "e"),
                    F.struct(F.col("mind2"), -F.col("vec_id")),
                ).alias("b")
            )
            .select("b.vec_id", "b.mind2", "b.e")
            .collect()
        )
        if not win or win[0]["vec_id"] is None:
            return centers, t2
        # ADMIT FIRST (transiently allowing m+1 centers), merge after
        # — the classic phase order. Merging before admitting (the
        # first cut of this fold) raised the scale without giving the
        # far region a center: at N=20k the stream collapsed to ONE
        # center with T² far above the realized radius, still inside
        # the guarantee but wasting the whole budget.
        vid, e = int(win[0]["vec_id"]), list(win[0]["e"])
        centers.append((vid, e))
        d_new = F.expr(_D2.format(a="e", b=_arr(e)))
        state = (
            state.where(F.col("vec_id") != vid)
            .select(
                "vec_id", "e",
                F.least(F.col("mind2"), d_new).alias("mind2"),
            )
            .localCheckpoint(eager=False)
        )
        merged = False
        while len(centers) > m:
            # over budget: raise the scale until a pair collapses
            # (max() guarantees ≥ 1 merge per phase since the closest
            # pair lands within the new T²), greedy keep by vec_id —
            # deterministic, driver-side over ≤ (m+1)² pairs
            merged = True
            min_pair = min(
                sum((a - b) * (a - b) for a, b in zip(e1, e2))
                for i, (_, e1) in enumerate(centers)
                for _, e2 in centers[i + 1 :]
            )
            t2 = max(4 * t2, min_pair)
            kept: list[tuple[int, list[int]]] = []
            for cvid, ce in sorted(centers):
                if all(
                    sum((a - b) * (a - b) for a, b in zip(ce, ke)) > t2
                    for _, ke in kept
                ):
                    kept.append((cvid, ce))
            centers = kept
        if merged:
            # recompute the running mind2 against the merged center
            # set so the next far-point check sees the true coverage
            # (the incremental least() fold only knows admits; the
            # isin list here is ≤ m entries — a constant, not a
            # corpus-scaling list)
            folds = [
                F.expr(_D2.format(a="e", b=_arr(ce))) for _, ce in centers
            ]
            mind2 = folds[0]
            for f_ in folds[1:]:
                mind2 = F.least(mind2, f_)
            state = (
                state.where(
                    ~F.col("vec_id").isin([cv for cv, _ in centers])
                )
                .select("vec_id", "e", mind2.alias("mind2"))
                .localCheckpoint(eager=False)
            )


def replay_kcenter(
    spark, embeddings: DataFrame, m: int = 6, n_chunks: int = 4
) -> tuple[list[tuple[int, list[int]]], int]:
    """Deterministic BATCH REPLAY of the streaming fold: chunk the
    corpus by `vec_id % n_chunks` and fold the chunks in order 0..n-1
    through `_fold_batch` — byte-identical state evolution to the
    foreachBatch trigger seeing the same chunks (the fold is the
    trigger body), without a checkpoint dir or a query lifecycle.
    Returns (centers, t2): the stream's realized selection and its
    internal squared scale.

    This is the face the `coreset_streaming_kcenter_audit` registry
    entry drives, so the DRIVER hash pins the streamed selection's
    realized radius the way the batch Gonzalez one is pinned — the r12
    verdict's gap: the streamed centers' quality number lived only in
    a sweep JSON. Every number out of here is deterministic: the
    argmax tie-breaks on (mind2, -vec_id), merges keep the smaller
    vec_id, and chunk membership is a pure function of vec_id."""
    centers: list[tuple[int, list[int]]] = []
    t2 = 0
    for chunk in range(n_chunks):
        batch = embeddings.where(
            F.pmod(F.col("vec_id"), F.lit(n_chunks)) == chunk
        )
        centers, t2 = _fold_batch(spark, batch, centers, t2, m)
    return centers, t2


def run_streaming_kcenter(
    vectors_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    m: int = 8,
    trigger: dict | None = None,
):
    """Maintain a ≤ m-center k-center coreset over a stream of
    (vec_id, embedding) rows — one look per vector, state bounded by
    m quantized vectors + one scalar, radius within the doubling
    algorithm's factor of the best m-center clustering of everything
    seen so far. Query the committed state any time with
    `read_streaming_kcenter` (+ `coreset_assign` for the audit)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        meta = _read_meta(state_path)
        if meta is not None and batch_id <= meta["last_batch"]:
            return  # replayed prefix: already folded
        if meta is None:
            centers, t2 = [], 0
        else:
            cdf = spark.read.parquet(
                os.path.join(state_path, meta["centers_dir"])
            )
            centers = [
                (int(r["vec_id"]), list(r["e"])) for r in cdf.collect()
            ]
            centers.sort()
            t2 = int(meta["t2"])
        centers, t2 = _fold_batch(spark, batch, centers, t2, m)
        _write_state(spark, state_path, centers, t2, batch_id)

    return (
        vectors_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )

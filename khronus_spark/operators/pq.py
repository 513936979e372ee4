"""Product Quantization (PQ) — the classic 100 TB ANN compression
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011), built on the repo's bit-exact integer k-means.

The embedding space splits into `sub` contiguous subspaces; each
subspace trains its own k-centroid codebook with the SAME quantized
integer Lloyd's as operators/clustering.py (so every codebook is
bit-identical on Spark and DuckDB); a vector's code packs its `sub`
nearest-centroid ids into one BIGINT (code = Σ_s cid_s · k^s). Search
uses Asymmetric Distance Computation: per probe, a `sub`×`k` lookup
table of exact int64 subspace distances to every centroid, then each
corpus vector scores with `sub` table adds instead of a full-dimension
distance — at the module defaults (sub=8, k=16) a 64-dim vector
compresses 64× (8 B of float32s worth of information in a 32-bit code)
and scoring drops from 64 multiplies to 8 adds.

Scale shape:
- training: per subspace, the zero-shuffle Arrow assignment + one
  map-side-combinable (cluster, dim) mean shuffle — inherited from
  clustering._kmeans_state on a sliced embedding frame;
- codes: `sub` assignment passes combined by one map-side-combinable
  groupBy(vec_id) sum — the stored index is ONE BIGINT per vector;
- search: the codebooks (sub·k rows) and the per-probe LUTs broadcast;
  scoring is a map-only pass over the code table; the per-probe top-k
  row_number window is bounded map-side by Spark 4's WindowGroupLimit.

The registry entry pins small parameters (sub=4, k=8, iters=1) to keep
the unrolled per-subspace CTE oracle tractable, exactly like the
k-means entry pins k=4; the module defaults are the production sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from khronus_spark.operators.clustering import _assign, _kmeans_state

DIMS = 64
SUB = 8
K = 16
ITERS = 2


def _subdim(dims: int, sub: int) -> int:
    """Validated subspace width. The geometry is caller-chosen (r10
    verdict: DIMS=64 was hard-wired — an embedding-width assumption a
    first-class 100 TB ANN operator must not make); indivisible
    combinations fail at BUILD time with the actual numbers, not at
    query time with a slice of the wrong width.

    Width contract: the Spark faces expect `embeddings`/`probe_vecs`
    frames whose arrays are EXACTLY `dims` wide — slice upstream
    (`slice(embedding, 1, dims)`, as the ann_pq_dim16_topk entry
    does). The subspace/ADC stages would silently prefix a wider
    frame, but the exact-rerank distance and the IVF coarse cosine
    read the full array, so a wider frame makes the stages disagree
    with each other and with the SQL oracles (which always read the
    FIRST `dims` entries of the table's arrays)."""
    if dims <= 0 or sub <= 0 or dims % sub:
        raise ValueError(
            f"PQ geometry invalid: dims={dims} must be a positive "
            f"multiple of sub={sub} (each of the {sub} subquantizers "
            "codes an equal contiguous slice)"
        )
    return dims // sub


_QUANT_COL = "transform({c}, x -> floor((CAST(x AS DOUBLE) + 1.0D) * 1000000.0D))"
_QUANT = _QUANT_COL.format(c="embedding")

#: int64-exact squared L2 between two equal-length long arrays
_D2 = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def _sub_frame(embeddings: DataFrame, s: int, subdim: int) -> DataFrame:
    """(vec_id, embedding) with the subspace-s float slice as the
    embedding column — _kmeans_state quantizes it exactly like the
    full-space path."""
    return embeddings.select(
        "vec_id", F.expr(f"slice(embedding, {s * subdim + 1}, {subdim})").alias(
            "embedding"
        )
    )


def _pq_state(
    embeddings: DataFrame,
    sub: int,
    k: int,
    iters: int,
    mode: str | None,
    dims: int = DIMS,
) -> list[tuple[DataFrame, DataFrame]]:
    """Per subspace: (quantized subvectors, trained centroids). Each
    subspace trains ONCE; codebooks, codes, and search all derive from
    this state. The `sub` trainings are fully independent, so they run
    from a small thread pool (guide §2.6): each training is a chain of
    small sequential jobs (centroid collect per Lloyd iteration) whose
    tail would otherwise leave the executor threads idle — overlapping
    them cuts the build wall from Σ(subspaces) toward max(subspace)
    with byte-identical results (scheduling overlap only)."""
    subdim = _subdim(dims, sub)
    kw = {} if mode is None else {"mode": mode}
    if sub == 1:
        return [_kmeans_state(_sub_frame(embeddings, 0, subdim), k, iters, **kw)]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(sub, 8)) as pool:
        futs = [
            pool.submit(
                _kmeans_state, _sub_frame(embeddings, s, subdim), k, iters, **kw
            )
            for s in range(sub)
        ]
        return [f.result() for f in futs]


def _books_from_state(state) -> DataFrame:
    out = None
    for s, (_, cents) in enumerate(state):
        part = cents.select(F.lit(s).cast("long").alias("s"), "cid", "c")
        out = part if out is None else out.unionByName(part)
    return out


def _codes_from_state(state, k: int, mode: str | None) -> DataFrame:
    kw = {} if mode is None else {"mode": mode}
    out = None
    for s, (q, cents) in enumerate(state):
        a = _assign(q, cents, **kw)
        part = a.select(
            "vec_id", (F.col("cid") * F.lit(k**s).cast("long")).alias("term")
        )
        out = part if out is None else out.unionByName(part)
    return out.groupBy("vec_id").agg(F.sum("term").alias("pq_code"))


def pq_codebooks(
    embeddings: DataFrame,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    mode: str | None = None,
    dims: int = DIMS,
) -> DataFrame:
    """(s, cid, c: array<long>[subdim]) — one trained integer codebook
    per subspace (init: centroids = the subvectors of vec_id 0..k-1,
    the same deterministic rule as the full-space k-means)."""
    return _books_from_state(_pq_state(embeddings, sub, k, iters, mode, dims))


def pq_codes(
    embeddings: DataFrame,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    mode: str | None = None,
    dims: int = DIMS,
) -> DataFrame:
    """(vec_id, pq_code) — the packed PQ index: code = Σ_s cid_s · k^s.
    `sub` assignment passes (each ≤N-row or zero shuffle, per the
    clustering module) combined by one map-side-combinable sum."""
    return _codes_from_state(
        _pq_state(embeddings, sub, k, iters, mode, dims), k, mode
    )


def pq_encode(
    embeddings: DataFrame,
    books: DataFrame,
    sub: int = SUB,
    k: int = K,
    mode: str | None = None,
    dims: int = DIMS,
) -> DataFrame:
    """(vec_id, pq_code) — encode vectors against PROVIDED codebooks
    (s, cid, c): the apply half of the build/query split. Each subspace
    is one broadcast-centroid assignment pass; the `sub` passes combine
    by one map-side-combinable sum. Used both by `pq_build_index` (full
    encode after sample training) and to encode NEW vectors into an
    existing index without retraining."""
    subdim = _subdim(dims, sub)
    kw = {} if mode is None else {"mode": mode}
    out = None
    for s in range(sub):
        q = _sub_frame(embeddings, s, subdim).select(
            "vec_id", F.expr(_QUANT).alias("e")
        )
        cents = books.where(F.col("s") == s).select("cid", "c")
        a = _assign(q, cents, **kw)
        part = a.select(
            "vec_id", (F.col("cid") * F.lit(k**s).cast("long")).alias("term")
        )
        out = part if out is None else out.unionByName(part)
    return out.groupBy("vec_id").agg(F.sum("term").alias("pq_code"))


def pq_encode_fused(
    embeddings: DataFrame,
    books: DataFrame,
    sub: int = SUB,
    k: int = K,
    dims: int = DIMS,
) -> DataFrame:
    """Map-only PQ encode: all `sub` subspace argmins score in ONE
    Arrow pass against the collected codebooks (sub·k short rows ship
    in the task closure, the clustering module's `_assign_arrow`
    device) and the packed code assembles in the same pass — ZERO
    shuffle and no aggregation state, so the SAME plan runs unchanged
    on a STREAMING DataFrame: this is the index "add" path at ingest —
    new vectors encode against the persisted books as they arrive
    (stream==batch pinned in tests). Bit-identical to `pq_encode`
    (which spends one map-side-combinable shuffle combining per-
    subspace passes): the float→double cast, the ×10⁶ floor
    quantization, the exact int64 |e|²−2·E·Cᵀ+|c|² distance, and the
    ties-to-smaller-cid argmin all mirror the SQL spec, every
    intermediate inside int64."""
    import numpy as np
    import pandas as pd

    subdim = _subdim(dims, sub)
    # tiny frame (sub*k rows): collect unsorted and sort driver-side —
    # a distributed orderBy costs a range-boundary sampling job plus a
    # range exchange per call (guide §2.1)
    rows = sorted(books.collect(), key=lambda r: (int(r["s"]), int(r["cid"])))
    by_s: dict[int, list] = {}
    for r in rows:
        by_s.setdefault(int(r["s"]), []).append((int(r["cid"]), list(r["c"])))
    assert sorted(by_s) == list(range(sub)), "codebooks must cover every subspace"
    cids_l, cmats, csqs = [], [], []
    for s in range(sub):
        entries = by_s[s]
        cids = np.array([c for c, _ in entries], dtype=np.int64)
        cmat = np.array([v for _, v in entries], dtype=np.int64).reshape(
            len(entries), subdim
        )
        cids_l.append(cids)
        cmats.append(cmat)
        csqs.append((cmat * cmat).sum(axis=1))
    powers = [k**s for s in range(sub)]

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            emat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            q = np.floor((emat + 1.0) * 1000000.0).astype(np.int64)
            code = np.zeros(len(pdf), dtype=np.int64)
            for s in range(sub):
                sl = q[:, s * subdim : (s + 1) * subdim]
                d = (
                    (sl * sl).sum(axis=1, keepdims=True)
                    - 2 * (sl @ cmats[s].T)
                    + csqs[s][None, :]
                )
                # first min over cid-ascending columns = ties to smaller cid
                code += cids_l[s][d.argmin(axis=1)] * powers[s]
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "pq_code": code})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        run, "vec_id long, pq_code long"
    )


def pq_build_index(
    embeddings: DataFrame,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    mode: str | None = None,
    train_sample_mod: int | None = None,
    dims: int = DIMS,
) -> tuple[DataFrame, DataFrame]:
    """Build the PQ index ONCE — (codebooks, codes) — so queries never
    train: the round-4 verdict's index/query split (an index rebuilt
    per query is a non-starter at 100 TB; the reference's analogue is
    the materialized summary store read by every dashboard query,
    `store/BucketStore.scala` — build amortized, reads cheap).

    `train_sample_mod` bounds training cost on huge corpora: codebooks
    train on the deterministic slice `vec_id % mod == 0` (k-means
    centroid quality saturates far below corpus size), then EVERY
    vector encodes against the trained books in one map-side pass —
    the standard FAISS train/add split. None = train on everything
    (bit-identical to the inline `pq_codes` path; test-pinned)."""
    train = (
        embeddings
        if train_sample_mod is None
        else embeddings.where(F.col("vec_id") % train_sample_mod == 0)
    )
    books = _books_from_state(_pq_state(train, sub, k, iters, mode, dims))
    # encode with the fused map-only pass (zero shuffle, one codebook
    # collect) unless the caller pinned the SQL structural twin; the
    # two encoders are test-pinned bit-identical
    if mode == "sql":
        codes = pq_encode(embeddings, books, sub, k, mode, dims)
    else:
        codes = pq_encode_fused(embeddings, books, sub, k, dims)
    return books, codes


def write_pq_index(
    books: DataFrame,
    codes: DataFrame,
    path: str,
    geometry: dict | None = None,
    grace_seconds: float = 600.0,
) -> None:
    """Persist the index as two parquet tables (books: sub·k short
    rows; codes: ONE BIGINT per vector). Pass `geometry` (e.g.
    {"sub": 4, "k": 8, "dims": 16}) to make the index SELF-DESCRIBING
    via a geometry.json sidecar — the streaming generations' r11
    convention, here opt-in so pre-sidecar layouts stay byte-stable:
    readers can then validate query-time parameters against the
    trained geometry instead of trusting the caller (the r12 ADVICE
    asked for exactly this on the Matryoshka indexed path).

    Publish is ATOMIC (r12 ADVICE): books, codes, and the sidecar are
    fully written into a fresh `gen-<token>/` under `path` and become
    visible in ONE os.replace of the CURRENT pointer — the
    `publish_generation` convention shared with streaming/ann.py. The
    old layout wrote the three artifacts in place, so a reader between
    the parquet overwrite and the sidecar write could pair the OLD
    geometry with the NEW books (or inherit a stale sidecar if the
    writer died before the remove) — exactly the mispairing the
    sidecar exists to prevent. A crash mid-write leaves CURRENT on the
    previous complete generation; readers resolve through
    `read_pq_index`/`read_pq_index_geometry`, and pre-generation flat
    layouts still read (resolve falls back to `path` itself)."""
    import json
    import os

    from khronus_spark.streaming.retrieval import (
        new_generation,
        publish_generation,
    )

    gen, gdir = new_generation(path)
    # the two table writes are independent jobs into the same fresh
    # generation dir — overlap them (guide §2.6); both must complete
    # (exceptions propagate) before the pointer swap below
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _fb = _pool.submit(
            books.write.mode("overwrite").parquet, os.path.join(gdir, "books")
        )
        _fc = _pool.submit(
            codes.write.mode("overwrite").parquet, os.path.join(gdir, "codes")
        )
        _fb.result()
        _fc.result()
    if geometry is not None:
        tmp = os.path.join(gdir, ".geometry.tmp")
        with open(tmp, "w") as fh:
            json.dump(geometry, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(gdir, "geometry.json"))
    # a geometry-less REBUILD over a previously self-describing path
    # publishes a generation WITHOUT a sidecar — the old generation's
    # geometry can never describe the new books because the swap
    # replaces the whole directory view at once
    publish_generation(path, gen, grace_seconds=grace_seconds)


def resolve_pq_index_dir(path: str) -> str:
    """Resolve the index root's CURRENT pointer ONCE and return the
    generation dir (the path itself for flat pre-generation layouts).
    A caller that needs a CONSISTENT (books, codes, geometry) triple
    under concurrent republish must resolve once and feed the returned
    root to `read_pq_index` + `read_pq_index_geometry` — each of those
    resolves independently when handed the unresolved root, so calling
    them back-to-back on `path` can still pair one generation's tables
    with another's sidecar if a publish lands in between. Resolution
    is idempotent (a generation dir has no CURRENT file and resolves
    to itself), so passing an already-resolved root is always safe."""
    from khronus_spark.streaming.retrieval import resolve_generation_dir

    return resolve_generation_dir(path)


#: the persisted index layouts are our own — pin schemas so no read
#: pays the parquet footer-probe inference job (one job per call on the
#: query path; guide §2.1)
BOOKS_SCHEMA = "s long, cid long, c array<long>"
CODES_SCHEMA = "vec_id long, pq_code long"


def read_pq_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    root = resolve_pq_index_dir(path)
    return (
        spark.read.schema(BOOKS_SCHEMA).parquet(f"{root}/books"),
        spark.read.schema(CODES_SCHEMA).parquet(f"{root}/codes"),
    )


def read_pq_index_geometry(path: str) -> dict | None:
    """The geometry.json sidecar written by `write_pq_index(...,
    geometry=...)`; None for pre-sidecar layouts (whose callers pass
    geometry explicitly, the historical contract). Resolves through
    the generation pointer; to pair with a `read_pq_index` call under
    concurrent republish, resolve once via `resolve_pq_index_dir` and
    pass the SAME root to both (see its docstring)."""
    import json
    import os

    p = os.path.join(resolve_pq_index_dir(path), "geometry.json")
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _adc_luts(
    pvec: DataFrame, books: DataFrame, sub: int, k: int, dims: int = DIMS
) -> DataFrame:
    """(probe_id, lut: map<int, long>) — the ADC lookup table keyed by
    s·k + cid. A MAP (not a positional array) because the trained
    codebook's cids need not be dense: a cluster emptied by a mean
    update (or duplicate init points) leaves a cid gap, and positional
    indexing would silently read the next centroid's distance for every
    cid above the gap. Codes only ever contain surviving cids, so every
    lookup key is present. `pvec` is (probe_id, pe) with the quantized
    full vector.

    The codebook is sub·k short rows — bounded index metadata under the
    codebook-collect convention (`pq_encode_fused`) — so the LUT builds
    as ONE projection on `pvec`: a `transform` over the collected
    (key, c) pairs as an array LITERAL, evaluating the _D2 fold per
    centroid against the probe's subvector slice. The former shape
    (pvec × broadcast(books) cross join → per-centroid rows →
    collect_list map aggregate) spent a BroadcastExchange, two
    ObjectHashAggregates and a probe_id shuffle Exchange per query —
    four plan barriers for sub·k arithmetic terms the driver already
    holds (guide §2.1/§2.4; the same decide-with-small-rows discipline
    as the bm25 collection_stats literals). The lambda stays the _D2
    zip_with fold VERBATIM (bit-identical d values; the higher-order
    interpreter runs on the probe-sized frame only — query-load rows,
    never the corpus, whose scan keeps the codegen `_adc_score_expr`),
    and the generated source stays small, so fresh codebook literals
    never trigger a huge-method recompile (a fully unrolled sum was
    measured +0.9 s janino/JIT per newly built index). Training-side
    callers hand a localCheckpointed `books`, so the collect replays
    the cached frame rather than re-running training."""
    subdim = _subdim(dims, sub)
    rows = sorted(books.collect(), key=lambda r: (int(r["s"]), int(r["cid"])))
    if not rows:
        # degenerate empty codebook: preserve the former cross-join
        # semantics (zero LUT rows → zero scored rows downstream)
        return pvec.select(
            "probe_id",
            F.expr(
                "map_from_arrays(array_repeat(CAST(0 AS INT), 0), "
                "array_repeat(CAST(0 AS BIGINT), 0))"
            ).alias("lut"),
        ).where(F.lit(False))
    cents = ", ".join(
        "named_struct('key', CAST({key} AS INT), 'c', array({vals}))".format(
            key=int(r["s"]) * k + int(r["cid"]),
            vals=", ".join(f"{int(v)}L" for v in r["c"]),
        )
        for r in rows
    )
    pd2 = _D2.format(
        a=f"slice(pe, (x.key div {k}) * {subdim} + 1, {subdim})", b="x.c"
    )
    lut = (
        f"map_from_entries(transform(array({cents}), "
        f"x -> struct(x.key AS key, CAST({pd2} AS BIGINT) AS d)))"
    )
    return pvec.select("probe_id", F.expr(lut).alias("lut"))


def _adc_score_expr(sub: int, k: int) -> str:
    """Score expression over columns (lut, pq_code): Σ_s lut[s·k+cid_s].
    UNROLLED into `sub` plain element_at terms with literal k^s
    divisors: the former aggregate(sequence(...)) form ran Catalyst's
    INTERPRETED higher-order-function evaluator on every corpus code —
    per-row interpreter cost on the hottest scan of the ANN family —
    where the flat sum stays inside whole-stage codegen. Same int64
    value, term for term."""
    terms = [
        f"element_at(lut, CAST({s * k} + pq_code div {k ** s} % {k} AS INT))"
        for s in range(sub)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def pq_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    n_neighbors: int = 3,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    mode: str | None = None,
    dims: int = DIMS,
) -> DataFrame:
    """(probe_id, neighbor_id, d2_adc) — ADC search over the packed
    codes: per probe a sub×k LUT of exact int64 subspace distances to
    every centroid (built in-engine from the broadcast codebooks), then
    every corpus code scores with `sub` lookups. Ties break to the
    smaller neighbor id; probes are excluded from their own results."""
    state = _pq_state(embeddings, sub, k, iters, mode, dims)
    books = _books_from_state(state)
    codes = _codes_from_state(state, k, mode)
    pvec = embeddings.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.expr(_QUANT).alias("pe")
    )
    return _adc_scan_topk(
        codes, _adc_luts(pvec, books, sub, k, dims), n_neighbors, sub, k
    )


def _adc_scored(codes: DataFrame, luts: DataFrame, sub: int, k: int) -> DataFrame:
    """(probe_id, neighbor_id, d2_adc) for EVERY (probe, corpus code)
    pair — the map-only ADC scan before any per-probe ranking. Shared
    by `_adc_scan_topk` and the fused hybrid tail (which ranks both
    retriever branches under one exchange)."""
    return (
        codes.select(F.col("vec_id").alias("neighbor_id"), "pq_code")
        .join(F.broadcast(luts), F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("d2_adc", F.expr(_adc_score_expr(sub, k)))
        .select("probe_id", "neighbor_id", "d2_adc")
    )


def _adc_scan_topk(
    codes: DataFrame, luts: DataFrame, n_neighbors: int, sub: int, k: int
) -> DataFrame:
    """The ADC scan shared by the inline and indexed query paths: codes
    × broadcast LUTs, `sub` table adds per row, bounded per-probe
    top-k."""
    w = Window.partitionBy("probe_id").orderBy(
        F.col("d2_adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        _adc_scored(codes, luts, sub, k)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_neighbors)
        .select("probe_id", "neighbor_id", "d2_adc")
    )


def pq_topk_indexed(
    books: DataFrame,
    codes: DataFrame,
    probe_vecs: DataFrame,
    n_neighbors: int = 3,
    sub: int = SUB,
    k: int = K,
    dims: int = DIMS,
) -> DataFrame:
    """ADC search over a PREBUILT index — the query half of the
    build/query split: `books`/`codes` come from `pq_build_index`
    (typically via `read_pq_index` of persisted tables), so NO training
    runs inside the query; the only work is the per-probe LUT build
    (sub·k broadcast rows) and the map-side scan over the 8-byte code
    table. `probe_vecs` is (probe_id, embedding). Identical results to
    `pq_topk` when the index was trained on the full corpus
    (test-pinned)."""
    pvec = probe_vecs.select(
        "probe_id", F.expr(_QUANT_COL.format(c="embedding")).alias("pe")
    )
    return _adc_scan_topk(
        codes, _adc_luts(pvec, books, sub, k, dims), n_neighbors, sub, k
    )


# ---------------------------------------------------------------- oracles

_QUANT_DUCK = (
    "list_transform(embedding, x -> "
    "CAST(floor((CAST(x AS DOUBLE) + 1.0) * 1000000.0) AS BIGINT))"
)


def _sub_ctes(s: int, subdim: int, k: int, iters: int) -> str:
    """Per-subspace CTE chain `p{s}_q, p{s}_c0, …, p{s}_final` — the
    clustering.kmeans_ctes structure on the subspace slice."""
    lo, hi = s * subdim + 1, (s + 1) * subdim
    dist = (
        f"list_sum(list_transform(range(1, {subdim + 1}), "
        "i -> (q.e[i] - c.c[i]) * (q.e[i] - c.c[i])))"
    )
    parts = [
        f"p{s}_q AS (SELECT vec_id, ({_QUANT_DUCK})[{lo}:{hi}] AS e FROM embeddings),",
        f"p{s}_c0 AS (SELECT vec_id AS cid, e AS c FROM p{s}_q WHERE vec_id < {k}),",
    ]
    for it in range(iters):
        parts.append(
            f"""p{s}_a{it} AS (
  SELECT q.vec_id, q.e, c.cid, {dist} AS d
  FROM p{s}_q q CROSS JOIN p{s}_c{it} c
  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY d ASC, cid ASC) = 1
),
p{s}_m{it} AS (
  SELECT cid, i, sum(e[i]) // count(*) AS m
  FROM p{s}_a{it} CROSS JOIN range(1, {subdim + 1}) t(i)
  GROUP BY cid, i
),
p{s}_c{it + 1} AS (SELECT cid, list(m ORDER BY i) AS c FROM p{s}_m{it} GROUP BY cid),"""
        )
    parts.append(
        f"""p{s}_final AS (
  SELECT q.vec_id, c.cid, {dist} AS d
  FROM p{s}_q q CROSS JOIN p{s}_c{iters} c
  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY d ASC, cid ASC) = 1
)"""
    )
    return "\n".join(parts)


def pq_codes_sql(
    sub: int = SUB, k: int = K, iters: int = ITERS, dims: int = DIMS
) -> str:
    subdim = _subdim(dims, sub)
    chains = ",\n".join(_sub_ctes(s, subdim, k, iters) for s in range(sub))
    terms = " + ".join(f"p{s}_final.cid * {k ** s}" for s in range(sub))
    joins = "\n".join(
        f"JOIN p{s}_final ON p{s}_final.vec_id = p0_final.vec_id"
        for s in range(1, sub)
    )
    return f"""
WITH {chains}
SELECT p0_final.vec_id, CAST({terms} AS BIGINT) AS pq_code
FROM p0_final
{joins}
"""


def _adc_score_ctes(
    probe_ids: list[int] | None,
    sub: int,
    k: int,
    iters: int,
    probe_pred: str | None = None,
    neighbor_pred: str | None = None,
    dims: int = DIMS,
) -> str:
    """Shared oracle text: the per-subspace training chains plus
    `parts` and `score` CTEs — (probe_id, neighbor_id, d2_adc) for
    every probe × corpus pair, term-for-term the LUT computation.
    Probes select via the literal `probe_ids` list or an explicit
    `probe_pred` predicate over `pr.vec_id` (e.g. the retrieval
    entries' modulo carve); `neighbor_pred` restricts the scanned code
    set (e.g. corpus-only for query/corpus splits) — training always
    sees every vector, matching `pq_build_index` on the full table."""
    subdim = _subdim(dims, sub)
    if probe_pred is None:
        ids = ", ".join(str(i) for i in probe_ids)
        probe_pred = f"pr.vec_id IN ({ids})"
    chains = ",\n".join(_sub_ctes(s, subdim, k, iters) for s in range(sub))
    pd2 = (
        f"list_sum(list_transform(range(1, {subdim + 1}), "
        "i -> (pr.e[i] - c.c[i]) * (pr.e[i] - c.c[i])))"
    )
    part_selects = "\nUNION ALL\n".join(
        f"""SELECT pr.vec_id AS probe_id, f.vec_id AS neighbor_id, {pd2} AS d
FROM p{s}_q pr, p{s}_final f
JOIN p{s}_c{iters} c ON c.cid = f.cid
WHERE {probe_pred}"""
        for s in range(sub)
    )
    scan_filter = "probe_id <> neighbor_id" + (
        f" AND {neighbor_pred}" if neighbor_pred else ""
    )
    return f"""{chains},
parts AS (
{part_selects}
),
score AS (
  SELECT probe_id, neighbor_id, CAST(sum(d) AS BIGINT) AS d2_adc
  FROM parts WHERE {scan_filter}
  GROUP BY probe_id, neighbor_id
)"""


def pq_topk_sql(
    probe_ids: list[int],
    n_neighbors: int = 3,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    dims: int = DIMS,
) -> str:
    """ADC restated relationally: per subspace, the distance from each
    probe's subvector to every NEIGHBOR's assigned centroid, summed
    over subspaces — term-for-term the LUT computation."""
    return f"""
WITH {_adc_score_ctes(probe_ids, sub, k, iters, dims=dims)}
SELECT probe_id, neighbor_id, d2_adc
FROM score
QUALIFY row_number() OVER (
    PARTITION BY probe_id ORDER BY d2_adc ASC, neighbor_id ASC) <= {n_neighbors}
"""


def pq_rerank_topk_sql(
    probe_ids: list[int],
    n_neighbors: int = 3,
    n_candidates: int = 30,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    dims: int = DIMS,
) -> str:
    """Two-stage oracle: ADC candidate cut (same score CTEs) followed by
    the exact full-space integer-L2 rerank on the survivors."""
    d2 = (
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (pq.e[i] - nq.e[i]) * (pq.e[i] - nq.e[i])))"
    )
    return f"""
WITH {_adc_score_ctes(probe_ids, sub, k, iters, dims=dims)},
cand AS (
  SELECT probe_id, neighbor_id
  FROM score
  QUALIFY row_number() OVER (
      PARTITION BY probe_id ORDER BY d2_adc ASC, neighbor_id ASC) <= {n_candidates}
),
fullq AS (SELECT vec_id, {_QUANT_DUCK} AS e FROM embeddings),
rr AS (
  SELECT cand.probe_id, cand.neighbor_id, CAST({d2} AS BIGINT) AS d2
  FROM cand
  JOIN fullq pq ON pq.vec_id = cand.probe_id
  JOIN fullq nq ON nq.vec_id = cand.neighbor_id
)
SELECT probe_id, neighbor_id, d2
FROM rr
QUALIFY row_number() OVER (
    PARTITION BY probe_id ORDER BY d2 ASC, neighbor_id ASC) <= {n_neighbors}
"""


def ivf_pq_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    n_neighbors: int = 3,
    stride: int = 50,
    nprobe: int = 2,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    mode: str | None = None,
    dims: int = DIMS,
) -> DataFrame:
    """IVF-PQ — the canonical billion-scale index (FAISS's IVFPQ, minus
    the optional residual encoding): the IVF coarse quantizer restricts
    each probe to `nprobe` inverted lists (~nprobe/nlist of the
    corpus), and the candidates score from their 8-byte PQ codes via
    the broadcast ADC lookup tables instead of full vectors. Output:
    (probe_id, neighbor_id, d2_adc), ties to the smaller neighbor id.

    Scale shape: coarse assignment and probe lists reuse the IVF
    module's map-only broadcast passes; codes are the ONE-BIGINT-per-
    vector table; the candidate join keys on the centroid id against a
    broadcast probe-list table; scoring is `sub` table adds per
    candidate; the per-probe top-k window is over the candidate subset
    only."""
    from khronus_spark.operators.similarity import ivf_assignments, ivf_probe_lists

    state = _pq_state(embeddings, sub, k, iters, mode, dims)
    books = _books_from_state(state)
    codes = _codes_from_state(state, k, mode)
    probe_lists = ivf_probe_lists(embeddings, probe_ids, nprobe, stride)
    pvec = probe_lists.select("probe_id", "probe_vec").distinct().select(
        "probe_id", F.expr(_QUANT_COL.format(c="probe_vec")).alias("pe")
    )
    luts = _adc_luts(pvec, books, sub, k, dims)
    assign = ivf_assignments(embeddings, stride)
    cand = (
        codes.join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("neighbor_id"), "pq_code", "centroid_id"
        )
        .join(
            F.broadcast(probe_lists.select("probe_id", "probe_centroid")),
            F.col("centroid_id") == F.col("probe_centroid"),
        )
        .where(F.col("neighbor_id") != F.col("probe_id"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("d2_adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.join(F.broadcast(luts), "probe_id")
        .withColumn("d2_adc", F.expr(_adc_score_expr(sub, k)))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_neighbors)
        .select("probe_id", "neighbor_id", "d2_adc")
    )


def ivf_pq_topk_sql(
    probe_ids: list[int],
    n_neighbors: int = 3,
    stride: int = 50,
    nprobe: int = 2,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    dims: int = DIMS,
) -> str:
    """Oracle: IVF candidate restriction (same cosine coarse quantizer
    as the similarity module) + the relational ADC restatement. At
    dims < the table's embedding width the FIRST `dims` entries are
    the operand everywhere (slice bounds in the training chains, range
    bounds in the cosine and the rerank), matching a Spark side whose
    caller passed a dims-wide sliced view."""
    subdim = _subdim(dims, sub)
    ids = ", ".join(str(i) for i in probe_ids)
    chains = ",\n".join(_sub_ctes(s, subdim, k, iters) for s in range(sub))
    dot = (
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    norm = (
        f"sqrt(list_sum(list_transform(range(1, {dims + 1}), "
        "i -> CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE))))"
    )
    cos_ec = (
        dot.format(a="e.embedding", b="c.cvec")
        + " / ("
        + norm.format(v="e.embedding")
        + " * "
        + norm.format(v="c.cvec")
        + ")"
    )
    cos_pc = (
        dot.format(a="p.embedding", b="c.cvec")
        + " / ("
        + norm.format(v="p.embedding")
        + " * "
        + norm.format(v="c.cvec")
        + ")"
    )
    pd2 = (
        f"list_sum(list_transform(range(1, {subdim + 1}), "
        "i -> (pr.e[i] - cc.c[i]) * (pr.e[i] - cc.c[i])))"
    )
    part_selects = "\nUNION ALL\n".join(
        f"""SELECT cand.probe_id, cand.neighbor_id, {pd2} AS d
FROM cand
JOIN p{s}_q pr ON pr.vec_id = cand.probe_id
JOIN p{s}_final f ON f.vec_id = cand.neighbor_id
JOIN p{s}_c{iters} cc ON cc.cid = f.cid"""
        for s in range(sub)
    )
    return f"""
WITH {chains},
cv AS (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id % {stride} = 0
),
ivf AS (
  SELECT vec_id, centroid_id
  FROM (
    SELECT e.vec_id, c.centroid_id, {cos_ec} AS sim
    FROM embeddings e CROSS JOIN cv c
  )
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id ASC) = 1
),
pl AS (
  SELECT p.vec_id AS probe_id, c.centroid_id AS probe_centroid
  FROM embeddings p CROSS JOIN cv c
  WHERE p.vec_id IN ({ids})
  QUALIFY row_number() OVER (
      PARTITION BY p.vec_id ORDER BY {cos_pc} DESC, c.centroid_id ASC) <= {nprobe}
),
cand AS (
  SELECT pl.probe_id, i.vec_id AS neighbor_id
  FROM pl JOIN ivf i ON i.centroid_id = pl.probe_centroid
  WHERE i.vec_id <> pl.probe_id
),
parts AS (
{part_selects}
),
score AS (
  SELECT probe_id, neighbor_id, CAST(sum(d) AS BIGINT) AS d2_adc
  FROM parts GROUP BY probe_id, neighbor_id
)
SELECT probe_id, neighbor_id, d2_adc
FROM score
QUALIFY row_number() OVER (
    PARTITION BY probe_id ORDER BY d2_adc ASC, neighbor_id ASC) <= {n_neighbors}
"""


def ivf_pq_rerank_topk_sql(
    probe_ids: list[int],
    n_neighbors: int = 3,
    n_candidates: int = 30,
    stride: int = 50,
    nprobe: int = 2,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    dims: int = DIMS,
) -> str:
    """Oracle for the indexed IVF-PQ + exact-rerank composition: the
    full `ivf_pq_topk_sql` restatement (coarse routing + relational
    ADC) becomes the candidate stage, and the survivors re-order by
    exact full-space integer L2 — the same two-stage shape as
    `pq_rerank_topk_sql` with the IVF restriction in front."""
    inner = ivf_pq_topk_sql(
        probe_ids, n_candidates, stride, nprobe, sub, k, iters, dims
    )
    d2 = (
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (pq.e[i] - nq.e[i]) * (pq.e[i] - nq.e[i])))"
    )
    return f"""
WITH cand AS (
  SELECT probe_id, neighbor_id FROM ({inner}) adc
),
fullq AS (SELECT vec_id, {_QUANT_DUCK} AS e FROM embeddings),
rr AS (
  SELECT cand.probe_id, cand.neighbor_id, CAST({d2} AS BIGINT) AS d2
  FROM cand
  JOIN fullq pq ON pq.vec_id = cand.probe_id
  JOIN fullq nq ON nq.vec_id = cand.neighbor_id
)
SELECT probe_id, neighbor_id, d2
FROM rr
QUALIFY row_number() OVER (
    PARTITION BY probe_id ORDER BY d2 ASC, neighbor_id ASC) <= {n_neighbors}
"""


def matryoshka_rerank_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    n_neighbors: int = 3,
    n_candidates: int = 30,
    prefix_dims: int = 16,
    sub: int = 4,
    k: int = K,
    iters: int = ITERS,
    mode: str | None = None,
    dims: int = DIMS,
) -> DataFrame:
    """Matryoshka-style two-stage retrieval, enabled by the r11 dims
    parameterization: the ADC shortlist runs on the PREFIX subspace
    only (`prefix_dims` of the full `dims` — MRL-trained embeddings
    make nested prefixes usable as standalone vectors, so the prefix
    index is 4x smaller to train/store and its LUTs 4x cheaper to
    scan at prefix 16/64), then ONLY the `n_candidates` survivors
    fetch full-width vectors for the exact integer-L2 rerank. Output
    (probe_id, neighbor_id, d2) with exact FULL-width distances — the
    same contract as `pq_rerank_topk`, reached through a quarter of
    the quantized scan work.

    Semantics note (why this is not just pq_rerank_topk at small
    dims): the candidate stage deliberately sees a DIFFERENT metric
    (prefix L2) than the rerank (full L2) — recall is the probability
    the prefix shortlist contains the full-width neighbors, which is
    exactly what MRL training optimizes. On non-MRL embeddings the
    prefix carries whatever signal the first coordinates happen to
    hold — measured worst case recall 0.0 on the tail-only-signal
    corpus vs 0.92 at full width (sweeps/r11/matryoshka_sweep.json,
    ASSERTED by tests/test_pq_dims.py::
    test_matryoshka_probe_pins_the_sweep_numbers) — so gate any new
    corpus through `matryoshka_build_index(probe_ids=...)` /
    `matryoshka_recall_probe` before serving from a prefix index."""
    if prefix_dims > dims:
        raise ValueError(
            f"Matryoshka prefix_dims={prefix_dims} exceeds dims={dims}: "
            "slice() would silently clamp and the upper prefix "
            "subspaces would quantize empty slices (constant codes, "
            "id-lottery shortlists) — the prefix must nest inside the "
            "full width"
        )
    prefix = embeddings.select(
        "vec_id",
        F.expr(f"slice(embedding, 1, {prefix_dims})").alias("embedding"),
    )
    cands = pq_topk(
        prefix, probe_ids, n_candidates, sub, k, iters, mode, prefix_dims
    )
    probe_vecs = embeddings.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    return _rerank_exact(cands, probe_vecs, embeddings, n_neighbors)


def matryoshka_rerank_topk_indexed(
    books: DataFrame,
    codes: DataFrame,
    probe_vecs: DataFrame,
    vectors: DataFrame,
    n_neighbors: int = 3,
    n_candidates: int = 30,
    prefix_dims: int = 16,
    sub: int = 4,
    k: int = K,
    trained_geometry: dict | None = None,
) -> DataFrame:
    """Query half of the Matryoshka split: `books`/`codes` come from
    `pq_build_index` over the PREFIX-sliced corpus (train once, 4x
    smaller index at prefix 16/64), probes slice themselves to the
    prefix for the ADC shortlist, and only the survivors fetch
    FULL-width vectors from the primary store for the exact rerank —
    no training anywhere in the plan. Identical results to
    `matryoshka_rerank_topk` when the index trained on the full
    corpus (test-pinned). `probe_vecs` is (probe_id, embedding) at
    full width; `vectors` is the full-width primary store."""
    # when the index is self-describing (write_pq_index(geometry=...)
    # -> read_pq_index_geometry), validate the query parameters
    # against the TRAINED geometry — a prefix/sub/k mismatch against
    # foreign books produces silently-garbage ADC scores
    if trained_geometry is not None:
        for name, got in (("dims", prefix_dims), ("sub", sub), ("k", k)):
            want = trained_geometry.get(name)
            if want is not None and want != got:
                raise ValueError(
                    f"Matryoshka query {name}={got} does not match the "
                    f"index's trained {name}={want} "
                    f"(geometry sidecar {trained_geometry}): codes are "
                    "meaningless under mismatched quantizer geometry"
                )
    # the inline twin validates prefix_dims against its dims parameter;
    # here the probe frame itself is the source of truth for the full
    # width — without this check slice() silently CLAMPS an oversized
    # prefix and the ADC shortlist degrades to an id-lottery (r12
    # ADVICE). The probe frame is query-load-sized, so one driver-side
    # min() is noise next to the shortlist scan.
    widths = probe_vecs.agg(
        F.min(F.size("embedding")).alias("w")
    ).collect()
    if widths and widths[0]["w"] is not None and prefix_dims > widths[0]["w"]:
        raise ValueError(
            f"Matryoshka prefix_dims={prefix_dims} exceeds the probe "
            f"embedding width {widths[0]['w']}: slice() would silently "
            "clamp and the prefix shortlist would degrade to an "
            "id-lottery — the prefix must nest inside the probes' "
            "full width"
        )
    prefix_probes = probe_vecs.select(
        "probe_id",
        F.expr(f"slice(embedding, 1, {prefix_dims})").alias("embedding"),
    )
    cands = pq_topk_indexed(
        books, codes, prefix_probes, n_candidates, sub, k, prefix_dims
    )
    return _rerank_exact(cands, probe_vecs, vectors, n_neighbors)


def matryoshka_recall_probe(
    embeddings: DataFrame,
    probe_ids: list[int],
    n_neighbors: int = 3,
    n_candidates: int = 30,
    prefix_dims: int = 16,
    sub: int = 4,
    k: int = K,
    iters: int = ITERS,
    mode: str | None = None,
    dims: int = DIMS,
) -> DataFrame:
    """ONE-ROW sampled recall probe for the Matryoshka composition —
    the guard the r11 sweep showed is needed (r11 verdict What's-wrong
    #5): on non-MRL embeddings the prefix shortlist metric can be
    GARBAGE while every global statistic looks healthy (the
    adversarial `tail_only_signal` corpus reads a perfectly
    proportional prefix VARIANCE share — its first 32 dims vary
    plenty, just not in the direction neighbors live — yet measures
    prefix recall 0.0 where full width reads 0.92; a variance-share
    check would wave it through, so the probe measures the thing
    itself). Output: (prefix_dims, dims, n_probes, n_neighbors,
    n_hits, recall_bp) — recall_bp = 10000·|matryoshka top-k ∩ exact
    full-width top-k| div (n_probes·n_neighbors), integer-exact.

    Cost: the probe stage is the inline Matryoshka query itself plus
    ONE exact top-k pass for the sampled probes (broadcast probes ×
    one corpus scan — the `ann_recall_at_k` cost class, amortized
    into the index build it gates)."""
    if not probe_ids:
        raise ValueError(
            "matryoshka_recall_probe needs at least one probe id: an "
            "empty sample measures nothing (and recall_bp's "
            "denominator would be zero)"
        )
    if len(set(probe_ids)) != len(probe_ids):
        raise ValueError(
            "matryoshka_recall_probe probe_ids contain duplicates: "
            "each duplicate inflates the denominator without adding a "
            "measurement, silently deflating recall_bp"
        )
    n_found = (
        embeddings.where(F.col("vec_id").isin(probe_ids))
        .select("vec_id")
        .distinct()
        .count()
    )
    if n_found != len(probe_ids):
        raise ValueError(
            f"matryoshka_recall_probe: only {n_found} of "
            f"{len(probe_ids)} probe_ids exist in the corpus — absent "
            "probes contribute zero hits but still count in the "
            "denominator, so the measured recall would be silently "
            "deflated (and a healthy index could spuriously fail the "
            "build guard). Sample probe ids from the corpus itself."
        )
    got = matryoshka_rerank_topk(
        embeddings, probe_ids, n_neighbors, n_candidates, prefix_dims,
        sub, k, iters, mode, dims,
    ).select("probe_id", "neighbor_id")
    pv = embeddings.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"),
        F.expr(_QUANT).alias("pe"),
    )
    nv = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.expr(_QUANT).alias("ne")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    exact = (
        nv.join(F.broadcast(pv), F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("d2", F.expr(_D2.format(a="pe", b="ne")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_neighbors)
        .select("probe_id", "neighbor_id")
    )
    total = len(probe_ids) * n_neighbors
    return (
        got.join(exact, ["probe_id", "neighbor_id"])
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            F.lit(prefix_dims).cast("long").alias("prefix_dims"),
            F.lit(dims).cast("long").alias("dims"),
            F.lit(len(probe_ids)).cast("long").alias("n_probes"),
            F.lit(n_neighbors).cast("long").alias("n_neighbors"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr(f"n_hits * 10000 div {total}")
            .cast("long")
            .alias("recall_bp"),
        )
    )


def matryoshka_recall_probe_sql(
    probe_ids: list[int],
    n_neighbors: int = 3,
    n_candidates: int = 30,
    prefix_dims: int = 16,
    sub: int = 4,
    k: int = K,
    iters: int = ITERS,
    dims: int = DIMS,
) -> str:
    """Oracle for the recall probe: the full Matryoshka restatement
    becomes the candidate list, an exact full-width top-k CTE the
    truth, and the single output row counts their intersection."""
    inner = matryoshka_rerank_topk_sql(
        probe_ids, n_neighbors, n_candidates, prefix_dims, sub, k,
        iters, dims,
    )
    ids = ", ".join(str(i) for i in probe_ids)
    d2 = (
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (p.e[i] - n.e[i]) * (p.e[i] - n.e[i])))"
    )
    total = len(probe_ids) * n_neighbors
    return f"""
WITH mat AS (SELECT probe_id, neighbor_id FROM ({inner}) m),
fullq AS (SELECT vec_id, {_QUANT_DUCK} AS e FROM embeddings),
exact AS (
  SELECT p.vec_id AS probe_id, n.vec_id AS neighbor_id, {d2} AS d2
  FROM fullq p JOIN fullq n ON n.vec_id <> p.vec_id
  WHERE p.vec_id IN ({ids})
  QUALIFY row_number() OVER (
      PARTITION BY p.vec_id ORDER BY d2 ASC, n.vec_id ASC) <= {n_neighbors}
)
SELECT CAST({prefix_dims} AS BIGINT) AS prefix_dims,
       CAST({dims} AS BIGINT) AS dims,
       CAST({len(probe_ids)} AS BIGINT) AS n_probes,
       CAST({n_neighbors} AS BIGINT) AS n_neighbors,
       CAST(count(*) AS BIGINT) AS n_hits,
       CAST((count(*) * 10000) // {total} AS BIGINT) AS recall_bp
FROM mat JOIN exact USING (probe_id, neighbor_id)
"""


def matryoshka_build_index(
    embeddings: DataFrame,
    prefix_dims: int = 16,
    sub: int = 4,
    k: int = K,
    iters: int = ITERS,
    mode: str | None = None,
    dims: int = DIMS,
    probe_ids: list[int] | None = None,
    min_recall_bp: int = 5000,
    n_neighbors: int = 3,
    n_candidates: int = 30,
    fail_below: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The Matryoshka BUILD face with the non-MRL guard built in:
    slice the corpus to the prefix, train the prefix PQ index
    (`pq_build_index` at prefix_dims), and — when `probe_ids` is given
    — measure the composition's sampled recall against exact
    full-width top-k (`matryoshka_recall_probe`) BEFORE anyone serves
    from the index. Below `min_recall_bp` the build warns (or raises
    under `fail_below`) — the measured r11 worst case is not
    hypothetical: embeddings whose neighbor signal lives outside the
    prefix (non-MRL checkpoints, feature-concatenated vectors) read
    recall_bp = 0 while every global statistic looks healthy, and at
    100 TB nobody re-reads a docstring caveat. Probing costs one
    exact pass for the sampled probes, amortized into the build.

    Returns (books, codes) — feed `write_pq_index` /
    `matryoshka_rerank_topk_indexed` exactly like a bare build."""
    if prefix_dims > dims:
        raise ValueError(
            f"Matryoshka prefix_dims={prefix_dims} exceeds dims={dims}: "
            "the prefix must nest inside the full width"
        )
    # mirror of the query-side probe-width check (r12 ADVICE follow-up):
    # `dims` is caller-asserted, so a corpus whose rows are NARROWER
    # than prefix_dims would slip past the parameter check and slice()
    # would silently CLAMP — the index then trains on truncated
    # prefixes and serves an id-lottery. One min(size()) aggregate is
    # noise next to the k-means passes the build already pays.
    widths = embeddings.agg(F.min(F.size("embedding")).alias("w")).collect()
    if widths and widths[0]["w"] is not None and prefix_dims > widths[0]["w"]:
        raise ValueError(
            f"Matryoshka prefix_dims={prefix_dims} exceeds the corpus's "
            f"minimum embedding width {widths[0]['w']}: slice() would "
            "silently clamp and the index would train on truncated "
            "prefixes — the prefix must nest inside every row's width"
        )
    prefix = embeddings.select(
        "vec_id",
        F.expr(f"slice(embedding, 1, {prefix_dims})").alias("embedding"),
    )
    books, codes = pq_build_index(prefix, sub=sub, k=k, iters=iters,
                                  mode=mode, dims=prefix_dims)
    if probe_ids:
        row = matryoshka_recall_probe(
            embeddings, probe_ids, n_neighbors, n_candidates,
            prefix_dims, sub, k, iters, mode, dims,
        ).collect()[0]
        if row["recall_bp"] < min_recall_bp:
            msg = (
                f"Matryoshka prefix-{prefix_dims}/{dims} index measured "
                f"sampled recall {row['recall_bp']} bp < the "
                f"min_recall_bp={min_recall_bp} floor over "
                f"{row['n_probes']} probes: the prefix does not carry "
                "this corpus's neighbor signal (non-MRL embeddings?) — "
                "the shortlist degrades toward an id-lottery. Retrain "
                "with MRL, widen prefix_dims, or serve the full-width "
                "index instead."
            )
            if fail_below:
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
    return books, codes


def matryoshka_rerank_topk_sql(
    probe_ids: list[int],
    n_neighbors: int = 3,
    n_candidates: int = 30,
    prefix_dims: int = 16,
    sub: int = 4,
    k: int = K,
    iters: int = ITERS,
    dims: int = DIMS,
) -> str:
    """Oracle for the Matryoshka composition (prefix_dims must nest
    inside dims, same validation as the operator): the per-subspace
    training chains and ADC score CTEs run at `prefix_dims` (the
    shortlist metric), the rerank distance at the full `dims` — the
    two-width split IS the operator's semantics, so the oracle states
    it explicitly rather than reusing the single-width rerank text."""
    if prefix_dims > dims:
        raise ValueError(
            f"Matryoshka prefix_dims={prefix_dims} exceeds dims={dims}"
        )
    d2 = (
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (pq.e[i] - nq.e[i]) * (pq.e[i] - nq.e[i])))"
    )
    return f"""
WITH {_adc_score_ctes(probe_ids, sub, k, iters, dims=prefix_dims)},
cand AS (
  SELECT probe_id, neighbor_id
  FROM score
  QUALIFY row_number() OVER (
      PARTITION BY probe_id ORDER BY d2_adc ASC, neighbor_id ASC) <= {n_candidates}
),
fullq AS (SELECT vec_id, {_QUANT_DUCK} AS e FROM embeddings),
rr AS (
  SELECT cand.probe_id, cand.neighbor_id, CAST({d2} AS BIGINT) AS d2
  FROM cand
  JOIN fullq pq ON pq.vec_id = cand.probe_id
  JOIN fullq nq ON nq.vec_id = cand.neighbor_id
)
SELECT probe_id, neighbor_id, d2
FROM rr
QUALIFY row_number() OVER (
    PARTITION BY probe_id ORDER BY d2 ASC, neighbor_id ASC) <= {n_neighbors}
"""


def pq_rerank_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    n_neighbors: int = 3,
    n_candidates: int = 30,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    mode: str | None = None,
    dims: int = DIMS,
) -> DataFrame:
    """Two-stage PQ retrieval: ADC over the packed codes keeps the
    `n_candidates` best per probe, then ONLY those candidates fetch
    their full vectors for an exact integer-L2 rerank — the standard
    production recipe that buys back the quantization error for
    `n_candidates`/N of the full-scan cost (same shape the JL
    two-stage entry `ann_rp_topk` proves against its oracle).

    Output (probe_id, neighbor_id, d2) with exact full-space distances.
    Measured envelope on the UNIFORM test corpus (ROUND4_NOTES.md):
    direct ADC recall@3 is 0.23 at sub=8/k=16 (distances concentrate in
    random high-dim data) but the exact rerank recovers every exact
    neighbor whose candidate survives — 0.70 at C=30 — and planted
    near-duplicates (identical codes) are recalled at 1.0."""
    cands = pq_topk(
        embeddings, probe_ids, n_candidates, sub, k, iters, mode, dims
    )
    vecs = embeddings.select("vec_id", F.expr(_QUANT).alias("e"))
    pv = vecs.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    nv = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"))
    d2 = _D2.format(a="pe", b="ne")
    w = Window.partitionBy("probe_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        cands.join(F.broadcast(pv), "probe_id")
        .join(nv, "neighbor_id")
        .withColumn("d2", F.expr(d2))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_neighbors)
        .select("probe_id", "neighbor_id", "d2")
    )


def ivf_pq_rerank_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    n_neighbors: int = 3,
    n_candidates: int = 30,
    stride: int = 50,
    nprobe: int = 2,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    mode: str | None = None,
    dims: int = DIMS,
) -> DataFrame:
    """The full production composition — IVF inverted lists → ADC over
    packed codes → exact rerank of the ADC survivors: each probe scans
    ~nprobe/nlist of the corpus as 8-byte codes and touches full
    vectors only for `n_candidates` rows. Output (probe_id,
    neighbor_id, d2) with exact full-space integer distances.

    Equivalence contract (test-pinned): identical to pq_rerank_topk
    with its candidate stage restricted to the probed lists — the IVF
    and rerank stages only restrict candidates, never change scores."""
    cands = ivf_pq_topk(
        embeddings,
        probe_ids,
        n_candidates,
        stride,
        nprobe,
        sub,
        k,
        iters,
        mode,
        dims,
    )
    vecs = embeddings.select("vec_id", F.expr(_QUANT).alias("e"))
    pv = vecs.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    nv = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"))
    d2 = _D2.format(a="pe", b="ne")
    w = Window.partitionBy("probe_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        cands.join(F.broadcast(pv), "probe_id")
        .join(nv, "neighbor_id")
        .withColumn("d2", F.expr(d2))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_neighbors)
        .select("probe_id", "neighbor_id", "d2")
    )


# ------------------------------------------------------- indexed variants


def ivf_pq_build_index(
    embeddings: DataFrame,
    stride: int = 50,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    mode: str | None = None,
    train_sample_mod: int | None = None,
    train_frame: DataFrame | None = None,
    dims: int = DIMS,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the IVF-PQ index ONCE — (books, coded inverted lists,
    centroids) — the round-5 verdict's remaining inline-training
    family: `ivf_pq_topk` retrains both quantizers inside every query,
    which is a non-starter at 100 TB. Persist all three with
    `write_ivf_pq_index`; query with `ivf_pq_topk_indexed`, whose plan
    contains no training (plan-gated).

    `coded` is the physical IVFPQ layout: one row per vector carrying
    its packed BIGINT PQ code AND its coarse list id (vec_id, pq_code,
    centroid_id) — the inverted-list restriction becomes a join-key
    filter on this single table, no full-vector access. `centroids`
    (centroid_id, cvec) is the small table queries broadcast to route
    probes. `train_sample_mod` bounds codebook training exactly as in
    `pq_build_index`. `train_frame` substitutes the codebook-training
    input entirely (encoding still covers `embeddings`): the k-means
    init takes the subvectors of vec_id 0..k-1, so a caller that needs
    init seeds drawn from somewhere other than the head of the id
    space (e.g. `streaming.ann.refresh_streamed_index`, whose standing
    corpus appends NEW distributions at HIGH ids) passes a re-keyed
    view here — ids in the returned index are never affected."""
    from khronus_spark.operators.similarity import ivf_assignments

    train = embeddings if train_frame is None else train_frame
    if train_sample_mod is not None:
        train = train.where(F.col("vec_id") % train_sample_mod == 0)
    books = _books_from_state(_pq_state(train, sub, k, iters, mode, dims))
    codes = pq_encode(embeddings, books, sub, k, mode, dims)
    coded = codes.join(ivf_assignments(embeddings, stride), "vec_id")
    centroids = embeddings.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    return books, coded, centroids


def write_ivf_pq_index(
    books: DataFrame,
    coded: DataFrame,
    centroids: DataFrame,
    path: str,
    atomic: bool = True,
    grace_seconds: float = 600.0,
) -> None:
    """Persist the IVF-PQ index as three parquet tables. `coded` is
    repartitioned by centroid_id so each inverted list is physically
    co-located — at scale a probe's nprobe lists map to a bounded set
    of files instead of touching every partition.

    Same atomic generation publish as `write_pq_index` (three in-place
    overwrites are three chances for a reader to pair tables from
    different builds): everything lands in `gen-<token>/`, one CURRENT
    swap makes it visible, flat pre-generation layouts still read.
    `atomic=False` writes the flat layout for callers that already own
    an outer atomic publish (`streaming/ann.py` builds into an
    UNPUBLISHED generation dir of its own — nesting a second pointer
    inside it would hide the tables from its flat readers)."""
    import os

    from khronus_spark.streaming.retrieval import (
        new_generation,
        publish_generation,
    )

    if not atomic:
        books.write.mode("overwrite").parquet(f"{path}/books")
        coded.repartition("centroid_id").write.mode("overwrite").parquet(
            f"{path}/coded"
        )
        centroids.write.mode("overwrite").parquet(f"{path}/centroids")
        return
    gen, gdir = new_generation(path)
    books.write.mode("overwrite").parquet(os.path.join(gdir, "books"))
    coded.repartition("centroid_id").write.mode("overwrite").parquet(
        os.path.join(gdir, "coded")
    )
    centroids.write.mode("overwrite").parquet(
        os.path.join(gdir, "centroids")
    )
    publish_generation(path, gen, grace_seconds=grace_seconds)


def read_ivf_pq_index(
    spark, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    from khronus_spark.streaming.retrieval import resolve_generation_dir

    root = resolve_generation_dir(path)
    return (
        spark.read.schema(BOOKS_SCHEMA).parquet(f"{root}/books"),
        spark.read.schema("vec_id long, pq_code long, centroid_id long")
        .parquet(f"{root}/coded"),
        spark.read.schema("centroid_id long, cvec array<float>")
        .parquet(f"{root}/centroids"),
    )


def ivf_pq_topk_indexed(
    books: DataFrame,
    coded: DataFrame,
    centroids: DataFrame,
    probe_vecs: DataFrame,
    n_neighbors: int = 3,
    nprobe: int = 2,
    sub: int = SUB,
    k: int = K,
    dims: int = DIMS,
) -> DataFrame:
    """Query half of the IVF-PQ split: probes route to their `nprobe`
    nearest lists via the BROADCAST prebuilt centroid table (identical
    cosine/tie semantics to `similarity.ivf_probe_lists`, so results
    match `ivf_pq_topk` exactly when the index trained on the full
    corpus — test-pinned, same oracle); candidates come from the
    prebuilt coded lists by a join-key restriction; scoring is `sub`
    broadcast-LUT adds per candidate. No k-means anywhere in the plan.
    `probe_vecs` is (probe_id, embedding)."""
    from khronus_spark.operators.similarity import cosine_col

    sim = cosine_col(F.col("embedding"), F.col("cvec"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("_sim").desc(), F.col("probe_centroid").asc()
    )
    probe_lists = (
        probe_vecs.crossJoin(F.broadcast(centroids))
        .select(
            "probe_id",
            F.col("centroid_id").alias("probe_centroid"),
            sim.alias("_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select("probe_id", "probe_centroid")
    )
    pvec = probe_vecs.select(
        "probe_id", F.expr(_QUANT_COL.format(c="embedding")).alias("pe")
    )
    luts = _adc_luts(pvec, books, sub, k, dims)
    cand = (
        coded.select(
            F.col("vec_id").alias("neighbor_id"), "pq_code", "centroid_id"
        )
        .join(
            F.broadcast(probe_lists),
            F.col("centroid_id") == F.col("probe_centroid"),
        )
        .where(F.col("neighbor_id") != F.col("probe_id"))
    )
    w2 = Window.partitionBy("probe_id").orderBy(
        F.col("d2_adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.join(F.broadcast(luts), "probe_id")
        .withColumn("d2_adc", F.expr(_adc_score_expr(sub, k)))
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= n_neighbors)
        .select("probe_id", "neighbor_id", "d2_adc")
    )


def pq_rerank_topk_indexed(
    books: DataFrame,
    codes: DataFrame,
    probe_vecs: DataFrame,
    vectors: DataFrame,
    n_neighbors: int = 3,
    n_candidates: int = 30,
    sub: int = SUB,
    k: int = K,
    dims: int = DIMS,
) -> DataFrame:
    """Query half of the two-stage PQ retrieval split: ADC over the
    PREBUILT `books`/`codes` keeps `n_candidates` per probe (no
    training in the plan), then only those candidates fetch their full
    vectors from `vectors` (vec_id, embedding — the primary store; the
    rerank stage reads full vectors BY DESIGN, that is its recall
    contract) for the exact integer-L2 rerank. Results identical to
    `pq_rerank_topk` when the index trained on the full corpus
    (test-pinned, same oracle)."""
    cands = pq_topk_indexed(
        books, codes, probe_vecs, n_candidates, sub, k, dims
    )
    return _rerank_exact(cands, probe_vecs, vectors, n_neighbors)


def _rerank_exact(
    cands: DataFrame,
    probe_vecs: DataFrame,
    vectors: DataFrame,
    n_neighbors: int,
) -> DataFrame:
    """Shared exact-rerank tail: ADC survivors (probe_id, neighbor_id)
    fetch full vectors for the exact integer-L2 re-order."""
    pv = probe_vecs.select(
        "probe_id", F.expr(_QUANT_COL.format(c="embedding")).alias("pe")
    )
    nv = vectors.select(
        F.col("vec_id").alias("neighbor_id"), F.expr(_QUANT).alias("ne")
    )
    d2 = _D2.format(a="pe", b="ne")
    w = Window.partitionBy("probe_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        cands.join(F.broadcast(pv), "probe_id")
        .join(nv, "neighbor_id")
        .withColumn("d2", F.expr(d2))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_neighbors)
        .select("probe_id", "neighbor_id", "d2")
    )


def ivf_pq_rerank_topk_indexed(
    books: DataFrame,
    coded: DataFrame,
    centroids: DataFrame,
    probe_vecs: DataFrame,
    vectors: DataFrame,
    n_neighbors: int = 3,
    n_candidates: int = 30,
    nprobe: int = 2,
    sub: int = SUB,
    k: int = K,
    dims: int = DIMS,
) -> DataFrame:
    """The INDEXED full production composition, previously missing
    (the unindexed `ivf_pq_rerank_topk` retrains inside the query; the
    indexed `ivf_pq_topk_indexed` stops at ADC): probes route through
    the prebuilt (books, coded, centroids) triple, ADC keeps
    `n_candidates` per probe, and only those rows fetch full vectors
    from the primary store for the exact integer-L2 rerank. No
    training anywhere in the plan. This is the query face the
    streaming-ANN drift tests measure recall through — ADC shortlist
    quality is exactly what frozen-codebook drift destroys, and the
    exact rerank means recall is the SHORTLIST's recall, uncontaminated
    by ADC ranking noise."""
    cands = ivf_pq_topk_indexed(
        books, coded, centroids, probe_vecs, n_candidates, nprobe, sub, k, dims
    )
    return _rerank_exact(cands, probe_vecs, vectors, n_neighbors)


def ivf_pq_encode(
    new_vectors: DataFrame,
    books: DataFrame,
    centroids: DataFrame,
    sub: int = SUB,
    k: int = K,
    mode: str | None = None,
    dims: int = DIMS,
) -> DataFrame:
    """Incremental add for the IVF-PQ index (FAISS `index.add()`):
    encode NEW vectors against the FIXED codebooks and route them to
    their coarse list via the PERSISTED centroid table — no retraining
    anywhere. Output rows (vec_id, pq_code, centroid_id) append
    directly to the `coded` table from `ivf_pq_build_index`
    (test-pinned identical to rebuilding over the union). Same
    assignment semantics as `similarity.ivf_assignments`: cosine
    argmax, ties → smaller centroid id, as a map-side-combinable
    max_by (no window, shuffle carries ≤N rows). Both passes are
    broadcast-probe map scans — the 100 TB ingest shape."""
    from khronus_spark.operators.similarity import cosine_col

    codes = pq_encode(new_vectors, books, sub, k, mode, dims)
    pairs = new_vectors.crossJoin(F.broadcast(centroids))
    sim = cosine_col(F.col("embedding"), F.col("cvec"))
    assign = (
        pairs.select("vec_id", "centroid_id", sim.alias("_sim"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "centroid_id", F.struct(F.col("_sim"), -F.col("centroid_id"))
            ).alias("centroid_id")
        )
    )
    return codes.join(assign, "vec_id")


def pq_mmr_topk_indexed(
    books: DataFrame,
    codes: DataFrame,
    probe_vecs: DataFrame,
    vectors: DataFrame,
    n_picks: int = 5,
    pool: int = 30,
    lam10: int = 7,
    sub: int = SUB,
    k: int = K,
    dims: int = DIMS,
) -> DataFrame:
    """DIVERSITY retrieval behind the persisted index — the production
    composition of `similarity.mmr_rerank`: the ADC shortlist over
    prebuilt `books`/`codes` keeps the `pool` best per probe (no
    training anywhere in the plan — the standing index/query
    discipline), survivors fetch full vectors from the primary store
    for EXACT probe distances, and the MMR greedy picks `n_picks`
    trading that exact relevance against redundancy with what's
    already picked. The greedy never touches the corpus: everything
    after the shortlist is pool × #probes rows — at 100 TB this is
    the diversity face of `pq_rerank_topk_indexed` (same ADC cut,
    MMR instead of plain re-sort). Output (probe_id, rank,
    neighbor_id, mmr_score)."""
    from khronus_spark.operators.similarity import mmr_rerank

    cand = _mmr_candidates_indexed(
        books, codes, probe_vecs, vectors, pool, sub, k, dims
    )
    return mmr_rerank(cand, n_picks, lam10)


def _mmr_candidates_indexed(
    books: DataFrame,
    codes: DataFrame,
    probe_vecs: DataFrame,
    vectors: DataFrame,
    pool: int,
    sub: int,
    k: int,
    dims: int,
) -> DataFrame:
    """The composition's candidate stage, factored for plan-gating
    (mmr_rerank's localCheckpoints cut lineage, so the no-training
    property must be asserted on THIS frame): ADC shortlist from the
    persisted index + exact full-width probe distances attached."""
    cands = pq_topk_indexed(books, codes, probe_vecs, pool, sub, k, dims)
    pv = probe_vecs.select(
        "probe_id", F.expr(_QUANT_COL.format(c="embedding")).alias("pe")
    )
    nv = vectors.select(
        F.col("vec_id").alias("neighbor_id"), F.expr(_QUANT).alias("e")
    )
    return (
        cands.select("probe_id", "neighbor_id")
        .join(F.broadcast(pv), "probe_id")
        .join(nv, "neighbor_id")
        .withColumn("d2q", F.expr(_D2.format(a="pe", b="e")))
        .select("probe_id", "neighbor_id", "e", "d2q")
    )


def pq_mmr_topk_sql(
    probe_ids: list[int],
    n_picks: int = 5,
    pool: int = 30,
    lam10: int = 7,
    sub: int = SUB,
    k: int = K,
    iters: int = ITERS,
    dims: int = DIMS,
) -> str:
    """Oracle for the indexed PQ+MMR composition: the ADC restatement
    (`_adc_score_ctes`, the proven pq_topk oracle core) shortlists the
    pool, exact full-width distances attach, and the SHARED unrolled
    greedy (`similarity._mmr_greedy_sql_parts` — the same text the
    inline `ann_mmr_topk` oracle uses) picks. The split must not
    change the greedy's restatement — sharing the generator makes a
    fork impossible."""
    from khronus_spark.operators.similarity import _mmr_greedy_sql_parts

    d2 = (
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (pq.e[i] - nq.e[i]) * (pq.e[i] - nq.e[i])))"
    )
    parts = [
        f"""adc AS (
  SELECT probe_id, neighbor_id FROM score
  QUALIFY row_number() OVER (
      PARTITION BY probe_id ORDER BY d2_adc ASC, neighbor_id ASC) <= {pool}
)""",
        f"fullq AS (SELECT vec_id, {_QUANT_DUCK} AS e FROM embeddings)",
        f"""mcand AS MATERIALIZED (
  SELECT adc.probe_id, adc.neighbor_id, nq.e, CAST({d2} AS BIGINT) AS d2q
  FROM adc
  JOIN fullq pq ON pq.vec_id = adc.probe_id
  JOIN fullq nq ON nq.vec_id = adc.neighbor_id
)""",
    ]
    greedy, final = _mmr_greedy_sql_parts(n_picks, lam10, dims)
    return (
        f"WITH {_adc_score_ctes(probe_ids, sub, k, iters, dims=dims)},\n"
        + ",\n".join(parts + greedy)
        + final
    )

"""Bit-exact cross-engine k-means over embedding vectors.

Float k-means can never hash-match across engines (mean computation is
float summation, whose result depends on reduction order). This module
instead specifies Lloyd's algorithm on an INTEGER-QUANTIZED domain, so
every iteration — distances, argmin assignment, centroid update — is
exact integer arithmetic that Spark and DuckDB reproduce bit-for-bit:

- quantize: e_i = floor((x_i + 1.0) · 10⁶) — the +1 shift makes all
  quantized values positive, so integer mean (`sum div count`) never
  hits the negative-division corner, and `floor` (not CAST) avoids the
  engines' different double→int rounding (Spark truncates, DuckDB
  rounds half-even);
- init: centroids = the embeddings of vec_id 0..k-1 (deterministic);
- assign: argmin of Σ(e_i − c_i)² (≤ 64·(2·10⁶)² ≈ 2.6e14, inside
  int64), ties to the smaller centroid id;
- update: per-dimension integer mean — floor division, identical
  truncation on both engines for positive sums;
- output: assignment under the final centroids.

The oracle unrolls the fixed iteration count into a CTE chain (assign →
per-dim mean → rebuild centroid arrays, repeated), so the whole
clustering is value-checked end-to-end — an iterative ML primitive
under the same correctness gate as the SQL operators.

Scale shape (the standard distributed Lloyd's): centroids are k×64
longs → BROADCAST to the assignment pass (map-only over the corpus);
the update is one map-side-combinable shuffle keyed (cluster, dim)
emitting k·64 rows; per-iteration lineage is truncated with an eager
localCheckpoint (components.py has the full rationale). Iteration
count is a fixed hyperparameter, not data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K = 4
ITERS = 2
DIMS = 64

_QUANT = "transform(embedding, x -> floor((CAST(x AS DOUBLE) + 1.0D) * 1000000.0D))"
_DIST = (
    "aggregate(zip_with(e, c, (a, b) -> (a - b) * (a - b)), "
    "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
)


def _kmeans_state(
    embeddings: DataFrame, k: int = K, iters: int = ITERS
) -> tuple[DataFrame, DataFrame]:
    """(quantized vectors, final centroids) after `iters` Lloyd updates.
    Centroids: (cid, c: array<long>)."""
    q = embeddings.select("vec_id", F.expr(_QUANT).alias("e"))
    cents = q.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("c")
    )

    for _ in range(iters):
        best = _assign(q, cents).select("cid", "e")
        ex = best.select("cid", F.posexplode("e").alias("dim", "v"))
        means = ex.groupBy("cid", "dim").agg(
            F.expr("sum(v) div count(1)").alias("m")
        )
        cents = means.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, m))), s -> s.m)"
            ).alias("c")
        ).localCheckpoint(eager=True)

    return q, cents


def _assign(q: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment as a map-side-combinable aggregate.

    The broadcast cross join expands each vector to k scored rows, but
    the argmin is taken with ``min_by`` keyed on the ``(d, cid)`` struct
    (distance first, ties to the smaller centroid id — bit-identical to
    the former ``row_number`` window). A hash aggregate combines the k
    rows per vector map-side BEFORE the exchange, so the shuffle carries
    ≤N rows — a window argmin would shuffle the full N×k expansion,
    which at SemDeDup's derived k=⌈√N⌉ is an N^1.5-row exchange."""
    scored = q.crossJoin(F.broadcast(centroids)).withColumn("d", F.expr(_DIST))
    best = scored.groupBy("vec_id").agg(
        F.min_by(F.struct("cid", "d", "e"), F.struct("d", "cid")).alias("b")
    )
    return best.select(
        "vec_id",
        F.col("b.e").alias("e"),
        F.col("b.cid").alias("cid"),
        F.col("b.d").alias("d"),
    )


def kmeans_centroids(
    embeddings: DataFrame, k: int = K, iters: int = ITERS
) -> DataFrame:
    """(cid, c: array<long>) — final quantized centroids."""
    return _kmeans_state(embeddings, k, iters)[1]


def kmeans_assignments(
    embeddings: DataFrame, k: int = K, iters: int = ITERS
) -> DataFrame:
    """(vec_id, cluster, dist_q) after `iters` Lloyd updates."""
    q, cents = _kmeans_state(embeddings, k, iters)
    return _assign(q, cents).select(
        "vec_id", F.col("cid").alias("cluster"), F.col("d").alias("dist_q")
    )


#: ε for SemDeDup-style semantic dedup: two embeddings are duplicates
#: when their quantized squared L2 distance is ≤ this (≈ the 0.1th
#: percentile of within-cluster pair distances on the test corpus —
#: drops ~12% of vectors at sf0.01). Squared distance instead of the
#: paper's cosine keeps the criterion pure int64 (cosine needs a sqrt
#: or an int128 cross-multiply), so both engines agree bit-for-bit.
D2_DEDUP_THRESH = 1_250_000_000_000

_PAIR_D2 = (
    "aggregate(zip_with(ae, be, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def derive_k(n_vectors: int, floor_k: int = K) -> int:
    """Cluster count for SemDeDup: k ≈ ⌈√N⌉ keeps the within-cluster
    pair count ~N^1.5 total (N²/2k with k=√N) instead of quadratic —
    the standard nlist heuristic. Never below the test-corpus floor."""
    import math

    return max(floor_k, math.isqrt(max(n_vectors, 1) - 1) + 1)


def semantic_dedup(
    embeddings: DataFrame,
    k: int | None = None,
    iters: int = ITERS,
    d2_thresh: int = D2_DEDUP_THRESH,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): Lloyd
    cluster the corpus, compare pairs only WITHIN a cluster, and drop
    every vector that has a lower-id ε-close neighbor (the paper's
    keep-one-representative rule, with vec_id as the deterministic
    priority). Returns (vec_id, cluster, kept).

    Scale shape: the all-pairs comparison is confined to clusters.
    `k=None` (the default) derives k ≈ ⌈√N⌉ from one cheap count, which
    bounds expected per-cluster pairs at ~N^1.5/2 total — a FIXED k
    would leave the per-cluster work N²/k, i.e. quadratic at any fixed
    setting. Pass an explicit k only when the cluster count must be
    reproducible independent of corpus size (the oracle-checked
    registry entry pins k=4 to keep the DuckDB CTE chain tractable).
    The assignment table is eagerly checkpointed first: the pair join
    reads it twice, and without truncation each side would re-run the
    whole Lloyd iteration subtree."""
    import logging

    if k is None:
        n_vectors = embeddings.count()
        k = derive_k(n_vectors)
        exp_pairs = n_vectors * n_vectors // max(2 * k, 1)
        logging.getLogger(__name__).info(
            "semantic_dedup: N=%d -> k=%d, expected within-cluster pairs "
            "~%d (N^2/2k)", n_vectors, k, exp_pairs,
        )
        if exp_pairs > 10_000_000_000:
            logging.getLogger(__name__).warning(
                "semantic_dedup: expected pair count %d exceeds 1e10; "
                "raise k or pre-shard the corpus", exp_pairs,
            )
    q, cents = _kmeans_state(embeddings, k, iters)
    a = (
        _assign(q, cents)
        .select("vec_id", "e", F.col("cid").alias("cluster"))
        .localCheckpoint(eager=True)
    )
    left = a.select(F.col("vec_id").alias("a_id"), F.col("e").alias("ae"), "cluster")
    right = a.select(F.col("vec_id").alias("b_id"), F.col("e").alias("be"), "cluster")
    dropped = (
        left.join(right, "cluster")
        .where(F.col("a_id") < F.col("b_id"))
        .where(F.expr(_PAIR_D2) <= F.lit(d2_thresh))
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return a.join(dropped, "vec_id", "left").select(
        "vec_id", "cluster", F.col("is_dup").isNull().alias("kept")
    )


def semantic_dedup_sql(
    k: int = K, iters: int = ITERS, d2_thresh: int = D2_DEDUP_THRESH
) -> str:
    pair_d2 = (
        f"list_sum(list_transform(range(1, {DIMS + 1}), "
        "i -> (lq.e[i] - rq.e[i]) * (lq.e[i] - rq.e[i])))"
    )
    return f"""
WITH {kmeans_ctes(k, iters)},
pairs AS (
  SELECT l.vec_id AS a_id, r.vec_id AS b_id, {pair_d2} AS d2
  FROM final l JOIN final r ON l.cid = r.cid AND l.vec_id < r.vec_id
  JOIN q lq ON lq.vec_id = l.vec_id
  JOIN q rq ON rq.vec_id = r.vec_id
),
drops AS (SELECT DISTINCT b_id AS vec_id FROM pairs WHERE d2 <= {d2_thresh})
SELECT f.vec_id, f.cid AS cluster, d.vec_id IS NULL AS kept
FROM final f LEFT JOIN drops d ON d.vec_id = f.vec_id
"""


#: quantized distance between q.e and c.c — shared by the CTE chain and
#: the IVF-over-kmeans oracle
KMEANS_DIST_SQL = (
    f"list_sum(list_transform(range(1, {DIMS + 1}), "
    "i -> (q.e[i] - c.c[i]) * (q.e[i] - c.c[i])))"
)


def kmeans_ctes(k: int = K, iters: int = ITERS) -> str:
    """CTE chain `q, c0, a0, m0, …, c{iters}, final` (no leading WITH,
    no trailing comma): `final` is the per-vector argmin assignment
    under the last centroids, `c{iters}` the centroid arrays — reusable
    inside larger oracles (IVF-over-kmeans)."""
    quant = (
        "list_transform(embedding, x -> "
        "CAST(floor((CAST(x AS DOUBLE) + 1.0) * 1000000.0) AS BIGINT))"
    )
    dist = KMEANS_DIST_SQL
    parts = [
        f"q AS (\n  SELECT vec_id, {quant} AS e FROM embeddings\n),",
        f"c0 AS (SELECT vec_id AS cid, e AS c FROM q WHERE vec_id < {k}),",
    ]
    for it in range(iters):
        parts.append(
            f"""a{it} AS (
  SELECT q.vec_id, q.e, c.cid, {dist} AS d
  FROM q CROSS JOIN c{it} c
  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY d ASC, cid ASC) = 1
),
m{it} AS (
  SELECT cid, i, sum(e[i]) // count(*) AS m
  FROM a{it} CROSS JOIN range(1, {DIMS + 1}) t(i)
  GROUP BY cid, i
),
c{it + 1} AS (SELECT cid, list(m ORDER BY i) AS c FROM m{it} GROUP BY cid),"""
        )
    parts.append(
        f"""final AS (
  SELECT q.vec_id, c.cid, {dist} AS d
  FROM q CROSS JOIN c{iters} c
  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY d ASC, cid ASC) = 1
)"""
    )
    return "\n".join(parts)


def kmeans_sql(k: int = K, iters: int = ITERS) -> str:
    """The identical algorithm as DuckDB SQL — the fixed iteration count
    unrolled into an assign/mean/rebuild CTE chain."""
    return (
        f"WITH {kmeans_ctes(k, iters)}\n"
        "SELECT vec_id, cid AS cluster, CAST(d AS BIGINT) AS dist_q FROM final"
    )

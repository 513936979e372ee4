"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. Probes are a broadcast
  side; the scan over the corpus is embarrassingly parallel; per-probe
  top-k via window row_number (TakeOrdered at scale: k × #probes rows
  survive the shuffle).
- LSH (sign-random-projection) bucketing: the scale path — a candidate
  set restricted to one bucket turns O(N) per probe into O(N/2^bits).
  Hyperplanes are a fixed deterministic constant shared verbatim with
  the oracle SQL.

Cosine arithmetic is written identically on both engines (element
products summed left-to-right over the 64 dims after casting to double)
so values hash-match at 4 decimals.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8


def _hyperplane(j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: closed-form constants so
    Spark and the oracle SQL share exact literals."""
    return [round(math.sin(1.0 + 17.0 * j + 0.619 * i), 6) for i in range(DIM)]


HYPERPLANES: list[list[float]] = [_hyperplane(j) for j in range(N_PLANES)]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_col(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(
    embeddings: DataFrame, probe_ids: list[int], k: int = 3
) -> DataFrame:
    """(probe_id, neighbor_id, cosine) — exact top-k per probe, self
    excluded; ties broken by neighbor_id."""
    probes = embeddings.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    pairs = embeddings.alias("e").join(
        F.broadcast(probes), F.col("e.vec_id") != F.col("probe_id")
    )
    sim = cosine_col(F.col("probe_vec"), F.col("e.embedding"))
    scored = pairs.select(
        F.col("probe_id"), F.col("e.vec_id").alias("neighbor_id"), sim.alias("_sim")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("probe_id", "neighbor_id", F.round(F.col("_sim"), 4).alias("cosine"))
    )


ANN_BRUTE_SQL = """
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS probe_vec
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
),
pairs AS (
  SELECT p.probe_id, e.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, 65),
             i -> CAST(p.probe_vec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, 65),
             i -> CAST(p.probe_vec[i] AS DOUBLE) * CAST(p.probe_vec[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(range(1, 65),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
         AS sim
  FROM probes p JOIN embeddings e ON e.vec_id <> p.probe_id
)
SELECT probe_id, neighbor_id, round(sim, 4) AS cosine
FROM pairs
QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id ASC) <= 3
"""


def lsh_bucket_assignments(embeddings: DataFrame) -> DataFrame:
    """(vec_id, bucket) — sign-random-projection LSH: bit j is
    sign(dot(v, hyperplane_j)); bucket is the 8-bit code."""
    bucket = None
    for j, plane in enumerate(HYPERPLANES):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = (
            F.when(_dot(F.col("embedding"), plane_col) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        term = bit * F.lit(1 << j).cast("long")
        bucket = term if bucket is None else bucket + term
    return embeddings.select("vec_id", bucket.alias("bucket"))


def lsh_buckets_sql() -> str:
    """Oracle SQL with the identical hyperplane literals."""
    bits = []
    for j, plane in enumerate(HYPERPLANES):
        arr = "[" + ", ".join(f"{x!r}" for x in plane) + "]"
        bits.append(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({arr}::DOUBLE[])[i])) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    expr = " + ".join(bits)
    return f"SELECT vec_id, CAST({expr} AS BIGINT) AS bucket FROM embeddings"


def embedding_near_duplicates(
    embeddings: DataFrame, threshold_bp: int = 9000
) -> DataFrame:
    """Embedding-cosine near-dup pairs: (vec_a, vec_b, cosine_bp) with
    vec_a < vec_b and cosine ≥ threshold (basis points, floor — integer
    output is cross-engine bit-stable).

    Blocking: candidates must share an LSH bucket (sign-random
    projections), so the pair join is per-bucket — linear-ish in corpus
    size at scale, exact cosine only on candidates."""
    with_b = embeddings.join(lsh_bucket_assignments(embeddings), "vec_id")
    a = with_b.alias("a")
    b = with_b.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    sim = cosine_col(F.col("a.embedding"), F.col("b.embedding"))
    cos_bp = F.floor(sim * 10000).cast("long")
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos_bp.alias("cosine_bp"),
        )
        .where(F.col("cosine_bp") >= threshold_bp)
    )


def embedding_near_dup_sql(threshold_bp: int = 9000) -> str:
    """Oracle: same LSH blocking (identical hyperplane literals) + the
    same left-to-right double cosine, floored to basis points."""
    buckets = lsh_buckets_sql()
    dot = (
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    )
    norm = (
        "sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST({s}.embedding[i] AS DOUBLE) * CAST({s}.embedding[i] AS DOUBLE))))"
    )
    return f"""
WITH bk AS ({buckets}),
emb AS (SELECT e.vec_id, e.embedding, bk.bucket FROM embeddings e JOIN bk USING (vec_id))
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(floor(({dot} / ({norm.format(s='a')} * {norm.format(s='b')})) * 10000) AS BIGINT) AS cosine_bp
FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE CAST(floor(({dot} / ({norm.format(s='a')} * {norm.format(s='b')})) * 10000) AS BIGINT) >= {threshold_bp}
"""


#: IVF coarse quantizer: every CENTROID_STRIDE-th vector is a centroid —
#: a deterministic stand-in for k-means (which would be iterative); the
#: index structure (assignment, probe-side nlist search) is the real part.
CENTROID_STRIDE = 50


def ivf_assignments(embeddings: DataFrame, stride: int = CENTROID_STRIDE) -> DataFrame:
    """(vec_id, centroid_id) — assign each vector to its nearest centroid
    (cosine; ties → smaller centroid id). Centroids broadcast; the scan
    is map-only."""
    centroids = embeddings.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    pairs = embeddings.crossJoin(F.broadcast(centroids))
    sim = cosine_col(F.col("embedding"), F.col("cvec"))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        pairs.select("vec_id", "centroid_id", sim.alias("_sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )


def ivf_assignments_sql(stride: int = CENTROID_STRIDE) -> str:
    dot = (
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))"
    )
    ne = (
        "sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))"
    )
    nc = (
        "sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(c.cvec[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))))"
    )
    return f"""
WITH c AS (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id % {stride} = 0
)
SELECT vec_id, centroid_id
FROM (
  SELECT e.vec_id, c.centroid_id, {dot} / ({ne} * {nc}) AS sim
  FROM embeddings e CROSS JOIN c
)
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id ASC) = 1
"""


def ivf_probe_lists(
    embeddings: DataFrame,
    probe_ids: list[int],
    nprobe: int = 1,
    stride: int = CENTROID_STRIDE,
) -> DataFrame:
    """(probe_id, probe_vec, probe_centroid) — each probe's `nprobe`
    nearest centroids (the IVF recall/cost knob: more lists searched =
    higher recall, proportionally more candidates scanned)."""
    centroids = embeddings.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("probe_centroid"), F.col("embedding").alias("cvec")
    )
    probes = embeddings.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    pairs = probes.crossJoin(F.broadcast(centroids))
    sim = cosine_col(F.col("probe_vec"), F.col("cvec"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("_sim").desc(), F.col("probe_centroid").asc()
    )
    return (
        pairs.select("probe_id", "probe_vec", "probe_centroid", sim.alias("_sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select("probe_id", "probe_vec", "probe_centroid")
    )


def ivf_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 3,
    stride: int = CENTROID_STRIDE,
    nprobe: int = 1,
) -> DataFrame:
    """IVF search: rerank only within the probe's `nprobe` nearest lists.
    At scale the scan is nprobe/nlist of the corpus. Each vector lives in
    exactly one list (argmax assignment), so multi-probe candidate sets
    need no dedup."""
    assign = ivf_assignments(embeddings, stride)
    emb_a = embeddings.join(assign, "vec_id")
    probes = ivf_probe_lists(embeddings, probe_ids, nprobe, stride)
    pairs = emb_a.alias("e").join(
        F.broadcast(probes),
        (F.col("e.centroid_id") == F.col("probe_centroid"))
        & (F.col("e.vec_id") != F.col("probe_id")),
    )
    sim = cosine_col(F.col("probe_vec"), F.col("e.embedding"))
    scored = pairs.select(
        F.col("probe_id"), F.col("e.vec_id").alias("neighbor_id"), sim.alias("_sim")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("probe_id", "neighbor_id", F.round(F.col("_sim"), 4).alias("cosine"))
    )


def lsh_topk(
    embeddings: DataFrame, probe_ids: list[int], k: int = 3
) -> DataFrame:
    """Scale path: exact rerank restricted to the probe's LSH bucket."""
    buckets = lsh_bucket_assignments(embeddings)
    emb_b = embeddings.join(buckets, "vec_id")
    probes = emb_b.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        F.col("bucket").alias("probe_bucket"),
    )
    pairs = emb_b.alias("e").join(
        F.broadcast(probes),
        (F.col("e.bucket") == F.col("probe_bucket"))
        & (F.col("e.vec_id") != F.col("probe_id")),
    )
    sim = cosine_col(F.col("probe_vec"), F.col("e.embedding"))
    scored = pairs.select(
        F.col("probe_id"), F.col("e.vec_id").alias("neighbor_id"), sim.alias("_sim")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("probe_id", "neighbor_id", F.round(F.col("_sim"), 4).alias("cosine"))
    )


def _dot_sql(a: str, b: str) -> str:
    return (
        "list_sum(list_transform(range(1, 65), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _norm_sql(v: str) -> str:
    return f"sqrt({_dot_sql(v, v)})"


def _topk_sql(probe_ids: list[int], k: int) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""
scored AS (
  SELECT p.probe_id, e.vec_id AS neighbor_id,
         {_dot_sql('p.probe_vec', 'e.embedding')}
         / ({_norm_sql('p.probe_vec')} * {_norm_sql('e.embedding')}) AS sim
  FROM emb e JOIN probes p ON e._blk = p._probe_blk AND e.vec_id <> p.probe_id
)
SELECT probe_id, neighbor_id, round(sim, 4) AS cosine FROM scored
QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id ASC) <= {k}
""", ids


def lsh_topk_sql(probe_ids: list[int], k: int = 3) -> str:
    """Oracle for lsh_topk: identical hyperplane literals, candidate set
    restricted to the probe's bucket, same rerank."""
    tail, ids = _topk_sql(probe_ids, k)
    return f"""
WITH bk AS ({lsh_buckets_sql()}),
emb AS (SELECT e.vec_id, e.embedding, bk.bucket AS _blk FROM embeddings e JOIN bk USING (vec_id)),
probes AS (SELECT vec_id AS probe_id, embedding AS probe_vec, _blk AS _probe_blk
           FROM emb WHERE vec_id IN ({ids})),
{tail}
"""


def ivf_topk_sql(
    probe_ids: list[int],
    k: int = 3,
    stride: int = CENTROID_STRIDE,
    nprobe: int = 1,
) -> str:
    """Oracle for ivf_topk: the same deterministic coarse quantizer,
    probe lists (nprobe nearest centroids), and rerank."""
    tail, ids = _topk_sql(probe_ids, k)
    return f"""
WITH assign AS ({ivf_assignments_sql(stride)}),
c AS (SELECT vec_id AS centroid_id, embedding AS cvec
      FROM embeddings WHERE vec_id % {stride} = 0),
p0 AS (SELECT vec_id AS probe_id, embedding AS probe_vec
       FROM embeddings WHERE vec_id IN ({ids})),
probes AS (
  SELECT probe_id, probe_vec, centroid_id AS _probe_blk FROM (
    SELECT p.probe_id, p.probe_vec, c.centroid_id,
           {_dot_sql('p.probe_vec', 'c.cvec')}
           / ({_norm_sql('p.probe_vec')} * {_norm_sql('c.cvec')}) AS sim
    FROM p0 p CROSS JOIN c
  ) QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, centroid_id ASC) <= {nprobe}
),
emb AS (SELECT e.vec_id, e.embedding, a.centroid_id AS _blk
        FROM embeddings e JOIN assign a USING (vec_id)),
{tail}
"""

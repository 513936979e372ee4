"""Int8 embedding quantization — vector compression for 100 TB-scale
embedding pipelines.

A float32[64] embedding is 256 bytes; symmetric int8 quantization
(per-vector absmax scale) stores 64 bytes + one scale — 4× smaller scan
and shuffle volume for every downstream ANN/dedup pass, at a bounded
cosine error (≤ ~1/127 per axis). The reference has no embedding
surface at all; this extends the training-data side the same way the
HDR path quantizes latencies into a bounded integer domain.

Cross-engine determinism: quantized codes are produced with explicit
`floor(x·127/scale + 0.5)` (round-half-up — floor is floor on both
engines, unlike CAST whose double→int rounding differs), and every
derived statistic (norms, dots) is exact int64 arithmetic, so the whole
pipeline is oracle-checkable bit-for-bit. Cosine over codes divides two
exact integers — the same double on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DIM = 64

#: absmax scale (guarded against the zero vector), as a double column
_SCALE = (
    "greatest(aggregate(embedding, 0.0D, "
    "(a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))), 1e-30D)"
)

#: int8 codes in [-127, 127] (round-half-up via floor)
_CODES = (
    f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0D / {_SCALE}"
    " + 0.5D) AS BIGINT))"
)


def quantized_embeddings(embeddings: DataFrame) -> DataFrame:
    """(vec_id, scale_q, q: array<long of int8 range>) — the stored form.
    `scale_q` = floor(scale · 10⁹) (integer so the row is hashable
    cross-engine)."""
    return embeddings.select(
        "vec_id",
        F.expr(f"CAST(floor({_SCALE} * 1000000000.0D) AS BIGINT)").alias("scale_q"),
        F.expr(_CODES).alias("q"),
    )


def quantize_stats(embeddings: DataFrame) -> DataFrame:
    """Scalar per-vector audit row: (vec_id, scale_q, q_norm, q_sum,
    q_min, q_max) — array-free so the cross-engine value hash is
    byte-stable (pandas stringifies lists differently per engine)."""
    qd = quantized_embeddings(embeddings)
    return qd.select(
        "vec_id",
        "scale_q",
        F.expr("aggregate(q, 0L, (a, x) -> a + x * x)").alias("q_norm"),
        F.expr("aggregate(q, 0L, (a, x) -> a + x)").alias("q_sum"),
        F.expr("array_min(q)").alias("q_min"),
        F.expr("array_max(q)").alias("q_max"),
    )


QUANTIZE_STATS_SQL = f"""
WITH qd AS (
  SELECT vec_id,
         CAST(floor({{scale}} * 1000000000.0) AS BIGINT) AS scale_q,
         {{codes}} AS q
  FROM embeddings
)
SELECT vec_id, scale_q,
       CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS q_norm,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       list_min(q) AS q_min, list_max(q) AS q_max
FROM qd
"""


def _duck_scale() -> str:
    return (
        "greatest(list_max(list_transform(embedding, "
        "x -> abs(CAST(x AS DOUBLE)))), 1e-30)"
    )


def _duck_codes() -> str:
    return (
        "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / "
        f"{_duck_scale()} + 0.5) AS BIGINT))"
    )


def quantize_stats_sql() -> str:
    return QUANTIZE_STATS_SQL.format(scale=_duck_scale(), codes=_duck_codes())


def quantized_topk(
    embeddings: DataFrame, probe_ids: list[int], k: int = 3
) -> DataFrame:
    """Brute-force top-k under the QUANTIZED cosine: integer dot over
    codes / integer norms — the compressed-domain search. Same output
    shape as the float paths so recall is directly comparable."""
    from khronus_spark.sources.tables import spread

    qd = quantized_embeddings(embeddings)
    probes = qd.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("q").alias("pq")
    )
    pairs = spread(qd, max_partitions=8).alias("e").join(
        F.broadcast(probes), F.col("e.vec_id") != F.col("probe_id")
    )
    dot = F.expr("aggregate(zip_with(pq, q, (a, b) -> a * b), 0L, (a, x) -> a + x)")
    n1 = F.expr("aggregate(pq, 0L, (a, x) -> a + x * x)")
    n2 = F.expr("aggregate(q, 0L, (a, x) -> a + x * x)")
    sim = dot / (F.sqrt(n1.cast("double")) * F.sqrt(n2.cast("double")))
    scored = pairs.select(
        "probe_id", F.col("e.vec_id").alias("neighbor_id"), sim.alias("_sim")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("probe_id", "neighbor_id", F.round(F.col("_sim"), 4).alias("cosine_q"))
    )


def quantized_topk_sql(probe_ids: list[int], k: int = 3) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""
WITH qd AS (SELECT vec_id, {_duck_codes()} AS q FROM embeddings),
probes AS (SELECT vec_id AS probe_id, q AS pq FROM qd WHERE vec_id IN ({ids})),
scored AS (
  SELECT p.probe_id, e.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {DIM + 1}),
              i -> p.pq[i] * e.q[i])) AS BIGINT)
         / (sqrt(CAST(list_sum(list_transform(p.pq, x -> x * x)) AS DOUBLE))
          * sqrt(CAST(list_sum(list_transform(e.q, x -> x * x)) AS DOUBLE))) AS sim
  FROM probes p JOIN qd e ON e.vec_id <> p.probe_id
)
SELECT probe_id, neighbor_id, round(sim, 4) AS cosine_q FROM scored
QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id ASC) <= {k}
"""


def embedding_dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-DIMENSION corpus statistics over the exact integer domain
    (the `_QUANT` micro-unit grid both engines share): (dim, n, min_q,
    max_q, mean_q, var_q x1e? — exact integer sums, variance in the
    integer numerator form var_num = n·Σx² − (Σx)², evaluated in
    DECIMAL(38,0) because the int64 form overflows at n ≈ 2,300 rows
    per dim (v ≤ 2e6 ⇒ n·Σv² ≈ 4e12·n²; the r12 dual-writer soak
    caught the refresh's train-stats write throwing exactly this once
    the standing corpus crossed it — same wrap class as the r11 HW
    hardening; exact up to ~1e12 rows, the documented drift-flags
    bound) so no float ever enters. The EMITTED `var_num` column is
    the exact integer CAST TO STRING: DECIMAL(38,0) is exact inside
    the plan but has NO canonical cross-engine materialization —
    Spark hands the driver `Decimal('3990380321932456')` where
    DuckDB's client path degrades the same value to float64
    `3.99038e+15`, so the r12 driver hash split on equal values (the
    round's one red row). The decimal digits ARE canonical at every
    scale; consumers (`embedding_drift_flags`) cast back to
    DECIMAL(38,0), an exact round-trip for integers) plus two QA
    flags — `dead` (the dimension never moves:
    min == max) and `clipped` (≥1% of values pinned at either end of
    the [-1, 1] input range). The embedding-table health check run
    before any ANN/quantization stage: a dead dim wastes index bits,
    heavy clipping means the upstream encoder saturated and cosine
    geometry is distorted.

    Scale shape: one posexplode + one map-side-combinable groupBy on
    the 64-value dim key; output is 64 rows regardless of corpus
    size."""
    quant = (
        "transform(embedding, x -> floor((CAST(x AS DOUBLE) + 1.0D) * 1000000.0D))"
    )
    q = embeddings.select(
        "vec_id", F.expr(quant).alias("e")
    ).select(F.posexplode("e").alias("dim", "v"))
    lo, hi = 0, 2_000_000  # _QUANT image of [-1.0, 1.0]
    return (
        q.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("min_q"),
            F.max("v").alias("max_q"),
            F.expr("sum(v) div count(1)").alias("mean_q"),
            F.expr(
                "CAST(count(1) AS DECIMAL(38,0))"
                " * sum(CAST(v * v AS DECIMAL(38,0)))"
                " - sum(CAST(v AS DECIMAL(38,0)))"
                " * sum(CAST(v AS DECIMAL(38,0)))"
            ).cast("decimal(38,0)").alias("var_num"),
            F.sum(F.expr(f"IF(v <= {lo} OR v >= {hi}, 1L, 0L)")).alias("n_pinned"),
        )
        .select(
            F.col("dim").cast("long").alias("dim"),
            "n",
            "min_q",
            "max_q",
            "mean_q",
            F.col("var_num").cast("string").alias("var_num"),
            (F.col("min_q") == F.col("max_q")).alias("dead"),
            (F.col("n_pinned") * 100 >= F.col("n")).alias("clipped"),
        )
    )


EMBEDDING_DIM_STATS_SQL = """
WITH q AS (
  SELECT s.i AS dim,
         CAST(floor((CAST(embedding[s.i] AS DOUBLE) + 1.0) * 1000000.0) AS BIGINT) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) s(i)
)
SELECT CAST(dim - 1 AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       min(v) AS min_q,
       max(v) AS max_q,
       CAST(sum(v) // count(*) AS BIGINT) AS mean_q,
       CAST(CAST(count(*) * sum(v * v) - sum(v) * sum(v) AS DECIMAL(38,0)) AS VARCHAR) AS var_num,
       (min(v) = max(v)) AS dead,
       (sum(CASE WHEN v <= 0 OR v >= 2000000 THEN 1 ELSE 0 END) * 100 >= count(*)) AS clipped
FROM q
GROUP BY dim
"""


def embedding_drift_flags(
    train_stats: DataFrame,
    batch_stats: DataFrame,
    z_tenths: int = 50,
) -> DataFrame:
    """Per-dimension DRIFT verdict between a training-time profile and
    a fresh-batch profile (both `embedding_dim_stats` outputs) — the
    detector half of the streaming-ANN refresh loop (`streaming/
    ann.py`: frozen PQ codebooks quantize new vectors with the
    training distribution's geometry, so a drifted batch silently
    inflates ADC error; this is the signal that gates a retrain).

    A dimension is flagged `mean_shift` when the batch mean sits more
    than z standard ERRORS from the training mean (a two-sample z-test
    with the training profile as reference):

        |Δmean| > z · std_train / √n_batch
      ⇔ Δmean² · n_batch · n_train² · 100 > z_tenths² · var_num_train

    — the inequality cleared of sqrt/division so it evaluates in
    EXACT integers (DECIMAL(38,0) products — `var_num` arrives as the
    stats face's canonical digit STRING and casts back to
    DECIMAL(38,0), an exact round-trip for integers; `z_tenths` is z×10, so
    the default 50 is a 5σ gate: per-dim false-positive odds are
    negligible while a real distribution shift clears it by orders of
    magnitude — shift/SE grows with √n_batch). Also flagged:
    `newly_dead` (a dimension that moved in training but is constant
    in the batch — an encoder regression) and `newly_clipped`
    (saturation appearing where training had none). `drifted` is the
    OR; `any(drifted)` is the refresh trigger.

    Caveat (shared with `events_seasonal_anomaly`): the decimal
    products are exact while Δmean²·n_batch·n_train²·100 < 1e38 —
    beyond ~1e12 profile rows pre-scale the counts.

    Scale shape: both inputs are |dims| rows; this is a broadcast-size
    join however large the corpora behind the profiles were."""
    t = train_stats.select(
        "dim",
        F.col("n").alias("n_t"),
        F.col("mean_q").alias("mean_q_train"),
        F.col("var_num").alias("var_num_t"),
        F.col("dead").alias("dead_t"),
        F.col("clipped").alias("clipped_t"),
    )
    b = batch_stats.select(
        "dim",
        F.col("n").alias("n_b"),
        F.col("mean_q").alias("mean_q_batch"),
        F.col("dead").alias("dead_b"),
        F.col("clipped").alias("clipped_b"),
    )
    d = t.join(b, "dim")
    dm = "CAST(mean_q_batch - mean_q_train AS DECIMAL(38,0))"
    lhs = f"{dm} * {dm} * CAST(n_b AS DECIMAL(38,0)) * CAST(n_t AS DECIMAL(38,0)) * CAST(n_t AS DECIMAL(38,0)) * 100"
    rhs = f"CAST({z_tenths} AS DECIMAL(38,0)) * {z_tenths} * CAST(var_num_t AS DECIMAL(38,0))"
    return d.select(
        "dim",
        "mean_q_train",
        "mean_q_batch",
        F.expr(f"{lhs} > {rhs}").alias("mean_shift"),
        (F.col("dead_b") & ~F.col("dead_t")).alias("newly_dead"),
        (F.col("clipped_b") & ~F.col("clipped_t")).alias("newly_clipped"),
        F.expr(
            f"({lhs} > {rhs}) OR (dead_b AND NOT dead_t) "
            "OR (clipped_b AND NOT clipped_t)"
        ).alias("drifted"),
    )


def embedding_drift_flags_sql(z_tenths: int = 50) -> str:
    """Oracle for the `embedding_drift_flags` registry entry: train =
    even vec_ids raw, batch = odd vec_ids shifted by +0.5 (computed in
    DOUBLE, clipped at 1.0, rounded to FLOAT — bit-identical to the
    Spark transform), both profiled by the `embedding_dim_stats`
    restatement, then the cleared z-test inequality in HUGEINT (exact,
    like Spark's DECIMAL(38,0))."""
    stats = """
  SELECT dim, count(*) AS n, min(v) AS min_q, max(v) AS max_q,
         CAST(sum(v) // count(*) AS BIGINT) AS mean_q,
         CAST(count(*) * sum(v * v) - sum(v) * sum(v) AS DECIMAL(38,0)) AS var_num,
         (min(v) = max(v)) AS dead,
         (sum(CASE WHEN v <= 0 OR v >= 2000000 THEN 1 ELSE 0 END) * 100
            >= count(*)) AS clipped
  FROM {src} GROUP BY dim
"""
    lhs = (
        "CAST(b.mean_q - t.mean_q AS HUGEINT) * (b.mean_q - t.mean_q) "
        "* b.n * t.n * t.n * 100"
    )
    rhs = f"CAST({z_tenths} AS HUGEINT) * {z_tenths} * t.var_num"
    return f"""
WITH tq AS (
  SELECT s.i - 1 AS dim,
         CAST(floor((CAST(embedding[s.i] AS DOUBLE) + 1.0) * 1000000.0) AS BIGINT) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) s(i)
  WHERE vec_id % 2 = 0
),
bq AS (
  SELECT s.i - 1 AS dim,
         CAST(floor((CAST(CAST(least(1.0, CAST(embedding[s.i] AS DOUBLE) + 0.5) AS FLOAT) AS DOUBLE) + 1.0) * 1000000.0) AS BIGINT) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) s(i)
  WHERE vec_id % 2 = 1
),
ts AS ({stats.format(src='tq')}),
bs AS ({stats.format(src='bq')})
SELECT CAST(t.dim AS BIGINT) AS dim,
       t.mean_q AS mean_q_train,
       b.mean_q AS mean_q_batch,
       ({lhs} > {rhs}) AS mean_shift,
       (b.dead AND NOT t.dead) AS newly_dead,
       (b.clipped AND NOT t.clipped) AS newly_clipped,
       (({lhs} > {rhs}) OR (b.dead AND NOT t.dead)
          OR (b.clipped AND NOT t.clipped)) AS drifted
FROM ts t JOIN bs b ON t.dim = b.dim
"""

"""Skew-resistant aggregation via salting (two-phase re-keying).

When is salting actually needed? Spark's hash aggregation already does
map-side partial aggregation, so plain sum/count/min/max over a skewed
key NEVER hotspots — each task pre-folds its rows before the shuffle.
The aggregations that DO hotspot are the ones whose partial state is
proportional to the data (exact COUNT(DISTINCT), collect_list/set):
every row of a hot key must reach one reducer.

``salted_distinct`` fixes exact distinct counts: re-key by
(group, hash(key) % buckets) so each reducer sees a 1/buckets slice of
the hot group's key space, count distinct per slice, then sum the
per-slice counts. Because the salt is a FUNCTION OF THE KEY, the slices
partition the key space — per-slice distinct counts add up exactly (no
overlap, nothing missed). Salting with a random/row-based salt would
double-count keys across slices; that variant is only valid for
re-aggregatable partials (sum/count), where it is unnecessary anyway.

Cost: two shuffles instead of one, but the first is spread over
`buckets`× more reducers for the hot key and the second moves only
(group × buckets) rows. At 100 TB with a hot tenant/metric this is the
difference between a straggler task holding the stage and an even
stage. (For skewed *joins*, prefer AQE skew-join handling — Spark
splits oversized partitions automatically; salting joins by hand
duplicates the build side.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct(
    df: DataFrame, group_col: str, key_col: str, buckets: int = 16
) -> DataFrame:
    """(group, n_distinct) — exact, skew-resistant COUNT(DISTINCT)."""
    salted = df.select(
        group_col,
        key_col,
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(buckets)).alias("_salt"),
    )
    partial = salted.groupBy(group_col, "_salt").agg(
        F.count_distinct(F.col(key_col)).alias("partial_distinct")
    )
    return partial.groupBy(group_col).agg(
        F.sum("partial_distinct").cast("long").alias("n_distinct")
    )


def salted_distinct_sql(table: str, group_col: str, key_col: str) -> str:
    """Oracle: the salted plan is exact, so the oracle is the plain
    COUNT(DISTINCT) — no salt arithmetic needs restating."""
    return f"""
SELECT {group_col}, count(DISTINCT {key_col}) AS n_distinct
FROM {table}
GROUP BY {group_col}
"""


def skew_profile(
    df: DataFrame, key_col: str, top_n: int = 20
) -> DataFrame:
    """The measurement that DECIDES whether any skew machinery is
    needed: per top-`top_n` key (by row count), its absolute count,
    corpus share, cumulative share, and multiple-of-the-mean-key —
    the pre-join/pre-aggregation diagnostic that tells you whether a
    shuffle on `key_col` will straggle (one key holding >> 1/parallelism
    of the rows) and whether AQE skew-join splitting or
    `salted_distinct` is warranted.

    Returns (rank, key, cnt, share_bp, cum_share_bp, mean_mult_x100),
    rank ordered by (cnt desc, key asc) — deterministic ties.
    `mean_mult_x100` = 100 x this key's count over the mean key's
    count, computed as cnt*100 div (total div n_keys) so every term
    stays inside int64 at any corpus size (an exact cnt*n_keys*100
    numerator would overflow at ~1e12 rows x 1e9 keys).

    Scale shape: ONE map-side-combinable count shuffle over the key,
    then everything downstream is key-table-sized — the totals are a
    two-scalar aggregate of the count table (broadcast back as one
    row), the top-N is a TakeOrdered, and the cumulative window runs
    over top_n rows. The corpus is scanned once.
    """
    counts = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    stats = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    from pyspark.sql import Window

    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(top_n)
        .crossJoin(F.broadcast(stats))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            "cnt",
            F.expr("cnt * 10000 div _total").alias("share_bp"),
            F.expr(
                "sum(cnt) OVER (ORDER BY cnt DESC, key ASC) * 10000 div _total"
            ).alias("cum_share_bp"),
            F.expr("cnt * 100 div (_total div _n_keys)").alias(
                "mean_mult_x100"
            ),
        )
    )

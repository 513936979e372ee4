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

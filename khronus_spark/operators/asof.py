"""As-of (point-in-time) join: each left row matched to the latest right
row with right.ts <= left.ts, per key.

The reference gets as-of behavior implicitly from its time-grid
alignment (every series is re-gridded before `zipByTimestamp`,
`InfluxQueryResolver.scala:203-212`); here it's a first-class operator
because training-data pipelines need point-in-time-correct feature
joins (no future leakage).

Scale design: NOT a join at all — both sides are union-ed and sorted
once per key (a single shuffle on the key), then the right payload is
carried forward with `last(..., ignorenulls)` over an ever-growing
window. Cost is one shuffle + one sort — the same as any groupBy — and
is immune to the candidate-pair blowup a theta-join (`l.ts >= r.ts`)
would produce. Skewed keys behave like any skewed aggregation (AQE
handles them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    by: str,
    ts: str = "ts_ms",
    start: str = "start_ms",
    end: str = "end_ms",
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Point-in-interval join (`start <= ts <= end`, same key) without a
    theta-join: intervals explode into the grid buckets they cover
    (bounded fan-out = interval span / bucket_ms), points map to their
    single containing bucket, both sides equi-join on (key, bucket), and
    the exact containment predicate filters the survivors.

    A naive `l.ts between r.start and r.end` condition forces Spark into
    BroadcastNestedLoopJoin (quadratic candidates); this shape keeps it
    a hash join whose cost is linear in points + interval-bucket spans.
    Each (point, interval) pair meets in exactly one bucket — the
    point's — so no dedup is needed.
    """
    i_buckets = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.call_function("div", F.col(start), F.lit(bucket_ms)),
                F.call_function("div", F.col(end), F.lit(bucket_ms)),
            )
        ),
    )
    p_buckets = points.withColumn(
        "_bucket", F.call_function("div", F.col(ts), F.lit(bucket_ms))
    )
    joined = p_buckets.join(i_buckets, on=[by, "_bucket"], how="inner").where(
        F.col(ts).between(F.col(start), F.col(end))
    )
    return joined.drop("_bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str = "ts_ms",
    payload_prefix: str = "r_",
) -> DataFrame:
    """Inner as-of join. `left` and `right` share the key column `by` and
    the long time column `ts`; every non-key right column is carried onto
    matching left rows as `{payload_prefix}{col}`. Ties (equal ts) match.
    """
    r_payload = [c for c in right.columns if c not in (by, ts)]
    l_cols = [c for c in left.columns if c not in (by, ts)]

    # The whole right row travels as ONE struct so every carried payload
    # field comes from the same matched right row (independent per-column
    # windows would stitch fields from different rows when payloads hold
    # NULLs).
    r_tagged = right.select(
        F.col(by),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts).alias(f"{payload_prefix}{ts}"),
            *[F.col(c).alias(f"{payload_prefix}{c}") for c in r_payload],
        ).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in l_cols],
    )
    l_tagged = left.select(
        F.col(by),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
    )
    unioned = r_tagged.unionByName(l_tagged)

    # right rows (_side=0) sort before left rows at equal ts → "<=" ties
    # match; the struct itself is the tertiary key so equal-ts right rows
    # order deterministically (field-wise struct comparison), making the
    # matched row stable across runs.
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts), F.col("_side"), F.col("_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        unioned.withColumn("_m", F.last(F.col("_r"), ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .where(F.col("_m").isNotNull())
    )
    return out.select(
        F.col(by),
        F.col(ts),
        *[F.col(f"_l_{c}").alias(c) for c in l_cols],
        *[F.col("_m")[f"{payload_prefix}{c}"].alias(f"{payload_prefix}{c}")
          for c in r_payload],
        F.col("_m")[f"{payload_prefix}{ts}"].alias(f"{payload_prefix}{ts}"),
    )

"""Deterministic HLL: spec pin, accuracy tolerance, partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from khronus_spark.operators.sketches import hll_distinct


def test_hll_accuracy_low_and_high_cardinality(spark, oracle_sf_dir):
    ev = spark.read.parquet(f"{oracle_sf_dir}/events.parquet")
    # low cardinality: 150 distinct users per type
    low = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(ev, "event_type", "user_id").collect()
    }
    exact_low = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    # raw HLL at m=64 (no linear-counting correction): allow 30%
    for t, est in low.items():
        assert abs(est - exact_low[t]) / exact_low[t] < 0.30, (t, est, exact_low[t])

    # high cardinality: ~2000 distinct event_ids per type
    high = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(ev, "event_type", "event_id").collect()
    }
    exact_high = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        .collect()
    }
    for t, est in high.items():
        assert abs(est - exact_high[t]) / exact_high[t] < 0.30, (t, est, exact_high[t])


def test_hll_partition_invariant_and_pinned(spark, oracle_sf_dir):
    """The estimate is a pure function of the value set — repartitioning
    must not change it; the pinned value guards the spec (any change to
    hash/register/estimator arithmetic breaks cross-engine parity)."""
    ev = spark.read.parquet(f"{oracle_sf_dir}/events.parquet")
    a = sorted(
        tuple(r) for r in hll_distinct(ev, "event_type", "user_id").collect()
    )
    b = sorted(
        tuple(r)
        for r in hll_distinct(ev.repartition(7), "event_type", "user_id").collect()
    )
    assert a == b
    assert all(est == 135 for _, est in a)  # spec pin at sf0.01 (exact: 150)


def test_hll_wide_equals_tall(spark, oracle_sf_dir):
    """The single-aggregation (streaming-safe) register-column form must
    produce the identical estimate to the two-level tall form."""
    from khronus_spark.operators.sketches import hll_distinct_wide

    ev = spark.read.parquet(f"{oracle_sf_dir}/events.parquet")
    tall = sorted(tuple(r) for r in hll_distinct(ev, "event_type", "user_id").collect())
    wide = sorted(
        tuple(r) for r in hll_distinct_wide(ev, "event_type", "user_id").collect()
    )
    assert tall == wide

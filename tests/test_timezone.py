"""Session-timezone independence of the time-domain boundary.

The engine's time domain is the epoch-ns long, produced at the scan
boundary by `ntz_to_epoch_ns`. The round-2 implementation went through
`to_utc_timestamp(ts, 'UTC')`, which implicitly casts TIMESTAMP_NTZ →
LTZ via the *session* timezone first (the 'UTC' shift is then a no-op),
skewing every epoch by the session offset whenever a driver session is
not UTC — and silently dropping rows in the engine's dual-predicate
pushdown (engine.py), where the shifted ts_ms predicate is ANDed with
the wall-clock NTZ-literal ts_src predicate. The suite pins UTC in
conftest, so these tests flip the session timezone explicitly.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from khronus_spark.engine import KhronusEngine
from khronus_spark.sources.tables import (
    load_table,
    measurements_from_events,
)

NON_UTC_TZS = ["Asia/Kolkata", "America/New_York"]


@contextmanager
def session_tz(spark, tz: str):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def _ts_fingerprint(spark, sf_dir):
    row = (
        load_table(spark, sf_dir, "events")
        .agg(
            # epoch-ns sums overflow BIGINT; a mod-bounded sum still
            # fingerprints every row while min/max catch uniform shifts
            F.sum(F.col("ts") % 1_000_000_000_000).alias("s"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    return tuple(row)


@pytest.mark.parametrize("tz", NON_UTC_TZS)
def test_load_table_epoch_ns_is_session_tz_independent(spark, sf_dir, tz):
    base = _ts_fingerprint(spark, sf_dir)
    with session_tz(spark, tz):
        shifted = _ts_fingerprint(spark, sf_dir)
    assert base == shifted, (
        f"events.ts epoch-ns differs under session tz {tz}: "
        f"{base} vs {shifted}"
    )


@pytest.mark.parametrize("tz", NON_UTC_TZS)
def test_measurements_view_is_session_tz_independent(spark, sf_dir, tz):
    def fp():
        return tuple(
            measurements_from_events(spark, sf_dir)
            .agg(
                F.sum(F.col("ts_ms") % 1_000_000_000_000).alias("s"),
                F.min("ts_ms").alias("lo"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )

    base = fp()
    with session_tz(spark, tz):
        shifted = fp()
    assert base == shifted


@pytest.mark.parametrize("tz", NON_UTC_TZS)
def test_engine_query_rows_survive_non_utc_session(spark, sf_dir, tz):
    """End-to-end: the on-the-fly engine ANDs the computed ts_ms
    predicate with the raw ts_src pushdown predicate. If either is
    session-tz-dependent they disagree and rows silently vanish."""

    def run():
        m = measurements_from_events(spark, sf_dir)
        now_ms = m.agg(F.max("ts_ms")).collect()[0][0]
        eng = KhronusEngine(spark, measurements=m, now_ms=now_ms)
        df = eng.sql_union(
            'select count from "click" where time > now() - 4h '
            "force group by time(5m)"
        )
        return sorted(tuple(r) for r in df.collect())

    base = run()
    assert len(base) > 0, "fixture must select rows for the test to bite"
    with session_tz(spark, tz):
        shifted = run()
    assert base == shifted


@pytest.mark.parametrize(
    "entry",
    [
        "ts_counter_summary_5m",      # measurements view (ns-long domain)
        "influx_count_click_5m",      # engine dual-predicate pushdown
        "tpch_q1_pricing",            # native NTZ date column filters
        "events_sessions_30m",        # session windows over ns longs
        # round-4b: F.window day grids + unix_millis week buckets must
        # not shift under a non-UTC session zone
        "approx_distinct_users_weekly_cascade",
        "cms_heavy_users_weekly_cascade",
    ],
)
def test_registry_entries_session_tz_independent(spark, sf_dir, entry):
    """Representative registry entries from every time-handling family
    must return identical rows under a non-UTC session timezone — the
    engine's whole time domain is either epoch-ns longs or TIMESTAMP_NTZ
    compared against NTZ literals, so no result may shift with the
    driver session's zone."""
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[entry]

    def run():
        return sorted(tuple(r) for r in fn(spark, sf_dir).collect())

    base = run()
    assert base, f"{entry}: fixture selected no rows"
    with session_tz(spark, "Asia/Kolkata"):
        shifted = run()
    assert base == shifted, f"{entry}: rows differ under Asia/Kolkata"

"""Materialized summary store: write → query-path read parity with the
on-the-fly engine, plus scan pushdown assertions (the Spark analogue of
the reference's PK(metric, timestamp) locality —
`store/SummaryStore.scala:70-75`)."""

from __future__ import annotations

import re
import tempfile

import pytest
from pyspark.sql import functions as F

from khronus_spark.engine import KhronusEngine
from khronus_spark.operators.rollup import (
    apply_retention,
    read_summaries,
    rollup_all,
    write_summaries,
)
from khronus_spark.sources.tables import measurements_from_events

NOW_MS = 1706659200000


@pytest.fixture(scope="module")
def store(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="khronus_store_")
    m = measurements_from_events(spark, sf_dir).cache()
    write_summaries(rollup_all(m), tmp)
    return tmp, m


def test_store_query_parity(spark, store):
    tmp, m = store
    q = 'select count, p95 from "purchase" where time > now()-48h force group by time(1h)'
    on_the_fly = KhronusEngine(spark, measurements=m, now_ms=NOW_MS)
    materialized = KhronusEngine(spark, summary_base_path=tmp, catalog=on_the_fly.catalog, now_ms=NOW_MS)
    a = {(r["series"], r["time"]): r["value"] for r in on_the_fly.sql_union(q).collect()}
    b = {(r["series"], r["time"]): r["value"] for r in materialized.sql_union(q).collect()}
    assert a == b and a


def test_store_scan_pushdown(spark, store):
    tmp, m = store
    cat = [("purchase", "timer"), ("click", "counter")]
    eng = KhronusEngine(spark, summary_base_path=tmp, catalog=cat, now_ms=NOW_MS)
    series = eng.sql('select p99 from "purchase" where time > now()-48h force group by time(1h)')
    plan = series[0].df._jdf.queryExecution().executedPlan().toString()
    # metric equality and ts range both reach the parquet scan (the plan
    # string truncates long filter lists, so check the markers directly)
    assert "EqualTo(metric,purchase)" in plan
    assert "GreaterThanOrEqual(ts," in plan
    # and the scan reads only the columns the query needs
    schemas = " ".join(re.findall(r"ReadSchema: [^\n]*", plan))
    assert "p50" not in schemas  # p99 query must not read other percentiles


def test_retention(spark, store):
    tmp, m = store
    full = read_summaries(spark, tmp, "counter", 60_000)
    cutoff = 1705000000000
    kept = apply_retention(spark, tmp, "counter", 60_000, cutoff)
    assert kept.where(F.col("ts") < cutoff).count() == 0
    assert kept.count() == full.where(F.col("ts") >= cutoff).count()


def test_slice_pushdown_on_the_fly(spark, store):
    """The on-the-fly provider must push the aligned slice into the RAW
    measurements scan — not aggregate all history then filter."""
    tmp, m = store
    eng = KhronusEngine(spark, measurements=m, now_ms=NOW_MS)
    series = eng.sql('select count from "click" where time > now()-6h force group by time(5m)')
    plan = series[0].df._jdf.queryExecution().optimizedPlan().toString()
    # the ts_ms range filter must sit below the aggregate
    assert re.search(r"ts_ms#\d+L >= \d+", plan), plan


def test_store_backed_engine_self_describes(spark, sf_dir):
    """A store-backed engine (no measurements attached) must be able to
    derive its catalog and resolution set from the store itself —
    `python -m khronus_spark --summary-store` boots exactly this way.
    Regression: the CLI previously constructed the engine with neither
    measurements nor catalog and crashed on every query."""
    import tempfile

    from pyspark.sql import functions as F

    from khronus_spark.engine import KhronusEngine
    from khronus_spark.functions.summary import (
        counter_summary,
        histogram_summary,
    )
    from khronus_spark.operators.rollup import (
        catalog_from_store,
        windows_from_store,
        write_summaries,
    )
    from khronus_spark.sources.tables import measurements_from_events

    m = measurements_from_events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="khronus_storecat_")
    write_summaries(
        {
            300_000: {
                "counter": counter_summary(
                    m.where(F.col("mtype") == "counter"), 300_000
                ),
                "histogram": histogram_summary(
                    m.where(F.col("mtype") != "counter"), 300_000
                ),
            }
        },
        tmp,
    )
    cat = catalog_from_store(spark, tmp)
    assert ("click", "counter") in cat and ("purchase", "timer") in cat
    win = windows_from_store(spark, tmp)
    assert win == (300_000,)

    eng = KhronusEngine(
        spark,
        summary_base_path=tmp,
        catalog=cat,
        windows_ms=win,
        now_ms=1706659200000,
    )
    r = eng.sql('select count from "click" where time > now()-6h group by time(5m)')
    assert r[0].df.count() > 0

    # a leftover '<res>._compacting' sibling from an interrupted
    # compact_summaries must neither abort boot-time introspection
    # (parse ValueError) nor be mistaken for the store's first
    # resolution by catalog_from_store's sorted(...)[0]
    import pathlib

    # '1m._compacting' sorts BEFORE the real '5m' dir, so it would win
    # the sorted(...)[0] pick if not filtered
    stale = pathlib.Path(tmp) / "counter_summary" / "1m._compacting"
    stale.mkdir()
    (stale / "junk.txt").write_text("not parquet")
    assert windows_from_store(spark, tmp) == (300_000,)
    assert catalog_from_store(spark, tmp) == cat
    r2 = eng.sql('select p99 from "purchase" where time > now()-6h group by time(5m)')
    assert r2[0].df.count() > 0
    names = {row["name"] for row in eng.list_series().collect()}
    assert names == {"click", "view", "signup", "purchase", "error"}


def test_summary_engine_without_catalog_fails_at_construction(spark, tmp_path):
    """r13 review: a summary-store engine without measurements has no
    frame to derive the catalog from, and every query used to die
    later with an opaque AttributeError; the constructor now names the
    missing piece."""
    import pytest

    from khronus_spark.engine import KhronusEngine

    with pytest.raises(ValueError, match="explicit catalog"):
        KhronusEngine(spark, summary_base_path=str(tmp_path / "s"))

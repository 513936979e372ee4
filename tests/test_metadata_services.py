"""Dashboard KV store (S11) + self-monitoring (S12) tests."""

from __future__ import annotations

import tempfile

from khronus_spark.engine import KhronusEngine
from khronus_spark.monitoring import Monitoring, is_system_metric
from khronus_spark.sources.dashboards import DashboardStore


def test_dashboard_crud(spark):
    store = DashboardStore(spark, tempfile.mkdtemp() + "/dash")
    store.store("prod-latency", '{"panels": 1}')
    store.store("prod-errors", '{"panels": 2}')
    store.store("dev-latency", '{"panels": 3}')

    assert [r["name"] for r in store.lookup("PROD-.*")] == [
        "prod-errors",
        "prod-latency",
    ]
    # upsert overwrites
    store.store("prod-errors", '{"panels": 9}')
    got = store.lookup("prod-errors")
    assert len(got) == 1 and got[0]["content"] == '{"panels": 9}'

    assert store.drop("prod-.*") == 2
    assert [r["name"] for r in store.lookup(".*")] == ["dev-latency"]


def test_monitoring_roundtrip(spark):
    mon = Monitoring()
    with mon.timed("query.execute"):
        pass
    mon.increment("ingest.batches", 3, ts_ms=1_000)
    mon.record_gauge("catalog.size", 42, ts_ms=2_000)
    mon.record_gauge("bogus.negative", -1)  # skipped like reference ingest

    df = mon.flush(spark)
    rows = {r["metric"]: r for r in df.collect()}
    assert set(rows) == {
        "~system.query.execute",
        "~system.ingest.batches",
        "~system.catalog.size",
    }
    assert all(is_system_metric(m) for m in rows)
    assert rows["~system.ingest.batches"]["mtype"] == "counter"

    # flushed metrics are queryable through the engine itself
    eng = KhronusEngine(spark, measurements=mon.flush(spark).unionByName(df), now_ms=10_000)
    res = eng.sql('select count from "~system.ingest.batches" where time >= 0 force group by time(30s)')
    vals = [r["value"] for r in res[0].df.collect()]
    assert vals == [3.0]


def test_monitoring_drains_on_flush(spark):
    mon = Monitoring()
    mon.increment("x", 1, ts_ms=0)
    assert mon.flush(spark).count() == 1
    assert mon.flush(spark).count() == 0


def test_dashboard_store_crash_safety_and_no_silent_empty(spark, tmp_path):
    """r13 review pair: (a) a crash mid-rewrite used to leave the live
    dir half-deleted and the NEXT store() persisted the total loss —
    writes now publish as a generation + CURRENT swap, so a planted
    unpublished half-write is invisible; (b) a transient read failure
    used to be swallowed as an empty table, turning the next
    read-modify-overwrite into silent total loss — a corrupt committed
    generation now RAISES instead of answering empty."""
    import os

    import pytest

    from khronus_spark.sources.dashboards import DashboardStore

    path = str(tmp_path / "dash")
    store = DashboardStore(spark, path)
    store.store("a", '{"name": "a"}')
    store.store("b", '{"name": "b"}')
    assert [r["name"] for r in store.lookup(".*")] == ["a", "b"]

    # (a) crash debris: a half-written generation that never published
    os.makedirs(f"{path}/gen-halfwrite/_temporary", exist_ok=True)
    assert [r["name"] for r in store.lookup(".*")] == ["a", "b"]
    store.store("c", '{"name": "c"}')
    assert [r["name"] for r in store.lookup(".*")] == ["a", "b", "c"]

    # (b) a corrupt COMMITTED generation must raise, not read empty —
    # if this were swallowed, the next store() would persist the loss
    cur = open(f"{path}/CURRENT").read().strip()
    for f in os.listdir(f"{path}/{cur}"):
        if f.endswith(".parquet"):
            with open(f"{path}/{cur}/{f}", "wb") as fh:
                fh.write(b"not parquet at all")
    with pytest.raises(Exception):
        store.lookup(".*")

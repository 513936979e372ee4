"""Incremental tick/watermark semantics — behaviors from
`TickTest.scala:18-68` and `TimeWindowChainTest.scala:57-95`."""

from __future__ import annotations

from khronus_spark.functions.summary import counter_summary
from khronus_spark.operators.incremental import (
    Tick,
    current_tick,
    process_tick,
    windows_due,
)

S30, M1, M5, H1 = 30_000, 60_000, 300_000, 3_600_000
SCHEMA = "metric STRING, mtype STRING, ts_ms LONG, value LONG"


def test_current_tick_lags_one_bucket():
    # executing at t=100_000 (inside bucket 3 of 30s): the due bucket is
    # bucket 2 = [60_000, 90_000) — one tick_delay behind (Tick.scala:14-19)
    t = current_tick(100_000)
    assert t == Tick(2, S30)
    assert t.start_ms == 60_000 and t.end_ms == 90_000
    # exactly on a boundary: t=90_000 is bucket 3 → due bucket 2
    assert current_tick(90_000).bucket_number == 2


def test_windows_due_cadence():
    tick = current_tick(3_630_000)  # tick end = 3_600_000 + 30_000... compute
    # a watermark 30s ago: only the smallest window crossed a boundary
    due = windows_due(tick.end_ms - 30_000, tick)
    assert S30 in due
    # a watermark long ago: everything is due
    assert set(windows_due(0, tick)) == {S30, M1, M5, 600_000, 1_800_000, H1}
    # watermark == tick end: nothing due
    assert windows_due(tick.end_ms, tick) == []


def test_process_tick_incremental_and_idempotent(spark):
    rows = [
        ("c", "counter", 10_000, 1),
        ("c", "counter", 40_000, 2),
        ("c", "counter", 70_000, 4),   # in the due tick bucket [60k, 90k)
        ("c", "counter", 95_000, 8),   # beyond the tick — not yet due
    ]
    m = spark.createDataFrame(rows, SCHEMA)
    catalog = {"c": ("counter", 60_000)}  # already processed through 60s

    out, updated = process_tick(m, catalog, now_ms=100_000)
    # 30s window due: slice [60_000, 90_000) → only the 70_000 sample
    got = {r["ts"]: r["count"] for r in out[S30]["counter"].collect()}
    assert got == {60_000: 4}
    assert updated["c"] == ("counter", 90_000)

    # replay the same tick (failure retry): identical output (idempotent)
    out2, _ = process_tick(m, catalog, now_ms=100_000)
    got2 = {r["ts"]: r["count"] for r in out2[S30]["counter"].collect()}
    assert got2 == got


def test_process_tick_catches_up_after_gap(spark):
    rows = [("c", "counter", t, 1) for t in range(0, 240_000, 10_000)]
    m = spark.createDataFrame(rows, SCHEMA)
    # watermark far behind: one batched aggregation rebuilds every due
    # bucket for the metric (late windows catch up, TimeWindow.scala:44-65)
    out, updated = process_tick(m, {"c": ("counter", 0)}, now_ms=240_000)
    buckets = sorted(r["ts"] for r in out[S30]["counter"].collect())
    # the due tick is the just-closed bucket [210k, 240k): slice [0, 240k)
    assert buckets == list(range(0, 240_000, 30_000))
    # coarser windows also due from the long gap
    assert M1 in out
    assert updated["c"][1] == 240_000


def test_full_recompute_equals_incremental(spark):
    rows = [("c", "counter", t, t // 1000) for t in range(0, 300_000, 7_000)]
    m = spark.createDataFrame(rows, SCHEMA)
    out, _ = process_tick(m, {"c": ("counter", 0)}, now_ms=300_000)
    inc = {r["ts"]: r["count"] for r in out[S30]["counter"].collect()}
    tick_end = 300_000  # due tick = just-closed bucket [270k, 300k)
    full = {
        r["ts"]: r["count"]
        for r in counter_summary(m.where(f"ts_ms < {tick_end}"), S30).collect()
    }
    assert inc == full


def test_bucket_limit_caps_catchup_and_defers_watermark(spark):
    """Post-downtime catch-up bounded per tick (the reference's
    bucket-limit bind, BucketStore.scala:77): with a 2-bucket cap on a
    30s window, a 5-bucket backlog processes 2 buckets and holds the
    watermark at the capped end so the rest is deferred, not dropped."""
    from khronus_spark.operators.incremental import process_tick

    rows = [("m", "counter", t * 1000, 1) for t in range(0, 150)]  # 150s of data
    m = spark.createDataFrame(
        rows, "metric STRING, mtype STRING, ts_ms LONG, value LONG"
    )
    catalog = {"m": ("counter", 0)}  # last processed: epoch 0 → 150s backlog
    out, updated = process_tick(
        m, catalog, now_ms=180_000, windows_ms=(30_000,), bucket_limit=2
    )
    buckets = sorted(r["ts"] for r in out[30_000]["counter"].collect())
    assert buckets == [0, 30_000]  # first 2 buckets only
    assert updated["m"] == ("counter", 60_000)  # watermark held at capped end

    # the NEXT tick picks up exactly where the cap stopped
    out2, updated2 = process_tick(
        m, updated, now_ms=180_000, windows_ms=(30_000,), bucket_limit=2
    )
    buckets2 = sorted(r["ts"] for r in out2[30_000]["counter"].collect())
    assert buckets2 == [60_000, 90_000]
    assert updated2["m"] == ("counter", 120_000)


def test_bucket_limit_holds_only_the_lagging_metric(spark):
    """A capped catch-up must not drag back the watermark of a metric
    that is already caught up: only metrics due in the capped window
    hold; the rest advance to the tick end."""
    from khronus_spark.operators.incremental import process_tick

    rows = [(m, "counter", t * 1000, 1) for m in ("lag", "ok") for t in range(0, 150)]
    meas = spark.createDataFrame(
        rows, "metric STRING, mtype STRING, ts_ms LONG, value LONG"
    )
    # 'ok' is current (watermark at 150s → nothing due in a 30s window
    # beyond the tick); 'lag' has a 150s backlog
    catalog = {"lag": ("counter", 0), "ok": ("counter", 150_000)}
    out, updated = process_tick(
        meas, catalog, now_ms=180_000, windows_ms=(30_000,), bucket_limit=2
    )
    assert updated["lag"] == ("counter", 60_000)  # held at the capped end
    assert updated["ok"] == ("counter", 150_000)  # advanced, not dragged back

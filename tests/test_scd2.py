"""SCD2 point-in-time conformance join: interval coverage and share
accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def test_every_event_joins_exactly_one_interval(spark, sf_dir):
    """The dominant-type intervals tile each user's active weeks with
    no overlap, so the PIT join must account for every event exactly
    once: the conformance matrix total equals the event count."""
    out = QUERIES["events_scd2_conformance"](spark, sf_dir)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events


def test_shares_tile_per_dominant_type(spark, sf_dir):
    """Basis-point shares within each dominant type sum to ~10000
    (floor-division slack < #event types)."""
    out = QUERIES["events_scd2_conformance"](spark, sf_dir).collect()
    per_dom = {}
    for r in out:
        per_dom.setdefault(r["dominant_type"], []).append(r["share_bp"])
    for dom, shares in per_dom.items():
        assert 10000 - len(shares) < sum(shares) <= 10000, (dom, shares)


def test_diagonal_is_modal_share(spark, sf_dir):
    """An interval's dominant type is by construction the most frequent
    type of each week inside it — aggregated over a user's whole run
    plus gap weeks that's no longer a theorem, but on the gate data the
    diagonal must still carry the plurality of each dominant row
    (a collapsed dimension that does NOT is evidence of a bug)."""
    out = QUERIES["events_scd2_conformance"](spark, sf_dir).collect()
    per_dom = {}
    for r in out:
        per_dom.setdefault(r["dominant_type"], {})[r["event_type"]] = r["n_events"]
    majority_holds = sum(
        1
        for dom, m in per_dom.items()
        if m.get(dom, 0) == max(m.values())
    )
    assert majority_holds >= len(per_dom) - 1, per_dom


def test_backfill_partial_recompute_equals_full_rebuild(spark, sf_dir):
    """scd2_apply_backfill must converge to the full rebuild exactly:
    rebuilding only the touched users' chains from the merged history
    yields the same interval set as scd2_intervals over everything."""
    from khronus_spark.operators import scd2 as scd2_ops
    from khronus_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    initial = ev.where(F.col("event_id") % 10 != 0)
    backfill = ev.where(F.col("event_id") % 10 == 0)
    base = scd2_ops.scd2_intervals(initial)
    corrected = scd2_ops.scd2_apply_backfill(base, ev, backfill)
    full = scd2_ops.scd2_intervals(ev)
    cols = sorted(corrected.columns)
    a = sorted(map(tuple, corrected.select(*cols).collect()))
    b = sorted(map(tuple, full.select(*cols).collect()))
    assert a and a == b


def test_backfill_replay_is_idempotent(spark, sf_dir):
    """Re-applying the SAME backfill to an already-corrected dimension
    must change nothing — the effectively-once contract applied to
    dimension maintenance (a duplicated late batch re-derives the same
    chains it already derived)."""
    from khronus_spark.operators import scd2 as scd2_ops
    from khronus_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    initial = ev.where(F.col("event_id") % 10 != 0)
    backfill = ev.where(F.col("event_id") % 10 == 0)
    base = scd2_ops.scd2_intervals(initial)
    once = scd2_ops.scd2_apply_backfill(base, ev, backfill)
    twice = scd2_ops.scd2_apply_backfill(once, ev, backfill)
    cols = sorted(once.columns)
    a = sorted(map(tuple, once.select(*cols).collect()))
    b = sorted(map(tuple, twice.select(*cols).collect()))
    assert a == b


def test_backfill_touches_only_backfilled_users(spark, sf_dir):
    """Untouched users' interval rows must pass through the correction
    BYTE-IDENTICAL (they are anti-joined, not recomputed) — the
    scale property: recompute is bounded by the backfill footprint."""
    from khronus_spark.operators import scd2 as scd2_ops
    from khronus_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    initial = ev.where(F.col("event_id") % 10 != 0)
    backfill = ev.where(F.col("event_id") % 10 == 0)
    touched = {r[0] for r in backfill.select("user_id").distinct().collect()}
    base = scd2_ops.scd2_intervals(initial)
    corrected = scd2_ops.scd2_apply_backfill(base, ev, backfill)
    base_rows = {
        tuple(r) for r in base.collect() if r["user_id"] not in touched
    }
    corr_rows = {
        tuple(r) for r in corrected.collect() if r["user_id"] not in touched
    }
    assert base_rows == corr_rows


def test_backfill_sequential_batches_converge(spark, sf_dir):
    """Stream-of-backfills == batch: applying two late batches one
    after the other (each correcting the prior state) converges to the
    full rebuild — the micro-batch maintenance shape a continuously
    loaded dimension runs."""
    from khronus_spark.operators import scd2 as scd2_ops
    from khronus_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    initial = ev.where(F.col("event_id") % 10 > 1)
    b1 = ev.where(F.col("event_id") % 10 == 0)
    b2 = ev.where(F.col("event_id") % 10 == 1)
    state0 = scd2_ops.scd2_intervals(initial)
    seen1 = initial.unionByName(b1)
    state1 = scd2_ops.scd2_apply_backfill(state0, seen1, b1)
    state2 = scd2_ops.scd2_apply_backfill(state1, seen1.unionByName(b2), b2)
    full = scd2_ops.scd2_intervals(ev)
    cols = sorted(full.columns)
    a = sorted(map(tuple, state2.select(*cols).collect()))
    b = sorted(map(tuple, full.select(*cols).collect()))
    assert a and a == b

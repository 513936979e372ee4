"""asof_join / bucketed_range_join edge semantics."""

from __future__ import annotations

from khronus_spark.operators.asof import asof_join, bucketed_range_join


def test_asof_join_edges(spark):
    left = spark.createDataFrame(
        [
            (1, 100, "l_before_any"),
            (1, 200, "l_tie"),
            (1, 250, "l_between"),
            (1, 400, "l_after_last"),
            (2, 500, "l_other_key"),
        ],
        "k long, ts_ms long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 200, 20), (1, 300, 30), (2, 999, 99)],
        "k long, ts_ms long, payload long",
    )
    got = {
        r["tag"]: (r["r_payload"], r["r_ts_ms"])
        for r in asof_join(left, right, by="k").collect()
    }
    # row before the first right row is dropped (inner)
    assert "l_before_any" not in got
    # equal timestamps match (<=)
    assert got["l_tie"] == (20, 200)
    # strictly the latest right row at-or-before
    assert got["l_between"] == (20, 200)
    assert got["l_after_last"] == (30, 300)
    # keys never cross
    assert "l_other_key" not in got


def test_asof_join_null_payload_no_chimera(spark):
    # A right row whose payload holds a NULL must be carried AS-IS — the
    # NULL field must not be backfilled from an older right row.
    left = spark.createDataFrame(
        [(1, 350, "l")], "k long, ts_ms long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 100, 10, "old"), (1, 300, None, "new")],
        "k long, ts_ms long, a long, b string",
    )
    [row] = asof_join(left, right, by="k").collect()
    assert row["r_ts_ms"] == 300
    assert row["r_b"] == "new"
    assert row["r_a"] is None  # not 10 from the older row


def test_bucketed_range_join_edges(spark):
    points = spark.createDataFrame(
        [
            (1, 999, "before"),
            (1, 1000, "at_start"),
            (1, 7200, "mid_span"),     # interval spans multiple buckets
            (1, 9000, "at_end"),
            (1, 9001, "after"),
            (2, 5000, "other_key"),
        ],
        "k long, ts_ms long, tag string",
    )
    intervals = spark.createDataFrame(
        [(1, 1000, 9000, "iv1")], "k long, start_ms long, end_ms long, name string"
    )
    got = bucketed_range_join(
        points, intervals, by="k", bucket_ms=1000
    ).select("tag", "name").collect()
    tags = sorted(r["tag"] for r in got)
    # inclusive on both ends; no duplicates despite the 9-bucket span
    assert tags == ["at_end", "at_start", "mid_span"]
    # the join must stay a hash join, never a nested loop
    plan = bucketed_range_join(points, intervals, by="k", bucket_ms=1000)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_join_equal_ts_right_rows_deterministic(spark):
    # two right rows at the same timestamp: the match must be stable
    # across runs/partitionings (struct-ordered tiebreaker), and all
    # payload fields must come from that single row
    left = spark.createDataFrame([(1, 300, "l")], "k long, ts_ms long, tag string")
    right = spark.createDataFrame(
        [(1, 200, 7, "x"), (1, 200, 7, "a"), (1, 200, 3, "z")],
        "k long, ts_ms long, a long, b string",
    )
    results = set()
    for n in (1, 4):
        [row] = asof_join(left, right.repartition(n), by="k").collect()
        results.add((row["r_a"], row["r_b"], row["r_ts_ms"]))
    # struct order: ts, then a, then b → (7, 'x') is the largest struct
    assert results == {(7, "x", 200)}

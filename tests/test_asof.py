"""asof_join edge semantics: <= tie matching, inner filtering, carry
of the matched right timestamp."""

from __future__ import annotations

from khronus_spark.operators.asof import asof_join


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

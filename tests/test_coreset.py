"""Greedy k-center coreset selection: hand-checkable geometry, DuckDB
oracle equality, degenerate corpora, and the coverage-audit
composition."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from khronus_spark.operators.coreset import (
    coreset_assign,
    kcenter_select,
    kcenter_select_sql,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs], "vec_id long, embedding array<float>"
    )


def test_kcenter_hand_checkable_selection(spark):
    """v0=(0,0) seeds; v1=(1,1)/v2=(-1,-1)/v4=(1,-1) are the spread
    corners (all 2e12 from the nearest chosen at their turn, ids break
    ties); v3=(.1,.1) hugs the seed and is never picked."""
    vecs = [
        (0, [0.0, 0.0]),
        (1, [1.0, 1.0]),
        (2, [-1.0, -1.0]),
        (3, [0.1, 0.1]),
        (4, [1.0, -1.0]),
    ]
    got = _rows(kcenter_select(_mk(spark, vecs), m=4))
    assert got == [
        (0, 0, 0),
        (1, 1, 2_000_000_000_000),
        (2, 2, 2_000_000_000_000),
        (3, 4, 2_000_000_000_000),
    ]
    # the radius curve is non-increasing past rank 0
    radii = [d for _, _, d in got[1:]]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_matches_duckdb_oracle_on_real_embeddings(spark, sf_dir):
    from khronus_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").where("vec_id < 150")
    got = _rows(kcenter_select(emb, m=6))
    con = duckdb.connect()
    con.register("embeddings", emb.toPandas())
    want = sorted(map(tuple, con.execute(kcenter_select_sql(m=6)).fetchall()))
    assert got == want and len(got) == 6


def test_kcenter_degenerate_corpora(spark):
    # duplicates exhaust: 3 distinct points, m=5 -> selection stops at 3
    vecs = [(0, [0.0]), (1, [0.0]), (2, [1.0]), (3, [1.0]), (4, [-1.0])]
    got = _rows(kcenter_select(_mk(spark, vecs), m=5))
    # +1 and -1 are equidistant from the seed -> id tie-break picks 2,
    # then -1 is the lone remaining spread point; duplicates exhaust
    assert [v for _, v, _ in got] == [0, 2, 4]
    with pytest.raises(ValueError, match="m >= 1"):
        kcenter_select(_mk(spark, vecs), m=0)
    with pytest.raises(ValueError, match="empty corpus"):
        kcenter_select(
            spark.createDataFrame([], "vec_id long, embedding array<float>"),
            m=2,
        )
    with pytest.raises(ValueError, match="m >= 1"):
        kcenter_select_sql(m=0)


def test_coreset_assign_covers_every_vector_within_radius(spark, sf_dir):
    """Every vector maps to exactly one center; the realized max
    distance of the full assignment never exceeds the NEXT center's
    selection distance (the Gonzalez invariant: d2 at rank r is the
    covering radius of the first r centers, so the final cover's
    radius is <= the last selection distance)."""
    from khronus_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").where("vec_id < 150")
    sel = kcenter_select(emb, m=6)
    assign = coreset_assign(emb, sel)
    n = emb.count()
    assert assign.count() == n
    assert assign.select("vec_id").distinct().count() == n
    centers = {r.vec_id for r in sel.collect()}
    assert {
        r.center_vec_id for r in assign.select("center_vec_id").distinct().collect()
    } <= centers
    # centers map to themselves at distance 0
    self_rows = assign.where(F.col("vec_id").isin(list(centers))).collect()
    assert all(r.center_vec_id == r.vec_id and r.d2 == 0 for r in self_rows)
    # Gonzalez invariant: had selection continued, the next pick would
    # be the assignment's max d2 — so max d2 <= last selection d2 is
    # exactly the "radius curve non-increasing" property realized
    last_sel_d2 = max(r.d2 for r in sel.collect())
    max_cover = assign.agg(F.max("d2")).first()[0]
    assert max_cover <= last_sel_d2

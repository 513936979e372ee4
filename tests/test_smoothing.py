"""Hand-fixture pins for the integer smoothing recurrences — the
values a reader can check with pencil and paper, independent of the
DuckDB oracle (which re-derives the same recurrence as a recursive
CTE and is hash-compared at sf0.01 by test_oracle_parity)."""

from __future__ import annotations

from khronus_spark.operators.smoothing import _tdiv, holt_winters_int


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, t long, x long")


def test_tdiv_truncates_toward_zero():
    assert _tdiv(-7, 10) == 0
    assert _tdiv(-17, 10) == -1
    assert _tdiv(17, 10) == 1


def test_holt_winters_hand_fixture(spark):
    """season_len=2, alpha=beta=gamma=1/2 over x = 10, 20, 18, 30:

    t=1 (warm-up):      level=10 trend=0 seasonal=0 forecast=10
    t=2 (init):         level = (10+20) tdiv 2 = 15, trend = 0,
                        hist = [10-15, 20-15] = [-5, 5],
                        seasonal = 5, forecast = 15+0+(-5) = 10
    t=3: s_old=-5; l = (1*(18-(-5)) + 1*(15+0)) tdiv 2 = 19
         b = (1*(19-15) + 1*0) tdiv 2 = 2
         s = (1*(18-19) + 1*(-5)) tdiv 2 = -3,  hist = [5, -3]
         forecast = 19+2+5 = 26
    t=4: s_old=5; l = (1*(30-5) + 1*(19+2)) tdiv 2 = 23
         b = (1*(23-19) + 1*2) tdiv 2 = 3
         s = (1*(30-23) + 1*5) tdiv 2 = 6,  hist = [-3, 6]
         forecast = 23+3+(-3) = 23
    """
    df = _df(spark, [("a", 1, 10), ("a", 2, 20), ("a", 3, 18), ("a", 4, 30)])
    got = {
        r.t: (r.level, r.trend, r.seasonal, r.forecast_next)
        for r in holt_winters_int(
            df, ["g"], "t", "x", season_len=2,
            alpha_num=1, alpha_den=2, beta_num=1, beta_den=2,
            gamma_num=1, gamma_den=2,
        ).collect()
    }
    assert got == {
        1: (10, 0, 0, 10),
        2: (15, 0, 5, 10),
        3: (19, 2, -3, 26),
        4: (23, 3, 6, 23),
    }


def test_holt_winters_short_series_all_warmup(spark):
    df = _df(spark, [("a", 1, 7), ("a", 2, 9)])
    rows = holt_winters_int(
        df, ["g"], "t", "x", season_len=5
    ).collect()
    assert {(r.t, r.level, r.trend, r.seasonal, r.forecast_next)
            for r in rows} == {(1, 7, 0, 0, 7), (2, 9, 0, 0, 9)}


def test_holt_winters_validation():
    import pytest

    with pytest.raises(ValueError):
        holt_winters_int(None, ["g"], "t", "x", season_len=0)
    with pytest.raises(ValueError):
        holt_winters_int(None, ["g"], "t", "x", season_len=2, gamma_num=0)


def test_holt_winters_duckdb_recursion_matches_python_fold_property():
    """Property test of the ORACLE's recursive-CTE-with-LIST-rotation
    against an independent pure-Python fold on random series — the
    risky piece of the entry is the recursion, and sf0.01 parity only
    exercises one series shape (720 hourly buckets). Random lengths
    cross the warm-up boundary in every way (empty tail, exactly one
    season, just past it)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    M = 4  # season length (small: more boundary crossings)
    L = "((3 * (s.x - r.hist[1]) + 7 * (r.level + r.trend)) // 10)"
    B = f"((1 * ({L} - r.level) + 9 * r.trend) // 10)"
    S = f"((2 * (s.x - {L}) + 8 * r.hist[1]) // 10)"
    sql = f"""
WITH RECURSIVE series AS (
  SELECT g, rn, x FROM src
),
init AS (
  SELECT g, list(x ORDER BY rn) AS xs
  FROM series WHERE rn <= {M} GROUP BY g HAVING count(*) = {M}
),
anchor AS (SELECT g, CAST(list_sum(xs) // {M} AS BIGINT) AS lm, xs FROM init),
r AS (
  SELECT s.g, s.rn, s.x, a.lm AS level, CAST(0 AS BIGINT) AS trend,
         CAST(s.x - a.lm AS BIGINT) AS seasonal,
         list_transform(a.xs, v -> CAST(v - a.lm AS BIGINT)) AS hist
  FROM series s JOIN anchor a USING (g) WHERE s.rn = {M}
  UNION ALL
  SELECT s.g, s.rn, s.x,
         CAST({L} AS BIGINT), CAST({B} AS BIGINT), CAST({S} AS BIGINT),
         r.hist[2:] || [CAST({S} AS BIGINT)]
  FROM series s JOIN r ON s.g = r.g AND s.rn = r.rn + 1
),
o AS (
  SELECT g, rn, level, trend, seasonal,
         CAST(level + trend + hist[1] AS BIGINT) AS forecast_next
  FROM r
)
SELECT s.g, s.rn, s.x,
       COALESCE(o.level, s.x) AS level, COALESCE(o.trend, 0) AS trend,
       COALESCE(o.seasonal, 0) AS seasonal,
       COALESCE(o.forecast_next, s.x) AS forecast_next
FROM series s LEFT JOIN o ON s.g = o.g AND s.rn = o.rn
"""

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    def py_fold(xs, m=M):
        out = []
        lvl = trend = 0
        hist = []
        for i, x in enumerate(xs):
            t = i + 1
            if t < m or len(xs) < m:
                out.append((x, 0, 0, x))
                continue
            if t == m:
                lvl = tdiv(sum(xs[:m]), m)
                trend = 0
                hist = [v - lvl for v in xs[:m]]
                s_t = hist[-1]
            else:
                s_old = hist[0]
                prev = lvl
                lvl = tdiv(3 * (x - s_old) + 7 * (lvl + trend), 10)
                trend = tdiv(1 * (lvl - prev) + 9 * trend, 10)
                s_t = tdiv(2 * (x - lvl) + 8 * s_old, 10)
                hist = hist[1:] + [s_t]
            out.append((lvl, trend, s_t, lvl + trend + hist[0]))
        return out

    @settings(max_examples=80, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(-1000, 1000), min_size=1, max_size=12),
            min_size=1,
            max_size=3,
        )
    )
    def run(series_list):
        rows = [
            (gi, rn + 1, x)
            for gi, xs in enumerate(series_list)
            for rn, x in enumerate(xs)
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE src (g BIGINT, rn BIGINT, x BIGINT)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?)", rows)
        got = {
            (r[0], r[1]): tuple(r[3:])
            for r in con.execute(sql).fetchall()
        }
        con.close()
        want = {}
        for gi, xs in enumerate(series_list):
            for rn, vals in enumerate(py_fold(xs)):
                want[(gi, rn + 1)] = vals
        assert got == want

    run()

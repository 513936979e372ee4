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

"""Per-series integer-exact sequential analysis: EWMA smoothing, Holt
level+trend forecasting, and CUSUM changepoint detection.

An exponentially-weighted moving average is the one dashboard staple
the window-function family can't express: each output depends on the
*previous output*, not on a bounded frame of inputs. Rather than
approximate with a long weighted frame, we run the recurrence exactly,
per series, in one Arrow-batched ``applyInPandas`` pass:

    s_1 = x_1
    s_t = (alpha_num * x_t + (alpha_den - alpha_num) * s_{t-1})
          DIV alpha_den

All terms are BIGINT and the division is a floor DIV, so the result is
bit-identical across engines (the DuckDB oracle runs the same
recurrence as a recursive CTE) — no float accumulation order to drift.

Scale notes:
- grouping key = the series identity, so the shuffle is ONE hash
  exchange on series id — the same partitioning any per-series render
  already needs;
- state per group is the rendered series itself, which the time-grid
  contract (G1: resolution auto-adjusts to ≤ ~700 points; here ≤ the
  queried-range bucket count) bounds — this is the documented
  bounded-state pattern, not an unbounded collect;
- the recurrence is a numpy loop over an int64 array — O(n) per
  series, trivially Arrow-vectorized on the transfer side; a 100 TB
  deployment runs millions of series in parallel, each tiny.

No reference counterpart (khronus projections are per-bucket summary
reads); extension surface, InfluxQL's ``exponential_moving_average``
is the public analogue.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_int(
    df: DataFrame,
    series_cols: Sequence[str],
    order_col: str,
    value_col: str,
    alpha_num: int = 3,
    alpha_den: int = 10,
) -> DataFrame:
    """(series cols, order_col, value_col, ewma): the integer EWMA
    recurrence over each series ordered by ``order_col``. Gaps in the
    grid are skipped, not filled — the recurrence runs over observed
    buckets (compose with the fill operators first to change that).
    """
    if not 0 < alpha_num <= alpha_den:
        raise ValueError("alpha must satisfy 0 < num <= den")
    keep = alpha_den - alpha_num

    schema = ", ".join(
        [f"{c} string" for c in series_cols]
        + [f"{order_col} long", f"{value_col} long", "ewma long"]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        x = pdf[value_col].to_numpy()
        out = []
        s = 0
        for i, xi in enumerate(x):
            xi = int(xi)
            s = xi if i == 0 else (alpha_num * xi + keep * s) // alpha_den
            out.append(s)
        pdf["ewma"] = pd.Series(out, dtype="int64")
        return pdf[list(series_cols) + [order_col, value_col, "ewma"]]

    return (
        df.select(*series_cols, order_col, value_col)
        .groupBy(*series_cols)
        .applyInPandas(run, schema)
    )


def _tdiv(a: int, b: int) -> int:
    """Integer division truncated TOWARD ZERO — the cross-engine common
    semantics (DuckDB's ``//`` and ANSI/Spark ``div`` both truncate;
    Python's ``//`` floors, which differs on negative operands, and
    Holt's trend term goes negative on any decline)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def holt_int(
    df: DataFrame,
    series_cols: Sequence[str],
    order_col: str,
    value_col: str,
    alpha_num: int = 3,
    alpha_den: int = 10,
    beta_num: int = 2,
    beta_den: int = 10,
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend), integer-exact:

        l_1 = x_1,  b_1 = 0
        l_t = (alpha_num·x_t + (alpha_den−alpha_num)·(l_{t-1}+b_{t-1}))
              tdiv alpha_den
        b_t = (beta_num·(l_t − l_{t-1}) + (beta_den−beta_num)·b_{t-1})
              tdiv beta_den

    with ``tdiv`` the toward-zero division both engines share. Returns
    (series cols, order_col, value_col, level, trend, forecast_next)
    where forecast_next = l_t + b_t is the one-step-ahead forecast —
    the dashboard "where is this metric heading" primitive EWMA's
    single state can't answer (EWMA lags every trend; Holt tracks it).

    Same plan shape and bounded-state argument as ``ewma_int``: one
    hash exchange on the series id, the recurrence folds per series in
    one Arrow batch.
    """
    for num, den in ((alpha_num, alpha_den), (beta_num, beta_den)):
        if not 0 < num <= den:
            raise ValueError("smoothing factors must satisfy 0 < num <= den")
    a_keep = alpha_den - alpha_num
    b_keep = beta_den - beta_num

    schema = ", ".join(
        [f"{c} string" for c in series_cols]
        + [
            f"{order_col} long",
            f"{value_col} long",
            "level long",
            "trend long",
            "forecast_next long",
        ]
    )
    cols = list(series_cols)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        x = pdf[value_col].to_numpy()
        levels, trends, fcs = [], [], []
        lvl = trend = 0
        for i, xi in enumerate(x):
            xi = int(xi)
            if i == 0:
                lvl, trend = xi, 0
            else:
                prev = lvl
                lvl = _tdiv(alpha_num * xi + a_keep * (lvl + trend), alpha_den)
                trend = _tdiv(beta_num * (lvl - prev) + b_keep * trend, beta_den)
            levels.append(lvl)
            trends.append(trend)
            fcs.append(lvl + trend)
        pdf["level"] = pd.Series(levels, dtype="int64")
        pdf["trend"] = pd.Series(trends, dtype="int64")
        pdf["forecast_next"] = pd.Series(fcs, dtype="int64")
        return pdf[
            cols + [order_col, value_col, "level", "trend", "forecast_next"]
        ]

    return (
        df.select(*cols, order_col, value_col)
        .groupBy(*cols)
        .applyInPandas(run, schema)
    )


def cusum_changepoints(
    df: DataFrame,
    series_cols: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Most-likely level-shift point per series: the argmax of the
    |scaled CUSUM| statistic  c_i = n·(Σ_{j≤i} x_j) − i·(Σ x_j)
    (the mean-centered cumulative sum with the division cleared, so
    every term stays BIGINT-exact — no float mean to drift across
    engines). Returns (series cols, change_<order_col>, cusum); ties
    break to the earliest point.

    Plan shape: one hash shuffle on the series id; the cumulative /
    total / rank windows all ride that same partitioning, and the
    rank-1 filter compiles to WindowGroupLimit (top-1 per series
    short-circuits the sort). State per series = the rendered series,
    bounded by the bucket grid like every per-series render.
    """
    from pyspark.sql import Window

    keys = [F.col(c) for c in series_cols]
    w_ord = Window.partitionBy(*keys).orderBy(order_col)
    w_all = Window.partitionBy(*keys)
    cusum = (
        F.lit(0)
        + F.count(F.lit(1)).over(w_all) * F.sum(value_col).over(w_ord)
        - F.row_number().over(w_ord) * F.sum(value_col).over(w_all)
    ).cast("long")
    ranked = df.select(
        *series_cols,
        F.col(order_col),
        cusum.alias("cusum"),
    ).withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(*keys).orderBy(
                F.abs(F.col("cusum")).desc(), F.col(order_col)
            )
        ),
    )
    return ranked.where(F.col("_rk") == 1).select(
        *series_cols,
        F.col(order_col).alias(f"change_{order_col}"),
        "cusum",
    )


def holt_winters_int(
    df: DataFrame,
    series_cols: Sequence[str],
    order_col: str,
    value_col: str,
    season_len: int,
    alpha_num: int = 3,
    alpha_den: int = 10,
    beta_num: int = 1,
    beta_den: int = 10,
    gamma_num: int = 2,
    gamma_den: int = 10,
) -> DataFrame:
    """Holt-Winters ADDITIVE triple-exponential smoothing (level +
    trend + seasonal), integer-exact — the seasonal completion of the
    ewma_int/holt_int family: a 9am-peaked metric forecast by Holt
    alone lags every diurnal swing; the seasonal state absorbs it.

    Warm-up convention (deterministic, cross-engine exact): the first
    `season_len` observations of each series initialize the state —
    rows t < m emit (level=x_t, trend=0, seasonal=0, forecast=x_t);
    at t = m the level becomes tdiv(Σ first m, m), trend 0, and the
    seasonal history s_i = x_i − level for i ≤ m. From t > m, with
    s_old = s_{t−m} (the season-ago seasonal):

        l_t = tdiv(αn·(x_t − s_old) + (αd−αn)·(l_{t−1}+b_{t−1}), αd)
        b_t = tdiv(βn·(l_t − l_{t−1}) + (βd−βn)·b_{t−1}, βd)
        s_t = tdiv(γn·(x_t − l_t) + (γd−γn)·s_old, γd)

    forecast_next = l_t + b_t + s_{t+1−m} (the seasonal the NEXT
    bucket will see). Series shorter than a full season stay entirely
    in warm-up. All divisions are toward-zero (`_tdiv`), the semantics
    DuckDB's // and ANSI div share, so the recursive-CTE oracle agrees
    bit-for-bit. Same plan shape as the siblings: one hash exchange on
    the series id, O(season_len) state per series in one Arrow fold.
    """
    if season_len < 1:
        raise ValueError("season_len must be >= 1")
    for num, den in (
        (alpha_num, alpha_den),
        (beta_num, beta_den),
        (gamma_num, gamma_den),
    ):
        if not 0 < num <= den:
            raise ValueError("smoothing factors must satisfy 0 < num <= den")
    a_keep = alpha_den - alpha_num
    b_keep = beta_den - beta_num
    g_keep = gamma_den - gamma_num
    m = season_len

    schema = ", ".join(
        [f"{c} string" for c in series_cols]
        + [
            f"{order_col} long",
            f"{value_col} long",
            "level long",
            "trend long",
            "seasonal long",
            "forecast_next long",
        ]
    )
    cols = list(series_cols)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        x = [int(v) for v in pdf[value_col].to_numpy()]
        levels, trends, seas, fcs = [], [], [], []
        lvl = trend = 0
        hist: list[int] = []  # [s_{t-m+1} .. s_t] once warmed
        for i, xi in enumerate(x):
            t = i + 1
            if t < m or len(x) < m:
                levels.append(xi)
                trends.append(0)
                seas.append(0)
                fcs.append(xi)
                continue
            if t == m:
                lvl = _tdiv(sum(x[:m]), m)
                trend = 0
                hist = [v - lvl for v in x[:m]]
                s_t = hist[-1]
            else:
                s_old = hist[0]
                prev = lvl
                lvl = _tdiv(
                    alpha_num * (xi - s_old) + a_keep * (lvl + trend),
                    alpha_den,
                )
                trend = _tdiv(
                    beta_num * (lvl - prev) + b_keep * trend, beta_den
                )
                s_t = _tdiv(
                    gamma_num * (xi - lvl) + g_keep * s_old, gamma_den
                )
                hist = hist[1:] + [s_t]
            levels.append(lvl)
            trends.append(trend)
            seas.append(s_t)
            fcs.append(lvl + trend + hist[0])
        pdf["level"] = pd.Series(levels, dtype="int64")
        pdf["trend"] = pd.Series(trends, dtype="int64")
        pdf["seasonal"] = pd.Series(seas, dtype="int64")
        pdf["forecast_next"] = pd.Series(fcs, dtype="int64")
        return pdf[
            cols
            + [order_col, value_col, "level", "trend", "seasonal",
               "forecast_next"]
        ]

    return (
        df.select(*cols, order_col, value_col)
        .groupBy(*cols)
        .applyInPandas(run, schema)
    )

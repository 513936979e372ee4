"""KhronusEngine — the user-facing facade.

Wires parser → binder → planner → executor over either:
- an in-memory/batch `measurements` DataFrame (summaries computed on the
  fly per queried resolution — exact, Catalyst-optimized), or
- a materialized summary store written by the rollup engine
  (`operators/rollup.py`), which is the 100 TB path: queries then scan
  only the routed resolution's partitioned summary table.

Equivalent of the reference's query entry point
(`influx/service/InfluxService.scala:46-87` →
`influx/finder/InfluxQueryResolver.scala:38-65`), minus HTTP.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from khronus_spark.functions.summary import counter_summary, histogram_summary
from khronus_spark.operators.rollup import read_summaries
from khronus_spark.parser.ast import InfluxCriteria, Source
from khronus_spark.parser.parser import InfluxQueryParser
from khronus_spark.plans.criteria import build_criteria
from khronus_spark.plans.executor import InfluxSeriesResult, QueryExecutor
from khronus_spark.timegrid import (
    DEFAULT_WINDOWS_MS,
    MAX_RESOLUTION_POINTS,
    MIN_RESOLUTION_POINTS,
)


def _ms_to_naive_dt(ms: int):
    """Epoch-ms → TIMESTAMP_NTZ literal column (UTC wall clock).

    Built as an explicit NTZ SQL literal so the comparison against the
    raw NTZ source column needs no implicit cast — a plain
    attribute-vs-literal predicate Catalyst pushes into the parquet
    scan — and is independent of the session timezone (a naive Python
    datetime lit would become TIMESTAMP_LTZ and re-interpret)."""
    import datetime as _dt

    base = _dt.datetime(1970, 1, 1) + _dt.timedelta(milliseconds=ms)
    return F.expr(f"TIMESTAMP_NTZ '{base.strftime('%Y-%m-%d %H:%M:%S.%f')}'")


def _ms_to_utc_instant(ms: int):
    """Epoch-ms → TIMESTAMP (LTZ) literal column pinned with an explicit
    +00:00 offset, so the instant is session-timezone-independent."""
    import datetime as _dt

    base = _dt.datetime(1970, 1, 1) + _dt.timedelta(milliseconds=ms)
    return F.expr(
        f"TIMESTAMP '{base.strftime('%Y-%m-%d %H:%M:%S.%f')}+00:00'"
    )


class KhronusEngine:
    def __init__(
        self,
        spark: SparkSession,
        measurements: DataFrame | None = None,
        summary_base_path: str | None = None,
        catalog: list[tuple[str, str]] | None = None,
        windows_ms: tuple[int, ...] = DEFAULT_WINDOWS_MS,
        now_ms: int | None = None,
        min_points: int = MIN_RESOLUTION_POINTS,
        max_points: int = MAX_RESOLUTION_POINTS,
        approx_percentiles: bool = False,
        summary_read_limit: int | None = None,
        bucket_read_limit: int | None = None,
        exact_mode: str = "auto",
    ):
        if measurements is None and summary_base_path is None:
            raise ValueError("need measurements or summary_base_path")
        if measurements is None and catalog is None:
            # the catalog property derives from measurements; without
            # either, every query would die later with an opaque
            # AttributeError instead of failing here with the cause
            # (r13 review)
            raise ValueError(
                "a summary-store engine (summary_base_path without "
                "measurements) needs an explicit catalog= — the metric "
                "catalog cannot be derived from a summary store"
            )
        self.spark = spark
        self.measurements = measurements
        self.summary_base_path = summary_base_path
        self.windows_ms = windows_ms
        self._now_ms = now_ms
        self.approx = approx_percentiles
        # On-the-fly exact-percentile strategy (`_provide_summaries`):
        #   'array'  — collect+sort each bucket's samples; ONE shuffle, but
        #              per-bucket state grows with sample count.
        #   'counts' — pre-aggregate to per-value counts first; state
        #              bounded by DISTINCT values, at the cost of a second
        #              shuffle — the unbounded-safe form.
        #   'auto'   — array when the slice spans at most `max_points`
        #              buckets (an interactive dashboard read, ≤700 points
        #              by the reference's resolution clamp
        #              `reference.conf:62-63`), counts beyond that (a
        #              hand-forced wide slice, where dense buckets are the
        #              risk). Both produce bit-identical summaries
        #              (tests/test_rollup.py), so this is purely a
        #              physical-plan choice. The true 100 TB dashboard
        #              path remains the materialized store (O1,
        #              `util/Setting.scala:99-103`) — on-the-fly exists
        #              for exploratory reads over raw measurements.
        if exact_mode not in ("auto", "array", "counts"):
            raise ValueError(f"exact_mode must be auto|array|counts, got {exact_mode!r}")
        self.exact_mode = exact_mode
        self.max_points = max_points
        self._catalog = catalog
        # Opt-in per-slice read caps. The reference's influx query path
        # binds the QUERY limit (`InfluxQueryResolver.scala:138`,
        # default Int.MaxValue — `InfluxAst.scala:30`), so queries are
        # uncapped by default; the config caps (`reference.conf:30-33`)
        # guard the ROLLUP read path (see operators/incremental.py) and
        # other internal summary reads (`SummaryStore.scala:105-108`).
        # A deployment can set these to bound hand-forced slices. Each
        # cap belongs to one construction mode — reject the one that
        # would be silently ignored instead of letting a deployment
        # believe it is protected.
        if summary_base_path is not None:
            if bucket_read_limit is not None:
                raise ValueError(
                    "bucket_read_limit applies to measurements-backed engines "
                    "(raw bucket reads); this engine reads a summary store — "
                    "use summary_read_limit"
                )
            read_limit = summary_read_limit
        else:
            if summary_read_limit is not None:
                raise ValueError(
                    "summary_read_limit applies to summary-store engines; "
                    "this engine computes from measurements — use "
                    "bucket_read_limit"
                )
            read_limit = bucket_read_limit
        self.executor = QueryExecutor(
            spark,
            self._provide_summaries,
            windows_ms,
            min_points,
            max_points,
            read_limit=read_limit,
        )

    # -- catalog (the meta snapshot, `store/Snapshot.scala:25-42`) ---------

    @property
    def catalog(self) -> list[tuple[str, str]]:
        if self._catalog is None:
            rows = (
                self.measurements.select("metric", "mtype").distinct().collect()
            )
            self._catalog = sorted((r["metric"], r["mtype"]) for r in rows)
        return self._catalog

    def list_series(self, regex: str = ".*") -> DataFrame:
        """`list series` (S10, `InfluxQueryResolver.scala:38-49`)."""
        import re as _re

        pat = _re.compile(f".*{regex}.*", _re.IGNORECASE)
        names = [(0, name) for name, _ in self.catalog if pat.fullmatch(name)]
        return self.spark.createDataFrame(names or [], "time INT, name STRING")

    # -- summaries ----------------------------------------------------------

    def _provide_summaries(self, src: Source, window_ms: int, slc) -> DataFrame:
        family = "counter" if src.mtype == "counter" else "histogram"
        if self.summary_base_path is not None:
            # materialized path: (metric, ts) predicates push down to the
            # partitioned/sorted parquet store (the executor applies them)
            return read_summaries(self.spark, self.summary_base_path, family, window_ms)
        # on-the-fly path: push the bucket-aligned slice into the RAW scan
        # so only the queried buckets are aggregated (full buckets kept —
        # a bucket's summary always covers [ts, ts+w), like the reference's
        # precomputed summaries)
        from khronus_spark.timegrid import align_floor

        lo = align_floor(slc.from_ms, window_ms)
        hi = align_floor(slc.to_ms, window_ms) + window_ms - 1
        cond = (F.col("metric") == src.metric) & F.col("ts_ms").between(lo, hi)
        dtypes = dict(self.measurements.dtypes)
        if "ts_src" in dtypes:
            # equivalent predicate in the raw source domain: unlike the
            # derived ts_ms (a computed expression), this one pushes
            # into the parquet scan and prunes row groups by stats
            if dtypes["ts_src"] == "timestamp_ntz":
                cond = cond & (
                    F.col("ts_src") >= _ms_to_naive_dt(lo)
                ) & (F.col("ts_src") < _ms_to_naive_dt(hi + 1))
            elif dtypes["ts_src"].startswith("timestamp"):
                # LTZ source: pin the literal's offset so no implicit
                # session-timezone cast enters the comparison
                cond = cond & (
                    F.col("ts_src") >= _ms_to_utc_instant(lo)
                ) & (F.col("ts_src") < _ms_to_utc_instant(hi + 1))
            else:  # legacy epoch-ns long encoding
                cond = cond & F.col("ts_src").between(
                    lo * 1_000_000, (hi + 1) * 1_000_000 - 1
                )
        m = self.measurements.where(cond)
        if family == "counter":
            return counter_summary(m, window_ms)
        n_buckets = (hi + 1 - lo) // window_ms
        use_counts = self.exact_mode == "counts" or (
            self.exact_mode == "auto" and n_buckets > self.max_points
        )
        return histogram_summary(
            m, window_ms, approx=self.approx,
            exact_counts=use_counts and not self.approx,
        )

    # -- query --------------------------------------------------------------

    @property
    def now_ms(self) -> int:
        return self._now_ms if self._now_ms is not None else int(_time.time() * 1000)

    def parse(self, query: str, now_ms: int | None = None) -> InfluxCriteria:
        now = self.now_ms if now_ms is None else now_ms
        parsed = InfluxQueryParser(now_ms=now).parse(query)
        return build_criteria(parsed, self.catalog)

    def sql(self, query: str) -> list[InfluxSeriesResult]:
        """Execute one InfluxQL query → list of series (name, df(time, value))."""
        if query.strip().lower().startswith("list series"):
            rest = query.strip()[len("list series"):].strip().strip("/")
            return [
                InfluxSeriesResult(
                    "list_series_result", "", self.list_series(rest or ".*")
                )
            ]
        # ONE wall-clock read per query (r13 review): without an
        # injected now_ms the property re-reads the clock, so parser
        # and executor could disagree about "now" across a bucket
        # boundary and the spine's from/to would be off by one bucket
        now = self.now_ms
        return self.executor.execute(self.parse(query, now), now)

    def sql_union(self, query: str) -> DataFrame:
        """All series of one query in long format (series, time, value)."""
        now = self.now_ms
        return self.executor.execute_union(self.parse(query, now), now)

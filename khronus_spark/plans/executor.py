"""Compile bound InfluxCriteria into DataFrame plans and execute.

The Spark restatement of `influx/finder/InfluxQueryResolver.scala`:

1. build the Slice from the time filters (`buildSlice`, :67-85);
   `>`/`<` shift the closed interval edge by ±1ms; a FROM bound is
   mandatory.
2. route the query to a materialized resolution (`adjustResolution`,
   :89-118), then grid-align the range (from ceils, to floors, :120-133).
3. per source: scan that resolution's summary table, pushed-down filtered
   to (metric, slice) with order+limit applied **at the read**, before
   spine generation (`store/SummaryStore.scala:108-117`).
4. per projection: join onto the dense time spine (`sequence()`-based,
   no driver-side loop); missing buckets take fill(x) or are omitted
   (:184-201); binary operations inner-join two series on the bucket
   timestamp (`zipByTimestamp`, :203-212) — broadcast-sized.
5. scale, round to 4dp HALF_UP (:214-224), order by time.

Everything stays in Catalyst: the spine is `explode(sequence(...))`,
functions are column expressions, joins are equi-joins on `time`.
At dashboard scale each series is ≤700 points (reference.conf:61-64),
so per-query work is trivially broadcastable; the heavy lifting lives in
the rollup engine that materialized the summaries.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from khronus_spark.functions.summary import cpm_col
from khronus_spark.parser.ast import (
    Field,
    InfluxCriteria,
    Number,
    Operation,
    Source,
)
from khronus_spark.timegrid import (
    DEFAULT_WINDOWS_MS,
    MAX_RESOLUTION_POINTS,
    MIN_RESOLUTION_POINTS,
    Slice,
    TimeRange,
    adjust_resolution,
    build_time_range,
)

#: summary-table provider: (source, window_ms, slice) -> DataFrame with
#: the family's summary schema (histogram: metric/ts/p50..p999/min/max/
#: count/mean; counter: metric/ts/count). The slice is advisory — a
#: provider computing summaries on the fly can push it (bucket-aligned)
#: into the raw scan so only the queried buckets are aggregated; the
#: executor re-applies the exact ts filter afterwards either way.
SummaryProvider = Callable[[Source, int, Slice], DataFrame]


class QueryExecutionError(Exception):
    pass


@dataclass
class InfluxSeriesResult:
    """One output series (`InfluxSeries`, `influx/service/InfluxProtocol.scala:19`):
    name = projection name, df = (time long, value double) points."""

    name: str
    metric: str
    df: DataFrame


def build_slice(filters, now_ms: int) -> Slice:
    """`buildSlice` (InfluxQueryResolver.scala:67-85). The missing-from
    sentinel must be None, not a magic epoch value: `time > 0` legally
    produces from_ms = 1, which a value sentinel would misread as
    "no lower bound given"."""
    from_ms, to_ms = None, now_ms
    for f in filters:
        op = getattr(f, "operator", None)
        if not hasattr(f, "value_ms"):
            continue  # StringFilter: parsed but never applied (dead surface)
        if op == ">":
            from_ms = f.value_ms + 1
        elif op == ">=":
            from_ms = f.value_ms
        elif op == "<":
            to_ms = f.value_ms - 1
        elif op == "<=":
            to_ms = f.value_ms
    if from_ms is None:
        raise QueryExecutionError("From clause required")
    return Slice(from_ms, to_ms)


class QueryExecutor:
    def __init__(
        self,
        spark: SparkSession,
        summary_provider: SummaryProvider,
        windows_ms: tuple[int, ...] = DEFAULT_WINDOWS_MS,
        min_points: int = MIN_RESOLUTION_POINTS,
        max_points: int = MAX_RESOLUTION_POINTS,
        read_limit: int | None = None,
    ):
        self.spark = spark
        self.summary_provider = summary_provider
        self.windows_ms = windows_ms
        self.min_points = min_points
        self.max_points = max_points
        #: hard per-(metric, slice) read cap, the reference's Cassandra
        #: `limit ?` bind (`SummaryStore.scala:80-88` summary-limit=1000;
        #: `BucketStore.scala:77` bucket-limit=30000). Applied in ts
        #: order (query direction), BEFORE spine join/post-processing —
        #: compiles to TakeOrderedAndProject (per-partition top-n), so
        #: a runaway slice never materializes unbounded rows.
        self.read_limit = read_limit

    # -- public ------------------------------------------------------------

    def execute(self, criteria: InfluxCriteria, now_ms: int) -> list[InfluxSeriesResult]:
        slc = build_slice(criteria.filters, now_ms)
        window_ms = adjust_resolution(
            slc,
            criteria.group_by.duration_ms,
            criteria.group_by.force,
            self.windows_ms,
            self.min_points,
            self.max_points,
        )
        trange = build_time_range(slc, window_ms)

        summaries = {
            src.table_id: self._read_summaries(src, window_ms, slc, criteria)
            for src in criteria.sources
        }
        # Share one summary computation across projections (guide §2.5):
        # without this, every projection of the same source embeds its own
        # copy of the summary subtree, and the union/multi-series plan
        # re-scans + re-aggregates the measurements once PER SERIES
        # (column pruning specializes each branch, so ReuseExchange never
        # fires — plans/r13/influx_percentiles_before.txt shows 3 full
        # scans for 3 percentile series). A lazy localCheckpoint makes
        # every branch read the ONE materialized summary slice instead —
        # bounded rows (the resolution clamp keeps rendered series ≤700
        # points; a `force` override is bounded by the user's own
        # slice/window choice, the same in-memory-series bound the
        # reference carries). Only applied when ≥2 projections reference
        # the source — a single-series query keeps its straight-line plan.
        refs: dict[str, int] = {}
        for proj in criteria.projections:
            for tid in self._field_table_ids(proj):
                refs[tid] = refs.get(tid, 0) + 1
        for tid, n in refs.items():
            if n > 1 and tid in summaries:
                summaries[tid] = summaries[tid].localCheckpoint(eager=False)

        results = []
        for proj in sorted(criteria.projections, key=lambda p: p.series_id):
            df = self._project(proj, trange, summaries, criteria, window_ms)
            df = self._finalize(df, criteria)
            metric = ""
            if isinstance(proj, Field):
                metric = criteria.source_by_table_id(proj.table_id).metric
            results.append(InfluxSeriesResult(proj.series_name, metric, df))
        return results

    def execute_union(self, criteria: InfluxCriteria, now_ms: int) -> DataFrame:
        """All series in long format (series, time, value) — test/oracle
        friendly; series assembled with unionByName."""
        out = None
        for series in self.execute(criteria, now_ms):
            df = series.df.select(
                F.lit(series.name).alias("series"),
                F.lit(series.metric).alias("metric"),
                F.col("time"),
                F.col("value"),
            )
            out = df if out is None else out.unionByName(df)
        return out

    # -- internals ----------------------------------------------------------

    @staticmethod
    def _field_table_ids(proj):
        """table_ids a projection's value depends on (Numbers depend on
        none — they render from the spine alone)."""
        if isinstance(proj, Field):
            yield proj.table_id
        elif isinstance(proj, Operation):
            for side in (proj.left, proj.right):
                if isinstance(side, Field):
                    yield side.table_id

    def _read_summaries(
        self, src: Source, window_ms: int, slc: Slice, criteria: InfluxCriteria
    ) -> DataFrame:
        """Summary scan with slice + order + limit pushed to the read
        (`SummaryStore.readAll`, applied before spine generation)."""
        df = self.summary_provider(src, window_ms, slc)
        df = df.where(
            (F.col("metric") == src.metric)
            & F.col("ts").between(slc.from_ms, slc.to_ms)
        )
        limits = [n for n in (criteria.limit, self.read_limit) if n is not None]
        if limits:
            order = F.col("ts").asc() if criteria.order_asc else F.col("ts").desc()
            df = df.orderBy(order).limit(min(limits))
        return df

    def _spine(self, trange: TimeRange) -> DataFrame:
        """Dense timestamp spine from..to inclusive, step window — a
        Catalyst `sequence` + explode, not a driver loop (G3)."""
        if trange.to_ms < trange.from_ms:
            return self.spark.range(0).select(F.col("id").alias("time"))
        return self.spark.sql(
            f"SELECT explode(sequence({trange.from_ms}L, {trange.to_ms}L, "
            f"{trange.window_ms}L)) AS time"
        )

    def _fill_linear(self, joined: DataFrame) -> DataFrame:
        """fill(linear): interpolate missing buckets between their
        nearest known neighbours — the InfluxQL fill(linear) semantics
        (gaps before the first / after the last known point are
        DROPPED, not extrapolated). The carry-forward/backward windows
        run over ONE series of ≤700 points (G1 bounds every rendered
        series), so the single partition is by construction bounded —
        the same reasoning as the reference's in-memory series build
        (`InfluxQueryResolver.scala:184-201`)."""
        from pyspark.sql import Window as W

        one = F.lit(1)
        prev_w = W.partitionBy(one).orderBy("time").rowsBetween(
            W.unboundedPreceding, -1
        )
        next_w = W.partitionBy(one).orderBy("time").rowsBetween(
            1, W.unboundedFollowing
        )
        known_t = F.when(F.col("_v").isNotNull(), F.col("time"))
        pv = F.last("_v", ignorenulls=True).over(prev_w)
        pt = F.last(known_t, ignorenulls=True).over(prev_w)
        nv = F.first("_v", ignorenulls=True).over(next_w)
        nt = F.first(known_t, ignorenulls=True).over(next_w)
        interp = pv + (nv - pv) * (F.col("time") - pt) / (nt - pt)
        value = (
            F.when(F.col("_v").isNotNull(), F.col("_v"))
            .when(pv.isNotNull() & nv.isNotNull(), interp)
        )
        return (
            joined.select("time", value.alias("value"))
            .where(F.col("value").isNotNull())
        )

    def _function_col(self, field: Field, window_ms: int) -> Column:
        if field.name == "cpm":
            return cpm_col(F.col("count"), window_ms).cast("double")
        return F.col(field.name).cast("double")

    def _series_values(
        self,
        proj: Field | Number,
        trange: TimeRange,
        summaries: dict[str, DataFrame],
        criteria: InfluxCriteria,
        window_ms: int,
    ) -> DataFrame:
        """(time, value) for a simple projection (`generateSeq`, :176-201)."""
        spine = self._spine(trange)
        if isinstance(proj, Number):
            return spine.select("time", F.lit(float(proj.value)).alias("value"))
        summary = summaries[proj.table_id]
        if proj.name == "delta":
            # extension: count difference vs the previous EXISTING bucket
            # in the sliced range (the first in-range bucket has no
            # predecessor and drops; a gap's delta spans the gap). The
            # lag window runs over one rendered series — ≤700 points by
            # G1, bounded like _fill_linear.
            from pyspark.sql import Window as W

            w = W.partitionBy(F.lit(1)).orderBy("ts")
            vals = (
                summary.withColumn(
                    "_v",
                    (F.col("count") - F.lag("count").over(w)).cast("double"),
                )
                .where(F.col("_v").isNotNull())
                .select(F.col("ts"), F.col("_v"))
            )
        else:
            value = self._function_col(proj, window_ms)
            vals = summary.withColumn("_v", value).select(
                F.col("ts"), F.col("_v")
            )
        if criteria.fill is not None:
            joined = spine.join(vals, spine.time == F.col("ts"), "left")
            if criteria.fill == "linear":
                return self._fill_linear(joined)
            return joined.select(
                "time", F.coalesce(F.col("_v"), F.lit(float(criteria.fill))).alias("value")
            )
        joined = spine.join(vals, spine.time == F.col("ts"), "inner")
        return joined.select("time", F.col("_v").alias("value"))

    def _project(
        self,
        proj,
        trange: TimeRange,
        summaries: dict[str, DataFrame],
        criteria: InfluxCriteria,
        window_ms: int,
    ) -> DataFrame:
        if isinstance(proj, (Field, Number)):
            return self._series_values(proj, trange, summaries, criteria, window_ms)
        if isinstance(proj, Operation):
            if isinstance(proj.left, Operation) or isinstance(proj.right, Operation):
                raise QueryExecutionError("Nested operations are not supported yet")
            left = self._series_values(proj.left, trange, summaries, criteria, window_ms)
            right = self._series_values(proj.right, trange, summaries, criteria, window_ms)
            # zipByTimestamp (:203-212): inner equi-join on the bucket ts.
            joined = left.alias("l").join(right.alias("r"), "time", "inner")
            lv, rv = F.col("l.value"), F.col("r.value")
            if proj.operator == "+":
                value = lv + rv
            elif proj.operator == "-":
                value = lv - rv
            elif proj.operator == "*":
                value = lv * rv
            elif proj.operator == "/":
                # the reference throws on division by zero
                # (`InfluxAst.scala:86-95`); reject the literal case at
                # plan time, and fail per-point via a raising expression
                # otherwise rather than emitting silent nulls
                if isinstance(proj.right, Number) and float(proj.right.value) == 0.0:
                    raise QueryExecutionError("Division by zero")
                value = F.when(rv == 0, F.raise_error(F.lit("Division by zero"))).otherwise(
                    lv / rv
                )
            else:
                raise QueryExecutionError(f"Unknown operator {proj.operator}")
            return joined.select("time", value.alias("value"))
        raise QueryExecutionError(f"Unknown projection {proj!r}")

    def _finalize(self, df: DataFrame, criteria: InfluxCriteria) -> DataFrame:
        """scale + 4dp HALF_UP rounding + time order (:214-224).

        The time order is a SINGLE-PARTITION sort, not a global orderBy:
        a global sort range-partitions, which costs a separate boundary-
        sampling job plus a range exchange PER SERIES — on a ≤700-point
        rendered series (the same bound `_fill_linear`'s windows already
        rely on) that is pure overhead at any scale. coalesce(1) narrows
        the few post-aggregate partitions without a shuffle and the
        within-partition sort then IS the total order — identical rows,
        identical order (guide §2.1: remove shuffles the data's shape
        makes unnecessary)."""
        value = F.col("value") * F.lit(float(criteria.scale if criteria.scale is not None else 1.0))
        df = df.select("time", F.round(value, 4).alias("value"))
        order = F.col("time").asc() if criteria.order_asc else F.col("time").desc()
        return df.coalesce(1).sortWithinPartitions(order)

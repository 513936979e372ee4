"""Parquet sources for the engine and its test harness.

The driver testdata (/root/testdata/sf*/) stores timestamps as parquet
TIMESTAMP(MICROS) without UTC adjustment, which Spark reads as
TIMESTAMP_NTZ and DuckDB as naive TIMESTAMP — the same wall-clock
values on both engines, timezone-unambiguous. (Earlier driver builds
wrote INT64 TIMESTAMP(NANOS); `_ensure_nanos_as_long` keeps those
readable, arriving as epoch-ns longs.)

The engine's internal time domain is the epoch-**nanosecond** long:
`load_table` normalizes `events.ts` to it at the scan boundary
(`_NS_LONG_COLUMNS`), so every downstream operator computes in pure
integer arithmetic regardless of the source encoding. TPC-H date
columns (`l_shipdate`, `o_orderdate`) stay native timestamps — their
consumers use calendar functions and timestamp literals, which push
down to the parquet scan as-is. Helper expressions convert ns longs to
the engine's epoch-millisecond domain.

The `measurements` view maps the driver's `events` table onto the
reference's ingest record (`model/MetricMeasurement.scala:44-52`):
one row per sample: (metric, mtype, ts_ms, value). `event_type` plays the
metric name; the metric-type assignment is a fixed deterministic mapping;
negative values are skipped exactly like the reference ingest path
(`store/MetricMeasurementStore.scala:122-127`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Columns normalized to epoch-ns longs at the scan boundary. Only the
#: engine's measurement time domain — TPC-H date columns stay native
#: timestamps (calendar functions + literal predicates push down).
_NS_LONG_COLUMNS = {
    "events": ("ts",),
}

#: Deterministic metric-type assignment for the events→measurements view.
#: Counters are scalar sums; timers and gauges are histogram-valued and
#: share one code path (`InfluxCriteriaBuilder.scala:113-117`).
EVENT_TYPE_MTYPE = {
    "click": "counter",
    "view": "counter",
    "signup": "gauge",
    "purchase": "timer",
    "error": "timer",
}


def _ensure_nanos_as_long(spark: SparkSession) -> None:
    # Session-settable; required because the testdata parquet uses
    # TIMESTAMP(NANOS) which Spark 4 otherwise refuses to read.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def ntz_to_epoch_ns(col: Column) -> Column:
    """TIMESTAMP_NTZ wall-clock → epoch-ns long, independent of the
    session timezone.

    `timestamp_diff(MICROSECOND, NTZ epoch, ts)` is pure naive-datetime
    arithmetic — no cast through TIMESTAMP_LTZ, so the session timezone
    never enters (and unlike offset-shift round-trips there is no DST
    ambiguity). The earlier `to_utc_timestamp(ts, 'UTC')` form was NOT
    tz-independent: Spark implicitly casts NTZ→LTZ via the session
    timezone first and the 'UTC' shift is then a no-op, skewing every
    epoch by the session offset in non-UTC sessions."""
    epoch = F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))
    return F.timestamp_diff("MICROSECOND", epoch, col) * 1000


def ltz_to_epoch_ns(col: Column) -> Column:
    """TIMESTAMP (LTZ) instant → epoch-ns long. `unix_micros` reads the
    internal epoch directly — already session-tz-independent."""
    return F.unix_micros(col) * 1000


def load_table_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with its native parquet schema."""
    _ensure_nanos_as_long(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_to_epoch_ns(col: Column, dtype: str) -> Column:
    """The ONE source-encoding → epoch-ns dispatch (r13 review: this
    three-way rule lived as divergent copy-paste in `load_table` and
    `measurements_from_events`; a new timestamp physical type fixed in
    one would silently misconvert in the other): TIMESTAMP_NTZ via the
    naive-UTC reinterpretation, zoned TIMESTAMP via the instant, and
    anything else (legacy INT64 nanos, arriving as long through
    `nanosAsLong`) passes through."""
    if dtype == "timestamp_ntz":
        return ntz_to_epoch_ns(col)
    if dtype.startswith("timestamp"):
        return ltz_to_epoch_ns(col)
    return col


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; engine time columns come back as
    epoch-ns longs (see `_NS_LONG_COLUMNS`) whether the source stored
    TIMESTAMP(MICROS) or legacy INT64 nanos."""
    df = load_table_raw(spark, sf_dir, name)
    dtypes = dict(df.dtypes)
    for c in _NS_LONG_COLUMNS.get(name, ()):
        df = df.withColumn(c, ts_to_epoch_ns(F.col(c), dtypes.get(c, "")))
    return df


def spread(df: DataFrame, max_partitions: int | None = None) -> DataFrame:
    """Widen under-partitioned inputs before CPU-heavy map stages.

    `max_partitions` caps the fan-out — Python-UDF stages (mapInPandas)
    pay an interpreter + Arrow startup per worker, so small inputs want
    modest parallelism, not one worker per core.

    Small parquet files scan as a single row-group → a single task, which
    serializes compute-bound stages (hashing, folds, self-joins) no matter
    how many cores exist. When the scan yields fewer partitions than the
    cluster's parallelism, round-robin repartition to it — a trivial
    shuffle at that size. At real scale (100 TB → thousands of splits)
    the guard makes this a no-op, so no large shuffle is ever introduced.
    """
    if df.isStreaming:  # partition probe is illegal on streams; micro-
        return df       # batch parallelism comes from the source/shuffle
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    target = min(parallelism, max_partitions) if max_partitions else parallelism
    # JVM-side partition count: planning-only, no job, and no Python RDD
    # conversion stage (df.rdd would wrap the plan in a pickle-serializer
    # pipeline just to ask for the count).
    n_parts = df._jdf.queryExecution().toRdd().getNumPartitions()
    if n_parts < target:
        return df.repartition(target)
    return df


def ns_to_ms(col: Column) -> Column:
    """Epoch-ns long → epoch-ms long (floor; values are positive).

    Integral division, NOT `/` + cast: epoch-ns (~1.7e18) exceeds a
    double's 53-bit mantissa, so float division can land a full unit off
    at floor boundaries."""
    return F.call_function("div", col, F.lit(1_000_000))


def ns_to_date(col: Column) -> Column:
    """Epoch-ns long → DateType (UTC calendar day). Integral division for
    the same precision reason as ns_to_ms."""
    return F.date_from_unix_date(
        F.call_function("div", col, F.lit(86_400_000_000_000)).cast("int")
    )


def mtype_expr(event_type: Column) -> Column:
    mapping = F.create_map(*[F.lit(x) for kv in EVENT_TYPE_MTYPE.items() for x in kv])
    return F.coalesce(mapping[event_type], F.lit("timer"))


def measurements_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → measurements(metric, mtype, ts_ms, value).

    value is floored to Long (the reference's value domain is Long only —
    `model/MetricMeasurement.scala:50-52`); negative values are skipped
    (`store/MetricMeasurementStore.scala:122-127`).
    """
    ev = load_table_raw(spark, sf_dir, "events")
    ts_ns = ts_to_epoch_ns(F.col("ts"), dict(ev.dtypes)["ts"])
    return (
        ev.where(F.col("value") >= 0)
        .select(
            F.col("event_type").alias("metric"),
            mtype_expr(F.col("event_type")).alias("mtype"),
            ns_to_ms(ts_ns).alias("ts_ms"),
            F.floor(F.col("value")).cast("long").alias("value"),
            # raw source-domain timestamp (NTZ for current testdata, ns
            # long for legacy): time-range predicates restated on this
            # UNCOMPUTED column reach the parquet scan (row-group
            # pruning), which a derived `unix_micros(...)//1000 >= x`
            # never can
            F.col("ts").alias("ts_src"),
        )
    )


def metric_catalog(measurements: DataFrame) -> DataFrame:
    """The `meta` catalog: metrics auto-register on first write
    (`store/MetricMeasurementStore.scala:111-120`, `store/MetaStore.scala:65`)."""
    return (
        measurements.groupBy("metric", "mtype")
        .agg(F.max("ts_ms").alias("last_seen_ms"))
        .withColumn("active", F.lit(True))
    )


# ---- DuckDB oracle helpers (shared SQL snippets) -------------------------

#: SQL snippet for the same measurements view in DuckDB (events view is
#: pre-registered by the driver). Timestamps in DuckDB read as TIMESTAMP
#: (µs precision) — epoch_ms() floors to ms exactly like ns_to_ms above.
MEASUREMENTS_SQL = """
SELECT
  event_type AS metric,
  CASE event_type
    WHEN 'click' THEN 'counter'
    WHEN 'view' THEN 'counter'
    WHEN 'signup' THEN 'gauge'
    WHEN 'purchase' THEN 'timer'
    WHEN 'error' THEN 'timer'
    ELSE 'timer' END AS mtype,
  epoch_ms(ts) AS ts_ms,
  CAST(floor(value) AS BIGINT) AS value
FROM events
WHERE value >= 0
"""

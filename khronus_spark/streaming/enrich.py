"""Stream-static dimension enrichment.

The reference enriches measurements with catalog metadata by holding the
meta snapshot in memory and refreshing it every 5 s
(`store/Snapshot.scala:25-42`, `store/MetaStore.scala:88-114`). The
Spark-native restatement is the stream-static join: Structured Streaming
re-plans the STATIC side on every micro-batch, so a dimension table
backed by files (or a view over them) is re-read at batch boundaries —
the same freshness contract as the reference's 5 s snapshot refresh,
with no custom cache loop.

Scale shape: the dimension side carries an explicit broadcast hint —
catalogs / type maps are small by construction, and broadcasting keeps
the unbounded stream side completely shuffle-free (a shuffled
stream-static join would re-partition every micro-batch). Unmatched
keys survive (left join) with a defaulted attribute, mirroring the
reference's behavior of treating unknown metrics as new rather than
dropping their samples (`store/MetricMeasurementStore.scala:111-120`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    defaults: dict[str, Column] | None = None,
) -> DataFrame:
    """Left-join `dim` (broadcast) onto `stream`; fill unmatched rows'
    dimension attributes from `defaults` (column-name → default column).

    Works identically on a batch DataFrame — the streaming semantics
    (per-micro-batch static re-read) come from Spark, not this code, so
    stream==batch equality is testable with the same call."""
    out = stream.join(F.broadcast(dim), on, "left")
    for col_name, default in (defaults or {}).items():
        out = out.withColumn(col_name, F.coalesce(F.col(col_name), default))
    return out


def typed_events(events: DataFrame, type_dim: DataFrame) -> DataFrame:
    """events + (event_type → mtype) dimension → typed event rows.
    Unknown event types default to 'timer', the reference's fallback
    for histogram-valued metrics (`InfluxCriteriaBuilder.scala:113-117`).
    """
    return enrich_with_dimension(
        events,
        type_dim,
        on="event_type",
        defaults={"mtype": F.lit("timer")},
    ).select("event_id", "ts", "event_type", "mtype", "value")

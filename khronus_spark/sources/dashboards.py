"""Dashboard CRUD (S11) — Grafana dashboards as an engine-side KV table.

The reference stores dashboards as Kryo blobs in Cassandra and serves
get/list/drop through regex extracted from the Influx query string
(`influx/finder/InfluxDashboardResolver.scala:60-118`). Here the store is
a parquet-backed KV (name → JSON content); non-analytics, so the
implementation favors simplicity: writes rewrite the small table,
lookups are regex filters on the cached name column.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = "name STRING, content STRING"


class DashboardStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read(self) -> DataFrame:
        try:
            return self.spark.read.schema(_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], _SCHEMA)

    def store(self, name: str, content: str) -> None:
        """Upsert by name (the reference overwrites by PK)."""
        current = self._read().where(F.col("name") != name)
        updated = current.unionByName(
            self.spark.createDataFrame([(name, content)], _SCHEMA)
        )
        # small metadata table: a full rewrite is the simple, idempotent move
        updated.write.mode("overwrite").parquet(self.path + ".tmp")
        self.spark.read.schema(_SCHEMA).parquet(self.path + ".tmp").write.mode(
            "overwrite"
        ).parquet(self.path)

    def lookup(self, regex: str) -> DataFrame:
        """Case-insensitive regex over dashboard names
        (`InfluxDashboardResolver.scala:69-90`)."""
        pat = f"(?i){regex}"
        return self._read().where(F.col("name").rlike(pat)).orderBy("name")

    def drop(self, regex: str) -> int:
        pat = re.compile(regex, re.IGNORECASE)
        current = self._read().collect()
        keep = [(r["name"], r["content"]) for r in current if not pat.search(r["name"])]
        dropped = len(current) - len(keep)
        self.spark.createDataFrame(keep or [], _SCHEMA).write.mode(
            "overwrite"
        ).parquet(self.path)
        return dropped

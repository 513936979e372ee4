"""Streaming SCD2 dimension maintenance — the late-fact twin.

`operators/scd2.py` gives the batch faces: `scd2_intervals` (the
dimension from scratch) and `scd2_apply_backfill` (correct a standing
dimension for one out-of-order batch, recompute bounded by the
backfill footprint). This module runs that correction CONTINUOUSLY:
every arriving micro-batch of facts — on time or late, the stream
does not care — upserts into a persisted fact history and rebuilds
exactly the touched users' interval chains, with facts and dimension
committed TOGETHER.

The storage is one `sources.txnlog.TxnTable` holding two partition
namespaces, both bucketed by user (`pmod(user_id, n_buckets)`):

    facts/bucket=<b>   the accumulated fact history of bucket b's
                       users, replay-idempotent by event_id identity
    dim/bucket=<b>     bucket b's slice of the SCD2 dimension

Because a TxnTable commit replaces any number of partitions
atomically, every micro-batch lands its touched fact buckets AND the
matching rebuilt dimension buckets in ONE compare-and-swap commit —
so at EVERY committed version, the dimension EQUALS
`scd2_intervals(facts at that version)` exactly (the
derived-consistency invariant; a reader can never observe facts the
dimension hasn't absorbed, nor a dimension ahead of its facts). The
plain parquet layout cannot promise that across two directories;
this is the commit log earning its keep beyond torn-batch safety.

Semantics and proofs (tests/test_streaming_scd2.py):
- stream==batch: after the stream drains, the dimension is
  bit-identical to `scd2_intervals(all facts)` — arrival order and
  chunking are invisible, including facts arriving weeks late;
- replay idempotence: a redelivered micro-batch upserts the same
  event_ids into the same buckets — new version, identical content;
- per-version consistency: dim(v) == scd2_intervals(facts(v)) for
  every version v, checked against pinned snapshots;
- untouched buckets are NOT rewritten (their staged dirs survive the
  commit by reference — bounded write amplification).

Scale shape: the per-trigger work is bounded by the TOUCHED buckets —
fact merge is an event_id anti-join + union per touched bucket,
the rebuild reads only those buckets' facts (never the full history:
the bucket map is the index), and `scd2_intervals`' two
user-partitioned windows run over touched users' facts only. Late
data costs exactly its footprint, the `scd2_apply_backfill` sweep's
flat-correction curve, now per micro-batch. `n_buckets` trades
write amplification (fewer, bigger rewrites) against commit fan-out;
at 100 TB the buckets would be thousands and the anti-join inherits
AQE skew handling.

Reference parity: the reference has no SCD2 surface (extension);
the effectively-once contract mirrors T5
(`store/BucketStore.scala:159-172` idempotent set-upsert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from khronus_spark.operators.scd2 import WEEK_MS, scd2_intervals
from khronus_spark.sources.txnlog import CommitConflict, TxnTable

_FACT_COLS = ["event_id", "user_id", "ts", "event_type"]


def _bucket(col, n_buckets: int):
    return F.pmod(F.col(col), F.lit(n_buckets)).cast("long")


def read_scd2_dimension(
    spark: SparkSession, table: TxnTable, version: int | None = None
) -> DataFrame | None:
    """The dimension at a version: union of the dim/* partitions."""
    return _read_namespace(spark, table, "dim/", version)


def read_scd2_facts(
    spark: SparkSession, table: TxnTable, version: int | None = None
) -> DataFrame | None:
    """The fact history at a version: union of the facts/* partitions."""
    return _read_namespace(spark, table, "facts/", version)


def _read_namespace(spark, table, prefix, version):
    files = {
        k: p
        for k, p in table.snapshot_files(version).items()
        if k.startswith(prefix)
    }
    out = None
    for key in sorted(files):
        df = spark.read.parquet(files[key])
        out = df if out is None else out.unionByName(df)
    return out


def scd2_upsert_sink(table: TxnTable, week_ms: int = WEEK_MS, n_buckets: int = 8):
    """foreachBatch body: merge the batch's facts into their user
    buckets (replay-idempotent by event_id), rebuild the touched
    users' interval chains from the merged bucket history, and commit
    facts + dimension for the touched buckets as ONE CAS commit."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        spark = batch_df.sparkSession
        batch = (
            batch_df.select(*_FACT_COLS)
            .dropDuplicates(["event_id"])
            .withColumn("bucket", _bucket("user_id", n_buckets))
            .localCheckpoint(eager=True)
        )
        buckets = [r["bucket"] for r in batch.select("bucket").distinct().collect()]
        if not buckets:
            return
        touched = batch.select("user_id").distinct().localCheckpoint(eager=True)
        new_ids = batch.select("event_id")
        for _ in range(8):
            version = table.version()
            parts: dict[str, DataFrame] = {}
            merged_by_bucket: dict[int, DataFrame] = {}
            for b in buckets:
                existing = table.read_partition(spark, f"facts/bucket={b}", version)
                part = batch.where(F.col("bucket") == b).drop("bucket")
                if existing is not None:
                    keep = existing.join(new_ids, ["event_id"], "left_anti")
                    part = keep.unionByName(part)
                # one materialization: the partition write AND the
                # rebuild below both consume the merged bucket
                part = part.localCheckpoint(eager=False)
                merged_by_bucket[b] = part
                parts[f"facts/bucket={b}"] = part
            history = None
            for b in buckets:
                h = merged_by_bucket[b]
                history = h if history is None else history.unionByName(h)
            rebuilt = scd2_intervals(
                history.join(F.broadcast(touched), "user_id", "left_semi"),
                week_ms,
            ).withColumn("bucket", _bucket("user_id", n_buckets))
            for b in buckets:
                existing_dim = table.read_partition(
                    spark, f"dim/bucket={b}", version
                )
                new_dim = rebuilt.where(F.col("bucket") == b).drop("bucket")
                if existing_dim is not None:
                    kept = existing_dim.join(
                        F.broadcast(touched), "user_id", "left_anti"
                    )
                    new_dim = kept.unionByName(new_dim)
                parts[f"dim/bucket={b}"] = new_dim
            try:
                table.commit(parts, expect_version=version)
                return
            except CommitConflict:
                continue  # an external writer moved the table: re-merge
        raise RuntimeError("scd2 upsert lost 8 CAS rounds; table too hot")

    return merge


def run_streaming_scd2(
    events_stream: DataFrame,
    table: TxnTable,
    checkpoint_path: str,
    week_ms: int = WEEK_MS,
    n_buckets: int = 8,
    trigger: dict | None = None,
):
    """Continuously maintain an SCD2 dimension from a fact stream:
    every micro-batch upserts facts and corrects exactly the touched
    users' chains, atomically (module docstring). `events_stream` is
    (event_id, user_id, ts (epoch-ns), event_type, ...) — extra
    columns are dropped."""
    return (
        events_stream.writeStream.foreachBatch(
            scd2_upsert_sink(table, week_ms, n_buckets)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )

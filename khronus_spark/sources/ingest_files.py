"""File-based corpus ingestion: JSONL / CSV document readers with an
explicit schema and a corrupt-record quarantine.

Training corpora usually arrive as line-delimited JSON (one document
per line) or CSV drops, not parquet. These readers are the boundary
where malformed input is caught — everything downstream (dedup,
curation, packing) assumes clean typed columns.

Design for 100 TB:

- **Explicit schema, never inference.** `spark.read.json` without a
  schema runs a full sampling pass over the input before the real scan
  — at 100 TB that is a second read of the corpus. The schema here is
  declared once and handed to the reader, so there is exactly one pass.
- **Line-splittable.** JSONL and CSV (without multiline fields) split
  per line, so a 100 TB drop parallelizes to as many tasks as there
  are file blocks; no single-file bottleneck.
- **PERMISSIVE + quarantine, not fail-fast.** A multi-billion-line
  ingest always contains garbage lines. FAILFAST kills the job at hour
  N; DROPMALFORMED silently loses data. PERMISSIVE routes each bad
  line into `_corrupt_record`, and `split_quarantine` separates them so
  the pipeline continues while the quarantine is auditable (and
  re-parseable after a fix) — same philosophy as the reference's
  ingest, which skips bad measurements instead of failing the batch
  (store/MetricMeasurementStore.scala:122-127).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: The documents table contract (matches documents.parquet).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL document drop under the documents contract.
    Malformed lines land in `_corrupt_record` with every data column
    NULL; well-formed lines have `_corrupt_record` NULL."""
    return (
        spark.read.schema(_with_corrupt(DOCUMENTS_SCHEMA))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_documents_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """Read a CSV document drop under the documents contract (no
    multiline fields — keeps the input line-splittable)."""
    return (
        spark.read.schema(_with_corrupt(DOCUMENTS_SCHEMA))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("multiLine", "false")
        .csv(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows without the corrupt column;
    quarantined raw lines for audit/replay. Also quarantines rows whose
    required key (doc_id) is NULL — a typed-but-keyless row is as
    unusable as a malformed one."""
    bad = F.col(CORRUPT_COL).isNotNull() | F.col("doc_id").isNull()
    clean = df.where(~bad).drop(CORRUPT_COL)
    quarantine = df.where(bad).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct("*"))).alias("raw_line")
    )
    return clean, quarantine


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC document drop under the documents contract. ORC is
    typed storage (schema travels with the file), so there is no
    corrupt-line quarantine — the failure mode is schema DRIFT, which
    this reader turns into a loud error instead of silent NULL
    columns: every contract column must exist with the contract type;
    extra columns are dropped (forward-compatible producers)."""
    df = spark.read.orc(path)
    have = {f.name: f.dataType for f in df.schema.fields}
    missing = [f.name for f in DOCUMENTS_SCHEMA.fields if f.name not in have]
    if missing:
        raise ValueError(f"ORC drop missing contract columns: {missing}")
    drift = [
        (f.name, str(have[f.name]), str(f.dataType))
        for f in DOCUMENTS_SCHEMA.fields
        if have[f.name] != f.dataType
    ]
    if drift:
        raise ValueError(f"ORC drop schema drift (col, got, want): {drift}")
    return df.select(*[f.name for f in DOCUMENTS_SCHEMA.fields])

"""Streaming training-corpus preparation — `operators/curation.py::
corpus_prep` run CONTINUOUSLY over a document stream (the crawl-side
face of the pipeline a data team runs before tokenization).

Per micro-batch, against a FROZEN eval split (benchmarks are fixed
before a crawl starts — the realistic deployment; a moving eval set
would demand retroactive re-scoring of already-accepted documents):

  1. quality gate     map-side projection (text.with_quality);
  2. decontaminate    n-gram overlap vs the static eval split — the
                      SAME scoring as the batch face (the union trick:
                      `decontamination(batch ∪ eval, eval_mod)` scores
                      batch docs against the full eval shingle set);
  3. exact dedup      keep-first-arrival per md5(text): within a batch
                      the min doc_id claims the class; across batches
                      a persisted md5 claim index (append-only
                      partitions of one `TxnTable`) marks later
                      arrivals dup_drop;
  4. accounting       the batch's per-language counter DELTAS.

Claims and accounting land as ONE commit per micro-batch
(`md5/batch=<id>` + `acct/batch=<id>` partitions), so a reader never
sees claims without their accounting or vice versa; both namespaces
are append-only and keyed by batch id, so a checkpoint replay REPLACES
them with recomputed-identical content (effectively-once by content —
the probe excludes the batch's own claim partition, so a replay scores
against exactly the pre-delivery index).

stream==batch contract (test-pinned): with in-order delivery (doc_ids
non-decreasing across micro-batches — the crawl-append shape),
`read_corpus_prep` equals the batch `corpus_prep` over the full corpus
EXACTLY, because keep-first-arrival coincides with the batch face's
keep-min-doc_id. Out-of-order delivery keeps a different (still
deterministic per delivery order) class representative; counts per
md5-class are unchanged, but a class whose members carry different
`lang` labels could attribute its kept doc to a different language —
the same caveat every first-writer-wins streaming dedup carries.

Scale shape: per trigger — quality map-only; decontamination broadcast
(eval shingles are benchmark-sized); the dedup probe is ONE scan of
the claim index (one md5 long + doc id per distinct text — the
incremental-dedup index shape) + one anti-join; accounting collapses
to |langs| rows. Nothing re-reads the accepted corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from khronus_spark.operators.dedup import decontamination
from khronus_spark.operators.text import with_quality
from khronus_spark.sources.tables import spread
from khronus_spark.sources.txnlog import TxnTable

ACCT_COLS = [
    "lang",
    "n_docs_kept",
    "n_tokens_kept",
    "n_docs_quality_drop",
    "n_docs_contaminated_drop",
    "n_docs_dup_drop",
]


def corpus_prep_sink(
    table: TxnTable,
    eval_docs: DataFrame,
    eval_mod: int = 11,
    quality_min_bp: int = 3000,
    contamination_max_bp: int = 5000,
):
    """foreachBatch body. `eval_docs` is the frozen eval split (its
    doc_ids satisfy doc_id % eval_mod == 0 — the batch face's carve);
    stream rows on the eval carve are ignored (eval is config, not
    data)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        spark = batch_df.sparkSession
        batch = batch_df.where(F.col("doc_id") % eval_mod != 0)
        if batch.isEmpty():
            return
        d = decontamination(
            batch.unionByName(eval_docs), eval_mod
        ).select("doc_id", "contamination_bp")
        h = F.md5(F.col("text")).alias("h")
        flagged = (
            with_quality(spread(batch))
            .join(d, "doc_id")
            .select(
                "doc_id",
                "lang",
                h,
                F.col("n_tokens").cast("long").alias("n_tokens"),
                (F.col("quality_bp") < quality_min_bp).alias("q_drop"),
                (F.col("contamination_bp") >= contamination_max_bp).alias(
                    "c_drop"
                ),
            )
            .localCheckpoint(eager=True)
        )
        # cross-batch claims: every md5 already claimed by an EARLIER
        # batch (the probe excludes this batch's own key, so replays
        # score against exactly the pre-delivery index)
        me = f"md5/batch={batch_id}"
        # ONE multi-path parquet relation, not a unionByName chain: a
        # Python-loop union builds an N-deep plan every trigger, so
        # analysis time grows with stream AGE (O(N) per trigger,
        # O(N^2) cumulative) — the r13 review's plan-depth finding.
        # The parquet reader takes the path list natively; all parts
        # share the claim schema.
        claim_paths = [
            path
            for key, path in table.snapshot_files().items()
            if key.startswith("md5/") and key != me
        ]
        claimed = (
            # explicit (pruned) schema: one column read, no per-batch
            # footer inference over the whole claim history
            spark.read.schema("h string").parquet(*claim_paths).select("h")
            if claim_paths
            else None
        )
        keep_w = flagged.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
        step = flagged.join(F.broadcast(keep_w), "h")
        if claimed is not None:
            hit = claimed.distinct().withColumn("_claimed", F.lit(True))
            step = step.join(hit, "h", "left")
        else:
            step = step.withColumn("_claimed", F.lit(None).cast("boolean"))
        step = step.withColumn(
            "dup_drop",
            F.coalesce(F.col("_claimed"), F.lit(False))
            | (F.col("doc_id") != F.col("keep_id")),
        ).localCheckpoint(eager=True)

        kept = ~F.col("q_drop") & ~F.col("c_drop") & ~F.col("dup_drop")
        acct = step.groupBy("lang").agg(
            F.sum(kept.cast("long")).alias("n_docs_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias(
                "n_tokens_kept"
            ),
            F.sum(F.col("q_drop").cast("long")).alias("n_docs_quality_drop"),
            F.sum((~F.col("q_drop") & F.col("c_drop")).cast("long")).alias(
                "n_docs_contaminated_drop"
            ),
            F.sum(
                (~F.col("q_drop") & ~F.col("c_drop") & F.col("dup_drop"))
                .cast("long")
            ).alias("n_docs_dup_drop"),
        )
        # new claims: classes this batch keeps (kept-or-dropped-by-
        # quality still CLAIMS the md5 — the batch face's window ranks
        # every non-eval doc, so later identical text is dup either way)
        new_claims = (
            step.where(~F.coalesce(F.col("_claimed"), F.lit(False)))
            .select("h", "keep_id")
            .distinct()
        )
        table.commit({me: new_claims, f"acct/batch={batch_id}": acct})

    return process


def run_streaming_corpus_prep(
    docs_stream: DataFrame,
    table: TxnTable,
    eval_docs: DataFrame,
    checkpoint_path: str,
    eval_mod: int = 11,
    quality_min_bp: int = 3000,
    contamination_max_bp: int = 5000,
    trigger: dict | None = None,
):
    """Continuously curate a document stream; read the standing
    accounting with `read_corpus_prep`."""
    return (
        docs_stream.writeStream.foreachBatch(
            corpus_prep_sink(
                table, eval_docs, eval_mod, quality_min_bp,
                contamination_max_bp,
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_corpus_prep(
    spark: SparkSession, table: TxnTable, budget: int = 512
) -> DataFrame | None:
    """The standing accounting: per-language totals over every batch
    delta, plus n_packs = ceildiv(kept tokens, budget) — computed at
    read time because a ceiling of a cumulative sum is not
    delta-decomposable. Column-for-column the batch `corpus_prep`
    schema."""
    out = None
    acct_schema = (
        "lang string, n_docs_kept long, n_tokens_kept long, "
        "n_docs_quality_drop long, n_docs_contaminated_drop long, "
        "n_docs_dup_drop long"
    )
    for key, path in sorted(table.snapshot_files().items()):
        if key.startswith("acct/"):
            df = spark.read.schema(acct_schema).parquet(path)
            out = df if out is None else out.unionByName(df)
    if out is None:
        return None
    return out.groupBy("lang").agg(
        *[F.sum(c).alias(c) for c in ACCT_COLS[1:]],
    ).select(
        *ACCT_COLS,
        F.expr(
            f"CAST((n_tokens_kept + {budget} - 1) div {budget} AS BIGINT)"
        ).alias("n_packs"),
    )

#!/usr/bin/env python
"""Scaling measurement for the hybrid retrieval faces.

The indexed face's pitch is not that it wins at 5k docs — it is that
the work it removes from query time (corpus tokenization + postings
build + df/collection-stats aggregation) GROWS with the corpus while
the work it keeps (scoring the query-term postings mass + rank fusion)
is what any retriever must pay. This sweep replicates the sf0.1
documents table (per-copy id offsets, texts re-suffixed so postings
mass scales realistically) and, at each size, measures:

- brute:   `hybrid_rrf_topk` end-to-end (tokenize + build + score)
- indexed: `hybrid_rrf_topk_indexed` QUERY over a prebuilt index
           (postings + df + stats + PQ books/codes read from parquet)
- build:   the one-off index build being amortized

Expectation: brute grows with corpus size along BOTH axes while the
indexed query grows only with the scoring mass — the gap widens.
Prints one JSON line per corpus size; paste into the round notes.

Round 8 adds the PRUNED indexed face (max_impact → exact WAND cut in
the BM25 branch, bit-identical fusion). Two vocabularies:

- default (replica-suffixed): near-uniform df ⇒ flat ceilings ⇒ the
  cut is NEUTRAL by construction — reported to show the hostile
  corner honestly;
- SPARK_GRAFT_HYBRID_ZIPF=1: the wand_sweep Zipf token transform
  (stop tier + per-copy noise + topical subwords) and larger
  replicas — the vocabulary shape real corpora have, where the cut
  pays past its ~50k-doc crossover.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"
ZIPF = os.environ.get("SPARK_GRAFT_HYBRID_ZIPF") == "1"
REPLICAS = [1, 4, 10, 21] if ZIPF else [1, 2, 4, 8]
EVAL_MOD = 97

#: scripts/wand_sweep.py's Zipf-ish transform, verbatim (see its
#: comment for the three tiers); applied to corpus AND queries
ZIPF_TEXT = (
    "array_join(transform(split(trim(lower(text)), '\\\\s+'), (w, i) -> "
    "CASE WHEN pmod(xxhash64(w, i, pmod(doc_id, 10000000), 7), 10) < 5 THEN w "
    "WHEN pmod(xxhash64(w, i, pmod(doc_id, 10000000), 7), 10) < 7 "
    "THEN concat(w, '#', CAST(pmod(xxhash64(w, i, doc_id, 11), 100000) AS STRING)) "
    "ELSE concat(w, '_', CAST(pmod(xxhash64(w, i, pmod(doc_id, 10000000), 13), 1000) AS STRING)) END"
    "), ' ')"
)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from khronus_spark.operators import pq as pq_ops
    from khronus_spark.operators import retrieval as ret
    from khronus_spark.operators import text as text_ops
    from khronus_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hybrid-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    emb.count()
    n_base = base.count()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    def best_of(fn, n=3):
        xs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            xs.append(time.perf_counter() - t0)
        return round(min(xs), 2)

    for reps in REPLICAS:
        # copy r: id-offset docs; suffix one replica-specific token so
        # the vocabulary and postings mass grow a little like a real
        # crawl (pure duplication would let df lookups collapse)
        parts = None
        for r in range(reps):
            c = base.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                (
                    F.col("text")
                    if r == 0
                    else F.concat(F.col("text"), F.lit(f" replica{r}"))
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            parts = c if parts is None else parts.unionAll(c)
        if ZIPF:
            parts = parts.select(
                "doc_id",
                F.expr(ZIPF_TEXT).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        docs = parts.localCheckpoint(eager=True)
        n = n_base * reps

        # queries: the SAME eval carve regardless of replication (the
        # query load is fixed; the corpus grows under it)
        queries = docs.where(
            (F.col("doc_id") % EVAL_MOD == 0) & (F.col("doc_id") < 10_000_000)
        ).select(F.col("doc_id").alias("query_id"), "text")
        probes = emb.where(F.col("vec_id") % EVAL_MOD == 0).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        corpus = docs.where(F.col("doc_id") % EVAL_MOD != 0)

        out = tempfile.mkdtemp(prefix=f"hybrid_sweep_{reps}_")
        t0 = time.perf_counter()
        text_ops.write_bm25_index(
            text_ops.bm25_build_postings(corpus), f"{out}/bm25"
        )
        books, codes = pq_ops.pq_build_index(emb, sub=4, k=8, iters=1)
        pq_ops.write_pq_index(books, codes, f"{out}/pq")
        t_build = round(time.perf_counter() - t0, 2)

        postings = text_ops.read_bm25_index(spark, f"{out}/bm25")
        df_t, n_docs, avgdl_m = text_ops.read_bm25_stats(spark, f"{out}/bm25")
        mi = text_ops.read_bm25_max_impact(spark, f"{out}/bm25")
        books_r, codes_r = pq_ops.read_pq_index(spark, f"{out}/pq")

        t_pruned = best_of(
            lambda: run(
                ret.hybrid_rrf_topk_indexed(
                    postings,
                    books_r,
                    codes_r,
                    queries,
                    probes,
                    df_t=df_t,
                    collection_stats=(n_docs, avgdl_m),
                    max_impact=mi,
                )
            )
        )
        t_indexed = best_of(
            lambda: run(
                ret.hybrid_rrf_topk_indexed(
                    postings,
                    books_r,
                    codes_r,
                    queries,
                    probes,
                    df_t=df_t,
                    collection_stats=(n_docs, avgdl_m),
                )
            )
        )
        # brute face composed with the IDENTICAL query/probe load (the
        # registry entry's internal carve would hand replicas extra
        # query docs): inline postings build + tokenize per query run,
        # exact-cosine semantic branch — what a no-index deployment pays
        t_brute = best_of(
            lambda: run(
                ret.rrf_fuse(
                    text_ops.bm25_rank_indexed(
                        text_ops.bm25_build_postings(corpus), queries, k=20
                    ).select("query_id", "doc_id", "rank"),
                    ret.semantic_eval_rank(emb, eval_mod=EVAL_MOD, pool=20),
                )
            )
        )

        print(
            json.dumps(
                {
                    "n_docs": n,
                    "zipf_vocab": ZIPF,
                    "brute_s": t_brute,
                    "indexed_query_s": t_indexed,
                    "indexed_pruned_query_s": t_pruned,
                    "index_build_s": t_build,
                    "speedup": round(t_brute / max(t_indexed, 1e-9), 2),
                    "speedup_pruned_vs_brute": round(
                        t_brute / max(t_pruned, 1e-9), 2
                    ),
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()

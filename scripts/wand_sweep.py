#!/usr/bin/env python
"""Scaling measurement for the exact WAND-style pruned BM25 face.

The round-7 verdict named the retrieval family's one open 100× gap:
the indexed face removed the corpus-sized build work, but BOTH faces
still paid the full scoring mass — every posting matching any query
term, which at web scale is dominated by stop-word posting lists.
`bm25_rank_indexed_pruned` cuts that mass with per-term score
ceilings (persisted with the index) and a seed-derived k-th-best
lower bound, preserving the exact top-k by a strict-inequality proof.

The gate corpus cannot show the win: its 31-word vocabulary is
near-uniform (every term df ≈ 78% ⇒ idf_bits = 1 ⇒ flat ceilings ⇒
nothing prunable) — the pruning-hostile corner, where the pruned face
must merely stay exact. Real corpora are Zipf-shaped, so this sweep
DERIVES a Zipf-vocabulary corpus from the sf0.1 documents table by a
deterministic per-occurrence token transform: each base token either
stays itself (probability ~1/2 — the stop-word tier, df ≈ 40%) or
splits into one of 1000 rare subwords keyed by xxhash64(w, i, doc_id)
(the content tier, df ≈ 0.1–0.5%). Replication with id offsets grows
the corpus under a FIXED query load (the rep-0 eval carve).

At each size, over the SAME prebuilt index (postings + df + stats +
maximpact):

- unpruned: `bm25_rank_indexed` (share_postings=False, persisted
  constants) — the round-7 face
- pruned:   `bm25_rank_indexed_pruned` — seed, ceiling cut, rescore
- identical: full top-k result-set equality (the exactness pin)
- kept_pm:  per-mille of (query, term) pairs surviving the ceiling
  cut (the scoring-mass proxy)

Prints one JSON line per corpus size; paste into the round notes.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = [1, 4, 10, 21, 32]
EVAL_MOD = 97

#: deterministic Zipf-ish token transform with TOPICAL structure: per
#: occurrence, keyed on the BASE doc id (pmod 10M) so replicas of a
#: base doc agree — 50% stop tier (bare word, df ≈ 40%), 20% per-copy
#: noise (keyed on the real doc_id — replicas diverge; ultra-rare), 30%
#: topical subwords (shared by a base doc's replicas — the relevant-doc
#: cluster a real corpus has and the uniform gate vocabulary lacks).
#: Applied identically to corpus and queries (they share the carve).
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

    from khronus_spark.operators import text as text_ops
    from khronus_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("wand-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF_DIR, "documents")
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
        parts = None
        for r in range(reps):
            c = base.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                "text",
            )
            parts = c if parts is None else parts.unionAll(c)
        # the transform keys on doc_id, so replicas diverge texturally
        # (pure duplication would hand every replica the same postings)
        docs = parts.select(
            "doc_id", F.expr(ZIPF_TEXT).alias("text")
        ).localCheckpoint(eager=True)
        n = n_base * reps

        queries = docs.where(
            (F.col("doc_id") % EVAL_MOD == 0) & (F.col("doc_id") < 10_000_000)
        ).select(F.col("doc_id").alias("query_id"), "text")
        corpus = docs.where(F.col("doc_id") % EVAL_MOD != 0)

        out = tempfile.mkdtemp(prefix=f"wand_sweep_{reps}_")
        t0 = time.perf_counter()
        text_ops.write_bm25_index(text_ops.bm25_build_postings(corpus), out)
        t_build = round(time.perf_counter() - t0, 2)

        postings = text_ops.read_bm25_index(spark, out)
        df_t, n_docs, avgdl_m = text_ops.read_bm25_stats(spark, out)
        mi = text_ops.read_bm25_max_impact(spark, out)

        t_unpruned = best_of(
            lambda: run(
                text_ops.bm25_rank_indexed(
                    postings,
                    queries,
                    share_postings=False,
                    df_t=df_t,
                    collection_stats=(n_docs, avgdl_m),
                )
            )
        )
        t_pruned = best_of(
            lambda: run(
                text_ops.bm25_rank_indexed_pruned(
                    postings,
                    mi,
                    queries,
                    df_t=df_t,
                    collection_stats=(n_docs, avgdl_m),
                )
            )
        )
        # the BRUTE baseline (inline postings build + df/stats per
        # query run, no persisted index) at the SAME fixed rep-0 query
        # load as the indexed faces — bm25_rank's internal carve would
        # hand every replica its own query set and inflate the ratio
        # by ~the replica factor. One run: it is the slow face by
        # construction and only anchors the indexed-vs-brute ratio.
        t_brute = best_of(
            lambda: run(
                text_ops.bm25_rank_indexed(
                    text_ops.bm25_build_postings(corpus), queries, k=5
                )
            ),
            n=1,
        )

        a = sorted(
            map(
                tuple,
                text_ops.bm25_rank_indexed(
                    postings,
                    queries,
                    share_postings=False,
                    df_t=df_t,
                    collection_stats=(n_docs, avgdl_m),
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                text_ops.bm25_rank_indexed_pruned(
                    postings,
                    mi,
                    queries,
                    df_t=df_t,
                    collection_stats=(n_docs, avgdl_m),
                ).collect(),
            )
        )

        # scoring-mass ledger from the survival face: Σ df over kept
        # (query, term) pairs vs over all — the posting rows that
        # enter the candidate join vs the unpruned scoring aggregate
        mass = (
            text_ops.bm25_pruned_term_survival(
                postings, mi, queries, df_t=df_t, collection_stats=(n_docs, avgdl_m)
            )
            .agg(
                F.sum("df").alias("total"),
                F.sum(F.when(F.col("kept"), F.col("df")).otherwise(0)).alias(
                    "kept"
                ),
            )
            .first()
        )
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "unpruned_query_s": t_unpruned,
                    "pruned_query_s": t_pruned,
                    "brute_query_s": t_brute,
                    "speedup": round(t_unpruned / max(t_pruned, 1e-9), 2),
                    "speedup_vs_brute": round(t_brute / max(t_pruned, 1e-9), 2),
                    "identical": a == b,
                    "topk_rows": len(a),
                    "index_build_s": t_build,
                    "qterm_posting_mass": mass["total"],
                    "kept_pm": int(1000 * mass["kept"] / max(mass["total"], 1)),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

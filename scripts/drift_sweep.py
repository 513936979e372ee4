#!/usr/bin/env python
"""Drift-loop generalization sweep (round-10; extends verdict
directive 7 beyond the two points the tests pin).

tests/test_streaming_ann.py pins ONE drift shape (collapse into
[0.85, 0.95]) at one config: stale books 0.18 recall@5, naive retrain
0.40, reseeded retrain 0.88. This sweep walks drift SEVERITY —
compressions of the drifted batch into windows of shrinking width at
increasing offsets (severe = tight + far from the training support's
dense regions) plus the two shapes the tests call out as benign
(reflection clip(0.3−x); pure negation — orthogonal map) — and
measures recall@5 through the exact-rerank face for all three
strategies on each. Expected structure, now measured instead of
asserted from two points:

- benign shapes: all three strategies fine (the exact rerank absorbs
  ADC error while codes still discriminate);
- the tighter/farther the drifted cluster, the worse stale books get
  AND the worse NAIVE retrain gets (vec_id-ordered k-means init never
  splits the foreign cluster), while reseeded retrain holds;
- reseeded retrain is never worse than naive.

Writes sweeps/latest/drift_sweep.json (copy into sweeps/r{N}/) and
prints one JSON line. Everything xxhash64/integer-deterministic —
rerunnable bit-for-bit anywhere.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


DRIFTS = {
    # benign: reflection with offset — batch stays inside well-covered
    # support
    "reflect_0.3": "least(1.0D, greatest(-1.0D, 0.3D - CAST(x AS DOUBLE)))",
    # benign: pure negation (orthogonal map, geometry preserved)
    "negate": "-CAST(x AS DOUBLE)",
    # compressions: tight windows at increasing offset = increasing
    # severity (codeword spacing in the window grows with offset,
    # window width shrinks relative to it)
    "window_0.5_w0.2": "least(1.0D, greatest(-1.0D, 0.5D + 0.10D * CAST(x AS DOUBLE)))",
    "window_0.7_w0.1": "least(1.0D, greatest(-1.0D, 0.7D + 0.05D * CAST(x AS DOUBLE)))",
    "window_0.9_w0.1": "least(1.0D, greatest(-1.0D, 0.9D + 0.05D * CAST(x AS DOUBLE)))",
}


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("khronus-drift-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators.pq import (
        ivf_pq_build_index,
        ivf_pq_encode,
        ivf_pq_rerank_topk_indexed,
    )
    from khronus_spark.operators.quantize import (
        embedding_dim_stats,
        embedding_drift_flags,
    )
    from khronus_spark.operators.similarity import anisotropic_corpus
    from khronus_spark.streaming.ann import _reseeded_train_view

    tmp = tempfile.mkdtemp(prefix="drift_sweep_")
    corpus = anisotropic_corpus(spark, 600, dim=64)
    corpus.where("vec_id < 400").write.parquet(f"{tmp}/A")
    A = spark.read.parquet(f"{tmp}/A")
    stats_A = embedding_dim_stats(A)

    def l2_truth(vectors, probe_vecs, k):
        pairs = vectors.alias("e").join(
            F.broadcast(probe_vecs.alias("p")),
            F.col("e.vec_id") != F.col("p.probe_id"),
        )
        d2 = F.expr(
            "aggregate(zip_with(p.embedding, e.embedding, (a,b) -> "
            "CAST(a-b AS DOUBLE)*CAST(a-b AS DOUBLE)), 0.0D, "
            "(acc,x) -> acc+x)"
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.col("_d2").asc(), F.col("neighbor_id").asc()
        )
        return (
            pairs.select(
                "probe_id",
                F.col("e.vec_id").alias("neighbor_id"),
                d2.alias("_d2"),
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("probe_id", "neighbor_id")
        )

    def recall(truth_rows, res):
        tset, got = {}, {}
        for r in truth_rows:
            tset.setdefault(r.probe_id, set()).add(r.neighbor_id)
        for r in res.collect():
            got.setdefault(r.probe_id, set()).add(r.neighbor_id)
        per = [len(tset[p] & got.get(p, set())) / len(tset[p]) for p in tset]
        return round(sum(per) / len(per), 3)

    out = {}
    for name, expr in DRIFTS.items():
        corpus.where("vec_id >= 400").select(
            "vec_id",
            F.expr(
                f"transform(embedding, x -> CAST({expr} AS FLOAT))"
            ).alias("embedding"),
        ).write.mode("overwrite").parquet(f"{tmp}/B_{name}")
        B = spark.read.parquet(f"{tmp}/B_{name}")
        allv = A.unionByName(B)
        probes = list(range(400, 410))
        pv = B.where(F.col("vec_id").isin(probes)).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        truth_rows = l2_truth(allv, pv, 5).collect()
        flagged = (
            embedding_drift_flags(stats_A, embedding_dim_stats(B))
            .where("drifted")
            .count()
        )

        def r_at(books, coded, cents):
            return recall(
                truth_rows,
                ivf_pq_rerank_topk_indexed(
                    books, coded, cents, pv, allv,
                    n_neighbors=5, n_candidates=30,
                ),
            )

        # stale: books trained on A only, drifted batch add()ed
        bA, cA, ceA = ivf_pq_build_index(A)
        stale = r_at(bA, cA.unionByName(ivf_pq_encode(B, bA, ceA)), ceA)
        # naive retrain over the union (vec_id-ordered init)
        bN, cN, ceN = ivf_pq_build_index(allv)
        naive = r_at(bN, cN, ceN)
        # reseeded retrain (the refresh path's training view)
        bR, cR, ceR = ivf_pq_build_index(
            allv, train_frame=_reseeded_train_view(allv, 16)
        )
        reseeded = r_at(bR, cR, ceR)
        out[name] = {
            "dims_flagged": flagged,
            "recall5_stale": stale,
            "recall5_naive_retrain": naive,
            "recall5_reseeded_retrain": reseeded,
        }
        print(name, out[name], flush=True)

    art = Path(_REPO) / "sweeps" / "latest"
    art.mkdir(parents=True, exist_ok=True)
    (art / "drift_sweep.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({"metric": "drift sweep recall@5", "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Matryoshka retrieval: measured recall/cost tradeoff across prefix
widths (round 11 — the operator ships with numbers, not claims).

For prefix widths {8, 16, 32, 64} over the 64-dim anisotropic corpus
(variance front-loaded by construction — the realistic MRL-like case)
and, as the adversarial contrast, the same corpus with its dimensions
REVERSED (variance back-loaded — the case prefix retrieval is WRONG
for), measure:

- recall@5 of `matryoshka_rerank_topk` against exact full-width L2
  ground truth (C=30 candidates, the registry entry's sizing);
- the quantized-scan cost proxy: LUT adds per corpus code = sub per
  code, and codebook rows = sub*k — both linear in prefix subspaces,
  so cost ratio vs full width is simply prefix/64 at fixed subdim.

Expectation: on the front-loaded corpus recall approaches the
full-width composition's at a fraction of the scan work; on the
reversed corpus small prefixes crater — the sweep pins BOTH
directions so the operator's docstring claim ("recall is what MRL
training optimizes; non-MRL corpora get whatever the first
coordinates hold") is a measurement.

Writes sweeps/latest/matryoshka_sweep.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N = 600
PROBES = list(range(400, 410))
K_NEIGHBORS = 5
C = 30
PREFIXES = [8, 16, 32, 64]


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("matryoshka-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators.pq import matryoshka_rerank_topk
    from khronus_spark.operators.similarity import anisotropic_corpus

    import tempfile

    tmp = tempfile.mkdtemp(prefix="matryoshka_sweep_")
    anisotropic_corpus(spark, N, dim=64).write.parquet(f"{tmp}/fwd")
    fwd = spark.read.parquet(f"{tmp}/fwd")
    fwd.select(
        "vec_id", F.expr("reverse(embedding)").alias("embedding")
    ).write.parquet(f"{tmp}/rev")
    rev = spark.read.parquet(f"{tmp}/rev")

    def l2_truth(vectors, pv):
        pairs = vectors.alias("e").join(
            F.broadcast(pv.alias("p")),
            F.col("e.vec_id") != F.col("p.probe_id"),
        )
        d2 = F.expr(
            "aggregate(zip_with(p.embedding, e.embedding, (a,b) -> "
            "CAST(a-b AS DOUBLE)*CAST(a-b AS DOUBLE)), 0.0D, (acc,x) -> acc+x)"
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
            .where(F.col("rn") <= K_NEIGHBORS)
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

    results = {"n": N, "probes": len(PROBES), "k": K_NEIGHBORS,
               "candidates": C, "corpora": {}}
    for tag, corpus in (("variance_front_loaded", fwd),
                        ("variance_back_loaded_reversed", rev)):
        pv = corpus.where(F.col("vec_id").isin(PROBES)).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        truth_rows = l2_truth(corpus, pv).collect()
        rows = []
        for p in PREFIXES:
            sub = 4  # fixed subquantizer count: subdim shrinks with p
            t0 = time.perf_counter()
            res = matryoshka_rerank_topk(
                corpus, PROBES, K_NEIGHBORS, n_candidates=C,
                prefix_dims=p, sub=sub, k=8, iters=1,
            )
            rec = recall(truth_rows, res)
            wall = round(time.perf_counter() - t0, 3)
            rows.append(
                {
                    "prefix_dims": p,
                    "recall_at_5": rec,
                    "scan_cost_ratio_vs_full": round(p / 64, 3),
                    "wall": wall,
                }
            )
            print(json.dumps({"corpus": tag, **rows[-1]}), flush=True)
        results["corpora"][tag] = rows

    out = Path(_REPO) / "sweeps" / "latest"
    out.mkdir(parents=True, exist_ok=True)
    (out / "matryoshka_sweep.json").write_text(
        json.dumps(results, indent=1) + "\n"
    )
    print(f"wrote {out / 'matryoshka_sweep.json'}")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""IVF sizing on a HARD corpus (round-8 verdict directive 6).

The round-8 `ivf_size_for_recall` evidence ran on the jitter-replicated
gate corpus, whose near-neighborhoods are easy (tight clones — any
probed list contains the clones). This sweep re-runs the sizing on a
corpus built to make recall GENUINELY degrade at low nprobe:

- ANISOTROPIC FILAMENT CLUSTERS: points lie along one stretched axis
  per cluster (stretch ~20x the off-axis spread). k-means carves
  isotropic cells, so a filament is chopped into several cells and a
  probe near a chop boundary has true nearest neighbors in the
  ADJACENT cell — exactly the failure mode nprobe=1 cannot see.
- UNIFORM NOISE FLOOR: a fraction of points uniform in [-1,1]^dim,
  whose true top-k are far-flung across every cell.

Everything is deterministic (xxhash64-derived pseudo-randoms keyed by
(vec_id, dim, salt); Irwin-Hall sum-of-3-uniforms as the
pseudo-Gaussian), so the sweep is reproducible bit-for-bit.

Output: one JSON line with the FULL measured grid (median recall@k +
measured scanned rows per config), the config the helper derives at
the target, and the refusal proof on a grid restricted to the failing
configs. The done-criterion from the verdict: at least one grid config
FAILS the target here (on the easy corpus every config passed), and
the helper sizes past it or refuses. Paste into ROUND9_NOTES.md.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_POINTS = 20_000
DIM = 16
N_TRUE_CLUSTERS = 8
NOISE_PM = 200  # 20% uniform noise floor
N_PROBES = 40
K = 3
TARGET_BP = 8000


def hard_anisotropic_corpus(spark, n, dim, n_true, noise_pm):
    """(vec_id, embedding float[dim]) — filament clusters + noise."""
    from pyspark.sql import functions as F

    # cluster id and its stretch axis are hash-derived per point/cluster;
    # coordinates: center[c,d] in [-0.6,0.6], on-axis spread 0.45,
    # off-axis 0.02, Irwin-Hall(3) pseudo-Gaussian in [-1,1]
    expr = f"""
    transform(sequence(0, {dim - 1}), d -> CAST(
      CASE WHEN pmod(xxhash64(vec_id, 9991), 1000) < {noise_pm}
        THEN (pmod(xxhash64(vec_id, d, 7777), 2000001) / 1000000.0D) - 1.0D
        ELSE least(1.0D, greatest(-1.0D,
          ((pmod(xxhash64(pmod(xxhash64(vec_id, 3331), {n_true}), d, 551),
                 1200001) / 1000000.0D) - 0.6D)
          + (CASE WHEN d = pmod(
                 xxhash64(pmod(xxhash64(vec_id, 3331), {n_true}), 919),
                 {dim})
             THEN 0.45D ELSE 0.02D END)
            * ((pmod(xxhash64(vec_id, d, 11), 1000)
               + pmod(xxhash64(vec_id, d, 12), 1000)
               + pmod(xxhash64(vec_id, d, 13), 1000)) / 1500.0D - 1.0D)
        ))
      END AS FLOAT))
    """
    return (
        spark.range(n)
        .withColumnRenamed("id", "vec_id")
        .withColumn("embedding", F.expr(expr))
    )


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("khronus-ivf-hard-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators.similarity import ivf_size_for_recall

    corpus = hard_anisotropic_corpus(
        spark, N_POINTS, DIM, N_TRUE_CLUSTERS, NOISE_PM
    ).localCheckpoint(eager=True)
    probe_ids = list(range(N_PROBES))

    stats: dict = {}
    try:
        chosen = ivf_size_for_recall(
            corpus,
            probe_ids,
            k=K,
            target_recall_bp=TARGET_BP,
            n_clusters_grid=(8, 16, 32),
            nprobe_grid=(1, 2, 4, 8),
            stats=stats,
        )
        refused = None
    except ValueError as exc:
        chosen, refused = None, str(exc)

    failing = {
        name: g["median_recall_bp"]
        for name, g in stats.get("grid", {}).items()
        if g["median_recall_bp"] < TARGET_BP
    }

    # refusal proof: restrict the grid to nprobe=1 (the configs the
    # hard corpus defeats); the helper must refuse, not under-deliver
    refusal_stats: dict = {}
    try:
        ivf_size_for_recall(
            corpus,
            probe_ids,
            k=K,
            target_recall_bp=TARGET_BP,
            n_clusters_grid=(8, 16, 32),
            nprobe_grid=(1,),
            stats=refusal_stats,
        )
        restricted_refused = None
    except ValueError as exc:
        restricted_refused = str(exc)

    print(
        json.dumps(
            {
                "metric": "ivf_size_for_recall on hard anisotropic corpus",
                "n_points": N_POINTS,
                "dim": DIM,
                "true_clusters": N_TRUE_CLUSTERS,
                "noise_pm": NOISE_PM,
                "k": K,
                "target_recall_bp": TARGET_BP,
                "grid": stats.get("grid"),
                "n_failing_configs": len(failing),
                "failing_configs": failing,
                "chosen": chosen,
                "full_grid_refused": refused,
                "nprobe1_grid": refusal_stats.get("grid"),
                "nprobe1_refusal": restricted_refused,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

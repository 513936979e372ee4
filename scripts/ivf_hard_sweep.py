#!/usr/bin/env python
"""IVF sizing on HARD corpora (round-8 verdict directive 6).

The round-8 `ivf_size_for_recall` evidence ran on the jitter-replicated
gate corpus, whose near-neighborhoods are easy (tight clones — any
probed list contains the clones). This sweep re-runs the sizing on
corpora built to make recall GENUINELY degrade at low nprobe, both
from `similarity.anisotropic_corpus` (deterministic, xxhash64-derived,
reproducible bit-for-bit):

- "noise" (dim 32, 100% uniform in [-1,1]^32): the
  distance-concentration regime — true cosine neighbors are barely
  closer than random points, so they scatter across k-means cells and
  low-nprobe recall collapses (measured 0 bp at c16_p1 in the 3k-point
  test pin). The textbook IVF-hard case.
- "mixed" (dim 32, anisotropic filaments + 20% noise floor): filament
  probes keep tight local neighborhoods (easy), noise probes are hard
  — shows how a majority-easy corpus hides the failing tail in the
  MEDIAN, which is itself worth knowing when choosing the target
  statistic.

Probes sit OUTSIDE the k-means init-seed range: the round-9
self-caught seed-probe bias (seeds measure 10000 bp where unbiased
probes measure 0) is refused by the helper itself.

Output: one JSON line per corpus with the FULL measured grid, the
config the helper derives at the target (or its refusal), and the
refusal proof on an nprobe=1-only grid. Done-criterion from the
verdict: at least one grid config FAILS the target on the hard corpus
and the helper sizes past it or refuses. Paste into ROUND9_NOTES.md.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_POINTS = 20_000
N_PROBES = 40
K = 3
TARGET_BP = 8000
CORPORA = {
    # name: (dim, n_true, noise_pm)
    "noise": (32, 8, 1000),
    "mixed": (32, 8, 200),
}


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

    from khronus_spark.operators.similarity import (
        anisotropic_corpus,
        ivf_size_for_recall,
    )

    probe_ids = list(range(100, 100 + N_PROBES))  # outside the seed range

    for name, (dim, n_true, noise_pm) in CORPORA.items():
        corpus = anisotropic_corpus(
            spark, N_POINTS, dim=dim, n_true=n_true, noise_pm=noise_pm
        ).localCheckpoint(eager=True)

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
            g: s["median_recall_bp"]
            for g, s in stats.get("grid", {}).items()
            if s["median_recall_bp"] < TARGET_BP
        }

        # refusal proof: nprobe=1 only — the helper must refuse rather
        # than under-deliver if every such config fails
        try:
            ivf_size_for_recall(
                corpus,
                probe_ids,
                k=K,
                target_recall_bp=TARGET_BP,
                n_clusters_grid=(16, 32),
                nprobe_grid=(1,),
            )
            restricted_refused = None
        except ValueError as exc:
            restricted_refused = str(exc)

        print(
            json.dumps(
                {
                    "metric": f"ivf_size_for_recall on hard corpus [{name}]",
                    "n_points": N_POINTS,
                    "dim": dim,
                    "true_clusters": n_true,
                    "noise_pm": noise_pm,
                    "k": K,
                    "target_recall_bp": TARGET_BP,
                    "grid": stats.get("grid"),
                    "n_failing_configs": len(failing),
                    "failing_configs": failing,
                    "chosen": chosen,
                    "full_grid_refused": refused,
                    "nprobe1_refusal": restricted_refused,
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()

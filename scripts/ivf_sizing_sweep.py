#!/usr/bin/env python
"""Does sizing-on-a-sample generalize? The 100 TB story of
`ivf_size_for_recall` is: run the measured grid on a bounded
deterministic carve, then build ONE production index at the chosen
config and trust its recall. This sweep measures that trust on a
corpus grown past the gate scale:

- corpus: the sf0.1 embeddings replicated with deterministic integer
  jitter (vec_id-keyed, ±2% per coordinate — replicas are near but
  not identical, so neighborhoods stay meaningful);
- size on the `sample_mod` carve (probes restricted to the carve, as
  the helper enforces);
- evaluate recall@k of a FULL-corpus kmeans-IVF index built at the
  sampled config, against the full-corpus exact baseline, on probes
  both inside and outside the sizing carve.

Prints one JSON line per (corpus size, sample_mod). The claim being
tested: full-corpus median recall at the sampled config stays at or
above the sizing target (the config generalizes), while the scanned
fraction stays in the helper's measured band.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from statistics import median

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = [4, 10]
SAMPLE_MODS = [5, 10]
TARGET_BP = 8000
K = 3


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from khronus_spark.operators import similarity as sim
    from khronus_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ivf-sizing-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF_DIR, "embeddings")
    n_base = base.count()
    dim = len(base.select("embedding").first()[0])

    jitter = (
        "transform(embedding, (x, i) -> CAST(x * (1.0 + "
        "CAST(pmod(xxhash64(vec_id, i, 41), 41) - 20 AS DOUBLE) / 1000.0) "
        "AS FLOAT))"
    )

    for reps in REPLICAS:
        parts = None
        for r in range(reps):
            c = base.select(
                (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
                "embedding",
            )
            parts = c if parts is None else parts.unionAll(c)
        emb = parts.select(
            "vec_id", F.expr(jitter).alias("embedding")
        ).localCheckpoint(eager=True)
        n = n_base * reps

        for mod in SAMPLE_MODS:
            probes_in = [(100 + i) * mod for i in range(10)]  # in-carve, non-seed
            t0 = time.perf_counter()
            cfg = sim.ivf_size_for_recall(
                emb,
                probes_in,
                k=K,
                target_recall_bp=TARGET_BP,
                sample_mod=mod,
            )
            t_size = round(time.perf_counter() - t0, 2)

            # production: ONE full-corpus index at the sampled config,
            # recall on carve-internal AND carve-external probes
            cents, assign = sim.ivf_kmeans_build_index(
                emb, cfg["n_clusters"], cfg["iters"]
            )
            cents = cents.localCheckpoint(eager=False)
            assign = assign.localCheckpoint(eager=False)
            probes_out = [i * mod + 1 for i in range(10)]  # outside
            rows = sim.ann_recall_at_k(
                emb,
                probes_in + probes_out,
                K,
                include=(),
                extra_methods={
                    "full": sim.ivf_kmeans_topk_indexed(
                        emb,
                        cents,
                        assign,
                        probes_in + probes_out,
                        K,
                        cfg["nprobe"],
                    )
                },
            ).collect()
            rec = {r["probe_id"]: r["recall_bp"] for r in rows}
            med_in = int(median(sorted(rec[p] for p in probes_in)))
            med_out = int(median(sorted(rec[p] for p in probes_out)))
            print(
                json.dumps(
                    {
                        "n_vectors": n,
                        "sample_mod": mod,
                        "sized_config": cfg,
                        "sizing_wall_s": t_size,
                        "full_median_recall_bp_carve_probes": med_in,
                        "full_median_recall_bp_fresh_probes": med_out,
                        "generalizes": med_in >= TARGET_BP
                        and med_out >= TARGET_BP,
                    }
                ),
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()

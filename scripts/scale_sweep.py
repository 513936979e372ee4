#!/usr/bin/env python
"""Cross-N wall-clock scaling of the flagship scale paths.

The bench pins per-round walls at ONE size (sf0.1: 5k docs / 2k
vectors / 100k events); this sweep measures how those walls GROW —
the question the 100 TB story actually turns on. For each operator,
three corpus sizes a factor of 4 apart (largest = 64x the bench's
documents table), warm-run timing, and the fitted log-log exponent
alpha between consecutive sizes: wall ≈ c·N^alpha, so alpha ≈ 1 is
the linear scaling the plan audits claim (map-only passes +
map-side-combinable aggregates + bounded shuffles), and a
superlinear alpha is a regression canary no single-size bench can
see (e.g. losing the LSH star cap re-introduces quadratic bucket
pairs — alpha would read ~2 on the dedup row).

Swept paths:
- minhash LSH candidate pairs (the dedup flagship: map-only
  signatures, ONE (band, bucket) shuffle, star-capped pair expansion)
  over synthetic documents with planted duplicate clusters,
- IVF-PQ index build (k-means on a sampled train slice + one encode
  pass) and ADC query behind the built index (broadcast LUTs, routed
  candidate scan) over synthetic 64-dim embeddings,
- exact-counts histogram rollup at 30 s resolution (the 100 TB exact
  path: bounded per-bucket state) over synthetic measurements.

All corpora are deterministic xxhash64 expressions — no files, no RNG.
Writes sweeps/latest/scale_sweep.json.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SIZES = {
    "dedup_minhash_lsh": [20_000, 80_000, 320_000],
    "ivfpq_build": [25_000, 100_000, 400_000],
    "ivfpq_query": [25_000, 100_000, 400_000],
    "rollup_hist_counts_30s": [250_000, 1_000_000, 4_000_000],
}


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.functions.summary import histogram_summary
    from khronus_spark.operators.dedup import minhash_lsh_candidates
    from khronus_spark.operators.pq import (
        ivf_pq_build_index,
        ivf_pq_topk_indexed,
    )

    def docs(n: int):
        # every 37th doc repeats an early doc's text: planted dup
        # clusters so the LSH actually finds pairs at every size
        return spark.range(n).selectExpr(
            "id AS doc_id",
            "CASE WHEN id % 37 = 0 THEN pmod(id, 997) ELSE id END AS _base",
        ).selectExpr(
            "doc_id",
            "concat_ws(' ', transform(sequence(1, 60), "
            "i -> concat('w', CAST(pmod(xxhash64(_base, i), 800) AS STRING))"
            ")) AS text",
        )

    def vecs(n: int):
        return spark.range(n).selectExpr(
            "id AS vec_id",
            "transform(sequence(0, 63), d -> CAST("
            "(pmod(xxhash64(id, d), 2001) - 1000) / 1000.0D AS FLOAT"
            ")) AS embedding",
        )

    def meas(n: int):
        # value is LONG: the engine's measurement domain (khronus
        # stores longs; the HDR rank-walk's state is typed to it)
        return spark.range(n).selectExpr(
            "concat('m', CAST(pmod(id, 50) AS STRING)) AS metric",
            "CAST(1704067200000 + pmod(id * 37, 3600000) AS LONG) AS ts_ms",
            "CAST(pmod(xxhash64(id), 10000) AS LONG) AS value",
        )

    def timed(thunk) -> tuple[float, int]:
        t0 = time.time()
        rows = thunk()
        return time.time() - t0, int(rows)

    results: dict[str, dict] = {}

    def sweep(name: str, make_thunk) -> None:
        walls, rows_out = [], []
        for n in SIZES[name]:
            thunk = make_thunk(n)
            thunk()  # warm at EVERY size: JVM/codegen warmup otherwise
            # drifts across the sweep and poisons the fitted slope
            w, r = timed(thunk)
            walls.append(round(w, 3))
            rows_out.append(r)
        alphas = [
            round(
                math.log(walls[i + 1] / walls[i])
                / math.log(SIZES[name][i + 1] / SIZES[name][i]),
                3,
            )
            for i in range(len(walls) - 1)
        ]
        results[name] = {
            "n": SIZES[name],
            "wall_sec": walls,
            "rows_out": rows_out,
            "alpha": alphas,
        }
        print(name, results[name], flush=True)

    sweep(
        "dedup_minhash_lsh",
        lambda n: lambda: minhash_lsh_candidates(docs(n)).count(),
    )

    # build: train on the vec_id % 20 slice (the FAISS train/add
    # split — centroid quality saturates far below corpus size), then
    # every vector encodes; count() on coded forces the full encode
    def mk_build(n: int):
        def thunk():
            books, coded, cents = ivf_pq_build_index(
                vecs(n), stride=max(50, n // 400), sub=4, k=8, iters=1,
                train_sample_mod=20,
            )
            return coded.count()

        return thunk

    sweep("ivfpq_build", mk_build)

    def mk_query(n: int):
        v = vecs(n)
        books, coded, cents = ivf_pq_build_index(
            v, stride=max(50, n // 400), sub=4, k=8, iters=1,
            train_sample_mod=20,
        )
        books = books.localCheckpoint()
        coded = coded.localCheckpoint()
        cents = cents.localCheckpoint()
        probes = v.where("vec_id < 8").selectExpr(
            "vec_id AS probe_id", "embedding"
        )

        def thunk():
            return ivf_pq_topk_indexed(
                books, coded, cents, probes, n_neighbors=5, nprobe=2,
                sub=4, k=8,
            ).count()

        return thunk

    sweep("ivfpq_query", mk_query)

    sweep(
        "rollup_hist_counts_30s",
        lambda n: lambda: histogram_summary(
            meas(n), 30_000, exact_counts=True
        ).count(),
    )

    out = {
        "metric": "cross-N wall scaling (alpha ~ 1 = linear)",
        "note": (
            "alpha = log-log slope between consecutive sizes; the "
            "largest corpora are 64x (docs) / 200x (vectors) / 40x "
            "(events) the sf0.1 bench tables. ivfpq_query's candidate "
            "scan grows with the routed lists (n/stride sizing keeps "
            "lists bounded), so its alpha reflects the scan, not the "
            "probe count."
        ),
        "results": results,
    }
    dest = Path(_REPO) / "sweeps" / "latest"
    dest.mkdir(parents=True, exist_ok=True)
    (dest / "scale_sweep.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

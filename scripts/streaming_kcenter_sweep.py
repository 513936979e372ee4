#!/usr/bin/env python
"""Streaming vs batch k-center: wall + coverage at the same center
budget. Batch Gonzalez re-scans the corpus m-1 times; the doubling
fold sees each vector ONCE (per chunk: one broadcast-assign pass +
admits only while the scale is unsettled) — the shape that matters
when the corpus arrives as a stream and re-scanning is not an option.

Writes sweeps/latest/streaming_kcenter_sweep.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N = 20000
M = 8
N_CHUNKS = 10


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("streaming-kcenter-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    from khronus_spark.operators.coreset import (
        coreset_assign,
        kcenter_select,
    )
    from khronus_spark.operators.similarity import anisotropic_corpus
    from khronus_spark.streaming.coreset import _fold_batch

    tmp = tempfile.mkdtemp(prefix="skc_sweep_")
    anisotropic_corpus(spark, N, dim=64).write.parquet(f"{tmp}/c")
    emb = spark.read.parquet(f"{tmp}/c")
    emb.count()

    def radius(center_ids):
        sel = spark.createDataFrame(
            [(int(v),) for v in center_ids], "vec_id long"
        )
        return int(
            coreset_assign(emb, sel).agg(F.max("d2")).collect()[0][0]
        )

    # streaming: fold the corpus chunk by chunk (the _fold_batch body
    # is exactly what each trigger runs; driving it directly keeps the
    # sweep measuring the FOLD, not parquet staging)
    chunk_n = N // N_CHUNKS
    t0 = time.perf_counter()
    centers, t2 = [], 0
    for i in range(N_CHUNKS):
        lo, hi = i * chunk_n, (i + 1) * chunk_n
        chunk = emb.where(f"vec_id >= {lo} AND vec_id < {hi}")
        centers, t2 = _fold_batch(spark, chunk, centers, t2, M)
    t_stream = time.perf_counter() - t0
    r_stream = radius([v for v, _ in centers])

    t0 = time.perf_counter()
    sel = kcenter_select(emb, m=M)
    ids = [r["vec_id"] for r in sel.collect()]
    t_batch = time.perf_counter() - t0
    r_batch = radius(ids)

    out = {
        "n": N,
        "m": M,
        "chunks": N_CHUNKS,
        "note": (
            "radius_ratio is the quality number: the doubling fold's "
            "guarantee bounds realized radius, not center count — on "
            "a noise-floor corpus where OPT(m) is close to OPT(1) the "
            "scale legitimately swallows the budget (few centers, "
            "radius still tight). Wall favors batch at this N because "
            "per-admit jobs dominate; the stream setting's point is "
            "the single look: batch Gonzalez needs the corpus STORED "
            "and re-scanned m-1 times, which a 100 TB stream does not "
            "have."
        ),
        "streaming": {
            "wall_sec": round(t_stream, 3),
            "centers": len(centers),
            "t2": int(t2),
            "realized_radius": r_stream,
            "corpus_passes": "1 (one look per vector)",
        },
        "batch_gonzalez": {
            "wall_sec": round(t_batch, 3),
            "centers": len(ids),
            "realized_radius": r_batch,
            "corpus_passes": M - 1,
        },
        "radius_ratio_stream_over_batch": round(r_stream / r_batch, 3),
        "wall_ratio_stream_over_batch": round(t_stream / t_batch, 3),
    }
    dest = Path(_REPO) / "sweeps" / "latest"
    dest.mkdir(parents=True, exist_ok=True)
    (dest / "streaming_kcenter_sweep.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()

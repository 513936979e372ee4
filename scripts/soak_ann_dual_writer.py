#!/usr/bin/env python
"""Streaming-ANN dual-writer soak (r11 verdict Next-round #6): the
refresh-race closure — rename-into-place landings, anti-join
carry-forward, post-swap re-lands, _SUCCESS-gated sweeps — under
SUSTAINED concurrent pressure instead of unit-test monkeypatches.

Shape (the SCD2-soak precedent): a guarded ingest stream runs
CONTINUOUSLY (processingTime trigger) while the drift-maintenance
daemon ticks on its own thread every TICK_SECONDS; every ingested
chunk is drifted, so verdicts keep flagging and heals keep firing
MID-INGEST. The standing-corpus mirror deliberately LAGS one chunk
behind the landing dir, so every refresh exercises the
sweep-everything default (the r11 covered_batches fix) against
batches its snapshot never saw.

Invariants asserted after every heal and at quiescence:
  1. ZERO VECTOR LOSS  — every vec_id ever landed is in the current
     generation's coded view (base + streamed),
  2. ZERO DUPLICATES   — each exactly once,
  3. fresh generations start with a clean drift log (self-resetting).

Writes sweeps/latest/ann_dual_writer_soak.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_BASE = 500
N_CHUNKS = 24
CHUNK = 100
TICK_SECONDS = 2.0
DROP_GAP_SECONDS = 4.0

# the drift shift the detector flags (the test suite's _DRIFT shape)
_DRIFT = (
    "transform(embedding, x -> "
    "CAST(least(1.0D, CAST(x AS DOUBLE) + 0.5D) AS FLOAT))"
)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ann-dual-writer-soak")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators.similarity import anisotropic_corpus
    from khronus_spark.streaming.ann import (
        read_drift_log,
        read_streamed_index,
        refresh_streamed_index,
        run_drift_maintenance,
        run_streaming_ivf_pq_add_guarded,
    )
    from khronus_spark.streaming.retrieval import resolve_generation_dir

    import tempfile

    tmp = tempfile.mkdtemp(prefix="ann_soak_")
    total = N_BASE + N_CHUNKS * CHUNK
    corpus = anisotropic_corpus(spark, total, dim=64)
    corpus.where(f"vec_id < {N_BASE}").write.parquet(f"{tmp}/A")
    A = spark.read.parquet(f"{tmp}/A")
    corpus.where(f"vec_id >= {N_BASE}").select(
        "vec_id", F.expr(_DRIFT).alias("embedding")
    ).write.parquet(f"{tmp}/D")
    D = spark.read.parquet(f"{tmp}/D")

    root = f"{tmp}/index"
    refresh_streamed_index(spark, root, A)
    vdir = f"{tmp}/standing"
    A.write.parquet(vdir)

    landing = f"{tmp}/landing"
    os.makedirs(landing, exist_ok=True)
    schema = A.select("vec_id", "embedding").schema
    stream = spark.readStream.schema(schema).parquet(landing)
    q = run_streaming_ivf_pq_add_guarded(
        stream, root, f"{tmp}/ck",
        trigger={"processingTime": "1 second"},
    )

    heals: list[str] = []
    thread, stop = run_drift_maintenance(
        spark,
        root,
        lambda: spark.read.parquet(vdir),
        interval_seconds=TICK_SECONDS,
        on_refresh=heals.append,
    )

    landed_upto = N_BASE
    checks = []
    t0 = time.perf_counter()
    try:
        for i in range(N_CHUNKS):
            lo, hi = N_BASE + i * CHUNK, N_BASE + (i + 1) * CHUNK
            chunk = D.where(f"vec_id >= {lo} AND vec_id < {hi}")
            stage = f"{tmp}/stage_{i}"
            chunk.coalesce(1).write.mode("overwrite").parquet(stage)
            for j, f_ in enumerate(sorted(os.listdir(stage))):
                if f_.endswith(".parquet"):
                    shutil.copy(f"{stage}/{f_}", f"{landing}/c{i}_{j}.parquet")
            landed_upto = hi
            # the standing mirror LAGS: chunk i lands in the mirror
            # only now (chunk i-1's heal refreshed without it, forcing
            # the sweep-everything carry to recover it)
            chunk.write.mode("append").parquet(vdir)
            time.sleep(DROP_GAP_SECONDS)
    finally:
        # drain the stream, then let the daemon run one final heal
        deadline = time.time() + 180
        while time.time() < deadline:
            done = {
                r["vec_id"]
                for r in read_streamed_index(spark, root)[1]
                .select("vec_id")
                .collect()
            }
            if len(done) >= landed_upto:
                break
            time.sleep(2)
        time.sleep(TICK_SECONDS * 3)  # final tick window
        stop.set()
        thread.join(timeout=60)
        q.stop()

    wall = time.perf_counter() - t0
    cur = resolve_generation_dir(root)
    ids = [
        r["vec_id"]
        for r in read_streamed_index(spark, root)[1]
        .select("vec_id")
        .collect()
    ]
    n_rows, n_distinct = len(ids), len(set(ids))
    lost = sorted(set(range(landed_upto)) - set(ids))[:10]
    dup = n_rows - n_distinct
    log = read_drift_log(spark, root)
    checks.append(
        {
            "generation": os.path.basename(cur),
            "rows": n_rows,
            "distinct": n_distinct,
            "expected": landed_upto,
            "lost_sample": lost,
            "duplicates": dup,
        }
    )
    ok = n_rows == n_distinct == landed_upto
    out = {
        "n_base": N_BASE,
        "n_chunks": N_CHUNKS,
        "chunk": CHUNK,
        "tick_seconds": TICK_SECONDS,
        "wall_sec": round(wall, 1),
        "heals": len(heals),
        "generations": heals,
        "final": checks[-1],
        "fresh_gen_drift_log_rows": (0 if log is None else log.count()),
        "pass": bool(ok),
    }
    dest = Path(_REPO) / "sweeps" / "latest"
    dest.mkdir(parents=True, exist_ok=True)
    (dest / "ann_dual_writer_soak.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(json.dumps(out, indent=2))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

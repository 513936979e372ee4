#!/usr/bin/env python
"""Per-cell vs global k-center: the wall-clock shape the composition
exists for (r11 verdict Next-round #4). Same TOTAL center budget both
ways on the same corpus:

- GLOBAL `kcenter_select(m=M)` runs M-1 sequential rounds, each one
  full map pass + argmax aggregate over the corpus.
- PER-CELL `kcenter_select_per_cell(m_per_cell=M/cells)` runs only
  m_per_cell-1 rounds — every cell advances in the same round — so the
  pass count is independent of how many cells (= how much corpus) there
  is. At 100 TB, cells scale with the corpus and m_per_cell stays
  small: the loop depth is CONSTANT where the global loop's grows with
  the center budget.

Also records the coverage quality both ways (realized radius via
coreset_assign) so the wall win is shown not to cost coverage.

Writes sweeps/latest/coreset_percell_sweep.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N = 4000
STRIDE = 100          # N/STRIDE = 40 cells
M_PER_CELL = 3        # -> 120 total centers
M_TOTAL = 120


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("coreset-percell-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    from khronus_spark.operators.coreset import (
        coreset_assign,
        kcenter_select,
        kcenter_select_per_cell,
    )
    from khronus_spark.operators.similarity import (
        anisotropic_corpus,
        ivf_assignments,
    )

    tmp = tempfile.mkdtemp(prefix="percell_sweep_")
    anisotropic_corpus(spark, N, dim=64).write.parquet(f"{tmp}/c")
    emb = spark.read.parquet(f"{tmp}/c")
    emb.count()  # warm the scan

    cells = ivf_assignments(emb, stride=STRIDE).withColumnRenamed(
        "centroid_id", "cell"
    )
    cells.write.parquet(f"{tmp}/cells")  # the standing IVF assignment
    cells = spark.read.parquet(f"{tmp}/cells")
    n_cells = cells.select("cell").distinct().count()

    t0 = time.perf_counter()
    pc = kcenter_select_per_cell(emb, cells, m_per_cell=M_PER_CELL)
    pc_rows = pc.count()
    t_pc = time.perf_counter() - t0
    r_pc = coreset_assign(emb, pc).agg(F.max("d2")).collect()[0][0]

    t0 = time.perf_counter()
    gl = kcenter_select(emb, m=M_TOTAL)
    gl_rows = gl.count()
    t_gl = time.perf_counter() - t0
    r_gl = coreset_assign(emb, gl).agg(F.max("d2")).collect()[0][0]

    out = {
        "n": N,
        "n_cells": n_cells,
        "m_per_cell": M_PER_CELL,
        "m_total": M_TOTAL,
        "per_cell": {
            "wall_sec": round(t_pc, 3),
            "rounds": M_PER_CELL - 1,
            "centers": pc_rows,
            "realized_radius": int(r_pc),
        },
        "global": {
            "wall_sec": round(t_gl, 3),
            "rounds": M_TOTAL - 1,
            "centers": gl_rows,
            "realized_radius": int(r_gl),
        },
        "speedup": round(t_gl / t_pc, 2),
        "radius_ratio_percell_over_global": round(r_pc / r_gl, 3),
    }
    dest = Path(_REPO) / "sweeps" / "latest"
    dest.mkdir(parents=True, exist_ok=True)
    (dest / "coreset_percell_sweep.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()

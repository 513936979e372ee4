#!/usr/bin/env python
"""A/B spark.sql.codegen.hugeMethodLimit (default 65535 vs HotSpot's
8000-byte JIT ceiling) on the bench slots whose whole-stage-codegen
methods exceed 8 KB bytecode (z-order rank tree, tokenizer walks) plus
codegen-heavy controls. Rationale: a generated method past HotSpot's
DontCompileHugeMethods limit runs INTERPRETED (~3.8 us/row measured on
the z-order cell projection); lowering Spark's own fallback threshold
to the JIT ceiling makes Spark split exactly those subtrees back into
small, JIT-able per-operator methods while leaving every other pipeline
fused. Scale-independent: the 8000-byte ceiling is a HotSpot property.

Usage: python scripts/huge_method_ab.py [runs]
Writes sweeps/r13/huge_method_ab.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SLOTS = [
    "zorder_layout",        # 511-branch rank IF-tree (~19.7 KB bytecode)
    "wordpiece_encode",     # greedy longest-match walk
    "unigram_encode",       # Viterbi DP walk
    "gopher_rules",         # rule battery (control: big but < 8 KB)
    "dup_ngram_5",          # gram pipeline control
    "tpch_q1",              # classic codegen control
]


def run_side(limit: str, runs: int, sf_dir: str, cpus: str) -> dict:
    import bench as bench_mod

    spark = bench_mod.make_session(
        cpus,
        app=f"huge-method-ab-{limit}",
        extra_conf={"spark.sql.codegen.hugeMethodLimit": limit},
    )
    try:
        slots, _ = bench_mod.build_slots(spark, sf_dir, cpus)
        picked = {k: slots[k] for k in SLOTS}
        for fn in picked.values():  # untimed warm-up
            fn()
        samples = {k: [] for k in picked}
        for _ in range(runs):
            for name, fn in picked.items():
                t0 = time.perf_counter()
                fn()
                samples[name].append(round(time.perf_counter() - t0, 3))
        return {k: statistics.median(v) for k, v in samples.items()} | {
            "_samples": samples
        }
    finally:
        spark.stop()


def main() -> None:
    import os

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # fixed order: default first, then 8000 — both sides pay one fresh
    # JVM + warm-up, so the comparison is same-host, same-state
    off = run_side("65535", runs, sf_dir, cpus)
    on = run_side("8000", runs, sf_dir, cpus)
    out = {
        "conf": "spark.sql.codegen.hugeMethodLimit",
        "runs": runs,
        "sf_dir": sf_dir,
        "median_65535": {k: off[k] for k in SLOTS},
        "median_8000": {k: on[k] for k in SLOTS},
        "ratio_8000_over_65535": {
            k: round(on[k] / off[k], 3) for k in SLOTS
        },
        "samples_65535": off["_samples"],
        "samples_8000": on["_samples"],
    }
    dest = Path(_REPO) / "sweeps" / "r13" / "huge_method_ab.json"
    dest.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: out[k] for k in ("median_65535", "median_8000",
                                          "ratio_8000_over_65535")},
                     indent=1))


if __name__ == "__main__":
    main()

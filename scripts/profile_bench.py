#!/usr/bin/env python
"""Per-slot bench profiler (r13 optimization round; guide §1).

Reuses bench.build_slots so it measures EXACTLY the driver's slots,
but instruments each with a job group to report wall seconds, job
count, stage count, task count, and JVM CPU seconds. One warm-up pass
precedes the measured pass (same methodology as bench.py).

Usage: python scripts/profile_bench.py [slot ...]   (default: all)
Writes sweeps/latest/profile.json and prints a sorted table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import bench as bench_mod

    spark = bench_mod.make_session(cpus, app="khronus-spark-profile")
    slots, jvm_cpu = bench_mod.build_slots(spark, sf_dir, cpus)

    only = set(sys.argv[1:])
    if only:
        slots = {k: v for k, v in slots.items() if k in only}

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm-up pass (untimed)
    for fn in slots.values():
        fn()

    out: dict[str, dict] = {}
    for name, fn in slots.items():
        group = f"profile-{name}"
        sc.setJobGroup(group, name)
        c0 = jvm_cpu()
        t0 = time.perf_counter()
        fn()
        wall = round(time.perf_counter() - t0, 3)
        cpu = round(jvm_cpu() - c0, 3)
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {
            "wall": wall,
            "cpu": cpu,
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
        }

    dest = Path(_REPO) / "sweeps" / "latest"
    dest.mkdir(parents=True, exist_ok=True)
    (dest / "profile.json").write_text(json.dumps(out, indent=1, sort_keys=True))

    print(f"{'slot':34s} {'wall':>7s} {'cpu':>7s} {'jobs':>5s} {'stg':>4s} {'tasks':>6s}")
    for name, m in sorted(out.items(), key=lambda kv: -kv[1]["wall"]):
        print(
            f"{name:34s} {m['wall']:7.3f} {m['cpu']:7.2f} "
            f"{m['jobs']:5d} {m['stages']:4d} {m['tasks']:6d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

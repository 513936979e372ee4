#!/usr/bin/env python
"""Scaling measurement for the record-linkage family.

Blocked ER verifies every within-block pair (quadratic in block size);
sorted-neighborhood verifies only each record's next w sort neighbors
(linear in block size). This sweep grows the part catalog by
replicating sf0.1 parts with per-copy id offsets and suffix-perturbed
names (each copy stays a near-dup of its original: 1-2 trailing edits,
so the verify step faces real match mass), then measures both
generators' wall time, candidate volume, and pair yield — plus the
sorted-neighborhood recall against the blocked-join ground truth.

Expectation at scale: blocked cost grows ~quadratically with the
replication factor (block sizes grow linearly), sorted-neighborhood
~linearly, recall roughly stable. Prints one JSON line per corpus
size; paste into the round notes.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = [1, 2, 4, 8]
WINDOW = 5
MAX_DIST = 2


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from khronus_spark.operators import linkage
    from khronus_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("linkage-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_name", "p_brand"
    )
    n_base = base.count()

    for reps in REPLICAS:
        # copy r keeps the name shape but appends a short per-copy
        # suffix: copies of one part stay within edit distance of each
        # other's truncations, and block membership (brand) is kept.
        parts = None
        for r in range(reps):
            c = base.select(
                (F.col("p_partkey") + F.lit(r * 10_000_000)).alias("p_partkey"),
                (
                    F.col("p_name")
                    if r == 0
                    else F.concat(F.col("p_name"), F.lit(" " + "x" * r))
                ).alias("p_name"),
                "p_brand",
            )
            parts = c if parts is None else parts.unionAll(c)
        parts = parts.localCheckpoint(eager=True)
        n = n_base * reps

        t0 = time.time()
        blocked = linkage.blocked_edit_pairs(
            parts, ["p_brand"], "p_name", "p_partkey", max_dist=MAX_DIST
        )
        n_blocked = blocked.count()
        t_blocked = time.time() - t0

        t0 = time.time()
        snm = linkage.sorted_neighbor_pairs(
            parts,
            ["p_brand"],
            "p_name",
            "p_partkey",
            window=WINDOW,
            max_dist=MAX_DIST,
        )
        n_snm = snm.count()
        t_snm = time.time() - t0

        # the round-6 fix: forward + reverse sort passes unioned
        t0 = time.time()
        snm2 = linkage.sorted_neighbor_pairs_multipass(
            parts,
            ["p_brand"],
            "p_name",
            "p_partkey",
            window=WINDOW,
            max_dist=MAX_DIST,
        )
        n_snm2 = snm2.count()
        t_snm2 = time.time() - t0

        # recall: SNM pairs (unordered) found among blocked ground truth
        b = blocked.select(
            F.least("id_a", "id_b").alias("x"),
            F.greatest("id_a", "id_b").alias("y"),
        ).distinct()

        def _recall(pairs):
            s = pairs.select(
                F.least("id_a", "id_b").alias("x"),
                F.greatest("id_a", "id_b").alias("y"),
            )
            n_common = s.distinct().join(b, ["x", "y"]).count()
            return round(n_common / max(n_blocked, 1), 4)

        print(
            json.dumps(
                {
                    "n_parts": n,
                    "blocked_pairs": n_blocked,
                    "blocked_s": round(t_blocked, 2),
                    "snm_pairs": n_snm,
                    "snm_s": round(t_snm, 2),
                    "snm_recall": _recall(snm),
                    "snm2_pairs": n_snm2,
                    "snm2_s": round(t_snm2, 2),
                    "snm2_recall": _recall(snm2),
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()

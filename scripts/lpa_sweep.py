#!/usr/bin/env python
"""Scaling + breakup measurement for label-propagation communities.

Grows the part catalog by replication (the linkage_sweep fixture:
suffix-perturbed copies stay near-dups, block membership kept), builds
the edge list with the LINEAR sorted-neighborhood generator so the
graph itself can grow past what blocked verification affords, then
runs 4-round LPA and connected components over the same edges.

Two questions per size: (1) wall per LPA round vs edge count (the
per-round cost is one co-partitioned join + two map-side-combinable
aggregates — expected ~linear in edges); (2) the breakup effect —
community count vs component count and the largest cluster under each
(replication inflates true cluster sizes; hub/bridge edges from the
suffix truncations chain clusters, which components absorb and LPA
resists). Prints one JSON line per size; paste into round notes.
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
ITERS = 4


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from khronus_spark.operators import linkage
    from khronus_spark.operators.components import (
        connected_components,
        lpa_communities,
    )
    from khronus_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("lpa-sweep")
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

        edges = linkage.sorted_neighbor_pairs(
            parts, ["p_brand"], "p_name", "p_partkey",
            window=WINDOW, max_dist=MAX_DIST,
        ).localCheckpoint(eager=True)
        n_edges = edges.count()

        t0 = time.time()
        lpa = lpa_communities(edges, "id_a", "id_b", iters=ITERS)
        lpa_stats = lpa.agg(
            F.countDistinct("community").alias("n"),
            F.max("community_size").alias("mx"),
        ).collect()[0]
        t_lpa = time.time() - t0

        t0 = time.time()
        comp = connected_components(
            edges.selectExpr("id_a AS src", "id_b AS dst")
        )
        comp_sizes = comp.groupBy("component_id").count()
        comp_stats = comp_sizes.agg(
            F.count(F.lit(1)).alias("n"), F.max("count").alias("mx")
        ).collect()[0]
        t_cc = time.time() - t0

        print(
            json.dumps(
                {
                    "n_parts": n_base * reps,
                    "n_edges": n_edges,
                    "lpa_s": round(t_lpa, 2),
                    "lpa_s_per_round": round(t_lpa / ITERS, 2),
                    "n_communities": lpa_stats["n"],
                    "max_community": lpa_stats["mx"],
                    "cc_s": round(t_cc, 2),
                    "n_components": comp_stats["n"],
                    "max_component": comp_stats["mx"],
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()

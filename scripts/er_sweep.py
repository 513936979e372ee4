#!/usr/bin/env python
"""Two-axis scaling sweep for the entity-resolution arc (round-10
verdict Next-round #7): separate the NODES axis from the EDGES axis
the way the tokenizer sweep separated distinct words from corpus
rows, and cover the survivorship join too.

`er_assignment_build` composes three stages with different scaling
laws, and a single decade sweep conflates them:

- blocked_edit_pairs: quadratic in BLOCK size, linear in block count;
- connected_components (large-star/small-star to checksum fixpoint):
  per-round cost ~linear in current edges, rounds ~O(log n);
- golden_records (survivorship): one melted scan + per-entity windows
  — linear in records, independent of how many edges built the
  assignment.

Axes, both from the sf0.1 part catalog (deterministic — replication
and suffix perturbation only, no RNG):

- NODES axis: replicate the catalog R∈{1,2,4}× with the BLOCKING KEY
  (p_brand) salted per replica, so replicas never share a block:
  block sizes and per-node edge structure stay EXACTLY constant while
  nodes and edges grow linearly. Expectation: every stage ~linear in
  R; CC rounds flat.
- EDGES axis: fixed ~T total rows; cluster multiplicity m∈{2,4,8} —
  T/m originals, each with m suffix-perturbed copies (pairwise edit
  distance ≤2, same brand/block), so edges ≈ T·(m−1)/2 grow with m
  while nodes stay fixed. Expectation: pairs + CC walls track edges;
  survivorship wall stays FLAT (it never sees edges, only records and
  the assignment).

Writes sweeps/latest/er_sweep.json (one record per config: stage
walls + row counts); the round process copies it to sweeps/r{N}/.
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
NODE_REPLICAS = [1, 2, 4]
EDGE_MULTIPLICITIES = [2, 4, 8]
EDGE_AXIS_ROWS = 20_000


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("er-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from khronus_spark.operators import components as components_ops
    from khronus_spark.operators import linkage as linkage_ops
    from khronus_spark.sources.tables import load_table

    def run_df(df):
        df.write.format("noop").mode("overwrite").save()

    part = (
        load_table(spark, SF_DIR, "part")
        .select("p_partkey", "p_name", "p_brand")
        .cache()
    )
    n_base = part.count()

    def node_axis_table(r: int):
        """R disjoint copies: brand salted per replica (replicas never
        share a block), ids offset — per-node structure constant."""
        out = None
        for i in range(r):
            rep = part.select(
                (F.col("p_partkey") + F.lit(i * 10_000_000)).alias("p_partkey"),
                "p_name",
                F.concat(F.col("p_brand"), F.lit(f"#{i}")).alias("p_brand"),
            )
            out = rep if out is None else out.unionByName(rep)
        return out

    # pairwise edit distance between any two suffixes is <= 2 (equal-
    # length single-char substitutions; vs the empty suffix: 2 inserts)
    _SUFFIX = ["", " a", " b", " c", " d", " e", " f", " g"]

    def edge_axis_table(m: int):
        """~EDGE_AXIS_ROWS rows as T/m originals x m near-dup copies,
        each original in its OWN synthetic block (brand = its partkey)
        so the natural within-brand near-dup mass of the catalog —
        which at 20k rows contributes ~220k edges and would swamp any
        planted signal — is suppressed entirely: edges are EXACTLY
        C(m,2) per cluster, i.e. T*(m-1)/2 total, while nodes stay
        fixed at ~T."""
        originals = part.where(
            F.col("p_partkey") <= EDGE_AXIS_ROWS // m
        )
        out = None
        for j in range(m):
            rep = originals.select(
                (F.col("p_partkey") * 100 + F.lit(j)).alias("p_partkey"),
                F.concat(F.col("p_name"), F.lit(_SUFFIX[j])).alias("p_name"),
                F.col("p_partkey").cast("string").alias("p_brand"),
            )
            out = rep if out is None else out.unionByName(rep)
        return out

    def measure(tag: str, table) -> dict:
        table = table.localCheckpoint()  # pin the input out of the timing
        n_rows = table.count()
        t0 = time.perf_counter()
        edges = linkage_ops.blocked_edit_pairs(
            table, ["p_brand"], "p_name", "p_partkey", max_dist=2
        ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        edges = edges.localCheckpoint()
        n_edges = edges.count()
        pairs_wall = round(time.perf_counter() - t0, 3)

        scratch = tempfile.mkdtemp(prefix="er_sweep_")
        t0 = time.perf_counter()
        components_ops.connected_components(edges).write.mode(
            "overwrite"
        ).parquet(scratch)
        cc_wall = round(time.perf_counter() - t0, 3)
        assignment = spark.read.parquet(scratch)
        n_assigned = assignment.count()
        n_entities = assignment.select("component_id").distinct().count()

        t0 = time.perf_counter()
        run_df(
            linkage_ops.golden_records(
                table, assignment, "p_partkey", ["p_name", "p_brand"]
            )
        )
        surv_wall = round(time.perf_counter() - t0, 3)
        rec = {
            "config": tag,
            "n_rows": n_rows,
            "n_edges": n_edges,
            "n_assigned": n_assigned,
            "n_entities": n_entities,
            "pairs_wall": pairs_wall,
            "cc_wall": cc_wall,
            "survivorship_wall": surv_wall,
        }
        print(json.dumps(rec), flush=True)
        return rec

    results = {"sf_base_rows": n_base, "node_axis": [], "edge_axis": []}
    # one untimed warm-up on the smallest shape (bench.py discipline)
    measure("warmup", node_axis_table(1))
    for r in NODE_REPLICAS:
        results["node_axis"].append(measure(f"nodes_x{r}", node_axis_table(r)))
    for m in EDGE_MULTIPLICITIES:
        results["edge_axis"].append(measure(f"edges_m{m}", edge_axis_table(m)))

    out_dir = Path(_REPO) / "sweeps" / "latest"
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "er_sweep.json").write_text(
        json.dumps(results, indent=1) + "\n"
    )
    print(f"wrote {out_dir / 'er_sweep.json'}")
    spark.stop()


if __name__ == "__main__":
    main()

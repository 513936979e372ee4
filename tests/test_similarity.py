"""IVF index semantics: assignment partitioning and the nprobe
recall/cost knob."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from khronus_spark.operators import similarity as sim
from khronus_spark.sources.tables import load_table

PROBES = list(range(5))
K = 3


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _result_set(df):
    return {(r["probe_id"], r["neighbor_id"]) for r in df.collect()}


def test_every_vector_in_exactly_one_list(emb):
    assign = sim.ivf_assignments(emb)
    n = emb.count()
    assert assign.count() == n
    assert assign.select("vec_id").distinct().count() == n


def test_probe_lists_size(emb):
    one = sim.ivf_probe_lists(emb, PROBES, nprobe=1)
    two = sim.ivf_probe_lists(emb, PROBES, nprobe=2)
    assert one.count() == len(PROBES)
    assert two.count() == 2 * len(PROBES)
    # nprobe=2 lists are a superset of nprobe=1 lists
    l1 = {(r["probe_id"], r["probe_centroid"]) for r in one.collect()}
    l2 = {(r["probe_id"], r["probe_centroid"]) for r in two.collect()}
    assert l1 <= l2


def test_nprobe_improves_or_preserves_recall(emb):
    exact = _result_set(sim.brute_force_topk(emb, PROBES, K))
    ivf1 = _result_set(sim.ivf_topk(emb, PROBES, K, nprobe=1))
    ivf2 = _result_set(sim.ivf_topk(emb, PROBES, K, nprobe=2))
    recall1 = len(exact & ivf1) / len(exact)
    recall2 = len(exact & ivf2) / len(exact)
    assert recall2 >= recall1
    assert len(ivf2) == len(PROBES) * K

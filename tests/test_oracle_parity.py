"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet,
then compare row count, schema width, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, colnames):
    """Sort columns by name, canonicalize values, return sorted rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        try:
            import decimal

            if isinstance(v, decimal.Decimal):
                return round(float(v), 9)
        except Exception:
            pass
        return v

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle_sf_dir, name):
    fn = QUERIES[name]
    sdf = fn(spark, oracle_sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if name not in ORACLES:
        # rows-only check, like the driver's weaker gate
        assert isinstance(spark_rows, list)
        return

    con = _duck_con(oracle_sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sn = _normalize(spark_rows, spark_cols)
    dn = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["series", "metric", "time", "value"]


def test_driver_window_covers_flagships():
    """The driver's gate checks only the first DRIVER_WINDOW entries of
    queries(); pin that every operator family has a representative there
    and that the priority list is exact and fully registered."""
    from khronus_spark.entry_queries import _PRIORITY, DRIVER_WINDOW

    names = list(QUERIES)
    assert len(_PRIORITY) == DRIVER_WINDOW
    assert names[:DRIVER_WINDOW] == _PRIORITY
    window = set(_PRIORITY)
    flagships = {
        # previously hash-failing rollup summaries
        "ts_counter_summary_5m", "ts_histogram_summary_1m",
        "ts_gauge_summary_30s", "ts_histogram_summary_1h", "ts_pregroup_5s",
        # one per LLM-pipeline / flagship family
        "corpus_curation", "dedup_components_minhash", "kmeans_embeddings",
        "approx_distinct_users_hll", "ann_cosine_topk", "ann_lsh_topk",
        "ann_ivf_kmeans_topk", "embedding_near_dup", "events_sessions_30m",
        "events_asof_signup", "media_features", "streaming_stateful_hist_1h",
        "ts_hdr_cascade_1h", "influx_from_materialized_store",
        "semantic_dedup", "dup_ngram_5",
        # composed LLM corpus-prep pipeline + the ops it chains
        "llm_corpus_prep", "decontamination_scan", "pack_sequences_512",
        "domain_mixture_sqrt", "corpus_vocabulary", "pii_source_profile",
    }
    assert flagships <= window
    # every windowed entry except the by-design rows-only one has an oracle
    assert [n for n in _PRIORITY if n not in ORACLES] == [
        "streaming_stateful_hist_1h"
    ]

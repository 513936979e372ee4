#!/usr/bin/env python
"""Capture .explain("formatted") output for bench slots (r13 deliverable).

Usage: python scripts/capture_plans.py <suffix> [slot ...]
Writes plans/r13/<slot>_<suffix>.txt for every DataFrame-producing slot
(build slots with side effects are profiled via scripts/profile_bench.py
instead; their plan story is job structure, not one explain).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def slot_frames(spark, sf_dir):
    """name -> zero-arg DataFrame builder for every df-producing bench
    slot (mirrors bench.build_slots' run_df(...) slots)."""
    from pyspark.sql import functions as F

    from khronus_spark import entry_queries as eq
    from khronus_spark.functions.summary import histogram_summary
    from khronus_spark.operators.clustering import (
        semantic_dedup as semantic_dedup_derived_k,
    )
    from khronus_spark.operators import coreset as coreset_ops
    from khronus_spark.operators import similarity as sim_ops
    from khronus_spark.operators import zorder as zorder_ops
    from khronus_spark.sources.tables import load_table, measurements_from_events

    q = eq.queries()

    def meas():
        return measurements_from_events(spark, sf_dir).where(
            "mtype IN ('timer','gauge')"
        )

    frames = {
        "rollup_hist_30s": lambda: histogram_summary(meas(), 30_000),
        "rollup_hist_counts_30s": lambda: histogram_summary(
            meas(), 30_000, exact_counts=True
        ),
        "rollup_hist_approx_30s": lambda: histogram_summary(
            meas(), 30_000, approx=True
        ),
        "semantic_dedup_auto": lambda: semantic_dedup_derived_k(
            load_table(spark, sf_dir, "embeddings")
        ),
        "zorder_layout": lambda: zorder_ops.zorder_layout_ranked(
            load_table(spark, sf_dir, "events").select(
                "event_id",
                F.col("user_id").alias("ua"),
                F.expr("ts div 1000000 div 3600000").alias("hb"),
            ),
            "ua",
            "hb",
            bits=8,
            n_partitions=32,
        ),
    }
    # registry-backed slots: bench name -> queries() entry
    reg = {
        "rollup_counter_1m": "ts_counter_summary_5m",
        "influx_dashboard": "influx_count_click_5m",
        "influx_percentiles": "influx_percentiles_purchase_1h",
        "tpch_q1": "tpch_q1_pricing",
        "tpch_q3": "tpch_q3_top_orders",
        "tpch_q5": "tpch_q5_regional_revenue",
        "dedup_minhash_lsh": "minhash_lsh_pairs",
        "text_quality": "quality_score",
        "ann_cosine_topk": "ann_cosine_topk",
        "ann_lsh_topk": "ann_lsh_topk",
        "rollup_hdr_5m": "ts_hdr_summary_5m",
        "asof_join": "events_asof_signup",
        "sessions_30m": "events_sessions_30m",
        "media_features": "media_features",
        "sliding_windows": "events_sliding_counts_10m_5m",
        "tpch_q18": "tpch_q18_big_orders",
        "corpus_curation": "corpus_curation",
        "gopher_rules": "gopher_rules",
        "dup_ngram_5": "dup_ngram_5",
        "semantic_dedup": "semantic_dedup",
        "influx_store_percentiles": "influx_store_percentiles_1h",
        "duplicate_spans": "duplicate_spans",
        "bpe_merges": "bpe_merges_6",
        "bpe_merges_batched": "bpe_merges_batched",
        "decontamination_bloom": "decontamination_bloom",
        "c4_span_removal": "c4_span_removal",
        "rp_project": "embedding_rp_project",
        "bigram_surprisal": "bigram_surprisal",
        "winnow_pairs": "winnow_match_pairs",
        "decontamination_retrieval": "decontamination_retrieval",
        "dsir_select": "dsir_topk_sample",
        "fill_linear": "influx_fill_linear_error_1h",
        "edit_pairs": "part_name_edit_pairs",
        "ewma_smooth": "events_ewma_1h",
        "perplexity_split": "doc_perplexity_split",
        "seasonal_anomaly": "events_seasonal_anomaly",
        "wordpiece_encode": "wordpiece_encode_docs",
        "unigram_encode": "unigram_encode_docs",
        "hw_residual_anomaly": "events_hw_residual_anomaly",
    }
    for bench_name, entry_name in reg.items():
        frames[bench_name] = (
            lambda e=entry_name: q[e](spark, sf_dir)
        )
    return frames


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench as bench_mod

    spark = bench_mod.make_session("8", app="khronus-spark-plans")
    frames = slot_frames(spark, sf_dir)
    if only:
        frames = {k: v for k, v in frames.items() if k in only}

    out_dir = Path(_REPO) / "plans" / "r13"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, fn in frames.items():
        try:
            df = fn()
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            txt = f"EXPLAIN FAILED: {exc}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()

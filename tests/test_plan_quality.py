"""Physical-plan quality gates: the properties that make these plans
survive a 100×-scale-up, pinned as regression tests.

- dimension joins must broadcast (never shuffle both sides);
- filters must reach the parquet scan (PushedFilters), including the
  time range restated in the raw source domain;
- scans must prune columns (ReadSchema ⊂ full schema);
- nothing may degenerate into a cartesian/nested-loop join except the
  deliberate broadcast cross in brute-force ANN.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_tpch_q3_broadcasts_and_pushes(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "tpch_q3_top_orders")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "GreaterThan(l_shipdate" in plan  # date filter at the scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "l_comment" not in plan  # column pruning

def test_tpch_q5_all_dims_broadcast(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "tpch_q5_regional_revenue")
    # formatted mode prints each operator in the tree AND detail section
    assert plan.count("BroadcastHashJoin") == 8  # 4 joins × 2 mentions
    assert "SortMergeJoin" not in plan
    assert "EqualTo(r_name,ASIA)" in plan


def test_dashboard_query_pushes_time_range_raw(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "influx_count_click_5m")
    assert "EqualTo(event_type,click)" in plan
    # the ms-domain slice must be restated on the raw source column
    # (TIMESTAMP_NTZ literals vs the NTZ scan column — no cast) and
    # BOTH bounds must land in the scan's PushedFilters line, where
    # parquet row-group stats prune; a derived-expression predicate
    # never gets there
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln and "ts" in ln
    ]
    assert pushed, "no PushedFilters line mentioning ts"
    assert any(
        "GreaterThanOrEqual(ts," in ln and "LessThan(ts," in ln
        for ln in pushed
    ), pushed
    assert "BroadcastHashJoin" in plan  # spine join broadcasts
    assert "props" not in plan  # unused events columns pruned


def test_rollup_single_shuffle(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "ts_counter_summary_5m")
    # map-side partial agg + one exchange + final agg — nothing else
    assert plan.count("Exchange") == 2  # 1 exchange × 2 mentions
    assert "partial_sum" in plan


def test_no_accidental_cartesian_products(spark, oracle_sf_dir):
    for name in ("minhash_lsh_pairs", "near_dup_jaccard_lsh", "events_asof_signup",
                 "tpch_q3_top_orders", "influx_op_two_sources_30m"):
        plan = _plan(spark, oracle_sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_asof_join_is_single_shuffle_no_join(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "events_asof_signup")
    # union + window carry-forward: no join operator at all
    assert "Join" not in plan or "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q4_semi_join_pushes_quarter_filter(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "tpch_q4_late_orders")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate," in plan  # quarter at the scan
    assert "l_extendedprice" not in plan  # lineitem pruned to 2 columns
    assert "CartesianProduct" not in plan


def test_lapsed_anti_join_pushes_date_filter(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "customer_lapsed_anti")
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate," in plan
    assert "o_totalprice" not in plan  # orders pruned to the key


def test_q18_partial_agg_before_joins(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "tpch_q18_big_orders")
    assert "partial_sum" in plan  # map-side combine on the big scan
    assert "CartesianProduct" not in plan
    assert "l_discount" not in plan  # lineitem pruned to 2 columns


def test_curation_broadcasts_component_map(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "corpus_curation")
    # the tiny (doc_id → component) map must broadcast; the corpus side
    # must never shuffle before the final per-language aggregation
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # quality attaches map-side (text.with_quality): the whole pipeline
    # reads the corpus EXACTLY once and never sort-merge-joins — a
    # second scan means someone reintroduced the
    # docs.join(quality_score(docs)) self-join, which at 100 TB is two
    # full-corpus shuffles for columns a projection computes for free
    assert plan.count("documents.parquet") == 1
    assert "SortMergeJoin" not in plan


def test_canonical_and_health_quality_is_join_free(spark, oracle_sf_dir):
    """canonical_by_quality / source_health_report attach their per-doc
    quality + gopher signals as projections, never via doc_id
    self-joins: scan counts pin the composition shape (before the
    round-6 rewrite these plans read the corpus 3 and 7 times)."""
    plan = _plan(spark, oracle_sf_dir, "canonical_by_quality")
    assert plan.count("documents.parquet") == 2  # reps + survivors
    assert "SortMergeJoin" not in plan
    plan = _plan(spark, oracle_sf_dir, "source_health_report")
    # hashed/flags branch + dup_h branch + OOV profile's three
    assert plan.count("documents.parquet") <= 5


def test_curation_default_edge_gen_is_banded_lsh(spark, oracle_sf_dir, monkeypatch):
    """curated_docs must default to the MinHash-LSH edge generator and
    the generator's plan must stay the banded equi-join (the round-1
    length-blocked self-join is deleted; this gate keeps it from
    coming back). The component loop eagerly checkpoints, so the final
    plan can't show the edge join — pin the wiring and the generator's
    own plan shape instead."""
    import re

    import khronus_spark.operators.curation as cur
    from khronus_spark.operators.dedup import minhash_md5_pairs

    used = []
    real = cur.minhash_duplicate_components
    monkeypatch.setattr(
        cur,
        "minhash_duplicate_components",
        lambda docs: used.append(True) or real(docs),
    )
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    cur.curated_docs(docs)
    assert used, "default edge_gen did not route through MinHash-LSH"

    # and the generator itself is the banded equi-join, no length blocking
    pair_plan = minhash_md5_pairs(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "band" in pair_plan and "bucket" in pair_plan
    assert not re.search(r"n_chars#\d+L? = n_chars#", pair_plan)


def test_salted_distinct_is_two_phase(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "events_distinct_users_salted")
    assert "_salt" in plan  # partial phase re-keyed on (group, salt)
    assert "xxhash64" in plan.lower()
    assert "CartesianProduct" not in plan


def test_funnel_is_pure_aggregation(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "user_funnel_vcp")
    assert "Join" not in plan  # conditional-min agg + scalar fold only
    assert "partial_min" in plan or "partial_count" in plan


def test_tfidf_broadcasts_term_frequencies(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "doc_top_terms_tfidf")
    assert "BroadcastHashJoin" in plan  # (term, df) table broadcast onto tf
    assert "CartesianProduct" not in plan


def test_hll_daily_single_aggregation_no_python(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "approx_distinct_users_hll_daily")
    # register-column form: one partial/final hash-agg pair, all JVM-side
    assert plan.count("Exchange") == 2  # 1 exchange × 2 mentions (tree+detail)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_assignment_zero_expansion_default(spark, oracle_sf_dir):
    """The default (arrow) assignment scores each Arrow batch against
    the closure-shipped centroid matrix: NO broadcast cross expansion,
    NO join, NO window — the assignment stage shuffles nothing at all
    (the only exchanges left belong to the centroid-mean update)."""
    plan = _plan(spark, oracle_sf_dir, "kmeans_embeddings")
    assert "MapInPandas" in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kmeans_assignment_sql_mode_argmin_is_map_side_aggregate(
    spark, oracle_sf_dir
):
    """The expression-path assignment (mode='sql', the oracle's
    structural twin) must broadcast the centroids into the cross join
    and take the argmin with a map-side-combinable min_by aggregate
    (partial_min_by BEFORE the exchange), never a window over vec_id: a
    window shuffles the full N×k scored expansion, which at SemDeDup's
    derived k=⌈√N⌉ is an N^1.5-row exchange — this stage may shuffle at
    most the ≤N combined rows."""
    from khronus_spark.operators.clustering import kmeans_assignments
    from khronus_spark.sources.tables import load_table

    emb = load_table(spark, oracle_sf_dir, "embeddings")
    df = kmeans_assignments(emb, mode="sql")
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" in plan  # broadcast cross, k rows
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "partial_min_by" in plan  # k rows/vector combine map-side


def test_ivf_assignment_argmax_never_shuffles_expansion(spark, oracle_sf_dir):
    """Same discipline for the IVF coarse quantizer: argmax-by-cosine as
    a partial_max_by aggregate, not a window over the N×nlist scored
    expansion."""
    plan = _plan(spark, oracle_sf_dir, "ann_ivf_assignments")
    assert "Window" not in plan
    assert "partial_max_by" in plan


def test_q8_all_dims_broadcast_single_fact_shuffle_join(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "tpch_q8_market_share")
    # part/supplier/customer/nation×2/region broadcast; only the
    # lineitem↔orders fact join may shuffle.
    assert plan.count("BroadcastHashJoin") >= 6
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
    assert "EqualTo(p_type,PROMO)" in plan  # pushed to the part scan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # pushed to orders scan


def test_q15_single_lineitem_scan_window_max(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "tpch_q15_top_supplier")
    # the global-max is a window over the per-supplier aggregate, so
    # the fact table is scanned exactly once and the plan stays lazy
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_decontamination_broadcasts_eval_side(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "decontamination_scan")
    assert "BroadcastHashJoin" in plan  # eval shingles broadcast
    assert "SortMergeJoin" not in plan  # never shuffles the corpus for the join


def test_lsh_candidate_generation_single_signature_pass(spark, oracle_sf_dir):
    """Candidate pairs (minhash + embedding LSH) must compute the
    expensive signature subtree exactly ONCE: bucket_pairs checkpoints
    the banded frame, so the executed plan reads the materialized rows
    (Scan ExistingRDD) and the corpus parquet appears in NO join branch
    (zero parquet scans in the pair plan). The pair enumeration itself
    is a co-partitioned (band, bucket) equi-join with spill-safe
    buffers — never a cartesian/nested-loop, and never a per-bucket
    collect_list array (the round-5 memory hardening)."""
    from khronus_spark.operators.dedup import minhash_lsh_candidates, minhash_md5_pairs
    from khronus_spark.operators.similarity import _lsh_candidate_pairs

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{oracle_sf_dir}/embeddings.parquet")
    for df in (
        minhash_lsh_candidates(docs),
        minhash_md5_pairs(docs),
        _lsh_candidate_pairs(emb, 4, 8),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Scan parquet" not in plan, plan[:2000]
        assert "Scan ExistingRDD" in plan, plan[:2000]
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "collect_list" not in plan


def test_gopher_rules_is_map_only(spark, oracle_sf_dir):
    """The rule battery must run at scan speed: one projection, no
    shuffle, no Python stage — it is the pruning filter that runs
    BEFORE every expensive corpus stage."""
    plan = _plan(spark, oracle_sf_dir, "gopher_rules")
    assert "Exchange" not in plan
    for py in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert py not in plan


def test_dup_ngram_skew_safe_freq_no_corpus_self_join(spark, oracle_sf_dir):
    """Cross-doc gram frequency must be an AGGREGATE joined back on a
    SALTED gram key — map-side combinable and structurally skew-spread —
    never a window over the gram key (one task per hot gram,
    unsplittable) and never a corpus self-join."""
    plan = _plan(spark, oracle_sf_dir, "dup_ngram_5")
    assert "Window" not in plan           # no gram-keyed window
    assert "partial_count" in plan        # freq combines map-side
    assert "_salt" in plan                # hot grams spread structurally
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan    # dup-gram table broadcasts here


def _hot_gram_corpus(spark, n_hot=40000, n_cold=500):
    """One 5-gram shared by ~99% of docs — the boilerplate-header skew
    case; cold docs carry only corpus-unique grams."""
    hot = "alpha beta gamma delta epsilon"
    rows = [(i, hot) for i in range(n_hot)]
    rows += [
        (i, f"u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(n_hot, n_hot + n_cold)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gram_join_hot_gram_is_salted_and_correct(spark):
    """Skew regression fixture (round-4 directive 7). The gram-frequency
    join CANNOT rely on AQE skew splitting: OptimizeSkewedJoin requires
    both join children to be bare shuffle stages, and the build side's
    final HashAggregate fuses between its shuffle and the join, blocking
    the rule (verified empirically; an explicit repartition to break the
    fusion is removed as redundant by the optimizer). So the salt must
    carry the load: with broadcast disabled (forcing the shuffle join a
    100 TB corpus would take), the hot gram's probe rows key on
    (g, doc_id % S) — S join-key groups instead of one unsplittable
    task — and both operators stay correct."""
    from khronus_spark.operators.text import (
        _GRAM_SALT,
        dup_ngram_fraction,
        duplicate_spans,
    )

    docs = _hot_gram_corpus(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = dup_ngram_fraction(docs)
        res = df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the shuffle join keys on (g, _salt): the hot gram occupies
        # _GRAM_SALT join-key groups, never one unsplittable task
        assert "_salt" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        hot = [r for r in res if r["doc_id"] < 40000]
        cold = [r for r in res if r["doc_id"] >= 40000]
        assert len(res) == 40500 and _GRAM_SALT >= 8
        assert all(r["dup_bp"] == 10000 for r in hot)
        assert all(r["dup_bp"] == 0 for r in cold)

        spans = duplicate_spans(docs, min_tokens=5).collect()
        # every hot doc is one full 5-token duplicated span; cold none
        assert len(spans) == 40000
        assert all(
            r["doc_id"] < 40000 and r["span_tokens"] == 5 for r in spans
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q17_broadcasts_parts_single_window(spark, oracle_sf_dir):
    """lineitem must not shuffle for the brand join (broadcast part
    keys) and the 20% threshold must ride ONE window over the filtered
    join output, not an aggregate-then-rejoin."""
    plan = _plan(spark, oracle_sf_dir, "tpch_q17_small_qty_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Window") == 2  # 1 window op × 2 mentions


def test_q22_scalar_threshold_broadcast(spark, oracle_sf_dir):
    """The global-average threshold is a 1-row broadcast cross (the
    only acceptable nested-loop shape); the anti join must hash."""
    plan = _plan(spark, oracle_sf_dir, "tpch_q22_idle_high_balance")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the anti join


def test_percentile_mode_routing(spark, oracle_sf_dir):
    """exact_mode='auto' (engine.py): an interactive dashboard slice
    (<= max_points buckets, the reference's 700-point clamp) takes the
    single-shuffle array mode; a hand-forced wide slice takes the
    bounded-state counts mode. Both are bit-identical summaries; this
    pins the PHYSICAL routing so the interactive path stays inside the
    reference's 3 s query budget."""
    from khronus_spark import KhronusEngine
    from khronus_spark.entry_queries import A_MS, B_MS, NOW_MS
    from khronus_spark.sources import measurements_from_events

    m = measurements_from_events(spark, oracle_sf_dir)
    eng = KhronusEngine(spark, measurements=m, now_ms=NOW_MS)
    jvm = spark._jvm

    def plan_of(q):
        df = eng.sql_union(q)
        return df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    dash = plan_of(
        f'select p99 from "purchase" where time between {A_MS} and {B_MS} '
        "force group by time(1h)"
    )
    assert "collect_list(value" in dash  # array mode: one agg shuffle
    assert "collect_list(struct" not in dash

    wide = plan_of(
        f'select p99 from "purchase" where time between {A_MS} and {B_MS} '
        "force group by time(30s)"
    )
    assert "collect_list(struct" in wide  # counts mode: bounded state
    assert "collect_list(value" not in wide


def test_curation_component_broadcast_is_size_guarded(spark, oracle_sf_dir):
    """curated_docs broadcasts the duplicate-component map only while it
    fits BROADCAST_COMPONENT_LIMIT rows. At web-crawl dup rates the map
    is a large fraction of the corpus — an unconditional broadcast is a
    driver OOM at 100 TB, so past the limit the canonical-keep filter
    must become a shuffle join (no explicit broadcast hint)."""
    from khronus_spark.operators.curation import curated_docs
    from khronus_spark.sources.tables import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")
    # fallback path: a zero threshold disqualifies any map
    df = curated_docs(docs, broadcast_component_limit=0)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical  # no broadcast hint survives
    # default path at test scale still broadcasts (see
    # test_curation_broadcasts_component_map for the physical assert)
    df2 = curated_docs(docs)
    logical2 = df2._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in logical2


def test_q19_disjunction_pushes_and_broadcasts(spark, oracle_sf_dir):
    """The 3-arm brand/size/quantity disjunction must not defeat the
    dimension broadcast, and its part-side conjuncts (brand IN plus the
    full OR over brand/size) must reach the part scan's PushedFilters."""
    plan = _plan(spark, oracle_sf_dir, "tpch_q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "In(p_brand, [Brand#1,Brand#2,Brand#3])" in plan
    assert "Or(Or(And(EqualTo(p_brand" in plan  # arm filter at the scan


def test_q21_windows_replace_correlated_exists(spark, oracle_sf_dir):
    """Q21's EXISTS / NOT EXISTS pair is restated as two window
    aggregates over one per-(order, supplier) table: exactly one Window
    operator (both aggregates share the orderkey partitioning) and no
    extra lineitem rescan via sort-merge."""
    plan = _plan(spark, oracle_sf_dir, "tpch_q21_sole_late_supplier")
    assert plan.count("Window") == 2  # 1 Window op x 2 mentions
    assert "SortMergeJoin" not in plan


def test_quality_classifier_broadcasts_model(spark, oracle_sf_dir):
    """The linear quality classifier must score at scan speed: the
    D-row weight table (the model) broadcasts onto the exploded tokens,
    the corpus shuffles once for the per-doc re-aggregation, and no
    Python stage appears — the plumbing a real trained filter needs."""
    plan = _plan(spark, oracle_sf_dir, "quality_classifier_score")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for py in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert py not in plan


def test_fuzzy_decontamination_broadcasts_eval_buckets(spark, oracle_sf_dir):
    """The eval (band, bucket) set must broadcast onto the corpus band
    assignments — never a corpus self-join or shuffle of both sides."""
    plan = _plan(spark, oracle_sf_dir, "decontamination_fuzzy")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_duplicate_spans_no_corpus_self_join(spark, oracle_sf_dir):
    """Span detection must reuse the gram-key window discipline: joins
    only re-key positions against per-doc gram frequencies (doc_id in
    every join key) — never a corpus-level self-join or cartesian."""
    plan = _plan(spark, oracle_sf_dir, "duplicate_spans")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_adc_scoring_stays_broadcast_and_map_side(spark, oracle_sf_dir):
    """The ADC search plan must keep the code table map-only: LUTs and
    codebooks arrive by broadcast, the code packing combines map-side
    (partial_sum), and nothing degenerates into a cartesian or a
    sort-merge join of corpus-sized sides."""
    plan = _plan(spark, oracle_sf_dir, "ann_pq_topk")
    assert "BroadcastExchange" in plan
    assert "partial_sum" in plan          # code packing combines map-side
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_ivfpq_candidate_join_is_broadcast(spark, oracle_sf_dir):
    """IVF-PQ must probe the inverted lists through broadcast joins
    (probe lists and LUTs are tiny); the corpus-side code+assignment
    join may shuffle but never nested-loop against a non-broadcast."""
    plan = _plan(spark, oracle_sf_dir, "ann_ivfpq_topk")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_iterations_are_map_side_combinable(spark, oracle_sf_dir):
    """Each PageRank iteration must be a partial-agg sum over the edge
    list (O(|E|) shuffle), never a window or cartesian."""
    plan = _plan(spark, oracle_sf_dir, "dedup_graph_pagerank")
    assert "partial_sum" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_near_dup_jaccard_lsh_no_length_blocked_self_join(spark, oracle_sf_dir):
    """Round-4 verdict directive 1: the near-dup Jaccard path must be
    candidate-bounded — no char-length-keyed self-join survives
    anywhere in the plan (n_chars must not even be READ: the scan
    prunes it), no cartesian, and the pair generation must not build
    per-bucket arrays (no collect_list — the bucket_pairs hardening)."""
    plan = _plan(spark, oracle_sf_dir, "near_dup_jaccard_lsh")
    assert "n_chars" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "collect_list" not in plan


def test_bucket_pairs_consumers_never_collect_buckets(spark, oracle_sf_dir):
    """The bucket_pairs memory hardening (round-4 verdict directive 3)
    must hold for every banded-LSH consumer: no plan may aggregate a
    bucket into an array row (a 10M-doc boilerplate bucket would be one
    ~80 MB aggregation buffer on one task)."""
    for name in (
        "minhash_md5_pairs",
        "dedup_components_minhash",
        "dedup_incremental_batch",
        "embedding_knn_graph",
    ):
        plan = _plan(spark, oracle_sf_dir, name)
        assert "collect_list" not in plan, name


def test_ann_topk_windows_have_group_limit(spark, oracle_sf_dir):
    """Round-4 verdict directive 5: every per-probe top-k row_number
    window in the ANN family must be rewritten by Spark's
    InferWindowGroupLimit into a WindowGroupLimit pair (partial below
    the exchange, final above), so only ~k rows per probe survive the
    shuffle instead of the full candidate expansion. The rule is a
    silent pattern-match (the round-4 sweep showed it can fail to fire
    without any error) — this gate makes a regression loud."""
    for name in (
        "ann_cosine_topk",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "ann_ivf_kmeans_topk",
        "ann_pq_topk",
        "ann_pq_topk_indexed",
        "ann_ivfpq_topk",
        "ann_ivfpq_topk_indexed",
        "ann_pq_rerank_topk",
        "ann_pq_rerank_topk_indexed",
        "ann_rp_topk",
        "ann_quantized_topk",
        "embedding_knn_graph",
        "bm25_eval_topk",
    ):
        plan = _plan(spark, oracle_sf_dir, name)
        assert plan.count("WindowGroupLimit") >= 2, (
            f"{name}: window group limit did not fire "
            f"(count={plan.count('WindowGroupLimit')})"
        )


def test_pq_indexed_query_has_no_training(spark, oracle_sf_dir):
    """The indexed PQ query must READ the persisted index, not rebuild
    it: the plan scans the codes parquet and contains no k-means
    machinery (no centroid-mean aggregation, no posexplode of the
    embedding table into (cid, dim) rows, no localCheckpoint barrier
    from the Lloyd loop). The codebook is sub·k rows of bounded index
    metadata and arrives as driver-collected LITERALS in the LUT
    projection (r14, the codebook-collect convention) — no books scan,
    no cross join, no LUT aggregate in the executed plan."""
    plan = _plan(spark, oracle_sf_dir, "ann_pq_topk_indexed")
    assert "posexplode" not in plan
    assert "codes" in plan              # parquet index scan
    assert "books" not in plan          # codebook inlined as literals
    assert "map_from_entries" in plan   # the literal LUT projection
    assert "Scan ExistingRDD" not in plan       # no Lloyd checkpoint residue


def test_incremental_dedup_probe_reads_prebuilt_index(spark, oracle_sf_dir):
    """Round-5 verdict directive 2: the incremental-dedup PROBE must
    read the persisted (band, bucket, n_docs, min_doc_id) index, not
    re-derive bucket stats from the corpus per batch. The plan gets the
    bucket minimum from the index scan (min_doc_id in its ReadSchema,
    never re-aggregated) and the corpus documents are not scanned at
    all — the only documents scans are the new batch's two reads
    (signatures + result spine)."""
    plan = _plan(spark, oracle_sf_dir, "dedup_incremental_batch")
    lines = plan.splitlines()
    idx_scans = [
        ln for ln in lines if "Location" in ln and "dedup_index" in ln
    ]
    assert len(idx_scans) == 1, idx_scans
    assert "min(min_doc_id)" not in plan  # index consumed as-is
    doc_scans = [
        ln for ln in lines if "Location" in ln and "documents" in ln
    ]
    assert len(doc_scans) == 2, doc_scans  # batch only; corpus untouched


def test_ivfpq_and_rerank_indexed_queries_have_no_training(spark, oracle_sf_dir):
    """Round-5 verdict directive 3: the remaining inline-training ANN
    families get indexed faces. Both query plans must READ the
    persisted index tables and contain no k-means machinery (no
    posexplode of embeddings into (cid, dim) rows, no Lloyd
    localCheckpoint residue); the IVF-PQ plan routes probes via the
    persisted centroid table and scans the coded inverted lists."""
    plan = _plan(spark, oracle_sf_dir, "ann_ivfpq_topk_indexed")
    assert "posexplode" not in plan
    assert "Scan ExistingRDD" not in plan
    assert "coded" in plan and "centroids" in plan
    assert "books" not in plan          # codebook inlined as literals (r14)

    plan = _plan(spark, oracle_sf_dir, "ann_pq_rerank_topk_indexed")
    assert "posexplode" not in plan
    assert "Scan ExistingRDD" not in plan
    assert "codes" in plan
    assert "books" not in plan          # codebook inlined as literals (r14)


def test_hybrid_indexed_query_reads_both_indexes_no_training(
    spark, oracle_sf_dir
):
    """Round-6 verdict directive 4: the indexed hybrid face must answer
    BOTH branches from the persisted indexes — the plan scans the
    postings and books/codes parquet, contains no k-means machinery
    (posexplode / Lloyd checkpoint residue), and touches the corpus
    text and full embedding vectors only for the QUERY carve: exactly
    one documents scan (the query text) and one embeddings scan (the
    probe vectors)."""
    plan = _plan(spark, oracle_sf_dir, "hybrid_rrf_topk_indexed")
    assert "posexplode" not in plan
    assert "Scan ExistingRDD" not in plan
    assert "postings" in plan and "codes" in plan
    assert "books" not in plan          # codebook inlined as literals (r14)
    lines = plan.splitlines()
    post_scans = [
        ln for ln in lines if "Location" in ln and "postings" in ln
    ]
    assert 1 <= len(post_scans) <= 3, post_scans  # column-pruned index reads
    doc_scans = [
        ln for ln in lines if "Location" in ln and "documents" in ln
    ]
    emb_scans = [
        ln for ln in lines if "Location" in ln and "embeddings" in ln
    ]
    assert len(doc_scans) == 1, doc_scans
    assert len(emb_scans) == 1, emb_scans
    # both branch top-pools and the final fused top-k stay group-limited
    assert plan.count("WindowGroupLimit") >= 2


def test_scd2_backfill_and_sized_recall_stay_distributed(
    spark, oracle_sf_dir
):
    """The round-7 entries keep the family discipline: no
    single-partition funnel, no nested-loop/cartesian join anywhere.
    (The backfill's one SortMergeJoin is the before/after matrix
    full-outer — a ≤ types²-row frame, which cannot broadcast-join by
    Spark's full-outer rules and is query-load-sized anyway.)"""
    for name in ("events_scd2_backfill_conformance", "ann_lsh_recall_sized"):
        plan = _plan(spark, oracle_sf_dir, name)
        assert "SinglePartition" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
    # the sized-IVF face: the centroid cross is the broadcast
    # probes × nlist-row centroid table (bounded metadata, by design);
    # nothing else may nest-loop and no stage may funnel
    plan = _plan(spark, oracle_sf_dir, "ann_ivf_sized")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # probe×centroids


def test_zorder_curve_topk_is_take_ordered(spark, oracle_sf_dir):
    """The z-curve spot-check must run as TakeOrderedAndProject
    (per-partition heads merged on the driver) — a global Sort exchange
    for a top-50 would serialize the whole table through one task."""
    plan = _plan(spark, oracle_sf_dir, "events_zorder_curve")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_scd2_windows_stay_user_partitioned(spark, oracle_sf_dir):
    """Every window and shuffle in the SCD2 interval builder is keyed by
    user_id — a single-partition exchange anywhere means some stage
    funnels all users through one task and dies at scale."""
    plan = _plan(spark, oracle_sf_dir, "events_scd2_dominant_type")
    assert "SinglePartition" not in plan
    assert "partitionBy" not in plan or "user_id" in plan


def test_rfm_is_one_shuffle_then_map_only(spark, oracle_sf_dir):
    """RFM = one map-side-combinable groupBy(user_id); the class ladders
    are map-only. Exactly one exchange (plus AQE reads) and no window,
    sort, or join anywhere."""
    plan = _plan(spark, oracle_sf_dir, "events_rfm_profile")
    assert plan.count("Exchange hashpartitioning") <= 2  # operator + detail
    assert "SinglePartition" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert "partial" in plan.lower()  # map-side combine proof


def test_dsir_bucket_ratio_table_broadcasts_onto_per_doc_counts(
    spark, oracle_sf_dir
):
    """DSIR's per-doc weight join must be broadcast (the ≤256-row bucket
    ratio table), never a shuffle join on the corpus side; and the
    normalizer must not appear as a BroadcastNestedLoopJoin cross (it is
    folded into the bucket frame as a window over aggregated rows)."""
    plan = _plan(spark, oracle_sf_dir, "dsir_topk_sample")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cohort_retention_shuffles_only_on_user_keys(spark, oracle_sf_dir):
    """The retention matrix shuffles on (user, week) / user_id only; the
    final (cohort, offset) aggregate is calendar-bounded. No single
    partition funnel, no nested-loop join."""
    plan = _plan(spark, oracle_sf_dir, "events_cohort_retention")
    assert "SinglePartition" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_shared_subtrees_materialize_once(spark, oracle_sf_dir):
    """Round-6 scan-budget gate: operators whose derived frames feed
    several consumers must build them ONCE (checkpoint / restructure),
    not once per consumer — ReuseExchange does not dedupe these
    subtrees, so without the explicit share each extra consumer
    re-runs the corpus scan (tokenize + hash + aggregate). The budgets
    below are the measured post-fix scan counts; a regression that
    reintroduces a duplicated subtree pushes the count past its budget
    and fails here with the entry name."""
    budgets = {
        # entry: max parquet scans in the physical plan
        "dup_ngram_5": 1,  # gram inventory checkpointed
        "duplicate_spans": 1,  # positional gram inventory checkpointed
        "unigram_surprisal": 2,  # occ + the zero-token left-join spine
        "bigram_surprisal": 2,  # occ/c2 checkpointed + spine
        "lm_reference_surprisal": 2,  # frozen model checkpointed + spine
        "corpus_vocabulary": 1,  # vocab aggregate checkpointed
        "vocab_oov_by_source": 1,  # vocab rides the checkpoint
        "doc_top_terms_tfidf": 2,  # df derives from checkpointed tf; N scan
        "decontamination_bloom": 1,  # bitmap checkpointed (k probe joins)
        "mixture_realization_audit": 1,  # mixture/kept frames checkpointed
        "part_edit_graph_clustering": 1,  # edge list + triangles shared
        "decontamination_retrieval": 1,  # BM25 postings built once
        "bm25_eval_topk": 3,  # postings + stats scan + query side
        "dsir_topk_sample": 2,  # (doc, bucket) pre-agg shared
        # r7: base intervals + touched users checkpointed (was 7 —
        # the interval subtree ran once per consumer); remaining scans
        # are the rebuilt semi-join and the two matrix fact reads
        "events_scd2_backfill_conformance": 3,
        # r7: query carve only — one documents scan (query text), one
        # embeddings scan (probe vectors); index reads are scratch-dir
        # parquet not counted by this metric (plan-gated separately)
        "hybrid_rrf_topk_indexed": 2,
        # r9: survivorship melts all attributes into ONE pass (one
        # part scan; the CC assignment is checkpoint-backed)
        "part_golden_records": 1,
        # r9: hourly count table checkpointed — profile + flag join
        # share it (one events scan)
        "events_seasonal_anomaly": 1,
    }
    over = []
    for name, budget in sorted(budgets.items()):
        df = QUERIES[name](spark, oracle_sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans = plan.count(".parquet")
        if scans > budget:
            over.append((name, scans, budget))
    assert not over, f"scan budget exceeded (entry, scans, budget): {over}"


def test_bm25_pruned_query_answers_from_index_no_corpus_scan(
    spark, oracle_sf_dir
):
    """The exact-pruned BM25 face is the indexed-constants path with
    two extra query-load-bounded waves: its plan must scan the
    persisted postings parquet (never re-derive it), touch the corpus
    text only for the QUERY carve (one documents scan), keep every
    probe side broadcast, and contain no cartesian/nested loop
    anywhere. The maximpact parquet is invisible here BY DESIGN: the
    per-query ceiling table `qu` is lazily checkpointed (the single
    materialization every phase shares), so its subtree — including
    the maximpact and df scans — shows as one Scan ExistingRDD node;
    the ceiling content itself is pinned by the survival-face tests
    and the shared driver oracle."""
    plan = _plan(spark, oracle_sf_dir, "bm25_eval_topk_pruned")
    lines = plan.splitlines()
    # the query carve (documents scan) lives inside the checkpointed
    # qterms frame — materialized once, re-scanned by no wave
    doc_scans = [ln for ln in lines if "Location" in ln and "documents" in ln]
    assert len(doc_scans) == 0, doc_scans
    # postings parquet feeds seed docs, candidates, and the rescore —
    # bounded distinct scans of the short-row index, never a rebuild
    post_scans = [
        ln for ln in lines if "Location" in ln and "/postings" in ln
    ]
    assert 1 <= len(post_scans) <= 4, post_scans
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the probe sides stay broadcast and the top-k stays group-limited
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_bm25_router_picks_pruned_past_crossover_only(spark, oracle_sf_dir):
    """The auto-router (round-8 verdict directive #2) must read the
    persisted n_docs and route: AT/ABOVE the crossover the plan is
    the pruned shape (multiple bounded postings waves + the lazily
    checkpointed ceiling subtree's Scan ExistingRDD), BELOW it the
    plain indexed shape (exactly ONE postings scan, no checkpoint
    residue, no seed waves). Both sides share bm25_eval_topk's
    oracle, so the driver hash pins the values; THIS gate pins that
    the router actually switches plans on the n_docs signal.
    Crossover constants are measured, not assumed —
    scripts/wand_sweep.py (50k standalone) and scripts/hybrid_sweep.py
    (100k pool=20), tables in ROUND8_NOTES.md."""
    import tempfile

    from pyspark.sql import functions as F

    from khronus_spark.operators import text as text_ops
    from khronus_spark.sources.tables import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    queries = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    path = tempfile.mkdtemp(prefix="router_gate_")
    text_ops.write_bm25_index(text_ops.bm25_build_postings(corpus), path)

    def plan_of(df):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # gate corpus (~500 docs) is below the 50k default: plain side
    below = plan_of(text_ops.bm25_topk_from_index(spark, path, queries))
    below_scans = [
        ln
        for ln in below.splitlines()
        if "Location" in ln and "/postings" in ln
    ]
    assert len(below_scans) == 1, below_scans
    assert "ExistingRDD" not in below
    # crossover pinned below n_docs: the router must take the pruned
    # side (same decision the default takes at >= 50k real docs —
    # wand_should_prune is pure in (n_docs, crossover))
    above = plan_of(
        text_ops.bm25_topk_from_index(spark, path, queries, crossover=1)
    )
    above_scans = [
        ln
        for ln in above.splitlines()
        if "Location" in ln and "/postings" in ln
    ]
    assert 2 <= len(above_scans) <= 4, above_scans
    assert "ExistingRDD" in above
    # the forced overrides beat the router in both directions
    mi = text_ops.read_bm25_max_impact(spark, path)
    forced_pruned = plan_of(
        text_ops.bm25_topk_from_index(spark, path, queries, max_impact=mi)
    )
    assert "ExistingRDD" in forced_pruned
    forced_plain = plan_of(
        text_ops.bm25_topk_from_index(
            spark, path, queries, max_impact=False, crossover=1
        )
    )
    assert "ExistingRDD" not in forced_plain


def test_golden_records_broadcasts_assignment_single_corpus_pass(
    spark, oracle_sf_dir
):
    """Survivorship plan shape (r9): the entity-assignment map joins
    BROADCAST onto the records (never a corpus-wide shuffle join), and
    the melted design means no corpus-to-corpus join exists at all —
    the only SortMergeJoin-eligible frames are count-table-sized."""
    plan = _plan(spark, oracle_sf_dir, "part_golden_records")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_seasonal_anomaly_profile_broadcasts(spark, oracle_sf_dir):
    """The (type, hour-of-day) profile is <= |types| x 24 rows and must
    broadcast back onto the hourly table; the hourly table itself is
    checkpoint-shared (scan budget 1), so no events-to-events join."""
    plan = _plan(spark, oracle_sf_dir, "events_seasonal_anomaly")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ann_cosine_brute_force_plan_pinned(spark, oracle_sf_dir):
    """r10 adjudication of the two-round wall drift (round-9 verdict
    "what's wrong" #1): on a host whose calibration probe runs 2.6x
    faster than the r9 driver host (0.125 vs 0.325 s), this slot's
    wall is unchanged (0.503 vs 0.524 s at sf0.1) — the wall is fixed
    per-job overhead (job launch, 32-task scheduling, file listing),
    not codegen CPU, so wall/calibration mechanically inflates
    whenever the probe speeds up. Not a plan regression
    (sweeps/r10/adjudicate_micro.json carries the measurement). The
    structural shape is pinned here so future wall noise on this slot
    adjudicates against the plan, not against a normalizer that does
    not apply to its shape."""
    plan = _plan(spark, oracle_sf_dir, "ann_cosine_topk")
    # the 5 probes broadcast once and the deliberate brute-force cross
    # is the broadcast nested-loop; losing the broadcast (a shuffled
    # cartesian) is the regression worth catching
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_sessions_single_shuffle_merging_sessions(spark, oracle_sf_dir):
    """Same adjudication (round-9 verdict "what's wrong" #1):
    sessions_30m wall 0.62 s on the 2.6x-faster host vs 0.786 s on the
    r9 driver — a fixed-overhead micro-slot, not codegen-bound, so the
    r8->r9 "1.41x normalized" reading was the normalizer, not the
    plan. Structural pin: partial session aggregation before EXACTLY
    one hash exchange on user_id, then MergingSessions — a second
    shuffle or a lost map-side partial is the real regression."""
    plan = _plan(spark, oracle_sf_dir, "events_sessions_30m")
    assert "MergingSessions" in plan
    assert "partial_count" in plan  # map-side combine before the shuffle
    # formatted mode mentions each operator twice (tree + detail)
    assert plan.count("Exchange") == 2


def test_ivfpq_rerank_indexed_query_has_no_training(spark, oracle_sf_dir):
    """r10: the indexed IVF-PQ + exact-rerank composition (the drift
    contract's recall instrument) must answer from the persisted
    triple — no k-means machinery in the query plan — and touch full
    vectors only through the rerank join (by design, its recall
    contract)."""
    plan = _plan(spark, oracle_sf_dir, "ann_ivfpq_rerank_topk_indexed")
    assert "posexplode" not in plan
    assert "Scan ExistingRDD" not in plan
    assert "coded" in plan and "centroids" in plan
    assert "books" not in plan          # codebook inlined as literals (r14)


def test_wordpiece_encode_no_python_broadcast_vocab(spark, oracle_sf_dir):
    """r10: the WordPiece walk must stay whole-stage-codegen — no
    Python/Arrow evaluation anywhere in the plan (the whole point of
    the jump-table formulation) — with the vocab joined BROADCAST and
    the doc⋈word join salted, never a corpus-scale SortMergeJoin on
    the bare word key."""
    plan = _plan(spark, oracle_sf_dir, "wordpiece_encode_docs")
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_unigram_encode_no_python_broadcast_vocab(spark, oracle_sf_dir):
    """r10: the Viterbi DP must stay whole-stage-codegen like the
    WordPiece walk it generalizes — no Python/Arrow evaluation, scored
    vocab joined broadcast, no cartesian."""
    plan = _plan(spark, oracle_sf_dir, "unigram_encode_docs")
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hw_residual_anomaly_profile_broadcasts(spark, oracle_sf_dir):
    """r10: the forecast-residual anomaly face — the only pandas in
    the plan is the Holt-Winters fold itself (the order-dependent
    recurrence, the documented exception class); the residual profile
    is a per-series 3-scalar table and must broadcast back, never a
    SortMergeJoin."""
    plan = _plan(spark, oracle_sf_dir, "events_hw_residual_anomaly")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_matryoshka_indexed_query_has_no_training(spark, oracle_sf_dir):
    """r11: the Matryoshka build/query split — the prefix index is
    persisted (books/codes parquet), the query slices probes to the
    prefix and reranks from the primary store; no k-means machinery
    anywhere in the query plan."""
    plan = _plan(spark, oracle_sf_dir, "ann_matryoshka_rerank_topk_indexed")
    assert "posexplode" not in plan
    assert "Scan ExistingRDD" not in plan
    assert "codes" in plan
    assert "books" not in plan          # codebook inlined as literals (r14)


def test_percell_coreset_round_fold_broadcasts(spark, oracle_sf_dir):
    """The per-cell k-center's scale contract: each round's fold joins
    the corpus to an n_cells-row centers frame — that join must
    BROADCAST (never shuffle the corpus against a frame the size of
    the cell count), and nothing in the composition may degenerate to
    a cartesian product. The entry runs the full m_per_cell=3
    selection, so its final-state plan carries every round's fold."""
    from khronus_spark.operators import coreset as coreset_ops
    from khronus_spark.operators import similarity as sim_ops
    from khronus_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, oracle_sf_dir, "embeddings")
    cells = sim_ops.ivf_assignments(emb).withColumnRenamed(
        "centroid_id", "cell"
    )
    # the round-fold frame (what each iteration re-selects): corpus
    # state joined LEFT to the per-cell newest-center frame
    q = emb.select(
        "vec_id", F.expr(coreset_ops._QUANT).alias("e")
    ).join(cells.select("vec_id", "cell"), "vec_id")
    new_df = F.broadcast(
        q.groupBy("cell").agg(F.min_by("e", F.col("vec_id")).alias("ce"))
    )
    folded = q.join(new_df, "cell", "left")
    plan = folded._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_matryoshka_probe_exact_stage_broadcasts_probes(
    spark, oracle_sf_dir
):
    """The recall probe's exact stage scans the corpus ONCE against
    broadcast probes (the ann_recall_at_k cost class) — the probe-side
    join must be a broadcast nested loop (tiny build side, non-equi
    self-exclusion), never a cartesian product, and the one-row output
    must not smuggle in a second corpus aggregate."""
    from khronus_spark.operators import pq as pq_ops
    from khronus_spark.sources.tables import load_table

    emb = load_table(spark, oracle_sf_dir, "embeddings")
    df = pq_ops.matryoshka_recall_probe(
        emb, [0, 1, 2], 3, n_candidates=10, prefix_dims=16, sub=4, k=8,
        iters=1,
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_pq_mmr_indexed_has_no_training(spark, oracle_sf_dir, tmp_path):
    """The indexed PQ+MMR composition follows the standing
    index/query discipline: the query plan reads persisted
    books/codes and the primary store — no k-means aggregate, no
    training scan anywhere in it."""
    from pyspark.sql import functions as F

    from khronus_spark.operators import pq as pq_ops
    from khronus_spark.sources.tables import load_table

    emb = load_table(spark, oracle_sf_dir, "embeddings")
    books, codes = pq_ops.pq_build_index(emb, sub=4, k=8, iters=1)
    path = str(tmp_path / "pqmmr")
    pq_ops.write_pq_index(books, codes, path)
    books, codes = pq_ops.read_pq_index(spark, path)
    probes = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    # the greedy's localCheckpoints cut lineage, so the gate reads
    # the factored CANDIDATE stage — the only part that touches the
    # index/corpus (everything after is pool-sized driver algebra)
    df = pq_ops._mmr_candidates_indexed(
        books, codes, probes, emb, pool=10, sub=4, k=8, dims=64
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the trained state arrives from parquet, never recomputed
    assert "pqmmr" in plan
    assert "kmeans" not in plan.lower()
    assert "CartesianProduct" not in plan

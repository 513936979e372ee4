"""DSIR importance resampling: planted-domain behavior and the
broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from khronus_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_dsir_upweights_target_domain_vocabulary(spark):
    """Target sample (doc_id % 43 == 0) speaks 'medical' vocabulary.
    Raw-pool docs sharing that vocabulary must outscore raw-pool docs
    speaking unrelated vocabulary — the defining DSIR property."""
    med = "patient dosage trial clinical symptom therapy relapse biopsy"
    web = "click subscribe offer deal shipping cart discount checkout"
    rows = [(0, med), (43, med + " cohort placebo")]  # target sample
    on_domain = [(i, med) for i in range(1, 9)]
    off_domain = [(i, web) for i in range(10, 18)]
    df = _docs(spark, rows + on_domain + off_domain)

    got = {
        r.doc_id: r.iw_score
        for r in curation.dsir_importance_weights(df).collect()
    }
    # every raw doc is scored, targets are not
    assert 0 not in got and 43 not in got
    assert set(got) == {i for i, _ in on_domain + off_domain}
    worst_on = min(got[i] for i, _ in on_domain)
    best_off = max(got[i] for i, _ in off_domain)
    assert worst_on > best_off, (worst_on, best_off)


def test_dsir_topk_is_deterministic_and_ranked(spark):
    med = "alpha beta gamma delta"
    rows = [(0, med)] + [(i, med if i % 2 else "zeta eta") for i in range(1, 12)]
    df = _docs(spark, rows)
    a = curation.dsir_topk(df, k=5).collect()
    b = curation.dsir_topk(df, k=5).collect()
    assert a == b
    assert [r.rank for r in a] == [1, 2, 3, 4, 5]
    scores = [r.iw_score for r in a]
    assert scores == sorted(scores, reverse=True)


def test_dsir_bucket_table_broadcasts(spark):
    """The ≤256-row bucket ratio table and the normalizer scalar must
    reach the per-doc counts as broadcast joins — the corpus side is
    never shuffled for them."""
    df = _docs(spark, [(i, f"tok{i % 7} common word") for i in range(60)])
    plan = curation.dsir_importance_weights(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan

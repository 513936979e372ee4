"""Semantic tests for the benchmark-decontamination scan
(operators/dedup.py::decontamination)."""

from __future__ import annotations

from khronus_spark.operators.dedup import decontamination


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_to_eval_doc_is_fully_contaminated(spark):
    # doc_id 0 is in the eval split (0 % 11 == 0); doc 1 copies it.
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in decontamination(docs).collect()}
    assert set(out) == {1, 2}  # eval docs themselves are excluded
    assert out[1]["contamination_bp"] == 10000
    assert out[2]["contamination_bp"] == 0
    assert out[2]["n_overlap"] == 0


def test_partial_overlap_counts_shared_shingles(spark):
    # eval doc contributes shingles of "a b c d"; corpus doc shares the
    # prefix "a b c" (one of its three 3-gram shingles).
    docs = _docs(
        spark,
        [
            (0, "a b c d"),
            (5, "a b c x y"),
        ],
    )
    row = decontamination(docs).collect()[0]
    assert row["doc_id"] == 5
    assert row["n_shingles"] == 3  # "a b c", "b c x", "c x y"
    assert row["n_overlap"] == 1
    assert row["contamination_bp"] == 3333


def test_short_doc_falls_back_to_whole_text_shingle(spark):
    docs = _docs(spark, [(0, "one two"), (7, "one two")])
    row = decontamination(docs).collect()[0]
    assert row["n_shingles"] == 1
    assert row["contamination_bp"] == 10000

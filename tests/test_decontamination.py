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


def test_fuzzy_flags_near_duplicate_of_eval_doc(spark):
    """An edited copy of an eval doc (one word changed out of 12) must
    collide in at least one MinHash band; an unrelated doc must not."""
    from khronus_spark.operators.dedup import decontamination_fuzzy

    eval_text = (
        "the quick brown fox jumps over the lazy dog near the river"
    )
    near_dup = (
        "the quick brown fox jumps over the lazy cat near the river"
    )
    unrelated = "completely different subject matter about spark plans"
    docs = spark.createDataFrame(
        [(0, eval_text), (1, near_dup), (2, unrelated)],
        "doc_id long, text string",
    )
    # 8 single-row bands: collision needs only ONE of 8 min-hashes to
    # agree — the sensitive setting a small eval suite affords (recall
    # rises with band count; the registry default of 2 bands x 4 rows
    # stays precision-oriented)
    out = {
        r["doc_id"]: r
        for r in decontamination_fuzzy(
            docs, eval_mod=11, num_hashes=8, bands=8
        ).collect()
    }
    assert 0 not in out  # eval doc itself is excluded from the output
    assert out[1]["flagged"], "near-duplicate of eval doc must flag"
    assert not out[2]["flagged"], "unrelated doc must not flag"


def test_fuzzy_empty_when_no_eval_docs(spark):
    from khronus_spark.operators.dedup import decontamination_fuzzy

    docs = spark.createDataFrame(
        [(1, "some text here"), (2, "other words entirely")],
        "doc_id long, text string",
    )
    out = decontamination_fuzzy(docs, eval_mod=11).collect()
    # no doc_id % 11 == 0 -> nothing to collide with; all unflagged
    assert len(out) == 2 and not any(r["flagged"] for r in out)

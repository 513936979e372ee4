"""Unicode (NFKC) normalization: fixture-set parity with the shared
pure-Python definition, ASCII agreement with the exact-parity core op,
and the NULL contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from khronus_spark.operators.text import (
    nfkc_normalize_str,
    normalize_text,
    normalize_text_nfkc,
)

#: Pinned Unicode edge cases: (input, expected_norm). Expected values
#: are LITERALS — the test pins behavior, it does not re-derive it.
FIXTURES = [
    # full-width forms + ideographic space fold to ASCII
    ("\uff28\uff45\uff4c\uff4c\uff4f\u3000\uff57\uff4f\uff52\uff4c\uff44", "Hello world"),
    # ligature splits
    ("\ufb01le \ufb02ow", "file flow"),
    # compatibility digits / circled numbers
    ("\u2460\u2461\u2462", "123"),
    ("x\u00b2", "x2"),
    # combining sequence composes (NFKC includes canonical composition)
    ("e\u0301clair", "\u00e9clair"),
    # NBSP folds to a plain space (NFKC) and collapses
    ("a\u00a0\u00a0b", "a b"),
    # zero-width space/joiners and soft hyphen strip entirely
    ("zero\u200bwidth", "zerowidth"),
    ("join\u200der", "joiner"),
    ("soft\u00adhyphen", "softhyphen"),
    ("bom\ufeffless", "bomless"),
    # control chars become spaces, unicode whitespace runs collapse
    ("a\tb\r\nc\x00d", "a b c d"),
    ("\u2003lead\u2002\u2009thin\u3000", "lead thin"),
    # already-clean ASCII is untouched
    ("plain ascii text", "plain ascii text"),
    ("", ""),
    (None, None),
]


def test_nfkc_fixture_parity(spark):
    """The distributed path must reproduce the pinned fixtures exactly
    (and therefore agree with nfkc_normalize_str, the single shared
    definition), with code-point lengths and null-safe changed
    flags."""
    rows = [(i, s) for i, (s, _) in enumerate(FIXTURES)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in normalize_text_nfkc(docs).collect()
    }
    for i, (inp, want) in enumerate(FIXTURES):
        r = got[i]
        assert r["text_norm"] == want, (inp, r["text_norm"], want)
        assert r["text_norm"] == nfkc_normalize_str(inp)
        if want is None:
            assert r["n_chars_norm"] is None and r["changed"] is False
        else:
            assert r["n_chars_norm"] == len(want)
            assert r["changed"] == (want != inp)


def test_nfkc_agrees_with_core_op_on_ascii(spark, sf_dir):
    """On the (ASCII) gate corpus the Unicode extension must be a
    strict superset that changes nothing: all three output columns
    equal the exact-parity core operator's, row for row."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = normalize_text(docs).orderBy("doc_id").collect()
    b = normalize_text_nfkc(docs).orderBy("doc_id").collect()
    assert len(a) == len(b) > 0
    assert a == b


def test_nfkc_is_idempotent(spark):
    """Normalizing a normalized corpus is the identity — the property
    that lets the pass run incrementally without re-touching clean
    docs."""
    rows = [(i, s) for i, (s, _) in enumerate(FIXTURES) if s is not None]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    once = normalize_text_nfkc(docs).select(
        "doc_id", F.col("text_norm").alias("text")
    )
    twice = normalize_text_nfkc(once)
    assert all(not r["changed"] for r in twice.collect())

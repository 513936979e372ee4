"""JSONL/CSV corpus ingestion: schema enforcement + corrupt-record
quarantine (sources/ingest_files.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from khronus_spark.sources.ingest_files import (
    read_documents_csv,
    read_documents_jsonl,
    split_quarantine,
)

GOOD = '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}'
KEYLESS = '{"text": "no id here", "lang": "en", "source": "web", "n_chars": 10}'
GARBAGE = '{"doc_id": oops not json'


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    p = tmp_path / "drop.jsonl"
    p.write_text("\n".join([GOOD, GARBAGE, KEYLESS]) + "\n")
    clean, quarantine = split_quarantine(read_documents_jsonl(spark, str(p)))

    rows = clean.collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1 and rows[0]["text"] == "hello world"
    assert "_corrupt_record" not in clean.columns

    q = sorted(r["raw_line"] for r in quarantine.collect())
    assert len(q) == 2
    assert GARBAGE in q  # malformed line preserved verbatim for replay
    assert any("no id here" in line for line in q)  # keyless row quarantined


def test_jsonl_reader_declares_schema_no_inference_pass(spark, tmp_path):
    p = tmp_path / "drop.jsonl"
    p.write_text(GOOD + "\n")
    df = read_documents_jsonl(spark, str(p))
    # Explicit contract: typed columns + quarantine column, no sampling.
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars", "_corrupt_record",
    ]
    assert df.schema["doc_id"].dataType.typeName() == "long"


def test_csv_clean_and_type_mismatch_quarantined(spark, tmp_path):
    p = tmp_path / "drop.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "7,hi there,en,web,8\n"
        "notanint,bad row,en,web,6\n"
    )
    clean, quarantine = split_quarantine(read_documents_csv(spark, str(p)))
    rows = clean.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 7
    assert quarantine.count() == 1


def test_jsonl_quarantine_works_in_streaming(spark, tmp_path):
    """The same reader contract under Structured Streaming: a JSONL
    drop directory consumed with readStream splits clean/quarantine
    identically to batch (PERMISSIVE + corrupt column are
    streaming-safe)."""
    from khronus_spark.sources.ingest_files import (
        CORRUPT_COL,
        DOCUMENTS_SCHEMA,
        _with_corrupt,
        split_quarantine,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.jsonl").write_text(GOOD + "\n" + GARBAGE + "\n")
    (drop / "b.jsonl").write_text(KEYLESS + "\n")

    stream = (
        spark.readStream.schema(_with_corrupt(DOCUMENTS_SCHEMA))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(str(drop))
    )
    clean, quarantine = split_quarantine(stream)
    for name, df in (("ing_clean", clean), ("ing_quar", quarantine)):
        q = (
            df.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    assert spark.sql("select * from ing_clean").count() == 1
    assert spark.sql("select * from ing_quar").count() == 2


def test_orc_reader_contract_and_drift(spark, tmp_path):
    """ORC drops are typed — the reader enforces the documents contract
    loudly: conforming files round-trip (extra columns dropped), a
    missing column and a wrong-typed column each raise with the
    offending names."""
    from khronus_spark.sources.ingest_files import (
        DOCUMENTS_SCHEMA,
        read_documents_orc,
    )

    rows = [(1, "hello world", "en", "s0", 11), (2, "more text", "en", "s1", 9)]
    good = spark.createDataFrame(rows, DOCUMENTS_SCHEMA).withColumn(
        "extra", F.lit("x")
    )
    p = str(tmp_path / "good_orc")
    good.write.orc(p)
    back = read_documents_orc(spark, p)
    assert back.columns == [f.name for f in DOCUMENTS_SCHEMA.fields]
    assert back.count() == 2

    bad_missing = spark.createDataFrame(
        [(1, "t", "en")], "doc_id long, text string, lang string"
    )
    p2 = str(tmp_path / "missing_orc")
    bad_missing.write.orc(p2)
    with pytest.raises(ValueError, match="missing contract columns.*source"):
        read_documents_orc(spark, p2)

    bad_type = spark.createDataFrame(
        [(1, "t", "en", "s", "11")],
        "doc_id long, text string, lang string, source string, n_chars string",
    )
    p3 = str(tmp_path / "drift_orc")
    bad_type.write.orc(p3)
    with pytest.raises(ValueError, match="schema drift.*n_chars"):
        read_documents_orc(spark, p3)

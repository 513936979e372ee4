"""Streaming SCD2 maintenance: stream==batch (late facts included),
replay idempotence, the per-version derived-consistency invariant
(dim(v) == scd2_intervals(facts(v)) at EVERY commit), and bounded
write amplification (untouched buckets keep their staged dirs)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from khronus_spark.operators.scd2 import scd2_intervals
from khronus_spark.sources.txnlog import TxnTable
from khronus_spark.streaming.scd2 import (
    read_scd2_dimension,
    read_scd2_facts,
    run_streaming_scd2,
)

WEEK_NS = 604_800_000 * 1_000_000
SCHEMA = "event_id long, user_id long, ts long, event_type string"


def _week(w: int) -> int:
    # mid-week timestamp in epoch-ns
    return w * WEEK_NS + WEEK_NS // 2


#: Facts engineered so late data CHANGES history: user 1 looks like
#: 'click'-dominant in week 1 until chunk 3's late week-1 'buy' facts
#: flip the dominant type and re-split the interval chain.
CHUNK1 = [
    (1, 1, _week(1), "click"),
    (2, 1, _week(2), "click"),
    (3, 2, _week(1), "view"),
]
CHUNK2 = [
    (4, 1, _week(3), "buy"),
    (5, 2, _week(2), "view"),
    (6, 3, _week(1), "click"),
]
CHUNK3_LATE = [
    (7, 1, _week(1), "buy"),   # late: week 1, ties 1-1 -> 'buy' wins lexicographic? no: 'buy' < 'click'
    (8, 1, _week(1), "buy"),   # late: now 2-1, 'buy' dominant in week 1
    (9, 2, _week(1), "view"),  # late duplicate-week reinforcement
]
ALL = CHUNK1 + CHUNK2 + CHUNK3_LATE


def _stream_chunks(spark, tmp, chunks, table, ckpt, n_buckets=4):
    import os
    import shutil

    landing = f"{tmp}/landing_{ckpt}"
    os.makedirs(landing, exist_ok=True)
    stream = spark.readStream.schema(SCHEMA).parquet(landing)
    for i, chunk in enumerate(chunks):
        stage = f"{tmp}/stage_{ckpt}_{i}"
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        for j, f in enumerate(
            sorted(os.listdir(stage))
        ):
            if f.endswith(".parquet"):
                shutil.copy(f"{stage}/{f}", f"{landing}/chunk{i}_{j}.parquet")
        q = run_streaming_scd2(
            stream, table, f"{tmp}/{ckpt}", n_buckets=n_buckets
        )
        q.awaitTermination(120)


def _dim_content(spark, table, version=None):
    df = read_scd2_dimension(spark, table, version)
    return set() if df is None else {tuple(r) for r in df.collect()}


def _expected(spark, rows):
    ev = spark.createDataFrame(rows, SCHEMA).select(
        "user_id", "ts", "event_type"
    )
    return {tuple(r) for r in scd2_intervals(ev).collect()}


def test_stream_equals_batch_with_late_facts(spark, tmp_path):
    table = TxnTable(str(tmp_path / "t"))
    _stream_chunks(
        spark, str(tmp_path), [CHUNK1, CHUNK2, CHUNK3_LATE], table, "ck1"
    )
    got = _dim_content(spark, table)
    want = _expected(spark, ALL)
    assert got == want and got
    # the late chunk genuinely changed week-1 history (not a no-op):
    pre_late = _expected(spark, CHUNK1 + CHUNK2)
    assert pre_late != want


def test_every_version_is_derived_consistent(spark, tmp_path):
    """THE invariant the one-commit design buys: at every committed
    version, the dimension equals scd2_intervals of the facts at that
    same version — no snapshot can see facts the dimension has not
    absorbed."""
    table = TxnTable(str(tmp_path / "t"))
    _stream_chunks(
        spark, str(tmp_path), [CHUNK1, CHUNK2, CHUNK3_LATE], table, "ck1"
    )
    assert table.version() >= 3
    for v in range(1, table.version() + 1):
        facts = read_scd2_facts(spark, table, v)
        want = {
            tuple(r)
            for r in scd2_intervals(
                facts.select("user_id", "ts", "event_type")
            ).collect()
        }
        assert _dim_content(spark, table, v) == want, f"version {v}"


def test_replay_is_idempotent(spark, tmp_path):
    table = TxnTable(str(tmp_path / "t"))
    _stream_chunks(
        spark, str(tmp_path), [CHUNK1, CHUNK2, CHUNK3_LATE], table, "ck1"
    )
    v1, dim1 = table.version(), _dim_content(spark, table)
    facts1 = {
        tuple(r) for r in read_scd2_facts(spark, table).collect()
    }
    # full redelivery: fresh checkpoint over the same landing chunks
    _stream_chunks(
        spark, str(tmp_path), [CHUNK1 + CHUNK2 + CHUNK3_LATE], table, "ck2"
    )
    assert table.version() > v1  # new versions...
    assert _dim_content(spark, table) == dim1  # ...identical content
    assert {
        tuple(r) for r in read_scd2_facts(spark, table).collect()
    } == facts1


def test_untouched_buckets_are_not_rewritten(spark, tmp_path):
    """Bounded write amplification: a batch touching only user 100's
    bucket must leave every other bucket's staged dirs untouched (the
    commit carries them by reference)."""
    table = TxnTable(str(tmp_path / "t"))
    _stream_chunks(spark, str(tmp_path), [CHUNK1 + CHUNK2], table, "ck1")
    before = table.snapshot_files()
    # user 100 -> bucket 0 with n_buckets=4; users 1,2,3 occupy 1,2,3
    _stream_chunks(
        spark,
        str(tmp_path),
        [[(100, 100, _week(1), "click")]],
        table,
        "ck2",
    )
    after = table.snapshot_files()
    for key, path in before.items():
        if key.endswith("bucket=0"):
            continue
        assert after[key] == path, key
    assert "facts/bucket=0" in after and "dim/bucket=0" in after


def test_dimension_semantics_match_batch_operator(spark):
    """Spot semantics guard: the engineered fixture's expected chain
    (derived by the BATCH operator, which the driver oracle already
    proves) splits user 1 into buy@w1, click@w2, buy@w3."""
    want = _expected(spark, ALL)
    u1 = sorted(t for t in want if t[0] == 1)
    assert u1 == [
        (1, "buy", 1, 1, 1),
        (1, "buy", 3, 3, 1),
        (1, "click", 2, 2, 1),
    ]

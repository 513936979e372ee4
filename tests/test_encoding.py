"""Histogram-state blob encoding: round-trip identity, summary
equivalence after a round-trip, and the compactness claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from khronus_spark.functions.encoding import (
    decode_hist,
    decoded_states,
    encode_hist,
    encoded_states,
)
from khronus_spark.operators.hdr_rollup import histogram_state, state_summary
from khronus_spark.sources.tables import measurements_from_events

WINDOW_MS = 3_600_000


def test_varint_roundtrip_unit():
    cases = [
        [(0, 1)],
        [(1, 1), (127, 2), (128, 3), (300, 4), (36_000_000, 5)],
        [(2047, 10), (2049, 2**40)],
    ]
    for entries in cases:
        assert decode_hist(encode_hist(entries)) == entries


def test_state_roundtrip_and_summary_equivalence(spark, sf_dir):
    m = measurements_from_events(spark, sf_dir).where(F.col("mtype") == "timer")
    state = histogram_state(m, WINDOW_MS)
    back = decoded_states(encoded_states(state))

    orig = {
        (r["metric"], r["ts"]): r for r in state_summary(state).collect()
    }
    rt = {(r["metric"], r["ts"]): r for r in state_summary(back).collect()}
    assert orig.keys() == rt.keys() and orig
    for k in orig:
        for col in ("p50", "p99", "p999", "min", "max", "count", "mean"):
            assert orig[k][col] == rt[k][col], (k, col)


def test_blob_is_compact(spark, sf_dir):
    """The reference's envelope: 'order of few hundred bytes' per bucket
    (`store/HistogramBucketStore.scala:69-71`). Also must beat a naive
    16-bytes-per-entry fixed encoding."""
    m = measurements_from_events(spark, sf_dir).where(F.col("mtype") == "timer")
    state = histogram_state(m, WINDOW_MS)
    stats = (
        encoded_states(state)
        .join(state.select("metric", "ts", F.size("hist").alias("n")), ["metric", "ts"])
        .select(
            F.octet_length("blob").alias("blob_bytes"),
            (F.col("n") * 16).alias("naive_bytes"),
        )
        .agg(
            F.avg("blob_bytes").alias("avg_blob"),
            F.max("blob_bytes").alias("max_blob"),
            F.avg("naive_bytes").alias("avg_naive"),
        )
        .first()
    )
    assert stats["max_blob"] < 1000
    assert stats["avg_blob"] < stats["avg_naive"]


def test_worst_case_state_stays_under_reference_blob_cap():
    """The reference hard-caps serialized histogram blobs at 200 KB
    (`store/HistogramBucketStore.scala:69-71`). Our quantized domain
    bounds the state STRUCTURALLY: enumerate every representable
    quantized value in [0, HIGHEST_TRACKABLE] with a worst-case
    (maximally irregular) count per entry — the max-entropy state a
    bucket can ever hold — and the encoded blob must stay far below
    the cap."""
    from khronus_spark.functions.encoding import decode_hist, encode_hist
    from khronus_spark.functions.hdr import HIGHEST_TRACKABLE, SUB_BUCKET_COUNT

    values = set()
    v = 0
    while v <= HIGHEST_TRACKABLE:
        if v < SUB_BUCKET_COUNT:
            q = v
            step = 1
        else:
            rng = 1 << (v.bit_length() - 1 - 10)
            q = (v // rng + 1) * rng - 1
            step = rng
        values.add(q)
        v += step
    entries = [(q, (q * 2654435761) % 10_000 + 1) for q in sorted(values)]
    blob = encode_hist(entries)
    assert len(entries) > 10_000  # genuinely the full domain
    assert len(blob) < 200_000  # reference cap, with a wide margin
    assert decode_hist(blob) == entries


def test_varint_refuses_negative_delta_instead_of_hanging():
    """r13 review: an unsorted entry list produced a negative delta,
    and the arithmetic right shift never terminates the varint loop
    for negatives — a silent hang + unbounded memory inside the Arrow
    batch. It now fails fast naming the broken precondition."""
    import pytest

    from khronus_spark.functions.encoding import encode_hist

    with pytest.raises(ValueError, match="sorted ascending"):
        encode_hist([(100, 1), (50, 2)])
    # the sorted form still round-trips
    from khronus_spark.functions.encoding import decode_hist

    assert decode_hist(encode_hist([(50, 2), (100, 1)])) == [
        (50, 2),
        (100, 1),
    ]

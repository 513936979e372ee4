"""Compact binary encoding for histogram states (O8 parity).

The reference stores per-bucket histograms as "SkinnyHistogram" blobs —
sparse delta+varint encoding, Deflate-compressed, "order of few hundred
bytes" per bucket (`org/HdrHistogram/SkinnyHistogram.scala:16-73`,
`store/HistogramBucketStore.scala:69-71`). Parquet already gives the
summary tables columnar compression for free (SURVEY §4 O8), so this
encoding matters only where a histogram *state* must live in a single
cell: a streaming state store, a KV cache, or a compact interchange
table.

Layout (all varints are LEB128 on non-negative ints):
    varint(n_entries), then per entry (sorted by value):
    varint(value_delta_from_previous), varint(count)
Delta+varint exploits the quantized domain's clustering exactly like
the reference's encoding; zlib on top matches its Deflate step.

Implemented as Arrow-batched pandas UDFs — encoding is per-row and
map-only at any scale.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

__all__ = ["encode_hist", "decode_hist", "encoded_states", "decoded_states"]


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        # a negative value delta means the entries broke the
        # sorted-by-value precondition; without this guard the
        # arithmetic shift converges to -1 (never 0) and the loop
        # appends 0xFF bytes FOREVER — a silent hang + memory blowup
        # inside the Arrow batch instead of an error (r13 review)
        raise ValueError(
            f"varint cannot encode negative value {v}: encode_hist "
            "entries must be sorted ascending by value"
        )
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def encode_hist(entries) -> bytes:
    """[(v, c), ...] sorted by v → delta+varint+zlib blob."""
    out = bytearray()
    _write_varint(out, len(entries))
    prev = 0
    for e in entries:
        v, c = (e["v"], e["c"]) if isinstance(e, dict) else (e[0], e[1])
        _write_varint(out, int(v) - prev)
        _write_varint(out, int(c))
        prev = int(v)
    return zlib.compress(bytes(out), 6)


def decode_hist(blob: bytes) -> list[tuple[int, int]]:
    buf = zlib.decompress(bytes(blob))
    n, pos = _read_varint(buf, 0)
    entries = []
    prev = 0
    for _ in range(n):
        dv, pos = _read_varint(buf, pos)
        c, pos = _read_varint(buf, pos)
        prev += dv
        entries.append((prev, c))
    return entries


def encoded_states(state: DataFrame) -> DataFrame:
    """(metric, ts, hist: array<struct<v,c>>) → (metric, ts, blob)."""

    @F.pandas_udf(BinaryType())
    def enc(hist: pd.Series) -> pd.Series:
        return hist.map(encode_hist)

    return state.select("metric", "ts", enc(F.col("hist")).alias("blob"))


def decoded_states(df: DataFrame) -> DataFrame:
    """(metric, ts, blob) → (metric, ts, hist) — inverse of
    encoded_states; output matches operators/hdr_rollup.py state shape."""

    @F.pandas_udf("array<struct<v: bigint, c: bigint>>")
    def dec(blob: pd.Series) -> pd.Series:
        return blob.map(
            lambda b: [{"v": v, "c": c} for v, c in decode_hist(b)]
        )

    return df.select("metric", "ts", dec(F.col("blob")).alias("hist"))

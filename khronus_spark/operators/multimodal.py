"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow-batched
`mapInPandas` UDF signatures, batch shapes, partition-preserving
transforms. Image decode is REAL for two uncompressed formats, parsed
byte-by-byte in pure Python inside the Arrow batch (no codec deps):

- binary PPM (P6): magic + whitespace/comment-tolerant header
  (width, height, maxval ≤ 255) + raw RGB triples;
- uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up or top-down,
  4-byte row padding, BGR order);
- 8-bit RGB PNG (color type 2, non-interlaced): real zlib inflate of
  the IDAT stream + full scanline defiltering (None/Sub/Up/Average/
  Paeth) — stdlib zlib, no codec package.

Audio decode is REAL for PCM 16-bit mono RIFF/WAVE (`_decode_audio`):
chunk walk, format validation, every sample read for peak/abs-sum.

Payloads that are none of these (plus compressed codecs — JPEG, ffmpeg
and friends are absent from this container) fall back to checksum-only
features: the decoders return None and the stat columns are NULL.
Swap/extend `_decode_image`/`_decode_audio` for PIL/ffmpeg in a real
deployment and nothing else changes.

Design for 100 TB: media rows are large, so every operator is
`mapInPandas` (Arrow batches, streaming per-partition, no collect);
metadata-only predicates (kind, width, duration) are plain columns so
Catalyst prunes/pushes them down *before* any payload is touched.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from khronus_spark.sources.tables import spread

#: canonical media table schema: payload is opaque binary; metadata is
#: typed columns (filter/prune without touching bytes).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("checksum", StringType()),
        StructField("feature", StringType()),  # coarse feature-bucket id
        # real decode results — NULL when the payload is not PPM/BMP/PNG
        StructField("img_width", IntegerType()),
        StructField("img_height", IntegerType()),
        StructField("mean_r", IntegerType()),
        StructField("mean_g", IntegerType()),
        StructField("mean_b", IntegerType()),
        StructField("max_channel", IntegerType()),
        # real audio decode results — NULL when the payload is not
        # PCM-16 mono WAV
        StructField("n_samples", IntegerType()),
        StructField("peak_amp", IntegerType()),
        StructField("sum_abs_amp", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


#: two-tone synthetic PPM geometry/colors, all derived from doc_id so
#: the DuckDB oracle can rebuild the byte-identical payload in SQL
_PPM_W = "(doc_id % 8 + 2)"
_PPM_H = "(doc_id % 5 + 2)"
_PPM_R = "(doc_id % 200)"
_PPM_G = "(doc_id * 7 % 200)"
_PPM_B = "(doc_id * 13 % 200)"

#: hex string of the full P6 payload: header, then the first half of the
#: pixels in color (r, g, b), the rest in (r+40, g+40, b+40) — pixel
#: values DIFFER within one image, so a decoder that fails to sum every
#: pixel cannot reproduce the channel means.
_PPM_HEX = f"""
concat(
  hex(encode(concat('P6\\n', CAST({_PPM_W} AS STRING), ' ',
                    CAST({_PPM_H} AS STRING), '\\n255\\n'), 'UTF-8')),
  repeat(concat(lpad(hex({_PPM_R}), 2, '0'), lpad(hex({_PPM_G}), 2, '0'),
                lpad(hex({_PPM_B}), 2, '0')),
         CAST({_PPM_W} * {_PPM_H} DIV 2 AS INT)),
  repeat(concat(lpad(hex({_PPM_R} + 40), 2, '0'), lpad(hex({_PPM_G} + 40), 2, '0'),
                lpad(hex({_PPM_B} + 40), 2, '0')),
         CAST({_PPM_W} * {_PPM_H} - {_PPM_W} * {_PPM_H} DIV 2 AS INT))
)
"""


#: synthetic WAV geometry: n 16-bit mono PCM samples at 8 kHz, sample k
#: = (doc_id·31 + k·997) % 20001 − 10000 ∈ [−10000, 10000] — closed
#: form from doc_id so the oracle rebuilds payload AND stats in SQL
_WAV_N = "(doc_id % 5 + 2)"
_WAV_SAMPLE = "((doc_id * 31 + {k} * 997) % 20001 - 10000)"


def _le_hex_sql(expr: str, nbytes: int, div: str = "div") -> str:
    """SQL: little-endian hex of a non-negative integer expression."""
    parts = [
        f"lpad(hex(({expr}) {div} {256 ** i} % 256), 2, '0')" for i in range(nbytes)
    ]
    return "concat(" + ", ".join(parts) + ")"


def _wav_const_hex() -> tuple[str, str]:
    """(header-before-riff-size, header-after-riff-size) constant hex of
    a PCM-16 mono 8 kHz WAV — everything except the two length fields."""
    import struct

    fmt = struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    return (
        b"RIFF".hex().upper(),
        (b"WAVE" + b"fmt " + fmt + b"data").hex().upper(),
    )


_WAV_PRE, _WAV_MID = _wav_const_hex()

#: full WAV payload as hex (Spark SQL) — RIFF size = 36 + 2n, data
#: size = 2n, then n little-endian two's-complement samples
_WAV_HEX = f"""
concat(
  '{_WAV_PRE}',
  {_le_hex_sql(f"36 + 2 * {_WAV_N}", 4)},
  '{_WAV_MID}',
  {_le_hex_sql(f"2 * {_WAV_N}", 4)},
  array_join(transform(sequence(0, {_WAV_N} - 1), k ->
    {_le_hex_sql("(" + _WAV_SAMPLE.format(k="k") + " + 65536) % 65536", 2)}), '')
)
"""


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents fixture.

    Image rows (doc_id % 3 == 0) carry a REAL binary PPM payload — a
    two-tone w×h P6 image whose geometry and colors derive from doc_id
    (built engine-side with hex/repeat/unhex, so it stays in codegen
    and the oracle can rebuild it bit-for-bit). Audio rows (doc_id % 3
    == 1) carry a REAL PCM-16 mono 8 kHz WAV whose samples derive from
    doc_id the same way. Video rows keep the text bytes as an opaque
    stand-in payload (no uncompressed video container is practical to
    synthesize per-row). The width/height
    METADATA columns stay doc-stat-derived for every row — they model
    upstream-supplied metadata, which real pipelines must treat as
    untrusted until decode confirms it."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = (
        F.when(F.col("doc_id") % 3 == 0, F.unhex(F.expr(_PPM_HEX)))
        .when(F.col("doc_id") % 3 == 1, F.unhex(F.expr(_WAV_HEX)))
        .otherwise(F.encode(F.col("text"), "UTF-8"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )


def _ppm_tokens(payload: bytes) -> list[int] | None:
    """P6 header fields (w, h, maxval) + pixel-data offset, or None.
    Whitespace- and comment-tolerant per the Netpbm spec."""
    if not payload.startswith(b"P6"):
        return None
    fields: list[int] = []
    i, n = 2, len(payload)
    while len(fields) < 3 and i < n:
        c = payload[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isdigit():
            j = i
            while j < n and payload[j : j + 1].isdigit():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(fields) < 3 or i >= n or not payload[i : i + 1].isspace():
        return None
    return fields + [i + 1]  # exactly one whitespace after maxval


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_planes(payload: bytes) -> tuple[int, int, list[bytes]] | None:
    """Decode an 8-bit RGB (color type 2, non-interlaced) PNG into
    (w, h, [r, g, b] planes) — real inflate (zlib) + full scanline
    defiltering (None/Sub/Up/Average/Paeth). Pure Python + stdlib zlib;
    anything else (palette, alpha, 16-bit, interlace) returns None for
    the checksum-only fallback."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        return None
    i, n = 8, len(payload)
    w = h = 0
    idat = bytearray()
    while i + 8 <= n:
        length = int.from_bytes(payload[i : i + 4], "big")
        typ = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) < length:
            return None
        if typ == b"IHDR":
            if length != 13:
                return None
            w, h = struct.unpack(">II", data[:8])
            bit_depth, color_type, comp, filt, interlace = data[8:13]
            if (bit_depth, color_type, comp, filt, interlace) != (8, 2, 0, 0, 0):
                return None
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        i += 12 + length  # chunk header + data + CRC
    if not w or not h or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * 3
    if len(raw) != h * (stride + 1):
        return None
    prev = bytearray(stride)
    out = bytearray()
    pos = 0
    for _ in range(h):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ft == 1:  # Sub
            for x in range(3, stride):
                line[x] = (line[x] + line[x - 3]) & 255
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 255
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - 3] if x >= 3 else 0
                line[x] = (line[x] + (a + prev[x]) // 2) & 255
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 255
        elif ft != 0:
            return None
        out += line
        prev = line
    return w, h, [bytes(out[0::3]), bytes(out[1::3]), bytes(out[2::3])]


def _decode_image(payload: bytes) -> tuple[int, int, int, int, int, int] | None:
    """Parse a binary PPM (P6), an uncompressed 24-bit BMP, or an 8-bit
    RGB PNG and return (width, height, mean_r, mean_g, mean_b,
    max_channel) with integer floor-division means — None if the payload
    is none of the three (the checksum-only fallback path). Pure Python
    over bytes + stdlib zlib: no codec libraries exist in this
    container, and these formats need none."""
    png = _png_planes(payload)
    head = _ppm_tokens(payload)
    if png is not None:
        w, h, rows = png
    elif head is not None:
        w, h, maxval, off = head
        if maxval > 255 or len(payload) < off + 3 * w * h:
            return None
        px = memoryview(payload)[off : off + 3 * w * h]
        rows = [px[i::3] for i in range(3)]  # r, g, b planes
    elif payload[:2] == b"BM" and len(payload) >= 54:
        data_off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None
        nrows = abs(h)
        stride = (w * 3 + 3) // 4 * 4
        if len(payload) < data_off + stride * nrows:
            return None
        r_plane = bytearray()
        g_plane = bytearray()
        b_plane = bytearray()
        for row in range(nrows):
            base = data_off + row * stride
            line = payload[base : base + w * 3]
            b_plane += line[0::3]
            g_plane += line[1::3]
            r_plane += line[2::3]
        rows = [r_plane, g_plane, b_plane]
        h = nrows
    else:
        return None
    npix = w * h
    if npix == 0:
        return None
    means = [sum(p) // npix for p in rows]
    return (w, h, means[0], means[1], means[2], max(max(p) for p in rows))


def _decode_audio(payload: bytes) -> tuple[int, int, int] | None:
    """Parse a PCM 16-bit mono RIFF/WAVE payload and return
    (n_samples, peak_amp, sum_abs_amp) from actually reading every
    sample — None for anything else (compressed codecs, stereo,
    non-16-bit: the checksum-only fallback). Pure Python over bytes."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    fmt_ok = False
    data: bytes | None = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if len(body) < size:
            return None
        if cid == b"fmt ":
            if size < 16:
                return None
            audio_fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
            fmt_ok = (audio_fmt, channels, bits) == (1, 1, 16)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not fmt_ok or data is None or len(data) % 2:
        return None
    peak = 0
    total = 0
    count = len(data) // 2
    for s in range(count):
        v = int.from_bytes(data[2 * s : 2 * s + 2], "little", signed=True)
        a = -v if v < 0 else v
        if a > peak:
            peak = a
        total += a
    return (count, peak, total)


def _checksum_digest(payload: bytes) -> bytes:
    """Digest over the UPPERCASE-hex encoding of the payload — the form
    both engines can hash (DuckDB's sha256 only takes VARCHAR, and
    hex() is uppercase on both). Raises like a codec would on empty."""
    if not payload:
        raise ValueError("empty media payload")
    return hashlib.sha256(payload.hex().upper().encode("ascii")).digest()


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payloads (mapInPandas):
    checksum features for every payload + real PPM/BMP decode stats
    (NULL columns for undecodable/opaque payloads)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(_checksum_digest)
            decoded = pdf["payload"].map(_decode_image)
            audio = pdf["payload"].map(_decode_audio)
            stat = lambda ser, i, dt="Int32": ser.map(  # noqa: E731
                lambda d, i=i: d[i] if d is not None else None
            ).astype(dt)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "checksum": digests.map(lambda d: d.hex()[:16]),
                    "feature": digests.map(lambda d: f"feat_{d[0] % 16:x}"),
                    "img_width": stat(decoded, 0),
                    "img_height": stat(decoded, 1),
                    "mean_r": stat(decoded, 2),
                    "mean_g": stat(decoded, 3),
                    "mean_b": stat(decoded, 4),
                    "max_channel": stat(decoded, 5),
                    "n_samples": stat(audio, 0),
                    "peak_amp": stat(audio, 1),
                    "sum_abs_amp": stat(audio, 2, "Int64"),
                }
            )

    return spread(media, max_partitions=8).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame. The stub
    slices the payload; a real build would seek/decode. Fan-out happens
    inside the Arrow batch — partitioning is preserved, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for _, row in pdf.iterrows():
                n_frames = max(1, int(row["duration_ms"]) // every_ms)
                step = max(1, len(row["payload"]) // n_frames)
                for i in range(n_frames):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    payloads.append(bytes(row["payload"][i * step : i * step + step]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return spread(media.where(F.col("kind") == "video"), max_partitions=8).mapInPandas(
        run, FRAME_SCHEMA
    )


def resize_metadata(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure column math (no payload touch): target
    dims with aspect preserved — stays in whole-stage codegen."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_height"),
    )

"""Multimodal plumbing + decode tests: schema, Arrow batch shapes,
fan-out, metadata-only pruning, and the REAL pure-Python PPM/BMP
decoder against hand-built fixture images with known pixel stats."""

from __future__ import annotations

import pytest

from khronus_spark.operators import multimodal as mm
from khronus_spark.sources.tables import load_table


def _ppm_bytes(w: int, h: int, pixels: list[tuple[int, int, int]]) -> bytes:
    assert len(pixels) == w * h
    body = b"".join(bytes(p) for p in pixels)
    return f"P6\n# fixture comment\n{w} {h}\n255\n".encode() + body


def _bmp_bytes(
    w: int, h: int, pixels: list[tuple[int, int, int]], top_down: bool = False
) -> bytes:
    """Uncompressed 24-bit BMP; `pixels` row-major top-to-bottom."""
    stride = (w * 3 + 3) // 4 * 4
    rows = [pixels[y * w : (y + 1) * w] for y in range(h)]
    if not top_down:
        rows = rows[::-1]  # bottom-up storage order
    body = b"".join(
        b"".join(bytes((b, g, r)) for (r, g, b) in row) + b"\0" * (stride - w * 3)
        for row in rows
    )
    height_field = -h if top_down else h
    header = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\0\0\0\0"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + height_field.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\0" * 16
    )
    assert len(header) == 54
    return header + body


#: 2×2 fixture with distinct per-pixel colors: means are floor-divided
#: sums, max_channel is the global max over every channel byte.
_PIXELS = [(10, 200, 30), (250, 0, 60), (40, 100, 90), (7, 55, 255)]
_EXPECT = (2, 2, (10 + 250 + 40 + 7) // 4, (200 + 0 + 100 + 55) // 4,
           (30 + 60 + 90 + 255) // 4, 255)


def test_decode_ppm_fixture_pixel_stats():
    assert mm._decode_image(_ppm_bytes(2, 2, _PIXELS)) == _EXPECT


def test_decode_bmp_fixture_pixel_stats_both_row_orders():
    assert mm._decode_image(_bmp_bytes(2, 2, _PIXELS)) == _EXPECT
    assert mm._decode_image(_bmp_bytes(2, 2, _PIXELS, top_down=True)) == _EXPECT


def test_decode_bmp_row_padding():
    # width 3 → 9-byte rows padded to 12; padding must not enter stats
    px = [(i * 20, 255 - i * 20, i * 10) for i in range(6)]
    w, h = 3, 2
    exp = (
        w, h,
        sum(p[0] for p in px) // 6,
        sum(p[1] for p in px) // 6,
        sum(p[2] for p in px) // 6,
        255,
    )
    assert mm._decode_image(_bmp_bytes(w, h, px)) == exp


def test_decode_rejects_non_images():
    assert mm._decode_image(b"not an image at all") is None
    assert mm._decode_image(b"P6\n2 2\n70000\n" + b"\0" * 12) is None  # maxval>255
    assert mm._decode_image(b"P6\n9 9\n255\n\0\0\0") is None  # truncated
    assert mm._decode_image(b"BMtooshort") is None


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return mm.synthesize_media(docs).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "width", "height", "duration_ms",
    ]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_deterministic(media):
    f1 = {r["media_id"]: r["checksum"] for r in mm.extract_features(media).collect()}
    f2 = {r["media_id"]: r["checksum"] for r in mm.extract_features(media).collect()}
    assert f1 == f2 and len(f1) == media.count()
    # checksum is derived from payload bytes, 16 hex chars
    assert all(len(c) == 16 for c in f1.values())


def test_extract_features_decodes_synthesized_ppm(media):
    """Every image row's payload is a real two-tone PPM: the decoder
    must recover width/height and the closed-form channel means; the
    opaque audio/video payloads must come back with NULL stats."""
    rows = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    for mid, r in rows.items():
        if r["kind"] == "image":
            w, h = mid % 8 + 2, mid % 5 + 2
            npix, n_a = w * h, (w * h) // 2
            r1 = mid % 200
            assert (r["img_width"], r["img_height"]) == (w, h)
            assert r["mean_r"] == (n_a * r1 + (npix - n_a) * (r1 + 40)) // npix
            assert r["max_channel"] == max(r1, mid * 7 % 200, mid * 13 % 200) + 40
        else:
            assert r["img_width"] is None and r["mean_r"] is None


def test_extract_features_through_arrow_on_fixture_images(spark):
    """The mapInPandas path itself (Arrow binary batches → decoder →
    nullable Int32 stats) against hand-built PPM/BMP payloads."""
    payloads = [
        (0, "image", _ppm_bytes(2, 2, _PIXELS)),
        (1, "image", _bmp_bytes(2, 2, _PIXELS)),
        (2, "audio", b"opaque bytes"),
    ]
    df = spark.createDataFrame(
        [(i, k, p, 2, 2, 0) for i, k, p in payloads], schema=mm.MEDIA_SCHEMA
    )
    out = {r["media_id"]: r for r in mm.extract_features(df).collect()}
    for mid in (0, 1):
        r = out[mid]
        assert (
            r["img_width"], r["img_height"], r["mean_r"], r["mean_g"],
            r["mean_b"], r["max_channel"],
        ) == _EXPECT
    assert out[2]["img_width"] is None and out[2]["checksum"] is not None


def test_frame_sample_fanout(media):
    frames = mm.frame_sample(media, every_ms=1000)
    rows = frames.collect()
    n_videos = media.where("kind = 'video'").count()
    assert len(rows) >= n_videos  # at least one frame per video
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame indexes


def test_resize_metadata_never_upscales(media):
    out = mm.resize_metadata(media, max_side=256).collect()
    for r in out:
        assert max(r["target_width"], r["target_height"]) <= 256
        assert r["target_width"] <= r["width"] and r["target_height"] <= r["height"]


def test_metadata_predicate_prunes_payload(spark, media, tmp_path):
    """Filtering on metadata must not read the payload column: write to
    parquet and check the scan's ReadSchema excludes `payload`."""
    p = str(tmp_path / "media")
    media.write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p).where("kind = 'image'").select("media_id", "width")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


# ------------------------------------------------------------- PNG decode


def _png_bytes(w, h, pixels, filters=None, color_type=2, bit_depth=8):
    """Build a real PNG: pixels is [[(r,g,b)...] per row]; filters picks
    the per-row filter byte (values are ENCODED accordingly, so decode
    must invert them)."""
    import struct
    import zlib

    filters = filters or [0] * h

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = bytearray(w * 3)
    for y in range(h):
        line = bytearray()
        for px in pixels[y]:
            line += bytes(px)
        ft = filters[y]
        enc = bytearray(line)
        if ft == 1:  # Sub
            for x in range(len(line) - 1, 2, -1):
                enc[x] = (line[x] - line[x - 3]) & 255
        elif ft == 2:  # Up
            for x in range(len(line)):
                enc[x] = (line[x] - prev[x]) & 255
        elif ft == 3:  # Average
            for x in range(len(line)):
                a = line[x - 3] if x >= 3 else 0
                enc[x] = (line[x] - (a + prev[x]) // 2) & 255
        elif ft == 4:  # Paeth
            for x in range(len(line)):
                a = line[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pr) & 255
        raw += bytes([ft]) + enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _expected_stats(w, h, pixels):
    rs = [p[0] for row in pixels for p in row]
    gs = [p[1] for row in pixels for p in row]
    bs = [p[2] for row in pixels for p in row]
    n = w * h
    return (w, h, sum(rs) // n, sum(gs) // n, sum(bs) // n, max(rs + gs + bs))


def test_png_decode_all_filters():
    """Each PNG filter type (None/Sub/Up/Average/Paeth) must round-trip
    through encode-with-filter → decode to the same pixel stats."""
    from khronus_spark.operators.multimodal import _decode_image

    w, h = 5, 4
    pixels = [
        [((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 91) % 256) for x in range(w)]
        for y in range(h)
    ]
    expect = _expected_stats(w, h, pixels)
    for ft in range(5):
        payload = _png_bytes(w, h, pixels, filters=[ft] * h)
        assert _decode_image(payload) == expect, f"filter {ft}"
    # mixed filters per row (the common real-encoder case)
    payload = _png_bytes(w, h, pixels, filters=[0, 1, 2, 4])
    assert _decode_image(payload) == expect


def test_png_decode_rejects_unsupported():
    from khronus_spark.operators.multimodal import _decode_image

    pixels = [[(1, 2, 3)]]
    good = _png_bytes(1, 1, pixels)
    assert _decode_image(good) == (1, 1, 1, 2, 3, 3)
    # palette color type
    assert _decode_image(_png_bytes(1, 1, pixels, color_type=3)) is None
    # 16-bit depth
    assert _decode_image(_png_bytes(1, 1, pixels, bit_depth=16)) is None
    # truncated IDAT
    assert _decode_image(good[:-20]) is None
    # corrupt zlib stream
    bad = bytearray(good)
    bad[41] ^= 0xFF
    assert _decode_image(bytes(bad)) is None


def test_png_features_through_arrow(spark):
    """A PNG payload flowing through extract_features' mapInPandas must
    land with decoded stats beside checksum features."""
    from khronus_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    w, h = 3, 2
    pixels = [[(10, 20, 30)] * w, [(50, 60, 70)] * w]
    payload = _png_bytes(w, h, pixels, filters=[2, 4])
    rows = [(1, "image", bytearray(payload), w, h, 0)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(media).collect()[0]
    assert (out.img_width, out.img_height) == (w, h)
    assert (out.mean_r, out.mean_g, out.mean_b) == (30, 40, 50)
    assert out.max_channel == 70


# ------------------------------------------------------------- WAV decode


def _wav_bytes(samples, channels=1, bits=16, fmt=1, pad_junk_chunk=False):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt_body = struct.pack(
        "<HHIIHH", fmt, channels, 8000, 8000 * channels * bits // 8,
        channels * bits // 8, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if pad_junk_chunk:  # odd-size chunk exercises word alignment
        chunks += b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_decode_roundtrip_and_alignment():
    from khronus_spark.operators.multimodal import _decode_audio

    samples = [0, 1000, -1000, 32767, -32768, 7]
    expect = (6, 32768, sum(abs(s) for s in samples))
    assert _decode_audio(_wav_bytes(samples)) == expect
    assert _decode_audio(_wav_bytes(samples, pad_junk_chunk=True)) == expect


def test_wav_decode_rejects_unsupported():
    from khronus_spark.operators.multimodal import _decode_audio

    s = [1, 2, 3]
    assert _decode_audio(_wav_bytes(s, channels=2)) is None
    assert _decode_audio(_wav_bytes(s, bits=8)) is None
    assert _decode_audio(_wav_bytes(s, fmt=3)) is None  # IEEE float
    assert _decode_audio(_wav_bytes(s)[:-4]) is None  # truncated data
    assert _decode_audio(b"RIFFxxxxNOPE") is None


def test_synthesized_audio_rows_decode_to_closed_form(spark):
    """synthesize_media's WAV payloads must decode to the generator's
    closed-form stats — and match what the DuckDB oracle recomputes."""
    from khronus_spark.operators.multimodal import extract_features, synthesize_media

    docs = spark.createDataFrame(
        [(i, f"t {i}", "en", "s", 5) for i in (1, 4, 10, 13)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    feats = {r.media_id: r for r in extract_features(synthesize_media(docs)).collect()}
    for d in (1, 4, 10, 13):
        n = d % 5 + 2
        vals = [(d * 31 + k * 997) % 20001 - 10000 for k in range(n)]
        assert feats[d].n_samples == n
        assert feats[d].peak_amp == max(abs(v) for v in vals)
        assert feats[d].sum_abs_amp == sum(abs(v) for v in vals)

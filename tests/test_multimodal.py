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

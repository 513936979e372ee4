"""Multimodal plumbing tests: schema, Arrow batch shapes, fan-out,
metadata-only pruning (decode is a deterministic stub — the container
has no codec libraries)."""

from __future__ import annotations

import pytest

from khronus_spark.operators import multimodal as mm
from khronus_spark.sources.tables import load_table


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

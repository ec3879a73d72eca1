"""Multimodal plumbing: schema, mapInPandas feature extraction, frame plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    m = mm.synthetic_media(spark, 30).cache()
    m.count()
    return m


def test_media_schema_and_determinism(spark, media):
    def shape(schema):
        return [(f.name, f.dataType.simpleString()) for f in schema.fields]

    assert shape(media.schema) == shape(mm.MEDIA_SCHEMA)
    again = mm.synthetic_media(spark, 30)
    assert media.exceptAll(again).count() == 0


def test_extract_features_shape(media):
    feats = mm.extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] == 64          # sha2-256 hex payload
        assert abs(sum(r["feature"]) - 1.0) < 1e-3  # normalized buckets


def test_extract_features_deterministic(media):
    a = {r["media_id"]: r["feature"]
         for r in mm.extract_features(media).collect()}
    b = {r["media_id"]: r["feature"]
         for r in mm.extract_features(media).collect()}
    assert a == b


def test_frame_sample_plan(media):
    plan = mm.frame_sample_plan(media, every_ms=10_000)
    rows = plan.groupBy("media_id").count().collect()
    metas = {r["media_id"]: r["meta"]["duration_ms"]
             for r in media.filter(F.col("kind") == "video").collect()}
    got = {r["media_id"]: r["count"] for r in rows}
    assert set(got) == set(metas)
    for mid, dur in metas.items():
        expect = max(dur - 1, 0) // 10_000 + 1
        assert got[mid] == expect


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm._decode_image_stub(b"bytes", "png")

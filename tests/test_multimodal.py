"""Multimodal plumbing: schema, mapInPandas feature extraction, frame plan."""

from __future__ import annotations

import struct

import numpy as np
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
        mm._decode_image_stub(b"bytes", "jpeg")


# --- real codec kernels (PNG/BMP/PPM, pure stdlib + numpy) ---


@pytest.mark.parametrize("fmt,ch", [
    ("png", 1), ("png", 2), ("png", 3), ("png", 4), ("bmp", 3), ("ppm", 3),
])
@pytest.mark.parametrize("hw", [(1, 1), (3, 5), (17, 23)])
def test_codec_round_trip(fmt, ch, hw):
    # 17 rows × filter cycle 0-4 exercises every PNG scanline filter;
    # w=5/23 exercise BMP 4-byte row padding
    h, w = hw
    rng = np.random.default_rng(hash((fmt, ch, h, w)) % 2**32)
    arr = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
    dec = mm._decode_image(mm.encode_image(arr, fmt), fmt)
    assert dec.shape == (h, w, ch)
    assert (dec == arr).all()


def test_codec_malformed_payloads():
    for fmt, bad in [("png", b"nope"), ("png", mm._PNG_SIG + b"\0" * 4),
                     ("bmp", b"XX"), ("ppm", b"P3 1 1 255 ")]:
        with pytest.raises((ValueError, IndexError)):
            mm._decode_image(bad, fmt)
    with pytest.raises(NotImplementedError):
        mm._decode_image(b"\xff\xd8...", "jpeg")


def test_box_resize_semantics():
    assert np.allclose(
        mm.box_resize(np.full((16, 12, 3), 42, np.uint8), 4, 4), 42.0)
    g = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    assert abs(mm.box_resize(g, 1, 1)[0, 0, 0] - g.mean()) < 1e-4
    up = mm.box_resize(np.array([[[0], [255]]], np.uint8), 2, 4)
    assert up.shape == (2, 4, 1)
    assert np.allclose(up[:, :2, 0], 0) and np.allclose(up[:, 2:, 0], 255)


def test_decode_images_end_to_end(spark):
    media = mm.synthetic_image_media(spark, 24).cache()
    try:
        out = mm.decode_images(media, thumb=4)
        rows = {r["media_id"]: r for r in out.collect()}
        assert len(rows) == 24
        metas = {r["media_id"]: r["meta"] for r in media.collect()}
        for mid, r in rows.items():
            assert r["ok"], (mid, r["err"])
            assert (r["width"], r["height"]) == (
                metas[mid]["width"], metas[mid]["height"])
            assert r["channels"] in (3, 4)
            assert len(r["chan_mean"]) == r["channels"]
            assert len(r["thumb"]) == 16
            assert all(0.0 <= v <= 255.0 for v in r["thumb"])
        # determinism across runs (Arrow batch boundaries must not matter)
        again = {r["media_id"]: r for r in
                 mm.decode_images(media, thumb=4).collect()}
        assert {m: r["thumb"] for m, r in rows.items()} == \
            {m: r["thumb"] for m, r in again.items()}
    finally:
        media.unpersist()


def test_decode_images_bad_rows_survive(spark):
    good = mm.synthetic_image_media(spark, 3)
    bad = spark.createDataFrame(
        [("badpng", "image", "png", bytearray(b"not a png"), None),
         ("nojpeg", "image", "jpeg", bytearray(b"\xff\xd8\xff"), None),
         ("skipme", "video", "mp4", bytearray(b"....."), None)],
        mm.MEDIA_SCHEMA)
    out = mm.decode_images(good.unionByName(bad)).collect()
    by_id = {r["media_id"]: r for r in out}
    assert "skipme" not in by_id            # non-image rows filtered
    assert len(by_id) == 5
    assert not by_id["badpng"]["ok"] and "ValueError" in by_id["badpng"]["err"]
    assert not by_id["nojpeg"]["ok"] \
        and "NotImplementedError" in by_id["nojpeg"]["err"]
    assert all(by_id[f"img{i}"]["ok"] for i in range(3))


@pytest.mark.parametrize("rate,bits,ch", [
    (8000, 8, 1), (16000, 16, 2), (44100, 32, 1),
])
def test_wav_round_trip(rate, bits, ch):
    rng = np.random.default_rng(rate + bits + ch)
    s = rng.uniform(-0.9, 0.9, (257, ch)).astype(np.float32)
    x, r = mm._decode_wav(mm.encode_wav(s, rate, bits))
    assert r == rate and x.shape == s.shape
    tol = {8: 2 / 127, 16: 2 / 32767, 32: 1e-6}[bits]
    assert np.abs(x - s).max() < tol


def test_decode_audio_end_to_end(spark):
    media = mm.synthetic_audio_media(spark, 12).cache()
    try:
        rows = {r["media_id"]: r for r in mm.decode_audio(media).collect()}
        assert len(rows) == 12
        metas = {r["media_id"]: r["meta"]["duration_ms"]
                 for r in media.collect()}
        for mid, r in rows.items():
            assert r["ok"], (mid, r["err"])
            assert abs(r["duration_ms"] - metas[mid]) <= 1
            assert 0.0 < r["rms"] < 1.0          # sine+noise mixture
            assert 0.0 < r["zero_cross_rate"] < 1.0
            assert len(r["envelope"]) == 16
            assert all(v >= 0.0 for v in r["envelope"])
        again = {r["media_id"]: r["envelope"]
                 for r in mm.decode_audio(media).collect()}
        assert {m: r["envelope"] for m, r in rows.items()} == again
    finally:
        media.unpersist()


def test_decode_audio_bad_rows_survive(spark):
    good = mm.synthetic_audio_media(spark, 2)
    bad = spark.createDataFrame(
        [("badwav", "audio", "wav", bytearray(b"RIFF????WAVE"), None),
         ("nomp3", "audio", "mp3", bytearray(b"ID3....."), None)],
        mm.MEDIA_SCHEMA)
    by_id = {r["media_id"]: r
             for r in mm.decode_audio(good.unionByName(bad)).collect()}
    assert len(by_id) == 4
    assert not by_id["badwav"]["ok"] \
        and "ValueError" in by_id["badwav"]["err"]
    assert not by_id["nomp3"]["ok"] \
        and "NotImplementedError" in by_id["nomp3"]["err"]
    assert by_id["aud0"]["ok"] and by_id["aud1"]["ok"]


def test_decode_audio_matches_python_twin(spark):
    media = mm.synthetic_audio_media(spark, 6, seed=11)
    spark_rows = {r["media_id"]: r for r in mm.decode_audio(media).collect()}
    for r in media.collect():
        x, rate = mm._decode_wav(bytes(r["payload"]))
        mono = x.mean(axis=1)
        exp_rms = round(float(np.sqrt((mono ** 2).mean())), 6)
        got = spark_rows[r["media_id"]]
        assert got["sample_rate"] == rate
        assert abs(got["rms"] - exp_rms) < 1e-5


@pytest.mark.parametrize("cs", ["420", "444"])
def test_y4m_round_trip(cs):
    rng = np.random.default_rng(len(cs) + ord(cs[1]))
    frames = rng.integers(0, 256, (9, 6, 8)).astype(np.uint8)
    enc = mm.encode_y4m(frames, fps=30, colorspace=cs)
    hdr, start = mm._parse_y4m_header(enc)
    assert (hdr["w"], hdr["h"], hdr["fps_num"]) == (8, 6, 30)
    for i in range(9):
        assert (mm._decode_y4m_frame(enc, hdr, start, i) == frames[i]).all()


def test_sample_frames_end_to_end(spark):
    media = mm.synthetic_video_media(spark, 9).cache()
    try:
        out = mm.sample_frames(media, every_ms=200, thumb=4).collect()
        assert all(r["ok"] for r in out), [r["err"] for r in out
                                           if not r["ok"]]
        metas = {r["media_id"]: r["meta"] for r in media.collect()}
        by_id = {}
        for r in out:
            by_id.setdefault(r["media_id"], []).append(r)
        assert set(by_id) == set(metas)
        for mid, rows in by_id.items():
            rows.sort(key=lambda r: r["frame_idx"])
            assert rows[0]["frame_idx"] == 0        # always samples t=0
            assert rows[0]["width"] == metas[mid]["width"]
            assert rows[0]["height"] == metas[mid]["height"]
            for r in rows:
                assert len(r["thumb"]) == 16
                assert r["frame_ts_ms"] <= metas[mid]["duration_ms"]
            # sampled spacing ≈ every_ms in frame units
            if len(rows) > 1:
                steps = {b["frame_idx"] - a["frame_idx"]
                         for a, b in zip(rows, rows[1:])}
                assert len(steps) == 1
    finally:
        media.unpersist()


def test_sample_frames_bad_rows_survive(spark):
    good = mm.synthetic_video_media(spark, 2)
    bad = spark.createDataFrame(
        [("bady4m", "video", "y4m", bytearray(b"YUV4MPEG2 W4\x0a"), None),
         ("nomp4", "video", "mp4", bytearray(b"\x00\x00ftypmp42"), None)],
        mm.MEDIA_SCHEMA)
    out = mm.sample_frames(good.unionByName(bad)).collect()
    bad_rows = {r["media_id"]: r for r in out if not r["ok"]}
    assert "ValueError" in bad_rows["bady4m"]["err"]
    assert "NotImplementedError" in bad_rows["nomp4"]["err"]
    ok_ids = {r["media_id"] for r in out if r["ok"]}
    assert ok_ids == {"vid0", "vid1"}


def test_sample_frames_matches_python_twin(spark):
    media = mm.synthetic_video_media(spark, 5, seed=23)
    spark_rows = [(r["media_id"], r["frame_idx"], tuple(r["thumb"]))
                  for r in mm.sample_frames(media, every_ms=300).collect()
                  if r["ok"]]
    exp = []
    for r in media.collect():
        raw = bytes(r["payload"])
        hdr, start = mm._parse_y4m_header(raw)
        fb = mm._y4m_frame_bytes(hdr)
        n_frames = (len(raw) - start) // (6 + fb)
        fps = hdr["fps_num"] / hdr.get("fps_den", 1)
        step = max(int(round(300 * fps / 1000.0)), 1)
        for idx in range(0, n_frames, step):
            y = mm._decode_y4m_frame(raw, hdr, start, idx)
            tb = mm.box_resize(y[..., None], 8, 8).reshape(-1)
            exp.append((r["media_id"], idx,
                        tuple(np.float32(round(float(v), 3)) for v in tb)))
    assert sorted(spark_rows) == sorted(exp)


def test_degenerate_headers_become_error_rows(spark):
    """Review regressions: parsed-but-degenerate header fields (fps=0,
    rate=0, zero dims, 10-bit Y4M) must yield ok=false rows, never
    NaN stats or a job-killing exception."""
    frames = np.zeros((2, 4, 4), np.uint8)
    y4m_f0 = mm.encode_y4m(frames, fps=25).replace(b"F25:1", b"F0:1")
    y4m_p10 = mm.encode_y4m(frames, fps=25).replace(b"C420", b"C420p10")
    wav_r0 = mm.encode_wav(np.zeros((8, 1), np.float32), 8000)
    wav_r0 = wav_r0.replace(struct.pack("<I", 8000),
                            struct.pack("<I", 0), 1)
    ppm_w0 = b"P6\n0 5\n255\n"
    rows = spark.createDataFrame(
        [("f0", "video", "y4m", bytearray(y4m_f0), None),
         ("p10", "video", "y4m", bytearray(y4m_p10), None),
         ("r0", "audio", "wav", bytearray(wav_r0), None),
         ("w0", "image", "ppm", bytearray(ppm_w0), None)],
        mm.MEDIA_SCHEMA)
    out = (mm.sample_frames(rows).collect()
           + mm.decode_audio(rows).collect()
           + mm.decode_images(rows).collect())
    assert len(out) == 4
    for r in out:
        assert not r["ok"], (r["media_id"], r)
        assert "ValueError" in r["err"]


def test_mid_stream_failure_drops_partial_frames(spark):
    """A Y4M stream whose frame 0 decodes but whose later markers are
    misaligned (parameterized FRAME tags) must emit ONE error row — not
    a mix of ok frames and an error for the same media_id."""
    frames = np.full((3, 4, 4), 9, np.uint8)
    good = mm.encode_y4m(frames, fps=25)
    # grow frame 1's marker: offsets shift for every later frame
    broken = good.replace(b"FRAME\x0a", b"FRAME Ip\x0a", 2)
    broken = broken.replace(b"FRAME Ip\x0a", b"FRAME\x0a", 1)
    rows = spark.createDataFrame(
        [("part", "video", "y4m", bytearray(broken), None)],
        mm.MEDIA_SCHEMA)
    out = mm.sample_frames(rows, every_ms=1).collect()
    assert len(out) == 1 and not out[0]["ok"]
    assert "ValueError" in out[0]["err"]


def test_decode_matches_spark_side_python_twin(spark):
    """Differential: the Spark mapInPandas output equals a driver-side
    pure-Python decode of the same payloads."""
    media = mm.synthetic_image_media(spark, 10, seed=7)
    spark_rows = {r["media_id"]: r for r in mm.decode_images(media).collect()}
    for r in media.collect():
        arr = mm._decode_image(bytes(r["payload"]), r["format"])
        exp = [round(float(m), 3) for m in arr.mean(axis=(0, 1))]
        got = spark_rows[r["media_id"]]["chan_mean"]
        # spark column is float32; compare at that precision
        assert np.allclose(got, exp, atol=1e-3), (r["media_id"], got, exp)

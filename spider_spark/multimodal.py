"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The interleaved-docs model (spans with kind ∈ {text, image, …}) extends to
real media payloads as ``binary`` columns with a metadata struct. Decode
is REAL across all three modalities via pure stdlib ``zlib`` +
``struct`` + numpy reference codecs: images — PNG (8-bit
gray/RGB/GA/RGBA, all five scanline filters), BMP (24-bit BI_RGB), PPM
(P6) → ``decode_images`` (decode → box-average resize → per-channel
stats); audio — RIFF/WAVE integer PCM at 8/16/32-bit → ``decode_audio``
(RMS / zero-cross / envelope); video — YUV4MPEG2 (C420/C444) →
``sample_frames`` (O(1)-seek sampled-frame luma thumbnails — a sampler
at crawl scale must not scan every byte of every video). JPEG/MP3/MP4
codecs stay behind the declared ``NotImplementedError`` extension point
(no libjpeg/ffmpeg in this container); the Spark-side plumbing — schema,
Arrow batch shape, mapInPandas partitioning, malformed-payload error
rows — is identical for real and stubbed formats and fully tested. The
reference decoders favor clarity over speed (per-row filter loops); a
production deployment swaps the `_DECODERS` table for turbo codecs
without touching the operators.

Schema mirrors Resource.content.image_files[] (resource.proto:87-99):
url + raw bytes + declared format.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),     # image|audio|video
        T.StructField("format", T.StringType(), True),    # png|wav|mp4|...
        T.StructField("payload", T.BinaryType(), True),   # opaque bytes
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.IntegerType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media rows: payload = repeatable pseudo-bytes
    derived from (seed, id) — column expressions only."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    fmts = F.array(F.lit("png"), F.lit("wav"), F.lit("mp4"))
    k = (F.col("id") % 3 + 1).cast("int")
    return spark.range(n).select(
        F.concat(F.lit("m"), F.col("id")).alias("media_id"),
        F.element_at(kinds, k).alias("kind"),
        F.element_at(fmts, k).alias("format"),
        F.encode(
            F.sha2(F.concat(F.lit(seed), F.col("id")), 256), "utf-8"
        ).cast("binary").alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(1920)) + 1)
            .cast("int").alias("width"),
            (F.pmod(F.xxhash64(F.lit(seed + 1), F.col("id")), F.lit(1080)) + 1)
            .cast("int").alias("height"),
            (F.pmod(F.xxhash64(F.lit(seed + 2), F.col("id")), F.lit(60000)))
            .cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes, fmt: str) -> "object":
    """Extension point for formats needing external codecs (jpeg, webp,
    …); plug PIL/cv2/turbojpeg here on a cluster that ships them."""
    raise NotImplementedError(
        f"no codec for image format {fmt!r} in this environment — "
        "plug PIL/cv2 into _DECODERS"
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → channel count (8-bit depth only; palette unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter_row(f: int, cur: np.ndarray, prior: np.ndarray,
                      bpp: int) -> np.ndarray:
    """Reverse one PNG scanline filter (spec §9: None/Sub/Up/Average/
    Paeth). cur is the filtered row (uint8), prior the reconstructed row
    above (zeros for the first row). Sub/Average/Paeth are sequential in
    the pixel dimension, so those run as per-byte loops — reference
    clarity over speed."""
    if f == 0:
        return cur
    if f == 2:
        return (cur.astype(np.int32) + prior).astype(np.uint8)
    out = cur.astype(np.int32)
    if f == 1:
        for i in range(bpp, len(out)):
            out[i] = (out[i] + out[i - bpp]) & 0xFF
    elif f == 3:
        for i in range(len(out)):
            a = out[i - bpp] if i >= bpp else 0
            out[i] = (out[i] + ((a + int(prior[i])) >> 1)) & 0xFF
    elif f == 4:
        for i in range(len(out)):
            a = out[i - bpp] if i >= bpp else 0
            b = int(prior[i])
            c = int(prior[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (out[i] + pred) & 0xFF
    else:
        raise ValueError(f"bad PNG filter type {f}")
    return out.astype(np.uint8)


def _decode_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w, channels) uint8. Supports bit depth 8, color types
    0/2/4/6, no interlace (PNG spec, RFC 2083)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if w < 1 or h < 1:
        raise ValueError(f"degenerate PNG dimensions {w}x{h}")
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0 \
            or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} "
            f"interlace={interlace})")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        out[y] = _png_unfilter_row(int(rows[y, 0]), rows[y, 1:], prior, ch)
        prior = out[y].astype(np.int32)
    return out.reshape(h, w, ch)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BI_RGB BMP → (h, w, 3) uint8 (RGB order,
    top-down output regardless of stored row order)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    (offset,) = struct.unpack("<I", payload[10:14])
    hdr_size, w, h, planes, bpp, comp = struct.unpack(
        "<IiihhI", payload[14:34])
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    if w < 1 or h < 1:
        raise ValueError(f"degenerate BMP dimensions {w}x{h}")
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    px = payload[offset:offset + row_bytes * h]
    if len(px) != row_bytes * h:
        raise ValueError("truncated BMP pixel data")
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, row_bytes)
    arr = arr[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
    return arr[::-1] if bottom_up else arr


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens (comments with # allowed), then ONE whitespace byte
    toks, pos = [], 2
    while len(toks) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        toks.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    if w < 1 or h < 1:
        raise ValueError(f"degenerate PPM dimensions {w}x{h}")
    px = payload[pos:pos + w * h * 3]
    if len(px) != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)


_DECODERS = {"png": _decode_png, "bmp": _decode_bmp, "ppm": _decode_ppm}


def _decode_image(payload: bytes, fmt: str) -> np.ndarray:
    dec = _DECODERS.get((fmt or "").lower())
    if dec is None:
        return _decode_image_stub(payload, fmt)
    return dec(payload)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w[, ch]) uint8 array — the test-fixture twin of
    `_decode_image` (PNG uses per-row filters cycling 0-4 so decode
    exercises every filter path; BMP writes bottom-up 24-bit; PPM P6)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, ch = arr.shape
    fmt = fmt.lower()
    if fmt == "png":
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        lines = []
        prior = np.zeros(w * ch, dtype=np.int32)
        for y in range(h):
            rawr = arr[y].reshape(-1).astype(np.int32)
            f = y % 5
            if f == 0:
                filt = rawr
            elif f == 1:
                a = np.concatenate([np.zeros(ch, np.int32), rawr[:-ch]])
                filt = rawr - a
            elif f == 2:
                filt = rawr - prior
            elif f == 3:
                a = np.concatenate([np.zeros(ch, np.int32), rawr[:-ch]])
                filt = rawr - ((a + prior) >> 1)
            else:
                a = np.concatenate([np.zeros(ch, np.int32), rawr[:-ch]])
                c = np.concatenate([np.zeros(ch, np.int32), prior[:-ch]])
                p = a + prior - c
                pa, pb, pc = np.abs(p - a), np.abs(p - prior), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a,
                                np.where(pb <= pc, prior, c))
                filt = rawr - pred
            lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
            prior = rawr

        def chunk(ctype: bytes, data: bytes) -> bytes:
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (_PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"".join(lines)))
                + chunk(b"IEND", b""))
    if fmt == "bmp":
        if ch != 3:
            raise ValueError("BMP encoder wants (h, w, 3)")
        row_bytes = (w * 3 + 3) & ~3
        pad = b"\x00" * (row_bytes - w * 3)
        body = b"".join(
            arr[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1))
        off = 14 + 40
        return (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
                + struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0,
                              len(body), 2835, 2835, 0, 0) + body)
    if fmt == "ppm":
        if ch != 3:
            raise ValueError("PPM encoder wants (h, w, 3)")
        return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()
    raise ValueError(f"no encoder for {fmt!r}")


def box_resize(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box-average downsample/upsample to (out_h, out_w, ch) float32 —
    pure-numpy bin averaging (each output pixel = mean of its source
    box), the resize kernel behind the thumbnail feature."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    a = arr.astype(np.float32)
    out = np.empty((out_h, out_w) + arr.shape[2:], dtype=np.float32)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = a[y0:y1, x0:x1].mean(axis=(0, 1))
    return out


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → ((n_samples, n_channels) float32 in [-1, 1],
    sample_rate). Supports format 1 (integer PCM) at 8/16/32-bit — the
    pure-struct RIFF chunk walk (WAVE spec: RIFF header, fmt  chunk,
    data chunk; chunks are word-aligned)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt_chunk = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are 2-byte aligned
    if fmt_chunk is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _block, bits = fmt_chunk
    if audio_fmt != 1 or bits not in (8, 16, 32) or n_ch < 1 or rate < 1:
        raise ValueError(
            f"unsupported WAV (fmt={audio_fmt} bits={bits} ch={n_ch} "
            f"rate={rate})")
    if bits == 8:   # 8-bit WAV is unsigned
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    else:
        dt = np.int16 if bits == 16 else np.int32
        data = data[: (len(data) // (n_ch * bits // 8)) * n_ch * bits // 8]
        x = np.frombuffer(data, dtype=dt).astype(np.float32) \
            / float(2 ** (bits - 1))
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Encode (n, ch) float32 in [-1, 1] as integer-PCM WAV — the
    test-fixture twin of `_decode_wav`."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    clipped = np.clip(samples, -1.0, 1.0)
    if bits == 8:
        raw = (clipped * 127.0 + 128.0).astype(np.uint8).tobytes()
    else:
        dt = np.int16 if bits == 16 else np.int32
        raw = (clipped * (2 ** (bits - 1) - 1)).astype(dt).tobytes()
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(raw)) + raw
              + (b"\x00" if len(raw) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("err", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("rms", T.FloatType(), True),
        T.StructField("zero_cross_rate", T.FloatType(), True),
        T.StructField("envelope", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_audio(media: DataFrame, envelope_bins: int = 16) -> DataFrame:
    """REAL audio decode → features over Arrow batches: parse PCM WAV,
    compute RMS, zero-crossing rate, duration, and a box-averaged
    |amplitude| envelope (the audio analogue of the image thumbnail).
    Malformed payloads become ok=false rows (`_media_map` contract);
    non-WAV formats hit the codec extension point."""

    def kernel(mid: str, fmt: str, payload: bytes) -> list[dict]:
        if (fmt or "").lower() != "wav":
            raise NotImplementedError(
                f"no codec for audio format {fmt!r} — plug "
                "soundfile/ffmpeg here")
        x, rate = _decode_wav(payload)
        if len(x) == 0:
            raise ValueError("empty WAV data chunk")
        mono = x.mean(axis=1)
        signs = np.signbit(mono)
        zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) \
            / max(len(mono) - 1, 1)
        env = box_resize(
            np.abs(mono)[:, None, None], envelope_bins, 1).reshape(-1)
        return [{
            "media_id": mid, "ok": True, "err": None,
            "sample_rate": rate, "n_channels": x.shape[1],
            "duration_ms": int(len(x) * 1000 / rate),
            "rms": round(float(np.sqrt((mono ** 2).mean())), 6),
            "zero_cross_rate": round(zcr, 6),
            "envelope": [round(float(v), 6) for v in env],
        }]

    return _media_map(media, "audio", kernel, AUDIO_SCHEMA)


def synthetic_audio_media(spark: SparkSession, n: int,
                          seed: int = 42) -> DataFrame:
    """Deterministic REAL WAV payloads (seeded sine + noise mixtures,
    varying rate/bits/channels) in MEDIA_SCHEMA — distributed via
    mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 9_999_991 + i)
                rate = [8000, 16000, 44100][i % 3]
                bits = [16, 32, 8][i % 3]
                ch = 1 + (i % 2)
                dur = float(rng.uniform(0.05, 0.3))
                t = np.arange(int(rate * dur)) / rate
                freq = float(rng.uniform(100, 2000))
                wave = 0.6 * np.sin(2 * np.pi * freq * t) \
                    + 0.1 * rng.standard_normal(len(t))
                samples = np.stack([wave] * ch, axis=1).astype(np.float32)
                rows.append({
                    "media_id": f"aud{i}", "kind": "audio", "format": "wav",
                    "payload": encode_wav(samples, rate, bits),
                    "meta": {"width": None, "height": None,
                             "duration_ms": int(len(t) * 1000 / rate)},
                })
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "format", "payload",
                               "meta"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _parse_y4m_header(payload: bytes) -> tuple[dict, int]:
    """Parse a YUV4MPEG2 stream header → ({w, h, fps_num, fps_den,
    colorspace}, header_end_offset). Public format: magic + space-
    separated W/H/F/C tags terminated by 0x0A."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\x0a")
    if nl < 0:
        raise ValueError("unterminated Y4M header")
    hdr = {"colorspace": "420"}
    for tag in payload[9:nl].split(b" "):
        if not tag:
            continue
        key, val = tag[:1], tag[1:]
        if key == b"W":
            hdr["w"] = int(val)
        elif key == b"H":
            hdr["h"] = int(val)
        elif key == b"F":
            num, den = val.split(b":")
            hdr["fps_num"], hdr["fps_den"] = int(num), int(den)
        elif key == b"C":
            hdr["colorspace"] = val.decode("ascii")
    if "w" not in hdr or "h" not in hdr or "fps_num" not in hdr:
        raise ValueError("Y4M header missing W/H/F")
    if hdr["w"] < 1 or hdr["h"] < 1 or hdr["fps_num"] < 1 \
            or hdr.get("fps_den", 1) < 1:
        raise ValueError(
            f"degenerate Y4M geometry/rate (W{hdr['w']} H{hdr['h']} "
            f"F{hdr['fps_num']}:{hdr.get('fps_den', 1)})")
    return hdr, nl + 1


# 8-bit colorspaces ONLY, matched exactly: prefix-matching would silently
# misparse 10/16-bit variants (C420p10 etc.) as half-size 8-bit frames
_Y4M_420 = {"420", "420jpeg", "420mpeg2", "420paldv"}


def _y4m_frame_bytes(hdr: dict) -> int:
    w, h = hdr["w"], hdr["h"]
    cs = hdr["colorspace"]
    if cs in _Y4M_420:
        return w * h + 2 * ((w // 2) * (h // 2))
    if cs == "444":
        return 3 * w * h
    raise ValueError(f"unsupported Y4M colorspace C{cs}")


def _decode_y4m_frame(payload: bytes, hdr: dict, start: int,
                      idx: int) -> np.ndarray:
    """Extract frame `idx`'s luma (Y) plane as (h, w) uint8 — an O(1)
    SEEK, not a scan: with plain ``FRAME\\n`` markers every frame record
    is fixed-size, so sampled decode touches only the sampled bytes.
    Streams using per-frame parameter tags (``FRAME Ixyz\\n``) would
    shift the offsets; the marker check detects that and raises (error
    row upstream) rather than decoding garbage — variable-marker
    support would need one linear index pass, deliberately not paid
    here."""
    fb = _y4m_frame_bytes(hdr)
    # fixed-size fast path: marker is exactly b"FRAME\n"
    pos = start + idx * (6 + fb)
    marker_end = payload.find(b"\x0a", pos, pos + 128)
    if payload[pos:pos + 5] != b"FRAME" or marker_end < 0:
        raise ValueError(f"bad FRAME marker for frame {idx}")
    data = payload[marker_end + 1:marker_end + 1 + fb]
    if len(data) != fb:
        raise ValueError(f"truncated frame {idx}")
    w, h = hdr["w"], hdr["h"]
    return np.frombuffer(data[: w * h], dtype=np.uint8).reshape(h, w)


def encode_y4m(frames: np.ndarray, fps: int = 25,
               colorspace: str = "420") -> bytes:
    """Encode (n_frames, h, w) uint8 luma planes as Y4M (chroma planes
    written neutral-gray 128) — the test-fixture twin of the frame
    sampler."""
    n, h, w = frames.shape
    if colorspace in _Y4M_420:
        chroma = b"\x80" * (2 * ((w // 2) * (h // 2)))
    elif colorspace == "444":
        chroma = b"\x80" * (2 * w * h)
    else:
        raise ValueError(f"unsupported colorspace {colorspace}")
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C%s\x0a"
           % (w, h, fps, colorspace.encode("ascii"))]
    for i in range(n):
        out.append(b"FRAME\x0a")
        out.append(np.ascontiguousarray(frames[i], dtype=np.uint8)
                   .tobytes())
        out.append(chroma)
    return b"".join(out)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("err", T.StringType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("frame_ts_ms", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("thumb", T.ArrayType(T.FloatType()), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  thumb: int = 8) -> DataFrame:
    """REAL video frame sampling for Y4M payloads: parse the stream
    header, compute the sampled frame indices at `every_ms` spacing, and
    decode ONLY those frames' luma planes (O(1) seek per frame — at
    crawl scale a sampler must not scan every byte of every video) into
    box-resized grayscale thumbnails. One output row per sampled frame.
    Malformed payloads and non-Y4M formats (mp4 etc. — the codec
    extension point) become single ok=false rows, and a mid-stream
    decode failure discards that video's partial frames (`_media_map`
    contract: a media item is either fully sampled or errored)."""

    def kernel(mid: str, fmt: str, payload: bytes) -> list[dict]:
        if (fmt or "").lower() not in ("y4m", "yuv4mpeg"):
            raise NotImplementedError(
                f"no codec for video format {fmt!r} — plug "
                "ffmpeg/pyav here")
        hdr, start = _parse_y4m_header(payload)
        fb = _y4m_frame_bytes(hdr)
        n_frames = (len(payload) - start) // (6 + fb)
        if n_frames <= 0:
            raise ValueError("Y4M stream has no frames")
        fps = hdr["fps_num"] / hdr.get("fps_den", 1)
        step = max(int(round(every_ms * fps / 1000.0)), 1)
        rows = []
        for idx in range(0, n_frames, step):
            y = _decode_y4m_frame(payload, hdr, start, idx)
            tb = box_resize(y[..., None], thumb, thumb)
            rows.append({
                "media_id": mid, "ok": True, "err": None,
                "frame_idx": idx,
                "frame_ts_ms": int(idx * 1000.0 / fps),
                "width": hdr["w"], "height": hdr["h"],
                "thumb": [round(float(v), 3) for v in tb.reshape(-1)],
            })
        return rows

    return _media_map(media, "video", kernel, FRAME_SCHEMA)


def synthetic_video_media(spark: SparkSession, n: int,
                          seed: int = 42) -> DataFrame:
    """Deterministic REAL Y4M payloads (seeded moving-gradient luma,
    varying size/fps/frame count) in MEDIA_SCHEMA."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 7_777_777 + i)
                h, w = int(rng.integers(4, 16)) * 2, \
                    int(rng.integers(4, 16)) * 2
                fps = [10, 25, 30][i % 3]
                nf = int(rng.integers(3, 40))
                base = np.add.outer(np.arange(h), np.arange(w))
                frames = np.stack([
                    ((base + 7 * t) % 256).astype(np.uint8)
                    for t in range(nf)])
                rows.append({
                    "media_id": f"vid{i}", "kind": "video", "format": "y4m",
                    "payload": encode_y4m(frames, fps),
                    "meta": {"width": w, "height": h,
                             "duration_ms": int(nf * 1000 / fps)},
                })
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "format", "payload",
                               "meta"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: bytes → fixed-dim
    float vector via byte-bucket sums (keeps tests meaningful)."""
    if payload is None:
        return [0.0] * dim
    buckets = [0] * dim
    for i, b in enumerate(payload):
        buckets[i % dim] += b
    total = sum(buckets) or 1
    return [round(x / total, 6) for x in buckets]


def extract_features(media: DataFrame, dim: int = 8,
                     batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: the production shape (Arrow batches
    of binary payloads → float vectors) with the model stubbed. Partition
    by media kind upstream if kernels differ per modality."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int32"),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_feature(p, dim)
                    ),
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


# any decode failure becomes an error row — a bad byte-stream must not
# kill a crawl-scale job. ZeroDivisionError covers degenerate-but-parsed
# header fields reaching arithmetic; IndexError/zlib/struct cover
# truncated or corrupt containers.
_MEDIA_ERRORS = (ValueError, NotImplementedError, IndexError,
                 ZeroDivisionError, zlib.error, struct.error)


def _media_map(media: DataFrame, kind: str, kernel,
               schema: T.StructType) -> DataFrame:
    """Shared mapInPandas scaffolding for the per-payload decode
    operators: filter to `kind`, run ``kernel(media_id, fmt, payload)
    -> list[row dict]`` per input row inside one try/except, and turn
    any decode failure into a SINGLE ok=false row carrying the error.
    The kernel returns its full row list or raises — so a mid-payload
    failure never leaks partial ok=true rows for that media item."""
    names = [f.name for f in schema]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, fmt, payload in zip(
                    pdf["media_id"], pdf["format"], pdf["payload"]):
                try:
                    rows.extend(kernel(
                        mid, fmt,
                        bytes(payload) if payload is not None else b""))
                except _MEDIA_ERRORS as exc:
                    err_row = dict.fromkeys(names)
                    err_row.update(
                        media_id=mid, ok=False,
                        err=f"{type(exc).__name__}: {exc}"[:200])
                    rows.append(err_row)
            yield pd.DataFrame(rows, columns=names)

    return media.filter(F.col("kind") == kind).select(
        "media_id", "format", "payload"
    ).mapInPandas(fn, schema=schema)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("err", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("chan_mean", T.ArrayType(T.FloatType()), True),
        T.StructField("thumb", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_images(media: DataFrame, thumb: int = 8) -> DataFrame:
    """REAL image decode → resize → feature pipeline over Arrow batches:
    decode each binary payload (PNG/BMP/PPM reference decoders), compute
    per-channel means, and box-resize to a (thumb × thumb) grayscale
    vector. Malformed or unsupported payloads become ok=false rows with
    the error string (`_media_map` contract). One output row per input
    row; mapInPandas so each Arrow batch is decoded in one Python
    call."""

    def kernel(mid: str, fmt: str, payload: bytes) -> list[dict]:
        arr = _decode_image(payload, fmt)
        gray = arr.astype(np.float32).mean(axis=2)
        tb = box_resize(gray[..., None], thumb, thumb)
        return [{
            "media_id": mid, "ok": True, "err": None,
            "width": arr.shape[1], "height": arr.shape[0],
            "channels": arr.shape[2],
            "chan_mean": [round(float(m), 3) for m in arr.mean(axis=(0, 1))],
            "thumb": [round(float(v), 3) for v in tb.reshape(-1)],
        }]

    return _media_map(media, "image", kernel, DECODED_SCHEMA)


def synthetic_image_media(spark: SparkSession, n: int,
                          seed: int = 42) -> DataFrame:
    """Deterministic REAL image payloads (PNG/BMP/PPM cycling, seeded
    numpy gradients + noise) in MEDIA_SCHEMA — distributed generation via
    mapInPandas, no driver-side loop."""
    fmts = ["png", "bmp", "ppm"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 1_000_003 + i)
                h, w = int(rng.integers(4, 24)), int(rng.integers(4, 24))
                fmt = fmts[i % 3]
                ch = 4 if (fmt == "png" and i % 6 == 3) else 3
                grad = (np.add.outer(np.arange(h), np.arange(w))
                        * 255 // max(h + w - 2, 1))
                arr = np.clip(
                    grad[..., None]
                    + rng.integers(0, 64, (h, w, ch)), 0, 255
                ).astype(np.uint8)
                rows.append({
                    "media_id": f"img{i}", "kind": "image", "format": fmt,
                    "payload": encode_image(arr, fmt),
                    "meta": {"width": w, "height": h, "duration_ms": None},
                })
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "format", "payload",
                               "meta"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan* from metadata alone: per video row,
    the frame timestamps a decoder would extract (sequence column) —
    the metadata-only companion to `sample_frames`, which actually
    decodes sampled Y4M frames. Useful when the payload lives elsewhere
    (media_ref) and only the schedule is needed."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )

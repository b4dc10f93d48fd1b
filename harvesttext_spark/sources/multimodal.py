"""Multimodal columns: image/audio/video as opaque BINARY payloads with
typed metadata, plus the Spark-side plumbing for decode / feature-extract /
resize / frame-sample stages.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the byte-level decoders are stubs with two behaviors:
  * ``engine="fake"`` (default in tests): a DETERMINISTIC fake decoder that
    parses our own 16-byte synthetic header — schema, partitioning, Arrow
    batch shape, and UDF signatures are fully real and tested;
  * ``engine="real"``: raises NotImplementedError with the dependency to
    install on the cluster image.

Payload header for synthetic fixtures (big-endian):
    bytes 0-3   magic  b'HTSM'
    bytes 4-5   width / sample-rate-kHz
    bytes 6-7   height / channels
    byte  8     n_frames (video) or 1
    bytes 9-15  reserved
    rest        pseudo pixel/sample bytes
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MULTIMODAL_SCHEMA = (
    "item_id bigint, modality string, payload binary, meta map<string,string>"
)
MAGIC = b"HTSM"
FEATURE_DIM = 16


def synth_multimodal(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic multimodal table (one row per item)."""
    base = spark.range(0, n)

    def gen(batches):
        import random

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = random.Random((seed << 20) ^ int(i))
                modality = ("image", "audio", "video")[int(i) % 3]
                w, h = rng.randint(16, 512), rng.randint(16, 512)
                frames = rng.randint(2, 12) if modality == "video" else 1
                body = bytes(rng.getrandbits(8) for _ in range(64))
                payload = MAGIC + struct.pack(">HHB7x", w, h, frames) + body
                rows.append(
                    (int(i), modality, payload, {"source": f"synth{int(i)%5}"})
                )
            yield pd.DataFrame(
                rows, columns=["item_id", "modality", "payload", "meta"]
            )

    return base.mapInPandas(gen, schema=MULTIMODAL_SCHEMA)


def _parse_header(payload: bytes):
    if payload is None or len(payload) < 16 or payload[:4] != MAGIC:
        return None
    w, h, frames = struct.unpack(">HHB", payload[4:9])
    return w, h, frames


def decode_metadata(df: DataFrame, engine: str = "fake") -> DataFrame:
    """payload -> (width, height, n_frames) columns.  mapInPandas keeps the
    binary column in Arrow buffers end to end (no per-row Python objects
    beyond the batch loop)."""
    if engine == "real":
        raise NotImplementedError(
            "real decode needs pillow/ffmpeg on the executor image; "
            "this container ships neither — use engine='fake'"
        )

    def run(batches):
        for pdf in batches:
            hdr = [_parse_header(p) for p in pdf["payload"]]
            pdf["width"] = [h[0] if h else None for h in hdr]
            pdf["height"] = [h[1] if h else None for h in hdr]
            pdf["n_frames"] = [h[2] if h else None for h in hdr]
            yield pdf

    schema = MULTIMODAL_SCHEMA + ", width int, height int, n_frames int"
    return df.mapInPandas(run, schema=schema)


def extract_features(df: DataFrame, engine: str = "fake") -> DataFrame:
    """payload -> array<float> embedding (FEATURE_DIM).  Fake engine:
    deterministic byte-histogram features — the real engine would run a
    vision/audio model per Arrow batch with identical signature."""
    if engine == "real":
        raise NotImplementedError("install a model runtime on the cluster image")

    def run(batches):
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if p is None or len(p) <= 16:
                    feats.append(None)
                    continue
                arr = np.frombuffer(p[16:], dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
                v = hist.astype("float32")
                n = float(np.linalg.norm(v)) or 1.0
                feats.append((v / n).tolist())
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema=MULTIMODAL_SCHEMA + ", features array<float>")


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Video frame-sampling plumbing: one output row per kept frame index
    (1 -> N generator via mapInPandas), payload sliced per frame in the
    fake engine."""

    def run(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                hdr = _parse_header(r["payload"])
                if hdr is None:
                    continue
                _, _, frames = hdr
                body = r["payload"][16:]
                if frames <= 1:
                    continue
                step = max(len(body) // frames, 1)
                for fi in range(0, frames, every):
                    rows.append(
                        (r["item_id"], fi, body[fi * step : (fi + 1) * step])
                    )
            yield pd.DataFrame(rows, columns=["item_id", "frame_idx", "frame_payload"])

    return df.mapInPandas(
        run, schema="item_id bigint, frame_idx int, frame_payload binary"
    )


# --- REAL image path: BMP (uncompressed, no external libs needed) -----------
#
# The container has no PIL/ffmpeg, but 24-bit uncompressed BMP is a plain
# struct layout — so for this format the decode / feature / resize stages
# are REAL (byte-exact format parsing + numpy pixel math), not fakes.
# Format reference: the public BITMAPFILEHEADER/BITMAPINFOHEADER layout.

def encode_bmp(pixels: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BMP bytes (bottom-up rows, BGR,
    4-byte row padding — the standard layout)."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    bgr = pixels[:, :, ::-1]
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):
        rows.append(bgr[y].tobytes() + pad)
    return header + dib + b"".join(rows)


def decode_bmp(payload: bytes):
    """BMP bytes -> (h, w, 3) uint8 RGB array, or None if not a 24-bit
    uncompressed BMP."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    off = struct.unpack("<I", payload[10:14])[0]
    _, w, h, _, bpp, comp = struct.unpack("<IiiHHI", payload[14:34])
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    flipped = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    if len(payload) < off + row_size * h:
        return None
    data = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=off)
    rows = data.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flipped else rgb


def resize_nearest(pixels: "np.ndarray", max_side: int) -> "np.ndarray":
    """Nearest-neighbor downscale so max(h, w) <= max_side (no-op if
    already small enough) — pure index math, no interpolation libs."""
    h, w, _ = pixels.shape
    scale = max(h, w) / float(max_side)
    if scale <= 1.0:
        return pixels
    nh, nw = max(int(h / scale), 1), max(int(w / scale), 1)
    yi = (np.arange(nh) * (h / nh)).astype(int)
    xi = (np.arange(nw) * (w / nw)).astype(int)
    return pixels[yi][:, xi]


def synth_bmp_table(spark: SparkSession, n: int = 50, seed: int = 7) -> DataFrame:
    """Deterministic REAL-BMP image table (item_id, payload binary)."""
    base = spark.range(0, n)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng((seed << 20) ^ int(i))
                w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
                px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                rows.append((int(i), encode_bmp(px)))
            yield pd.DataFrame(rows, columns=["item_id", "payload"])

    return base.mapInPandas(gen, schema="item_id bigint, payload binary")


def decode_image_stats(df: DataFrame) -> DataFrame:
    """REAL image decode: (item_id, width, height, mean_r/g/b) from BMP
    payloads.  Non-BMP rows yield NULL stats (graceful)."""

    def run(batches):
        for pdf in batches:
            out = {"width": [], "height": [], "mean_r": [], "mean_g": [], "mean_b": []}
            for p in pdf["payload"]:
                px = decode_bmp(p)
                if px is None:
                    for k in out:
                        out[k].append(None)
                    continue
                m = px.reshape(-1, 3).mean(axis=0)
                out["width"].append(px.shape[1])
                out["height"].append(px.shape[0])
                out["mean_r"].append(float(m[0]))
                out["mean_g"].append(float(m[1]))
                out["mean_b"].append(float(m[2]))
            for k, v in out.items():
                pdf[k] = v
            yield pdf[["item_id", "width", "height", "mean_r", "mean_g", "mean_b"]]

    return df.mapInPandas(
        run,
        schema="item_id bigint, width int, height int, "
        "mean_r double, mean_g double, mean_b double",
    )


def resize_images(df: DataFrame, max_side: int = 16) -> DataFrame:
    """REAL resize stage: decode BMP -> nearest-neighbor downscale ->
    re-encode BMP.  (item_id, payload) in, same shape out."""

    def run(batches):
        for pdf in batches:
            resized = []
            for p in pdf["payload"]:
                px = decode_bmp(p)
                resized.append(None if px is None else encode_bmp(resize_nearest(px, max_side)))
            pdf["payload"] = resized
            yield pdf[["item_id", "payload"]]

    return df.mapInPandas(run, schema="item_id bigint, payload binary")


def image_grayscale_features(df: DataFrame, bins: int = FEATURE_DIM) -> DataFrame:
    """REAL feature extraction: L2-normalized grayscale histogram over the
    decoded pixels (luma = 0.299R+0.587G+0.114B)."""

    def run(batches):
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                px = decode_bmp(p)
                if px is None:
                    feats.append(None)
                    continue
                luma = px.reshape(-1, 3).astype("float32") @ np.array(
                    [0.299, 0.587, 0.114], dtype="float32"
                )
                hist, _ = np.histogram(luma, bins=bins, range=(0, 256))
                v = hist.astype("float32")
                n = float(np.linalg.norm(v)) or 1.0
                feats.append((v / n).tolist())
            pdf["features"] = feats
            yield pdf[["item_id", "features"]]

    return df.mapInPandas(run, schema="item_id bigint, features array<float>")


# --- REAL audio path: PCM WAV (stdlib `wave`, no external libs) --------------
#
# Same philosophy as the BMP path: 16-bit PCM WAV is a plain RIFF layout
# the stdlib parses, so the audio decode / feature / downsample stages are
# REAL (byte-exact container parsing + numpy sample math), not fakes.
# Compressed audio (mp3/ogg/aac) stays honestly behind engine="real".

def encode_wav(samples: "np.ndarray", rate: int = 16000) -> bytes:
    """mono int16 samples -> 16-bit PCM WAV bytes."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """WAV bytes -> (rate, mono int16 array), or None if not 16-bit PCM
    (multi-channel input is averaged down to mono)."""
    import io
    import wave

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF":
        return None
    try:
        with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
            if w.getsampwidth() != 2 or w.getcomptype() != "NONE":
                return None
            rate = w.getframerate()
            nch = w.getnchannels()
            raw = w.readframes(w.getnframes())
    except wave.Error:
        return None
    data = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        data = data[: (len(data) // nch) * nch].reshape(-1, nch)
        data = data.mean(axis=1).astype("<i2")
    return rate, data


def downsample_audio(samples: "np.ndarray", rate: int, target_rate: int):
    """Nearest-sample decimation to target_rate (the audio analog of
    resize_nearest — pure index math; no-op if already at/below)."""
    if rate <= target_rate:
        return samples, rate
    n_out = max(int(len(samples) * target_rate / rate), 1)
    idx = (np.arange(n_out) * (len(samples) / n_out)).astype(int)
    return samples[idx], target_rate


def synth_wav_table(spark: SparkSession, n: int = 50, seed: int = 11) -> DataFrame:
    """Deterministic REAL-WAV audio table (item_id, payload binary):
    per-item seeded sine + noise mixes at varying lengths/rates."""
    base = spark.range(0, n)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng((seed << 20) ^ int(i))
                rate = int(rng.choice([8000, 16000, 22050]))
                dur = int(rng.integers(rate // 10, rate // 2))
                t = np.arange(dur) / rate
                freq = float(rng.uniform(100, 2000))
                sig = 8000 * np.sin(2 * np.pi * freq * t)
                sig = sig + rng.normal(0, 500, size=dur)
                rows.append((int(i), encode_wav(np.clip(sig, -32768, 32767), rate)))
            yield pd.DataFrame(rows, columns=["item_id", "payload"])

    return base.mapInPandas(gen, schema="item_id bigint, payload binary")


def decode_audio_stats(df: DataFrame) -> DataFrame:
    """REAL audio decode: (item_id, sample_rate, n_samples, duration_s,
    rms, peak) from WAV payloads.  Non-WAV rows yield NULL stats."""

    def run(batches):
        for pdf in batches:
            out = {
                "sample_rate": [], "n_samples": [], "duration_s": [],
                "rms": [], "peak": [],
            }
            for p in pdf["payload"]:
                dec = decode_wav(p)
                if dec is None:
                    for k in out:
                        out[k].append(None)
                    continue
                rate, data = dec
                x = data.astype(np.float64)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(data))
                out["duration_s"].append(len(data) / rate)
                out["rms"].append(float(np.sqrt((x * x).mean())) if len(x) else 0.0)
                out["peak"].append(int(np.abs(data).max()) if len(data) else 0)
            for k, v in out.items():
                pdf[k] = v
            yield pdf[
                ["item_id", "sample_rate", "n_samples", "duration_s", "rms", "peak"]
            ]

    return df.mapInPandas(
        run,
        schema="item_id bigint, sample_rate int, n_samples int, "
        "duration_s double, rms double, peak int",
    )


def downsample_audio_table(df: DataFrame, target_rate: int = 8000) -> DataFrame:
    """REAL downsample stage: decode WAV -> decimate -> re-encode WAV.
    (item_id, payload) in, same shape out; non-WAV rows pass as NULL."""

    def run(batches):
        for pdf in batches:
            outp = []
            for p in pdf["payload"]:
                dec = decode_wav(p)
                if dec is None:
                    outp.append(None)
                    continue
                rate, data = dec
                samples, new_rate = downsample_audio(data, rate, target_rate)
                outp.append(encode_wav(samples, new_rate))
            pdf["payload"] = outp
            yield pdf[["item_id", "payload"]]

    return df.mapInPandas(run, schema="item_id bigint, payload binary")

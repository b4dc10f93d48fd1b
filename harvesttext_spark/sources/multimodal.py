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

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``SPIKEX_SPARK_FAKE_DECODE`` (deterministic fake) or raises
``NotImplementedError`` — but the Spark-side plumbing is real and tested:
schemas, Arrow batch shapes, partitioning, and the UDF signatures match what
a production deployment drops its Pillow/ffmpeg decoder into.

Design for 100 TB: media bytes stay in their own column so column pruning
skips them unless a stage touches them; decode is ``mapInPandas`` (Arrow
carries binary zero-copy); per-batch decode amortizes library setup;
feature vectors come back as ``array<float>`` ready for simsearch.
"""

from __future__ import annotations

import hashlib
import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),      # image/video
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),  # audio/video
    T.StructField("payload", T.BinaryType()),
])

_FEAT_DIM = 16


def _fake_decode_enabled() -> bool:
    return os.environ.get("SPIKEX_SPARK_FAKE_DECODE", "1") == "1"


def _fake_features(payload: bytes, dim: int = _FEAT_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+embedder: md5-seeded floats.
    Stable across machines/sessions — tests and resume rely on that."""
    out = []
    h = payload or b""
    for i in range(dim):
        d = hashlib.md5(h + struct.pack("<i", i)).digest()
        out.append(struct.unpack("<I", d[:4])[0] / 0xFFFFFFFF * 2.0 - 1.0)
    return out


def decode_features(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id") -> DataFrame:
    """(media_id, features array<float>): decode + embed each media blob.

    Real deployment: replace the body of ``decode_one``. With fake decode
    off and no decoder present, raises NotImplementedError (clearly marked
    stub per the build contract)."""
    out_schema = (
        f"{id_col} {df.schema[id_col].dataType.simpleString()},"
        " features array<float>"
    )
    fake = _fake_decode_enabled()

    def decode_one(payload: bytes) -> list[float]:
        if fake:
            return _fake_features(payload)
        raise NotImplementedError(
            "media decode requires an image/audio library not present in "
            "this container; set SPIKEX_SPARK_FAKE_DECODE=1 or plug a "
            "decoder into multimodal.decode_features"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "features": [decode_one(p) for p in pdf[payload_col]],
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """(media_id, resized binary, width, height) — stubbed resize: the fake
    path re-hashes payload to a size-tagged blob (deterministic), keeping
    the batch shape a real resizer would produce."""
    out_schema = (
        f"{id_col} {df.schema[id_col].dataType.simpleString()},"
        " resized binary, width int, height int"
    )
    fake = _fake_decode_enabled()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image resize needs a codec")
            resized = [
                hashlib.md5((p or b"") + f":{width}x{height}".encode()).digest()
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "resized": resized,
                "width": width,
                "height": height,
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  id_col: str = "media_id") -> DataFrame:
    """(media_id, frame_idx, ts_ms, frame binary): frame sampling for video
    rows — frame count derives from duration metadata (real), frame bytes
    from the stub decoder."""
    out_schema = (
        f"{id_col} {df.schema[id_col].dataType.simpleString()},"
        " frame_idx int, ts_ms int, frame binary"
    )
    fake = _fake_decode_enabled()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("frame sampling needs a codec")
            rows = {"_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for mid, dur, payload in zip(
                pdf[id_col], pdf["duration_ms"], pdf["payload"]
            ):
                n = max(int((dur or 0) // every_ms), 0)
                for i in range(n):
                    rows["_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame"].append(
                        hashlib.md5((payload or b"") + struct.pack("<i", i)).digest()
                    )
            out = pd.DataFrame(rows)
            out.columns = [id_col, "frame_idx", "ts_ms", "frame"]
            yield out

    return df.select(id_col, "duration_ms", "payload").mapInPandas(
        run, schema=out_schema
    )


def gen_media(n: int = 20, seed: int = 42) -> list[dict]:
    """Deterministic synthetic media table rows (MEDIA_SCHEMA shape)."""
    import random
    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media:{seed}:{i}".encode()).digest() * 4
        rows.append({
            "media_id": i,
            "kind": kind,
            "mime": {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
            "width": 64 + (i % 4) * 32 if kind != "audio" else None,
            "height": 48 + (i % 3) * 16 if kind != "audio" else None,
            "duration_ms": (rng.randint(1, 8) * 1000) if kind != "image" else None,
            "payload": payload,
        })
    return rows

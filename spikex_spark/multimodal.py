"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Image decode is REAL for the uncompressed formats a pure-Python decoder can
handle — PPM (P6 binary / P3 ascii) and 24-bit uncompressed BMP — including
decode → feature-extract and decode → nearest-neighbor resize → re-encode.
Codec formats (PNG/JPEG/audio/video) have no library in this container, so
their decode stays stubbed behind ``SPIKEX_SPARK_FAKE_DECODE``
(deterministic fake) or raises ``NotImplementedError``; the Spark-side
plumbing (schemas, Arrow batch shapes, partitioning, UDF signatures) is the
same either way — a production deployment drops Pillow/ffmpeg into
``decode_image``'s fallthrough.

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


# ---------------------------------------------------------------------------
# real pure-Python image codecs: PPM (P6/P3) and 24-bit uncompressed BMP
# ---------------------------------------------------------------------------

def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a PPM header, skipping '#' comments: (width, height, maxval,
    pixel-data offset)."""
    fields: list[int] = []
    i = 2  # past the magic
    n = len(payload)
    while len(fields) < 3:
        while i < n and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[i:j]))
        i = j
    return fields[0], fields[1], fields[2], i + 1  # ONE ws char after maxval


def decode_image(payload: bytes) -> "np.ndarray | None":
    """Decode PPM P6/P3 or 24-bit BMP bytes to an H×W×3 uint8 array.

    Returns None for formats this pure-Python decoder does not handle
    (PNG/JPEG/...); raises ValueError on corrupt data of a known format.
    """
    if payload is None or len(payload) < 2:
        return None
    magic = bytes(payload[:2])
    if magic == b"P6":
        w, h, maxval, off = _ppm_header(payload)
        need = w * h * 3
        if maxval > 255:
            # 2-byte big-endian samples (maxval up to 65535)
            data = np.frombuffer(payload, dtype=">u2", count=need, offset=off)
            data = (data.astype(np.uint32) * 255 // maxval).astype(np.uint8)
        else:
            data = np.frombuffer(payload, dtype=np.uint8, count=need,
                                 offset=off)
            if maxval != 255:
                data = (data.astype(np.uint32) * 255 // maxval).astype(np.uint8)
        return data.reshape(h, w, 3)
    if magic == b"P3":
        w, h, maxval, off = _ppm_header(payload)
        vals = np.array(bytes(payload[off - 1:]).split(), dtype=np.uint32)
        if len(vals) < w * h * 3:
            raise ValueError("truncated P3 pixel data")
        vals = vals[: w * h * 3]
        if maxval != 255:
            vals = vals * 255 // maxval
        return vals.astype(np.uint8).reshape(h, w, 3)
    if magic == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        off, = struct.unpack_from("<I", payload, 10)
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        comp, = struct.unpack_from("<I", payload, 30)
        if bpp != 24 or comp != 0:
            return None  # only uncompressed 24-bit handled here
        flip = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                             offset=off).reshape(h, stride)
        img = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR -> RGB
        return img[::-1] if flip else img  # bottom-up -> top-down
    return None


def encode_ppm(img: "np.ndarray") -> bytes:
    """Encode an H×W×3 uint8 array as binary PPM (P6)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8).tobytes()


def _resize_nearest(img: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbor resample (the classic integer center mapping)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[ys][:, xs]


def image_features(img: "np.ndarray", dim: int = _FEAT_DIM) -> list[float]:
    """Deterministic 16-dim feature vector from decoded pixels: normalized
    dims (2), per-channel mean (3) and std (3), and an 8-bin grayscale
    histogram (fractions)."""
    h, w = img.shape[:2]
    px = img.reshape(-1, 3).astype(np.float64)
    gray = px.mean(axis=1)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
    out = [h / 256.0, w / 256.0]
    out += (px.mean(axis=0) / 255.0).tolist()
    out += (px.std(axis=0) / 255.0).tolist()
    out += (hist / max(gray.size, 1)).tolist()
    return [float(round(v, 9)) for v in out[:dim]]


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
                    id_col: str = "media_id",
                    kind_col: str = "kind") -> DataFrame:
    """(media_id, features array<float>): decode + embed each media blob.

    PPM/BMP payloads decode for REAL (``decode_image`` → ``image_features``,
    no env flag needed). Other formats fall back to the deterministic fake
    (``SPIKEX_SPARK_FAKE_DECODE``) or raise NotImplementedError — a
    production deployment plugs Pillow/ffmpeg into that fallthrough.

    When ``kind_col`` is present, image decoding is attempted ONLY for
    kind='image' rows — an opaque audio/video blob whose first bytes happen
    to spell an image magic ('P6'/'BM': ~3 in 65536 per blob, i.e. certain
    at corpus scale) must take the fake/stub path, not crash the header
    parser. Without a kind column the payload magic decides."""
    has_kind = kind_col in df.columns
    out_schema = (
        f"{id_col} {df.schema[id_col].dataType.simpleString()},"
        " features array<float>"
    )
    fake = _fake_decode_enabled()

    def decode_one(payload: bytes, kind) -> list[float]:
        if kind is None or kind == "image":
            try:
                img = decode_image(payload)
            except ValueError:
                # magic-sniffed only (no kind column): an opaque blob whose
                # first bytes collide with 'P6'/'P3'/'BM' reaches the header
                # parser — fall through to the fake/stub path instead of
                # failing the whole Arrow batch. Rows explicitly typed
                # kind='image' still raise: a corrupt declared image is a
                # data error the caller must see.
                if kind == "image":
                    raise
                img = None
            if img is not None:
                return image_features(img)
        if fake:
            return _fake_features(payload)
        raise NotImplementedError(
            "non-PPM/BMP media decode requires an image/audio library not "
            "present in this container; set SPIKEX_SPARK_FAKE_DECODE=1 or "
            "plug a decoder into multimodal.decode_image"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf[kind_col] if has_kind else [None] * len(pdf)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "features": [decode_one(p, k)
                             for p, k in zip(pdf[payload_col], kinds)],
            })

    cols = [id_col, payload_col] + ([kind_col] if has_kind else [])
    return df.select(*cols).mapInPandas(run, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """(media_id, resized binary, width, height). PPM/BMP payloads resize
    for REAL (decode → nearest-neighbor resample → re-encode as P6); other
    formats keep the deterministic fake blob (or raise without the flag).
    Image decode is gated on kind='image' when the column is present (see
    decode_features on magic-byte collisions in opaque blobs)."""
    kind_col = "kind"
    has_kind = kind_col in df.columns
    out_schema = (
        f"{id_col} {df.schema[id_col].dataType.simpleString()},"
        " resized binary, width int, height int"
    )
    fake = _fake_decode_enabled()

    def resize_one(payload: bytes, kind) -> bytes:
        if kind is None or kind == "image":
            try:
                img = decode_image(payload)
            except ValueError:
                # see decode_one: magic collision on an untyped blob falls
                # through; an explicitly-typed corrupt image still raises
                if kind == "image":
                    raise
                img = None
            if img is not None:
                return encode_ppm(_resize_nearest(img, width, height))
        if fake:
            return hashlib.md5(
                (payload or b"") + f":{width}x{height}".encode()).digest()
        raise NotImplementedError("non-PPM/BMP image resize needs a codec")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf[kind_col] if has_kind else [None] * len(pdf)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "resized": [resize_one(p, k)
                            for p, k in zip(pdf[payload_col], kinds)],
                "width": width,
                "height": height,
            })

    cols = [id_col, payload_col] + ([kind_col] if has_kind else [])
    return df.select(*cols).mapInPandas(run, schema=out_schema)


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
    """Deterministic synthetic media table rows (MEDIA_SCHEMA shape).

    Image rows carry REAL binary-PPM payloads (deterministic gradient
    patterns sized per the row metadata) so decode/resize run end-to-end
    without any codec library; audio/video rows stay opaque blobs for the
    stub/fake path."""
    import random
    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        width = 64 + (i % 4) * 32 if kind != "audio" else None
        height = 48 + (i % 3) * 16 if kind != "audio" else None
        if kind == "image":
            y, x = np.mgrid[0:height, 0:width]
            img = np.stack(
                [(x * 3 + i) % 256, (y * 5 + 2 * i) % 256, (x + y + 7 * i) % 256],
                axis=-1,
            ).astype(np.uint8)
            payload = encode_ppm(img)
            mime = "image/x-portable-pixmap"
        else:
            payload = hashlib.md5(f"media:{seed}:{i}".encode()).digest() * 4
            mime = {"audio": "audio/wav", "video": "video/mp4"}[kind]
        rows.append({
            "media_id": i,
            "kind": kind,
            "mime": mime,
            "width": width,
            "height": height,
            "duration_ms": (rng.randint(1, 8) * 1000) if kind != "image" else None,
            "payload": payload,
        })
    return rows

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Image decode is REAL for every format a pure-Python (stdlib + numpy)
decoder can handle — PPM (P6 binary / P3 ascii), 24-bit uncompressed BMP,
full PNG (zlib inflate, all five scanline filters, color types 0/2/3/4/6,
bit depths 1-16, Adam7 interlace, CRC-verified), baseline AND progressive
JPEG (:mod:`spikex_spark.jpeg`: Huffman + DCT + 4:2:0, JFIF YCbCr, restart
markers, spectral selection + successive approximation), and GIF
(:mod:`spikex_spark.gif`: LZW, interlace, palette re-encode) — including
decode → feature-extract and decode → nearest-neighbor resize →
format-preserving re-encode. Audio decode is REAL for RIFF/WAVE PCM
(u8/i16/i24/i32 and IEEE float, extensible headers) — decode →
feature-extract (:func:`audio_features`) and decode → linear-interp
resample → re-encode (:func:`resample_audio_df`). Remaining formats
(arithmetic-coded JPEG, compressed audio, video) have no library in
this container, so their decode stays stubbed behind ``SPIKEX_SPARK_FAKE_DECODE``
(deterministic fake) or raises ``NotImplementedError``; the Spark-side
plumbing (schemas, Arrow batch shapes, partitioning, UDF signatures) is
the same either way — a production deployment drops Pillow/ffmpeg into
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
    """Decode PPM P6/P3, 24-bit BMP, PNG, baseline JPEG, or GIF bytes to
    an H×W×3 uint8 array.

    Returns None for formats this pure-Python decoder does not handle
    (arithmetic-coded JPEG, compressed BMP, ...); raises ValueError on corrupt
    data of a known format. The ValueError contract is normalized HERE:
    codec internals can surface zlib.error (bad IDAT stream behind intact
    chunk CRCs), struct.error (truncated fixed-layout headers), or
    IndexError (short buffers) — callers like decode_features rely on
    catching exactly ValueError to route untyped magic-collision blobs to
    the fake/stub path instead of failing the whole Arrow batch.
    """
    import zlib

    try:
        return _decode_image_raw(payload)
    except ValueError:
        raise
    except (zlib.error, struct.error, IndexError) as e:
        raise ValueError(f"corrupt image stream: {e}") from e


def _decode_image_raw(payload: bytes) -> "np.ndarray | None":
    if payload is None or len(payload) < 2:
        return None
    if bytes(payload[:8]) == _PNG_SIG:
        return decode_png(payload)
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
    if bytes(payload[:3]) == b"\xff\xd8\xff":
        from spikex_spark.jpeg import decode_jpeg
        return decode_jpeg(bytes(payload))  # None for arithmetic-coded
    if bytes(payload[:6]) in (b"GIF87a", b"GIF89a"):
        from spikex_spark.gif import decode_gif
        return decode_gif(bytes(payload))
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


def encode_p3(img: "np.ndarray") -> bytes:
    """Encode an H×W×3 uint8 array as ascii PPM (P3), one pixel per line."""
    h, w = img.shape[:2]
    flat = np.ascontiguousarray(img, dtype=np.uint8).reshape(-1, 3)
    body = "\n".join(f"{r} {g} {b}" for r, g, b in flat)
    return (f"P3\n{w} {h}\n255\n{body}\n").encode("ascii")


def encode_bmp(img: "np.ndarray") -> bytes:
    """Encode an H×W×3 uint8 array as 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows padded to 4 bytes, BGR byte order — the exact shape
    ``decode_image`` parses back)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = np.ascontiguousarray(
        img[::-1, :, ::-1], dtype=np.uint8).reshape(h, w * 3)  # flip+BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


# --- PNG: real stdlib-only codec (zlib inflate + per-spec unfiltering) ------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# Adam7 pass grid: (x-offset, y-offset, x-step, y-step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, pos: int, w: int, h: int, channels: int,
                  depth: int) -> tuple["np.ndarray", int]:
    """Reverse PNG scanline filtering for one (sub-)image of w×h pixels.

    ``raw`` is the inflated IDAT stream; consumes ``h`` scanlines starting
    at byte ``pos`` (each: 1 filter-type byte + stride payload bytes) and
    returns (h×stride uint8 array of reconstructed bytes, new position).
    Filters None/Sub/Up vectorize (Sub is a per-residue-class cumsum);
    Average/Paeth are inherently sequential in x and loop per byte.
    """
    bpp = max(1, (channels * depth) // 8)
    stride = (w * channels * depth + 7) // 8
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    need = h * (stride + 1)
    if len(raw) - pos < need:
        raise ValueError("truncated PNG pixel data")
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp]
            # per-residue-class prefix sum — the recurrence chains only
            # within each byte lane of a pixel
            for r in range(bpp):
                row[r::bpp] = np.cumsum(
                    row[r::bpp].astype(np.uint64)) & 0xFF
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = row
        prev = row
    return out, pos


def _png_rows_to_samples(rows: "np.ndarray", w: int, channels: int,
                         depth: int) -> "np.ndarray":
    """h×stride reconstructed bytes → h×w×channels uint8 samples (16-bit
    samples take their high byte; sub-byte depths unpack MSB-first and
    scale to 0..255)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        u16 = rows.reshape(h, -1)[:, : w * channels * 2]
        hi = u16.reshape(h, w * channels, 2)[..., 0]  # big-endian high byte
        return hi.reshape(h, w, channels)
    # 1/2/4-bit (grayscale or palette, channels == 1 per spec)
    bits = np.unpackbits(rows, axis=1)[:, : w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (bits * weights).sum(axis=2).astype(np.uint8)
    return vals.reshape(h, w, 1)


def decode_png(payload: bytes) -> "np.ndarray":
    """Decode a PNG to an H×W×3 uint8 RGB array — pure stdlib (zlib) + numpy.

    Handles all five scanline filters, color types 0/2/3/4/6, bit depths
    1/2/4/8/16 (16-bit takes the high byte; alpha is dropped; palette
    indices look up PLTE), and Adam7 interlacing. Chunk CRCs are verified.
    Raises ValueError on corrupt data.
    """
    import zlib
    if not bytes(payload[:8]) == _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, n = 8, len(payload)
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= n:
        (length,), ctype = struct.unpack_from(">I", payload, pos), \
            bytes(payload[pos + 4: pos + 8])
        data = bytes(payload[pos + 8: pos + 8 + length])
        if len(data) != length or pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        crc, = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    channels = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))

    def finish(samples: "np.ndarray") -> "np.ndarray":
        if color == 3:
            if plte is None:
                raise ValueError("palette PNG missing PLTE")
            idx = samples[..., 0]
            if int(idx.max(initial=0)) >= len(plte):
                raise ValueError("PNG palette index out of range")
            return plte[idx]
        if color in (0, 4):  # grayscale (+alpha): scale sub-byte, drop alpha
            g = samples[..., 0]
            if depth < 8:
                g = (g.astype(np.uint32) * 255 // ((1 << depth) - 1)
                     ).astype(np.uint8)
            return np.repeat(g[..., None], 3, axis=2)
        return samples[..., :3]  # RGB / RGBA (alpha dropped)

    if interlace == 0:
        rows, pos2 = _png_unfilter(raw, 0, w, h, channels, depth)
        return np.ascontiguousarray(
            finish(_png_rows_to_samples(rows, w, channels, depth)))
    if interlace != 1:
        raise ValueError(f"bad PNG interlace method {interlace}")
    out = np.zeros((h, w, 3), dtype=np.uint8)
    p = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        rows, p = _png_unfilter(raw, p, pw, ph, channels, depth)
        sub = finish(_png_rows_to_samples(rows, pw, channels, depth))
        out[y0::dy, x0::dx] = sub
    return out


def encode_png(img: "np.ndarray", level: int = 6) -> bytes:
    """Encode an H×W×3 uint8 array as an 8-bit RGB PNG (filter 0 rows,
    single IDAT) — pure stdlib."""
    import zlib
    h, w = img.shape[:2]
    body = np.ascontiguousarray(img, dtype=np.uint8).reshape(h, w * 3)
    scan = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    scan[:, 1:] = body  # filter byte 0 per row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(scan.tobytes(), level)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


# format-preserving re-encode dispatch for decodable formats
_ENCODERS = {}


def detect_image_format(payload: bytes) -> "str | None":
    """Sniff the on-disk image format from magic bytes: 'p6' | 'p3' | 'bmp'
    | 'png' | 'jpeg' | 'jpegp' (progressive JPEG) | 'gif' | None (unknown /
    not an image). The jpeg/jpegp split walks the marker segments to the
    frame header so the resize path can re-encode each variant as itself."""
    if payload is None or len(payload) < 2:
        return None
    head = bytes(payload[:8])
    if head.startswith(b"P6"):
        return "p6"
    if head.startswith(b"P3"):
        return "p3"
    if head.startswith(b"BM"):
        return "bmp"
    if head == _PNG_SIG:
        return "png"
    if head.startswith(b"\xff\xd8\xff"):
        i, n = 2, len(payload)
        while i + 1 < n and payload[i] == 0xFF:
            m = payload[i + 1]
            if m == 0xFF:                 # fill byte
                i += 1
                continue
            if m == 0xC2:
                return "jpegp"
            if (0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC)) \
                    or m == 0xDA:
                return "jpeg"             # any other SOF, or scan w/o SOF
            if m in (0x01,) or 0xD0 <= m <= 0xD9:
                i += 2                    # parameterless markers
                continue
            if i + 4 > n:
                break
            i += 2 + struct.unpack_from(">H", payload, i + 2)[0]
        return "jpeg"
    if head.startswith(b"GIF87a") or head.startswith(b"GIF89a"):
        return "gif"
    return None


def _encode_jpeg90(img: "np.ndarray") -> bytes:
    from spikex_spark.jpeg import encode_jpeg
    return encode_jpeg(img, quality=90)


def _encode_gif(img: "np.ndarray") -> bytes:
    # palette-preserving: valid whenever the image has <=256 distinct
    # colors — always true on the resize path (nearest-neighbor output
    # colors are a subset of the decoded GIF's palette)
    from spikex_spark.gif import encode_gif
    return encode_gif(img)


def _encode_jpeg90_progressive(img: "np.ndarray") -> bytes:
    from spikex_spark.jpeg import encode_jpeg
    return encode_jpeg(img, quality=90, progressive=True)


_ENCODERS.update({"p6": encode_ppm, "p3": encode_p3, "bmp": encode_bmp,
                  "png": encode_png, "jpeg": _encode_jpeg90,
                  "jpegp": _encode_jpeg90_progressive,
                  "gif": _encode_gif})


# ---------------------------------------------------------------------------
# real stdlib-only audio codec: RIFF/WAVE PCM (u8 / i16 / i24 / i32, IEEE
# float32/64, WAVE_FORMAT_EXTENSIBLE wrapping either)
# ---------------------------------------------------------------------------

_WAV_FMT_PCM = 1
_WAV_FMT_FLOAT = 3
_WAV_FMT_EXTENSIBLE = 0xFFFE


def detect_audio_format(payload: bytes) -> "str | None":
    """'wav' for RIFF/WAVE payloads, else None (mp3/ogg/... stay opaque)."""
    if payload is None or len(payload) < 12:
        return None
    head = bytes(payload[:12])
    return "wav" if head[:4] == b"RIFF" and head[8:12] == b"WAVE" else None


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int] | None":
    """Decode RIFF/WAVE PCM bytes to (float32 samples in [-1, 1] shaped
    (n_frames, channels), sample_rate).

    Same contract as :func:`decode_image`: an unknown container returns
    None, a known container with corrupt contents raises ValueError.
    Handles PCM u8/i16/i24/i32 and IEEE float32/64, plus
    WAVE_FORMAT_EXTENSIBLE wrapping either; compressed-in-WAV codec tags
    (ADPCM, MP3, ...) return None — they need a real codec library.
    """
    if detect_audio_format(payload) != "wav":
        return None
    buf = bytes(payload)
    pos, end = 12, len(buf)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8: pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated WAV fmt chunk")
            tag, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if tag == _WAV_FMT_EXTENSIBLE:
                if size < 26:
                    raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt")
                # SubFormat GUID: its first two bytes carry the real tag
                (tag,) = struct.unpack_from("<H", body, 24)
            fmt = (tag, ch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even length
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, ch, rate, bits = fmt
    if ch < 1 or rate < 1:
        raise ValueError(f"bad WAV fmt: channels={ch} rate={rate}")
    if tag == _WAV_FMT_PCM and bits == 8:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    elif tag == _WAV_FMT_PCM and bits == 16:
        x = np.frombuffer(
            data[: len(data) & ~1], dtype="<i2").astype(np.float32) / 32768.0
    elif tag == _WAV_FMT_PCM and bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8)
        raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3).astype(np.int64)
        u = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        u[u >= 1 << 23] -= 1 << 24  # sign-extend
        x = u.astype(np.float32) / float(1 << 23)
    elif tag == _WAV_FMT_PCM and bits == 32:
        x = np.frombuffer(
            data[: len(data) & ~3], dtype="<i4").astype(np.float32)
        x /= float(1 << 31)
    elif tag == _WAV_FMT_FLOAT and bits == 32:
        x = np.frombuffer(data[: len(data) & ~3], dtype="<f4").astype(
            np.float32)
    elif tag == _WAV_FMT_FLOAT and bits == 64:
        x = np.frombuffer(data[: len(data) & ~7], dtype="<f8").astype(
            np.float32)
    else:
        return None  # compressed-in-WAV needs a real codec library
    n = (x.size // ch) * ch
    return x[:n].reshape(-1, ch), rate


def decode_audio(payload: bytes) -> "tuple[np.ndarray, int] | None":
    """ValueError-normalizing wrapper over :func:`decode_wav` (the audio
    face of :func:`decode_image`'s contract — see its docstring for why
    callers catch exactly ValueError)."""
    try:
        return decode_wav(payload)
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt audio stream: {e}") from e


def encode_wav(samples: "np.ndarray", rate: int, bits: int = 16) -> bytes:
    """Encode float samples in [-1, 1], shaped (n, ch) or (n,), as PCM WAV
    (u8 / i16 / i32)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    x = np.clip(x, -1.0, 1.0)
    # symmetric 2^(bits-1) scale, clipped at the positive rail — matches
    # the decoder's divisor exactly, so round-trips stay within half a
    # quantization step at every depth
    if bits == 16:
        q = np.clip(np.round(x * 32768.0), -32768, 32767)
        pcm = q.astype("<i2").tobytes()
    elif bits == 8:
        q = np.clip(np.round(x * 128.0), -128, 127)
        pcm = (q + 128).astype(np.uint8).tobytes()
    elif bits == 32:
        q = np.clip(np.round(x * 2147483648.0), -2147483648, 2147483647)
        pcm = q.astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported WAV encode bit depth {bits}")
    ba = ch * bits // 8
    fmt = struct.pack("<HHIIHH", _WAV_FMT_PCM, ch, rate, rate * ba, ba, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
            + (b"\x00" if len(pcm) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(samples: "np.ndarray", rate: int,
                   dim: int = _FEAT_DIM) -> list[float]:
    """Deterministic 16-dim feature vector from decoded PCM: duration (s),
    rate (/48k), channels (/8), RMS, peak, zero-crossing rate, mean |x|,
    DC offset, and an 8-bin RMS energy envelope over equal time slices."""
    n, ch = samples.shape
    mono = samples.astype(np.float64).mean(axis=1)
    out = [
        n / rate,
        rate / 48000.0,
        ch / 8.0,
        float(np.sqrt(np.mean(mono ** 2))) if n else 0.0,
        float(np.max(np.abs(mono))) if n else 0.0,
        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        if n > 1 else 0.0,
        float(np.mean(np.abs(mono))) if n else 0.0,
        float(np.mean(mono)) if n else 0.0,
    ]
    nbin = max(dim - len(out), 0)
    edges = (np.arange(nbin + 1) * n) // max(nbin, 1)
    for i in range(nbin):
        seg = mono[edges[i]:edges[i + 1]]
        out.append(float(np.sqrt(np.mean(seg ** 2))) if seg.size else 0.0)
    return [float(round(v, 9)) for v in out[:dim]]


def resample_audio(samples: "np.ndarray", src_rate: int,
                   dst_rate: int) -> "np.ndarray":
    """Linear-interpolation resample of (n, ch) float samples to dst_rate."""
    n, ch = samples.shape
    if src_rate == dst_rate or n == 0:
        return samples.astype(np.float32)
    m = max(int(round(n * dst_rate / src_rate)), 1)
    t_dst = np.arange(m, dtype=np.float64) * (src_rate / dst_rate)
    t_src = np.arange(n, dtype=np.float64)
    out = np.empty((m, ch), dtype=np.float32)
    for c in range(ch):
        out[:, c] = np.interp(t_dst, t_src, samples[:, c].astype(np.float64))
    return out


# ---------------------------------------------------------------------------
# real stdlib-only video CONTAINER parsing: ISO BMFF (MP4) box walk.
# Frame DECODE stays stubbed (H.264/VP9 genuinely need codec libraries), but
# the metadata a pipeline filters/partitions on — duration, timescale, track
# count, brand — parses for real from the moov/mvhd boxes.
# ---------------------------------------------------------------------------

_MP4_TOP_BOXES = {b"ftyp", b"styp", b"moov", b"mdat", b"free", b"skip",
                  b"moof", b"mfra", b"meta", b"pdin", b"uuid", b"sidx"}


def detect_video_format(payload: bytes) -> "str | None":
    """'mp4' for a plausible ISO-BMFF box, 'mjpeg' for a concatenated
    JPEG stream with ≥2 frames (the IP-camera/AVI-payload format — a
    single JPEG is an image, not a video), else None (other containers
    stay opaque)."""
    if payload is None or len(payload) < 8:
        return None
    if bytes(payload[4:8]) in _MP4_TOP_BOXES:
        return "mp4"
    if bytes(payload[:3]) == b"\xff\xd8\xff":
        if _mjpeg_frames_or_none(payload) is not None:
            return "mjpeg"
        return None
    return None


def _mjpeg_frames_or_none(payload: bytes) -> "list | None":
    """The frames of a VALID ≥2-frame MJPEG stream, else None — one walk
    shared by detection and decoding (callers previously split the same
    payload once to detect and again to sample, ADVICE r5). Semantics
    identical to detect_video_format's mjpeg arm: the WHOLE stream must
    parse (trailing garbage → not mjpeg), a single JPEG is an image."""
    if payload is None or len(payload) < 8:
        return None
    if bytes(payload[4:8]) in _MP4_TOP_BOXES:
        return None                      # detect's mp4 arm wins first
    if bytes(payload[:3]) != b"\xff\xd8\xff":
        return None
    try:
        frames = split_mjpeg_frames(payload)
    except ValueError:
        return None
    return frames if len(frames) >= 2 else None


def split_mjpeg_frames(payload: bytes) -> list:
    """Split an MJPEG stream (concatenated baseline/progressive JPEGs)
    into its frame byte strings by walking the REAL JPEG segment
    structure — length-prefixed marker segments, entropy-coded scan data
    skipped with FF00 byte-stuffing and RST0-7 awareness. A naive
    ``payload.split(EOI)`` breaks on stuffed bytes and embedded EXIF
    thumbnails; this walk cannot. Truncated/malformed streams raise
    ValueError (same contract as decode_image)."""
    buf = bytes(payload)
    frames = []
    pos = 0
    n = len(buf)
    while pos < n:
        if buf[pos:pos + 2] != b"\xff\xd8":
            raise ValueError(f"MJPEG frame at {pos} does not start with SOI")
        start = pos
        pos += 2
        while True:
            if pos + 2 > n:
                raise ValueError("truncated MJPEG frame (no EOI)")
            if buf[pos] != 0xFF:
                raise ValueError(f"expected marker at {pos}")
            marker = buf[pos + 1]
            if marker == 0xD9:                      # EOI — frame complete
                pos += 2
                frames.append(buf[start:pos])
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                pos += 2                            # stand-alone marker
                continue
            if pos + 4 > n:
                raise ValueError("truncated MJPEG segment header")
            (seglen,) = struct.unpack_from(">H", buf, pos + 2)
            if seglen < 2:
                raise ValueError(f"bad segment length {seglen} at {pos}")
            pos += 2 + seglen
            if marker == 0xDA:                      # SOS: skip entropy data
                # jump between 0xFF candidates with bytes.find (C speed)
                # instead of advancing one byte at a time in Python —
                # entropy data is ~all the payload, and the old loop paid
                # a Python iteration per byte (ADVICE r5). Stop conditions
                # are identical: a 0xFF followed by neither a stuffed 00
                # nor RST0-7 is the next real marker; running off the end
                # leaves pos ≥ n-1 so the outer truncation check raises
                # the same ValueError.
                while True:
                    nxt = buf.find(b"\xff", pos)
                    if nxt < 0 or nxt + 2 > n:
                        pos = n
                        break
                    m2 = buf[nxt + 1]
                    if m2 == 0x00 or 0xD0 <= m2 <= 0xD7:
                        pos = nxt + 2               # stuffed byte / RSTn
                        continue
                    pos = nxt                       # real marker (EOI/next)
                    break
    return frames


def _mp4_boxes(buf: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in buf[pos:end]."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        btype = buf[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"bad MP4 box size {size} for {btype!r}")
        yield btype, body, pos + size
        pos += size


def parse_mp4_meta(payload: bytes) -> "dict | None":
    """Parse ISO-BMFF container metadata: {brand, duration_ms, timescale,
    n_tracks}. Same contract as decode_image/decode_wav: non-MP4 payloads
    return None, a recognized container with corrupt boxes raises
    ValueError. Only box headers and the fixed mvhd layout are read — no
    sample data is touched, so this is O(#boxes), not O(bytes)."""
    if detect_video_format(payload) != "mp4":
        return None
    buf = bytes(payload)
    meta = {"brand": None, "duration_ms": None, "timescale": None,
            "n_tracks": 0}
    try:
        for btype, body, bend in _mp4_boxes(buf, 0, len(buf)):
            if btype == b"ftyp" and bend - body >= 4:
                meta["brand"] = buf[body: body + 4].decode(
                    "ascii", "replace")
            elif btype == b"moov":
                for ctype, cbody, cend in _mp4_boxes(buf, body, bend):
                    if ctype == b"mvhd":
                        ver = buf[cbody]
                        if ver == 1:
                            ts, dur = struct.unpack_from(">IQ", buf,
                                                         cbody + 4 + 16)
                        else:
                            ts, dur = struct.unpack_from(">II", buf,
                                                         cbody + 4 + 8)
                        meta["timescale"] = ts
                        if ts:
                            meta["duration_ms"] = int(dur * 1000 // ts)
                    elif ctype == b"trak":
                        meta["n_tracks"] += 1
    except struct.error as e:
        raise ValueError(f"corrupt MP4 structure: {e}") from e
    if meta["timescale"] is None:
        raise ValueError("MP4 missing moov/mvhd box")
    return meta


def encode_mp4_stub(duration_ms: int, timescale: int = 1000,
                    n_tracks: int = 1, brand: bytes = b"isom",
                    mdat: bytes = b"") -> bytes:
    """Build a minimal VALID ISO-BMFF container (ftyp + moov[mvhd + empty
    trak boxes] + mdat): real enough for any box-walking parser; the mdat
    payload is caller-supplied opaque bytes (no real codec stream)."""
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    dur = duration_ms * timescale // 1000
    mvhd = box(b"mvhd", (
        b"\x00\x00\x00\x00"                      # version 0 + flags
        + struct.pack(">II", 0, 0)               # creation/modification
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)          # rate 1.0
        + struct.pack(">H", 0x0100)              # volume 1.0
        + b"\x00" * 10                           # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)                # unity matrix
        + b"\x00" * 24                           # pre_defined
        + struct.pack(">I", n_tracks + 1)))      # next_track_ID
    traks = b"".join(box(b"trak", struct.pack(">I", i + 1))
                     for i in range(n_tracks))
    return ftyp + box(b"moov", mvhd + traks) + box(b"mdat", mdat)


def video_meta_df(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """(media_id, brand, duration_ms, timescale, n_tracks): real container-
    metadata extraction over binary video columns — the stage a training
    pipeline filters on (drop >10 min clips, partition by brand) BEFORE any
    expensive decode. Non-MP4 payloads yield NULL metadata (opaque blobs
    are data, not errors, at corpus scale); corrupt MP4 raises for rows
    explicitly typed kind='video', else falls through to NULLs."""
    kind_col = "kind"
    has_kind = kind_col in df.columns
    out_schema = (
        f"{id_col} {df.schema[id_col].dataType.simpleString()},"
        " brand string, duration_ms bigint, timescale bigint, n_tracks int"
    )

    def meta_one(payload: bytes, kind) -> tuple:
        try:
            m = parse_mp4_meta(payload)
        except ValueError:
            if kind == "video":
                raise
            m = None
        if m is None:
            return (None, None, None, None)
        return (m["brand"], m["duration_ms"], m["timescale"], m["n_tracks"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf[kind_col] if has_kind else [None] * len(pdf)
            metas = [meta_one(p, k)
                     for p, k in zip(pdf[payload_col], kinds)]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "brand": [m[0] for m in metas],
                "duration_ms": [m[1] for m in metas],
                "timescale": [m[2] for m in metas],
                "n_tracks": [m[3] for m in metas],
            })

    cols = [id_col, payload_col] + ([kind_col] if has_kind else [])
    return df.select(*cols).mapInPandas(run, schema=out_schema)


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

    PPM/BMP/PNG/JPEG payloads decode for REAL (``decode_image`` →
    ``image_features``) and WAV PCM payloads too (``decode_audio`` →
    ``audio_features``), no env flag needed. Other formats fall back to the
    deterministic fake (``SPIKEX_SPARK_FAKE_DECODE``) or raise
    NotImplementedError — a production deployment plugs Pillow/ffmpeg into
    that fallthrough.

    When ``kind_col`` is present, image decoding is attempted ONLY for
    kind='image' rows and audio decoding only for kind='audio' — an opaque
    blob whose first bytes happen to spell a foreign magic ('P6'/'BM'/
    'RIFF': ~4 in 2^16-2^32 per blob, i.e. certain at corpus scale) must
    take the fake/stub path, not crash the header parser. Without a kind
    column the payload magic decides."""
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
        if kind is None or kind == "audio":
            try:
                dec = decode_audio(payload)
            except ValueError:
                # same collision rule as images: an untyped blob whose first
                # bytes spell RIFF/WAVE falls through to the fake path; a row
                # explicitly typed kind='audio' with corrupt WAV still raises
                if kind == "audio":
                    raise
                dec = None
            if dec is not None:
                return audio_features(*dec)
        if kind is None or kind == "video":
            # real video path: MJPEG streams decode their FIRST frame
            # through the real JPEG decoder (the representative-frame
            # embedding a curation pipeline uses); mp4/compressed codecs
            # stay stub-gated below
            mj = _mjpeg_frames_or_none(payload)   # one walk, not detect+split
            if mj is not None:
                from .jpeg import decode_jpeg
                return image_features(decode_jpeg(mj[0]))
        if fake:
            return _fake_features(payload)
        raise NotImplementedError(
            "non-image media decode requires an audio/video library not "
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
    """(media_id, resized binary, width, height). PPM/BMP/PNG/JPEG payloads
    resize for REAL (decode → nearest-neighbor resample → re-encode in the
    INPUT's format, so a BMP round-trips as BMP and a PNG as PNG); other
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
                enc = _ENCODERS[detect_image_format(payload)]
                return enc(_resize_nearest(img, width, height))
        if fake:
            return hashlib.md5(
                (payload or b"") + f":{width}x{height}".encode()).digest()
        raise NotImplementedError("non-image media resize needs a codec")

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


def resample_audio_df(df: DataFrame, rate: int,
                      payload_col: str = "payload",
                      id_col: str = "media_id") -> DataFrame:
    """(media_id, resampled binary, sample_rate): the audio face of
    :func:`resize_images` — WAV PCM payloads resample for REAL (decode →
    linear interpolation → 16-bit PCM re-encode at ``rate``); other audio
    containers keep the deterministic fake blob (or raise without the
    flag). Audio decode is gated on kind='audio' when the column is present
    (see decode_features on magic-byte collisions in opaque blobs); image/
    video rows always take the fake/stub path."""
    kind_col = "kind"
    has_kind = kind_col in df.columns
    out_schema = (
        f"{id_col} {df.schema[id_col].dataType.simpleString()},"
        " resampled binary, sample_rate int"
    )
    fake = _fake_decode_enabled()

    def resample_one(payload: bytes, kind) -> bytes:
        if kind is None or kind == "audio":
            try:
                dec = decode_audio(payload)
            except ValueError:
                if kind == "audio":
                    raise
                dec = None
            if dec is not None:
                samples, src_rate = dec
                return encode_wav(resample_audio(samples, src_rate, rate),
                                  rate, bits=16)
        if fake:
            return hashlib.md5(
                (payload or b"") + f":{rate}hz".encode()).digest()
        raise NotImplementedError("non-WAV audio resample needs a codec")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf[kind_col] if has_kind else [None] * len(pdf)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "resampled": [resample_one(p, k)
                              for p, k in zip(pdf[payload_col], kinds)],
                "sample_rate": rate,
            })

    cols = [id_col, payload_col] + ([kind_col] if has_kind else [])
    return df.select(*cols).mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  id_col: str = "media_id") -> DataFrame:
    """(media_id, frame_idx, ts_ms, frame binary): frame sampling for
    video rows at ``every_ms`` ticks across ``duration_ms``.

    MJPEG payloads sample for REAL: the stream is split into its actual
    JPEG frames (``split_mjpeg_frames``), frames are assumed uniformly
    spaced over the duration (MJPEG carries no per-frame timing), and
    each tick emits the JPEG bytes of the frame at that timestamp —
    each one decodable by ``jpeg.decode_jpeg``. Other containers (mp4 /
    compressed codecs) keep the deterministic fake frame under
    ``SPIKEX_SPARK_FAKE_DECODE`` or raise — see COVERAGE.md for the
    stub contract."""
    out_schema = (
        f"{id_col} {df.schema[id_col].dataType.simpleString()},"
        " frame_idx int, ts_ms int, frame binary"
    )
    fake = _fake_decode_enabled()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for mid, dur, payload in zip(
                pdf[id_col], pdf["duration_ms"], pdf["payload"]
            ):
                n = max(int((dur or 0) // every_ms), 0)
                mj = _mjpeg_frames_or_none(payload)  # one walk, see helper
                if mj is None and not fake:
                    raise NotImplementedError(
                        "frame sampling for non-MJPEG video needs a codec")
                for i in range(n):
                    ts = i * every_ms
                    if mj is not None:
                        # uniform spacing: tick ts -> source frame index
                        j = min(len(mj) - 1, ts * len(mj) // max(dur, 1))
                        frame = mj[j]
                    else:
                        frame = hashlib.md5(
                            (payload or b"") + struct.pack("<i", i)).digest()
                    rows["_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
                    rows["frame"].append(frame)
            out = pd.DataFrame(rows)
            out.columns = [id_col, "frame_idx", "ts_ms", "frame"]
            yield out

    return df.select(id_col, "duration_ms", "payload").mapInPandas(
        run, schema=out_schema
    )


def gen_media(n: int = 20, seed: int = 42) -> list[dict]:
    """Deterministic synthetic media table rows (MEDIA_SCHEMA shape).

    Image rows carry REAL payloads (deterministic gradient patterns sized
    per the row metadata), cycling through every encoder this module can
    decode back — P6, P3, BMP, PNG, baseline JPEG, GIF, progressive JPEG —
    so decode/resize exercise all seven codec paths end-to-end without any
    external library.
    Audio rows carry REAL WAV PCM payloads (deterministic two-tone sine
    mixes cycling sample rate 8k/11k/16k/22k, bit depth 8/16/32, and
    mono/stereo) matching their duration_ms; video rows alternate between
    REAL MJPEG streams (2-4 concatenated JPEG frames — the real frame-
    sampling/first-frame-features path) and opaque ISO-BMFF blobs for the
    stub/fake path (mp4 genuinely needs a codec library)."""
    import random
    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        width = 64 + (i % 4) * 32 if kind != "audio" else None
        height = 48 + (i % 3) * 16 if kind != "audio" else None
        # one rng draw per non-image row, in row order (sequence-stable)
        duration_ms = rng.randint(1, 8) * 1000 if kind != "image" else None
        if kind == "image":
            y, x = np.mgrid[0:height, 0:width]
            img = np.stack(
                [(x * 3 + i) % 256, (y * 5 + 2 * i) % 256, (x + y + 7 * i) % 256],
                axis=-1,
            ).astype(np.uint8)
            fmt = ("p6", "p3", "bmp", "png", "jpeg", "gif",
                   "jpegp")[(i // 3) % 7]
            if fmt == "gif":
                img = (img // 64) * 64  # palette-limited (<=64 colors)
            payload = _ENCODERS[fmt](img)
            mime = {"p6": "image/x-portable-pixmap",
                    "p3": "image/x-portable-pixmap",
                    "bmp": "image/bmp", "png": "image/png",
                    "jpeg": "image/jpeg", "jpegp": "image/jpeg",
                    "gif": "image/gif"}[fmt]
        elif kind == "audio":
            arate = (8000, 11025, 16000, 22050)[(i // 3) % 4]
            nsamp = arate * duration_ms // 1000
            t = np.arange(nsamp, dtype=np.float64) / arate
            f0 = 110.0 * (1 + (i % 5))
            wave = (0.6 * np.sin(2 * np.pi * f0 * t)
                    + 0.3 * np.sin(2 * np.pi * 2 * f0 * t + i))
            ach = 1 + (i % 2)
            sig = np.stack([wave * (0.9 ** c) for c in range(ach)], axis=1)
            payload = encode_wav(sig, arate, bits=(8, 16, 32)[(i // 3) % 3])
            mime = "audio/wav"
        elif (i // 3) % 2 == 1:
            # REAL MJPEG stream (round 5): 2-4 concatenated JPEG frames of
            # deterministic gradients — the real video path end-to-end
            # (split → per-tick frame sampling → first-frame features)
            n_frames = 2 + (i % 3)
            y, x = np.mgrid[0:height, 0:width]
            frames = []
            for fidx in range(n_frames):
                img = np.stack(
                    [(x * 2 + i + 11 * fidx) % 256,
                     (y * 3 + 5 * fidx) % 256,
                     (x + y + i * fidx) % 256], axis=-1).astype(np.uint8)
                from .jpeg import encode_jpeg
                frames.append(encode_jpeg(img, quality=90))
            payload = b"".join(frames)
            mime = "video/x-motion-jpeg"
        else:
            # real ISO-BMFF container (parsable moov/mvhd metadata); the
            # mdat bytes stay an opaque deterministic blob — no codec here
            # brand cycles on (i // 6) so BOTH brands stay covered now that
            # odd (i // 3) video slots carry MJPEG instead of mp4
            payload = encode_mp4_stub(
                duration_ms, timescale=(600, 1000, 90000)[(i // 3) % 3],
                n_tracks=1 + (i % 2), brand=(b"isom", b"mp42")[(i // 6) % 2],
                mdat=hashlib.md5(f"media:{seed}:{i}".encode()).digest() * 4)
            mime = "video/mp4"
        rows.append({
            "media_id": i,
            "kind": kind,
            "mime": mime,
            "width": width,
            "height": height,
            "duration_ms": duration_ms,
            "payload": payload,
        })
    return rows

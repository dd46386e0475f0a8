"""GIF codec in pure Python + numpy (stdlib only; no Pillow).

Decode: GIF87a/89a — logical screen descriptor, global/local color
tables, variable-width LZW with CLEAR/END handling, 4-pass interlace,
graphic-control/comment/application extensions skipped; for animated
files the FIRST frame composited on the logical screen is returned (a
feature-extraction pipeline wants one representative raster, not an
animation player).

Encode: palette-based re-encode for images with <= 256 distinct colors —
exactly what nearest-neighbor resize of a decoded GIF produces (resampling
only ever SELECTS original pixels, so the output colors are a subset of
the input palette). Emits spec-valid LZW: literal codes with a CLEAR
reset before each dictionary overflow, packed LSB-first into <=255-byte
sub-blocks. No compression dictionary is built (the stream is larger than
a real encoder's, never invalid); the reference for the trick is the
widely documented "uncompressed GIF" technique.

Parity note: the reference engine (erre-quadro/spikex) has no image
handling at all — this module exists for the builder's multimodal mandate
(webtext corpora carry GIFs), mirroring the contract of
``spikex_spark.jpeg``: bytes -> H×W×3 uint8, ValueError on corrupt data.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))  # (row offset, step) per pass


class _BitReader:
    """LSB-first bit reader over the concatenated LZW data bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0       # bit position

    def read(self, nbits: int) -> int:
        d, p = self.data, self.pos
        end = p + nbits
        if end > len(d) * 8:
            raise ValueError("truncated GIF LZW stream")
        out = 0
        shift = 0
        while p < end:
            byte = d[p >> 3]
            take = min(8 - (p & 7), end - p)
            out |= ((byte >> (p & 7)) & ((1 << take) - 1)) << shift
            shift += take
            p += take
        self.pos = p
        return out


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Variable-width LZW per GIF spec; returns exactly n_pixels indices."""
    clear = 1 << min_code_size
    end = clear + 1
    reader = _BitReader(data)
    out = bytearray()

    def reset():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return bytes(out[:n_pixels])


def _sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; returns (data, new pos
    past the 0x00 terminator)."""
    parts = []
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-blocks")
        size = buf[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        parts.append(buf[pos:pos + size])
        pos += size


def decode_gif(payload: bytes) -> "np.ndarray":
    """Decode GIF bytes to an H×W×3 uint8 array (first frame)."""
    buf = bytes(payload)
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF header")
    if len(buf) < 13:
        raise ValueError("truncated GIF screen descriptor")
    sw, sh, flags, bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(buf, np.uint8, size * 3, pos).reshape(size, 3)
        pos += size * 3
    # logical screen starts as the background color (or black without a GCT)
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        screen[:] = gct[bg]
    while True:
        if pos >= len(buf):
            raise ValueError("GIF missing trailer")
        block = buf[pos]
        pos += 1
        if block == 0x3B:                      # trailer
            raise ValueError("GIF contains no image data")
        if block == 0x21:                      # extension: label + sub-blocks
            pos += 1
            _, pos = _sub_blocks(buf, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        table = gct
        if iflags & 0x80:
            size = 2 << (iflags & 0x07)
            table = np.frombuffer(buf, np.uint8, size * 3, pos).reshape(
                size, 3)
            pos += size * 3
        if table is None:
            raise ValueError("GIF image with no color table")
        min_code_size = buf[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad GIF LZW min code size {min_code_size}")
        data, pos = _sub_blocks(buf, pos)
        idx = np.frombuffer(
            _lzw_decode(data, min_code_size, w * h), np.uint8)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index outside color table")
        rows = table[idx].reshape(h, w, 3)
        if iflags & 0x40:                      # 4-pass interlace
            ordered = np.empty_like(rows)
            src = 0
            for off, step in _INTERLACE:
                cnt = len(range(off, h, step))
                ordered[off::step] = rows[src:src + cnt]
                src += cnt
            rows = ordered
        screen[top:top + h, left:left + w] = rows[: sh - top, : sw - left]
        return screen                          # first frame only


def encode_gif(img: "np.ndarray") -> bytes:
    """Encode an H×W×3 uint8 array with <= 256 distinct colors as GIF89a.

    Raises ValueError beyond 256 colors — this encoder exists for the
    format-preserving resize path, where nearest-neighbor output colors
    are always a subset of the decoded input palette."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF encode needs <=256 colors, got {len(palette)}")
    bits = max(int(len(palette) - 1).bit_length(), 1)   # GCT size field
    table_size = 1 << bits
    mcs = max(bits, 2)                                   # LZW min code size
    gct = np.zeros((table_size, 3), dtype=np.uint8)
    gct[: len(palette)] = palette

    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    # literal-code stream with a CLEAR before each would-be dict overflow:
    # after CLEAR the table holds `end+1` codes, and each literal appends
    # one, so `(1<<width) - end - 1` literals fit at the starting width
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    per_clear = (1 << width) - end - 1
    emit(clear)
    for start in range(0, len(idx), per_clear):
        if start:
            emit(clear)
        for v in idx[start:start + per_clear]:
            emit(int(v))
    emit(end)
    if nbits:
        out.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)

    header = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0x80 | ((table_size.bit_length() - 2) & 7), 0, 0)
    descriptor = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    return (header + gct.tobytes() + descriptor + bytes([mcs])
            + bytes(blocks) + b"\x3b")

"""Baseline + progressive JPEG codec in pure Python + numpy (no external
libraries).

Implements the ITU-T T.81 baseline sequential DCT process (SOF0/1) and the
progressive DCT process (SOF2): Huffman entropy coding, 8x8 FDCT/IDCT,
Annex-K quantization/Huffman tables, JFIF YCbCr color, optional 4:2:0
chroma subsampling, restart markers, and — for progressive — spectral
selection, successive approximation (DC/AC first + refinement scans, T.81
Annex G), and EOB-run coding. Decoder handles grayscale and YCbCr with any
(h,v) sampling factors in 1..4 that divide the frame's max factors
(integer-ratio upsampling); unsupported variants (arithmetic coding,
lossless/hierarchical, 12-bit precision, non-dividing sampling factors)
return ``None`` so multimodal dispatch can fall through rather than crash.

This is a correctness-grade codec for the multimodal column plumbing
(reference has no media path at all — see SURVEY §2.8): per-pixel Python
Huffman loops make it ~1000x slower than libjpeg, fine for the small
payloads the tests and goldens use. A production deployment swaps
Pillow/libjpeg-turbo into :func:`spikex_spark.multimodal.decode_image`'s
dispatch without touching any Spark plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# constants: zigzag order, Annex K quantization + Huffman tables
# --------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
_UNZIG = np.argsort(ZIGZAG)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# standard Huffman tables (T.81 Annex K.3): (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa,
])

# 8x8 DCT basis: C[u, x] = a(u)/2 * cos((2x+1) u pi / 16); spatial = C.T@F@C
_x = np.arange(8)
_DCT_C = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) / 2.0
_DCT_C[0] /= np.sqrt(2.0)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol for a T.81 canonical Huffman table."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s low bits to the signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over de-stuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_code(self, table: dict) -> int:
        code, length = 0, 0
        bits, pos = self.bits, self.pos
        n = len(bits)
        while length < 16:
            if pos >= n:
                raise ValueError("truncated JPEG entropy data")
            code = (code << 1) | int(bits[pos])
            pos += 1
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                self.pos = pos
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def receive(self, s: int) -> int:
        if s == 0:
            return 0
        pos = self.pos
        if pos + s > len(self.bits):
            raise ValueError("truncated JPEG entropy data")
        v = 0
        for b in self.bits[pos:pos + s]:
            v = (v << 1) | int(b)
        self.pos = pos + s
        return v


def _split_scan(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy segments (split at RSTn, 0xFF00 de-stuffed) + end offset."""
    segs, cur, i, n = [], bytearray(), start, len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = payload[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:                      # stuffed 0xFF data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:            # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                              # next real marker (EOI, ...)
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes) -> "np.ndarray | None":
    """Decode a baseline or progressive JPEG to H×W×3 uint8 RGB
    (grayscale replicated).

    Returns ``None`` for unsupported variants (arithmetic coding SOF9+,
    lossless, hierarchical, 12-bit); raises ``ValueError`` on corrupt or
    truncated data.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}   # (class 0=DC/1=AC, id) -> codes
    restart = 0
    frame = None
    i, n = 2, len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        m = payload[i + 1]
        if m == 0xFF:           # T.81 B.1.1.2: optional 0xFF fill bytes
            i += 1              # may pad before any marker — skip one,
            continue            # the next byte is still 0xFF or the code
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:                     # EOI
            break
        if i + 4 > n:
            raise ValueError("truncated JPEG segment")
        seglen, = struct.unpack_from(">H", payload, i + 2)
        seg = payload[i + 4:i + 2 + seglen]
        i += 2 + seglen
        if m == 0xDB:                     # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec:
                    q = np.frombuffer(seg, dtype=">u2", count=64, offset=p)
                    p += 128
                else:
                    q = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p)
                    p += 64
                qtabs[tid] = q.astype(np.int32)[_UNZIG]   # natural order
        elif m == 0xC4:                   # DHT
            p = 0
            while p < len(seg):
                tc, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                htabs[(tc, tid)] = _canonical_codes(bits, vals)
                p += 17 + nv
        elif m == 0xDD:                   # DRI
            restart, = struct.unpack_from(">H", seg, 0)
        elif m in (0xC0, 0xC1, 0xC2):     # SOF0/1 sequential, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                return None               # 12-bit: not supported
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": m == 0xC2}
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            return None                   # arithmetic/lossless/hierarchical
        elif m == 0xDA:                   # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tabs >> 4, tabs & 0x0F)
            segs, i = _split_scan(payload, i)
            if not frame["progressive"]:
                return _decode_scan(frame, sel, qtabs, htabs, restart, segs)
            # progressive: scans accumulate into per-component coefficient
            # grids; pixels materialize once at EOI
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if "grid" not in frame["comps"][0]:
                if not _init_prog(frame, qtabs):
                    return None           # non-dividing sampling factors
            _decode_prog_scan(frame, sel, ss, se, ahal >> 4, ahal & 0x0F,
                              htabs, restart, segs)
    if frame is not None and frame["progressive"] \
            and "grid" in frame["comps"][0]:
        return _assemble_prog(frame)
    raise ValueError("JPEG has no scan data")


def _decode_scan(frame, sel, qtabs, htabs, restart, segs):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(hmax % c["h"] or vmax % c["v"] for c in comps):
        # e.g. luma h=3 with chroma h=2: the integer-ratio repeat() below
        # cannot upsample it — unsupported variant, not corrupt data
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    for c in comps:
        c["dc_tab"] = htabs[(0, sel[c["id"]][0])]
        c["ac_tab"] = htabs[(1, sel[c["id"]][1])]
        c["q"] = qtabs[c["tq"]].astype(np.float64)
        c["coef"] = np.zeros((nmcu * c["h"] * c["v"], 64), dtype=np.int32)
        c["pred"] = 0

    # entropy decode, MCU-interleaved, restart-aware
    seg_idx = 0
    reader = _BitReader(segs[0])
    for mcu in range(nmcu):
        if restart and mcu and mcu % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(segs[seg_idx])
            for c in comps:
                c["pred"] = 0
        for c in comps:
            nblk = c["h"] * c["v"]
            for b in range(nblk):
                blk = c["coef"][mcu * nblk + b]
                s = reader.read_code(c["dc_tab"])
                diff = _extend(reader.receive(s), s) if s else 0
                c["pred"] += diff
                blk[0] = c["pred"]
                k = 1
                while k < 64:
                    rs = reader.read_code(c["ac_tab"])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:       # ZRL: 16 zeros
                            k += 16
                            continue
                        break             # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC index overflow")
                    blk[k] = _extend(reader.receive(s), s)
                    k += 1

    # dequantize -> IDCT -> assemble planes (vectorized over all blocks)
    planes = []
    for c in comps:
        coef = (c["coef"].astype(np.float64) * c["q"][ZIGZAG])
        coef = coef[:, _UNZIG].reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_C, coef, _DCT_C,
                            optimize=True) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        # block order within an MCU is raster (v rows of h blocks)
        ch, cv = c["h"], c["v"]
        plane = (spatial.reshape(mcuy, mcux, cv, ch, 8, 8)
                 .transpose(0, 2, 4, 1, 3, 5)
                 .reshape(mcuy * cv * 8, mcux * ch * 8))
        plane = plane.repeat(vmax // cv, axis=0).repeat(hmax // ch, axis=1)
        planes.append(plane[:h, :w])
    return _planes_to_rgb(planes)


def _planes_to_rgb(planes):
    """JFIF YCbCr→RGB (grayscale replicated) over cropped uint8 planes."""
    if len(planes) == 1:
        return np.stack([planes[0]] * 3, axis=-1)
    y, cb, cr = (p.astype(np.float64) for p in planes[:3])
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


# --------------------------------------------------------------------------
# progressive decoder (T.81 Annex G; bit-level algorithms follow the
# interoperable libjpeg formulation of G.1.2/G.2)
# --------------------------------------------------------------------------

def _init_prog(frame, qtabs) -> bool:
    """Allocate per-component zigzag coefficient grids (MCU-padded raster).

    Returns False for non-dividing sampling factors (unsupported variant,
    mirrors the baseline path's ``None``).
    """
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(hmax % c["h"] or vmax % c["v"] for c in comps):
        return False
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    for c in comps:
        # grid covers the interleaved-MCU padding; non-interleaved scans
        # visit only the component's actual bh x bw blocks (T.81 A.2.2)
        c["grid"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                             dtype=np.int32)
        cw = -(-frame["w"] * c["h"] // hmax)   # component pixel dims
        ch = -(-frame["h"] * c["v"] // vmax)
        c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)
        c["q"] = qtabs[c["tq"]].astype(np.float64)    # natural order
    return True


def _decode_prog_scan(frame, sel, ss, se, ah, al, htabs, restart, segs):
    """Apply one progressive scan to the component coefficient grids."""
    comps = frame["comps"]
    scomps = [c for c in comps if c["id"] in sel]
    if not scomps:
        raise ValueError("JPEG scan selects unknown component")
    for c in scomps:
        if ss == 0 and ah == 0:           # DC-first reads Huffman DC codes;
            key = (0, sel[c["id"]][0])    # DC-refine reads raw bits only
            if key not in htabs:
                raise ValueError("JPEG scan references undefined DC table")
            c["dc_tab"] = htabs[key]
        if ss > 0:
            key = (1, sel[c["id"]][1])
            if key not in htabs:
                raise ValueError("JPEG scan references undefined AC table")
            c["ac_tab"] = htabs[key]
        c["pred"] = 0
    if ss > 0 and len(scomps) != 1:
        raise ValueError("JPEG progressive AC scan must be single-component")
    state = {"seg": 0, "reader": _BitReader(segs[0]), "eobrun": 0}

    def unit_restart(u):
        if restart and u and u % restart == 0:
            state["seg"] += 1
            if state["seg"] >= len(segs):
                raise ValueError("missing JPEG restart segment")
            state["reader"] = _BitReader(segs[state["seg"]])
            state["eobrun"] = 0
            for c in scomps:
                c["pred"] = 0

    if len(scomps) > 1:                   # interleaved (DC scans)
        for mcu in range(frame["mcux"] * frame["mcuy"]):
            unit_restart(mcu)
            my, mx = divmod(mcu, frame["mcux"])
            for c in scomps:
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        blk = c["grid"][my * c["v"] + dy, mx * c["h"] + dx]
                        _prog_block(state, blk, c, ss, se, ah, al)
    else:                                 # non-interleaved: actual blocks
        c = scomps[0]
        for u in range(c["bh"] * c["bw"]):
            unit_restart(u)
            by, bx = divmod(u, c["bw"])
            _prog_block(state, c["grid"][by, bx], c, ss, se, ah, al)


def _prog_block(state, blk, c, ss, se, ah, al):
    """Decode one block's contribution from the current scan (zigzag idx)."""
    reader = state["reader"]
    if ss == 0:                           # DC scan (se == 0)
        if ah == 0:                       # first: diff-coded, scaled by Al
            s = reader.read_code(c["dc_tab"])
            diff = _extend(reader.receive(s), s) if s else 0
            c["pred"] += diff
            blk[0] = c["pred"] << al
        elif reader.receive(1):           # refinement: one raw bit
            blk[0] = int(blk[0]) | (1 << al)
        return
    if ah == 0:                           # AC first (G.1.2.2): EOB runs
        if state["eobrun"]:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = reader.read_code(c["ac_tab"])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:               # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1 \
                    + (reader.receive(r) if r else 0)
                return
            k += r
            if k > se:
                raise ValueError("JPEG AC index overflow")
            blk[k] = _extend(reader.receive(s), s) << al
            k += 1
        return
    # AC refinement (G.1.2.3): newly-nonzero coefficients are coded with
    # runs over zero-HISTORY positions; positions already nonzero consume
    # one correction bit each as the run passes over them
    p1, m1 = 1 << al, -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.read_code(c["ac_tab"])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) \
                        + (reader.receive(r) if r else 0)
                    break
                newval = 0                # ZRL: 16 zero-history positions
            else:
                newval = p1 if reader.receive(1) else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if reader.receive(1) and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:               # block inside an EOB run still
        while k <= se:                    # pays its correction bits
            v = int(blk[k])
            if v != 0:
                if reader.receive(1) and (v & p1) == 0:
                    blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _assemble_prog(frame):
    """Dequantize + IDCT the accumulated grids into the final RGB image."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        grid = c["grid"]
        rows, cols = grid.shape[:2]
        coef = grid.reshape(-1, 64).astype(np.float64) * c["q"][ZIGZAG]
        coef = coef[:, _UNZIG].reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_C, coef, _DCT_C,
                            optimize=True) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        plane = (spatial.reshape(rows, cols, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8))
        plane = plane.repeat(vmax // c["v"], axis=0) \
                     .repeat(hmax // c["h"], axis=1)
        planes.append(plane[:frame["h"], :frame["w"]])
    return _planes_to_rgb(planes)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:                 # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)   # 1-fill pad per T.81 F.1.2.3
        return bytes(self.out)


def _encode_codes(bits, vals) -> dict:
    """symbol -> (code, length) for the encoder side."""
    return {sym: (code, length)
            for (length, code), sym in _canonical_codes(bits, vals).items()}


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base quant table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _fdct_quant(plane: "np.ndarray", q: "np.ndarray") -> "np.ndarray":
    """8x8-tile a plane, FDCT each tile, quantize: (nblocks, 64) zigzagged."""
    h, w = plane.shape
    blocks = (plane.reshape(h // 8, 8, w // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8)
              .astype(np.float64) - 128.0)
    coef = np.einsum("ux,nxy,vy->nuv", _DCT_C, blocks, _DCT_C, optimize=True)
    coef = coef.reshape(-1, 64)[:, ZIGZAG]
    return np.round(coef / q[None, :]).astype(np.int32)


def _csize(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_blocks(writer, blocks, dc_codes, ac_codes, pred: int) -> int:
    for blk in blocks:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        s = _csize(diff)
        code, length = dc_codes[s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]   # ZRL
                writer.write(code, length)
                run -= 16
            s = _csize(v)
            code, length = ac_codes[(run << 4) | s]
            writer.write(code, length)
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, length = ac_codes[0x00]       # EOB
            writer.write(code, length)
    return pred


def _pad_to_blocks(plane: "np.ndarray", bh: int, bw: int) -> "np.ndarray":
    """Edge-replicate pad a plane to multiples of (bh, bw)."""
    h, w = plane.shape
    ph, pw = -(-h // bh) * bh, -(-w // bw) * bw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(img: "np.ndarray", quality: int = 90,
                subsample: bool = False, progressive: bool = False) -> bytes:
    """Encode H×W×3 uint8 RGB as JFIF JPEG (Annex-K tables scaled to
    ``quality``; 4:2:0 chroma when ``subsample`` else 4:4:4).

    ``progressive=True`` emits a SOF2 progressive stream (libjpeg's
    standard 10-scan script: spectral selection + 2-level successive
    approximation with EOB-run coding). Both modes quantize identical
    coefficients, so they decode to identical pixels.
    """
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    r, g, b = (img[..., c].astype(np.float64) for c in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    ql = _quality_scale(_QUANT_LUMA, quality)
    qc = _quality_scale(_QUANT_CHROMA, quality)
    ql_z, qc_z = ql[ZIGZAG], qc[ZIGZAG]   # tables stored/applied zigzagged

    hs, vs = (2, 2) if subsample else (1, 1)
    yp = _pad_to_blocks(np.round(y), 8 * vs, 8 * hs)
    if subsample:
        # pad to even first so the 2x2 mean sees full cells
        cbp = _pad_to_blocks(np.round(cb), 2, 2)
        crp = _pad_to_blocks(np.round(cr), 2, 2)
        cbp = cbp.reshape(cbp.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
        crp = crp.reshape(crp.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
        cbp = _pad_to_blocks(np.round(cbp), 8, 8)
        crp = _pad_to_blocks(np.round(crp), 8, 8)
    else:
        cbp = _pad_to_blocks(np.round(cb), 8, 8)
        crp = _pad_to_blocks(np.round(cr), 8, 8)

    ycoef = _fdct_quant(np.clip(yp, 0, 255), ql_z.astype(np.float64))
    cbcoef = _fdct_quant(np.clip(cbp, 0, 255), qc_z.astype(np.float64))
    crcoef = _fdct_quant(np.clip(crp, 0, 255), qc_z.astype(np.float64))

    if progressive:
        return _encode_progressive(h, w, hs, vs, ql_z, qc_z,
                                   ycoef, cbcoef, crcoef,
                                   yp.shape, cbp.shape)

    dc_l, ac_l = _encode_codes(*_DC_LUMA), _encode_codes(*_AC_LUMA)
    dc_c, ac_c = _encode_codes(*_DC_CHROMA), _encode_codes(*_AC_CHROMA)
    writer = _BitWriter()
    mcux = yp.shape[1] // (8 * hs)
    mcuy = yp.shape[0] // (8 * vs)
    yb = yp.shape[1] // 8           # luma blocks per row
    cb_w = cbp.shape[1] // 8
    py = pcb = pcr = 0
    for my in range(mcuy):
        for mx in range(mcux):
            yblks = [ycoef[(my * vs + dy) * yb + mx * hs + dx]
                     for dy in range(vs) for dx in range(hs)]
            py = _encode_blocks(writer, yblks, dc_l, ac_l, py)
            pcb = _encode_blocks(writer, [cbcoef[my * cb_w + mx]],
                                 dc_c, ac_c, pcb)
            pcr = _encode_blocks(writer, [crcoef[my * cb_w + mx]],
                                 dc_c, ac_c, pcr)
    scan = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tid: int, q_z: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(v) for v in q_z))

    def dht(tc: int, tid: int, table) -> bytes:
        bits, vals = table
        return seg(0xC4, bytes([(tc << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (b"\xff\xd8"
            + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + dqt(0, ql_z) + dqt(1, qc_z)
            + sof
            + dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
            + dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
            + sos + scan + b"\xff\xd9")


# --------------------------------------------------------------------------
# progressive encoder (T.81 Annex G; scan script = libjpeg's standard
# 10-scan progression, bit-level algorithms follow jcphuff's G.1.2
# formulation so any conformant decoder reads the output)
# --------------------------------------------------------------------------

def _flat_table(symbols: list) -> tuple:
    """A complete fixed-length canonical Huffman table: (bits, vals).

    All codes get length L with 2^L > nsym, so the all-1s code stays
    unused (T.81 C.2). Compression is deliberately traded for simplicity:
    no per-image frequency pass, every symbol the scan can emit exists.
    """
    n = len(symbols)
    length = max(2, n.bit_length())
    if (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, list(symbols)


_PROG_DC_SYMS = list(range(12))
_PROG_AC_FIRST_SYMS = ([(r << 4) | s for r in range(16) for s in range(1, 11)]
                       + [r << 4 for r in range(15)] + [0xF0])
_PROG_AC_REFINE_SYMS = ([(r << 4) | 1 for r in range(16)]
                        + [r << 4 for r in range(15)] + [0xF0])


def _prog_dc_first(comps, mcux, mcuy, dc_codes, al) -> bytes:
    writer = _BitWriter()
    for c in comps:
        c["pred"] = 0
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for c in comps:
            for dy in range(c["v"]):
                for dx in range(c["h"]):
                    blk = c["coef"][(my * c["v"] + dy) * c["cols"]
                                    + mx * c["h"] + dx]
                    t = int(blk[0]) >> al      # point transform (arith shift)
                    diff = t - c["pred"]
                    c["pred"] = t
                    s = _csize(diff)
                    code, length = dc_codes[s]
                    writer.write(code, length)
                    if s:
                        writer.write(diff if diff >= 0
                                     else diff + (1 << s) - 1, s)
    return writer.flush()


def _prog_dc_refine(comps, mcux, mcuy, al) -> bytes:
    writer = _BitWriter()
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for c in comps:
            for dy in range(c["v"]):
                for dx in range(c["h"]):
                    blk = c["coef"][(my * c["v"] + dy) * c["cols"]
                                    + mx * c["h"] + dx]
                    writer.write((int(blk[0]) >> al) & 1, 1)
    return writer.flush()


def _prog_ac_first(c, ss, se, al, ac_codes) -> bytes:
    writer = _BitWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, length = ac_codes[nbits << 4]
            writer.write(code, length)
            if nbits:
                writer.write(eobrun - (1 << nbits), nbits)
            eobrun = 0

    for u in range(c["bh"] * c["bw"]):
        by, bx = divmod(u, c["bw"])
        blk = c["coef"][by * c["cols"] + bx]
        r = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al                   # AC point transform: |v|/2^Al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                code, length = ac_codes[0xF0]
                writer.write(code, length)
                r -= 16
            s = t.bit_length()
            code, length = ac_codes[(r << 4) | s]
            writer.write(code, length)
            writer.write(t if v >= 0 else (1 << s) - 1 - t, s)
            r = 0
        if r:                                  # trailing zeros join EOB run
            eobrun += 1
            if eobrun == 0x7FFF:               # EOB14 ceiling
                flush_eob()
    flush_eob()
    return writer.flush()


def _prog_ac_refine(c, ss, se, al, ac_codes) -> bytes:
    writer = _BitWriter()
    eobrun = 0
    runbits: list = []                         # corrections owed by run blocks

    def flush_eob():
        nonlocal eobrun, runbits
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, length = ac_codes[nbits << 4]
            writer.write(code, length)
            if nbits:
                writer.write(eobrun - (1 << nbits), nbits)
            eobrun = 0
        for b in runbits:
            writer.write(b, 1)
        runbits = []

    for u in range(c["bh"] * c["bw"]):
        by, bx = divmod(u, c["bw"])
        blk = c["coef"][by * c["cols"] + bx]
        tvals = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eobpos = ss - 1                        # last newly-nonzero position
        for idx, t in enumerate(tvals):
            if t == 1:
                eobpos = ss + idx
        r = 0
        pend: list = []                        # corrections since last symbol
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = tvals[k - ss]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eobpos:      # ZRL only before last new coef
                flush_eob()
                code, length = ac_codes[0xF0]
                writer.write(code, length)
                r -= 16
                for b in pend:
                    writer.write(b, 1)
                pend = []
            if t > 1:                          # already nonzero: one bit
                pend.append(t & 1)
                continue
            flush_eob()                        # newly nonzero (t == 1)
            code, length = ac_codes[(r << 4) | 1]
            writer.write(code, length)
            writer.write(1 if v >= 0 else 0, 1)
            for b in pend:
                writer.write(b, 1)
            pend = []
            r = 0
        if r or pend:                          # tail folds into the EOB run
            eobrun += 1
            runbits.extend(pend)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return writer.flush()


def _encode_progressive(h, w, hs, vs, ql_z, qc_z, ycoef, cbcoef, crcoef,
                        yshape, cshape) -> bytes:
    comps = [
        {"id": 1, "h": hs, "v": vs, "coef": ycoef, "cols": yshape[1] // 8,
         "bw": -(-w // 8), "bh": -(-h // 8)},
        {"id": 2, "h": 1, "v": 1, "coef": cbcoef, "cols": cshape[1] // 8,
         "bw": -(-(-(-w // hs)) // 8), "bh": -(-(-(-h // vs)) // 8)},
        {"id": 3, "h": 1, "v": 1, "coef": crcoef, "cols": cshape[1] // 8,
         "bw": -(-(-(-w // hs)) // 8), "bh": -(-(-(-h // vs)) // 8)},
    ]
    mcux = yshape[1] // (8 * hs)
    mcuy = yshape[0] // (8 * vs)
    dc_tab = _flat_table(_PROG_DC_SYMS)
    acf_tab = _flat_table(_PROG_AC_FIRST_SYMS)
    acr_tab = _flat_table(_PROG_AC_REFINE_SYMS)
    dc_codes = _encode_codes(*dc_tab)
    acf_codes = _encode_codes(*acf_tab)
    acr_codes = _encode_codes(*acr_tab)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos(scomps, ta, ss, se, ah, al) -> bytes:
        body = bytes([len(scomps)])
        for c in scomps:
            body += bytes([c["id"], ta if ss or ah else (ta << 4)])
        # DC scans set Td (high nibble), AC scans set Ta (low nibble);
        # refinement DC scans read raw bits so Td=0 is fine either way
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    y, cb, cr = comps
    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(int(v) for v in ql_z))
    out += seg(0xDB, bytes([1]) + bytes(int(v) for v in qc_z))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_tab[0]) + bytes(dc_tab[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(acf_tab[0]) + bytes(acf_tab[1]))
    out += seg(0xC4, bytes([0x11]) + bytes(acr_tab[0]) + bytes(acr_tab[1]))
    # libjpeg's standard script: DC first (Al=1) interleaved; per-component
    # AC first scans (Y split 1-5 / 6-63 at Al=2, chroma 1-63 at Al=1);
    # AC refinements down to Al=0; DC refinement raw bits
    out += sos(comps, 0, 0, 0, 0, 1)
    out += _prog_dc_first(comps, mcux, mcuy, dc_codes, 1)
    out += sos([y], 0, 1, 5, 0, 2)
    out += _prog_ac_first(y, 1, 5, 2, acf_codes)
    out += sos([cb], 0, 1, 63, 0, 1)
    out += _prog_ac_first(cb, 1, 63, 1, acf_codes)
    out += sos([cr], 0, 1, 63, 0, 1)
    out += _prog_ac_first(cr, 1, 63, 1, acf_codes)
    out += sos([y], 0, 6, 63, 0, 2)
    out += _prog_ac_first(y, 6, 63, 2, acf_codes)
    out += sos([y], 1, 1, 63, 2, 1)
    out += _prog_ac_refine(y, 1, 63, 1, acr_codes)
    out += sos(comps, 0, 0, 0, 1, 0)
    out += _prog_dc_refine(comps, mcux, mcuy, 0)
    out += sos([cr], 1, 1, 63, 1, 0)
    out += _prog_ac_refine(cr, 1, 63, 0, acr_codes)
    out += sos([cb], 1, 1, 63, 1, 0)
    out += _prog_ac_refine(cb, 1, 63, 0, acr_codes)
    out += sos([y], 1, 1, 63, 1, 0)
    out += _prog_ac_refine(y, 1, 63, 0, acr_codes)
    out += b"\xff\xd9"
    return bytes(out)

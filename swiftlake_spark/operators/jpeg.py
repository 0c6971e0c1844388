"""Stdlib baseline-JPEG codec (VERDICT r8 ask #5).

Real corpora are JPEG-dominated, and the multimodal pipeline's
zero-dependency floor previously stopped at PNG/BMP/PPM — JPEG required
the optional PIL seam.  This module implements the baseline sequential
DCT process from the public JPEG specification (ITU-T T.81): huffman
entropy decode (with byte unstuffing and restart markers), dequantize,
8x8 inverse DCT (vectorized — one einsum over all blocks per
component), chroma upsampling, and JFIF YCbCr→RGB.  ≙ reference media
handling intent (SURVEY §2 multimodal columns); the decode itself is
public-spec math, no reference code involved.

Scope (everything else raises NotImplementedError so
``decode_image_bytes`` can fall through to the PIL seam):

- baseline (SOF0, 8-bit) and extended sequential huffman (SOF1,
  8- or 12-bit — 12-bit output downscales to the high byte, the
  PNG/TIFF 16-bit convention);
- progressive huffman (SOF2, VERDICT r9 ask #8; 8- or 12-bit):
  multi-scan spectral selection + successive approximation per T.81
  Annex G — DC first/refine (interleaved or not), AC first/refine
  with EOBRUN, per-scan DHT/DRI redefinition, restart markers in any
  scan;
- 1 (grayscale) or 3 (YCbCr) components, integer sampling ratios
  (4:4:4, 4:2:2, 4:2:0, 4:1:1, ...);
- restart intervals (DRI + RST0-7);
- DHT-less abbreviated streams (OpenDML MJPG 'AVI1'): sequential
  scans referencing an undefined Huffman slot fall back to the
  Annex-K typical tables, as that spec requires of decoders;
- arithmetic coding (SOF9 sequential + SOF10 progressive + SOF11/
  SOF15 lossless) dispatches to ``operators/jpeg_arith.py``; Huffman
  lossless (SOF3/SOF7) to ``operators/jpeg_lossless.py``;
- hierarchical streams (DHP/EXP + differential SOF5/6/7/13/14/15
  frames, encoder in ``operators/jpeg_hier.py``) decode in this
  module's frame loop — as of r12 the COMPLETE T.81 frame-process
  matrix is native; the seam keeps only exotic shapes (non-integer
  sampling, >8/12-bit baselines, lossless restart intervals).

An encoder (`encode_jpeg`) exists for tests and payload synthesis, like
``encode_png``/``encode_ppm``: Annex-K quantization tables with libjpeg
quality scaling, Annex-K huffman tables, optional 4:2:0 subsampling and
restart intervals.  Encoder and decoder share only the constant tables,
so a round trip crosses two independent transform implementations
(FDCT vs IDCT, bit writer vs bit reader).

Performance shape: entropy decode is a Python bit loop (inherently
sequential per scan), the IDCT/color math is numpy-vectorized.  In the
Spark pipeline this runs inside ``mapInPandas`` batches on executors —
the per-image cost is the unit of parallelism, and the PIL seam remains
the fast path when pillow is installed.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- constants

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# ITU-T T.81 Annex K quantization tables (quality-50 base)
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

# Annex K huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 12-bit-precision Huffman specs.  T.81 publishes example tables for
# 8-bit samples only (Annex K covers DC categories 0..11, AC sizes
# 1..10); 12-bit needs DC diff categories up to 15 and AC sizes up to
# 14 (T.81 Tables F.1/F.2).  These flat canonical tables cover EVERY
# legal 12-bit symbol — suboptimal compression, bit-exact codes — and
# are emitted in the DHT segment so any conforming decoder reads them.
_DC12_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC12_VALS = list(range(16))  # categories 0..15 at 5 bits each
_AC12_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 15)
]  # EOB, ZRL, every (run, size<=14): 226 symbols at 8 bits each
_AC12_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC12_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: coefficients = A @ block @
    A.T; pixels = A.T @ coef @ A — exactly T.81's FDCT/IDCT pair."""
    a = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else np.sqrt(0.25)
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()


# --------------------------------------------------------------- huffman

def _build_decode_lut(bits, vals):
    """(length, code) → value, per T.81 C.2 canonical code assignment."""
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


_DEFAULT_LUTS: dict | None = None


def _default_lut(tc: int, th: int):
    """T.81 Annex-K typical tables as a decode fallback: OpenDML MJPG
    ('AVI1') abbreviated JPEG omits DHT segments and requires decoders
    to supply these (luma tables for slot 0, chroma for slot 1+).
    Used ONLY by the sequential path — a progressive scan referencing
    an undefined table is still an error."""
    global _DEFAULT_LUTS
    if _DEFAULT_LUTS is None:
        _DEFAULT_LUTS = {
            (0, 0): _build_decode_lut(_DC_LUMA_BITS, _DC_LUMA_VALS),
            (0, 1): _build_decode_lut(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 0): _build_decode_lut(_AC_LUMA_BITS, _AC_LUMA_VALS),
            (1, 1): _build_decode_lut(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
        }
    return _DEFAULT_LUTS[(tc, min(th, 1))]


def _build_encode_lut(bits, vals):
    """value → (code, length)."""
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return lut


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing.  Hitting a real
    marker mid-read is a structural error (the caller consumes RSTn at
    byte boundaries via sync_restart)."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) \
                else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError(
                    f"marker 0xFF{nxt:02X} inside entropy-coded segment")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def get_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def get_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.get_bit()
        return v

    def sync_restart(self, seq: int) -> None:
        """Drop padding bits, consume the expected RSTn marker."""
        self.acc = 0
        self.n = 0
        if self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1]
        if m != 0xD0 + (seq & 7):
            raise ValueError(f"expected RST{seq & 7}, got 0xFF{m:02X}")
        self.pos += 2


def _decode_huff(r: _BitReader, lut) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.get_bit()
        v = lut.get((ln, code))
        if v is not None:
            return v
    raise ValueError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to the signed value."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# --------------------------------------------------------------- decoder

def _expand_plane(ref: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """T.81 J.1.1.2 reference-component expansion: doubling along an
    axis inserts interpolated samples p = (a + b + 1) >> 1 between
    neighbours (tail replicated when the doubled size is odd)."""
    p = ref.astype(np.int32)
    h, w = p.shape
    if out_w != w:
        if not w * 2 - 1 <= out_w <= w * 2:
            raise ValueError(f"EXP width {w} -> {out_w} is not a doubling")
        nxt = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        interp = (p + nxt + 1) >> 1
        out = np.empty((h, out_w), np.int32)
        out[:, 0::2] = p[:, : (out_w + 1) // 2]
        out[:, 1::2] = interp[:, : out_w // 2]
        p = out
    if out_h != h:
        if not h * 2 - 1 <= out_h <= h * 2:
            raise ValueError(f"EXP height {h} -> {out_h} is not a doubling")
        nxt = np.concatenate([p[1:], p[-1:]], axis=0)
        interp = (p + nxt + 1) >> 1
        out = np.empty((out_h, p.shape[1]), np.int32)
        out[0::2] = p[: (out_h + 1) // 2]
        out[1::2] = interp[: out_h // 2]
        p = out
    return p.astype(np.uint8)


def _hier_prepare_refs(frame, hier):
    """Apply any pending EXP expansion and validate reference/frame
    dimensions; returns the (expanded) reference dict for a
    differential frame, or {} for a non-differential one."""
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    eh, ev = hier["pending_exp"]
    hier["pending_exp"] = (0, 0)
    refs = {}
    if frame["differential"]:
        for c in comps:
            cid = c["id"]
            if cid not in hier["refs"]:
                raise ValueError(
                    f"differential frame for component {cid} "
                    "with no reference")
            ref = hier["refs"][cid]
            if eh or ev:
                ref = _expand_plane(
                    ref,
                    h if ev else ref.shape[0],
                    w if eh else ref.shape[1],
                )
            if ref.shape != (h, w):
                raise ValueError(
                    f"reference {ref.shape} does not match "
                    f"differential frame {h}x{w}")
            refs[cid] = ref
    elif eh or ev:
        raise ValueError("EXP before a non-differential frame")
    return refs


def _hier_apply_arrays(frame, qt, arrays, hier, refs):
    """Fold a decoded DCT coefficient store into the references."""
    comps = frame["comps"]
    if frame["differential"]:
        diffs = _diff_planes(frame, qt, arrays)
        for c, dpl in zip(comps, diffs):
            hier["refs"][c["id"]] = np.clip(
                refs[c["id"]].astype(np.int32) + dpl, 0, 255
            ).astype(np.uint8)
    else:
        planes = _component_planes(frame, qt, arrays)
        for c, pl in zip(comps, planes):
            hier["refs"][c["id"]] = pl


def _hier_fold_prog(frame, qt, coefs, hier):
    """Fold a COMPLETED hierarchical progressive frame's accumulated
    coefficient store into the references (SOF2/SOF10 non-differential
    stage or SOF6/SOF14 differential refinement)."""
    refs = _hier_prepare_refs(frame, hier)
    _hier_apply_arrays(frame, qt, coefs, hier, refs)


def _hier_stage(data, pos, frame, scan, sos_body, ns, qt, huff_dc,
                huff_ac, restart_interval, hier, dac_dc, dac_ac):
    """Decode one hierarchical frame's scan and fold it into the
    reference components (T.81 Annex J).  Returns the byte position of
    the next marker.

    Non-differential frames replace their components' references;
    differential frames (SOF5/SOF13 DCT / SOF7 lossless) decode
    difference planes added to the (possibly EXP-expanded) references,
    clamped to [0, 255] — the 8-bit native floor."""
    comps = frame["comps"]
    refs = _hier_prepare_refs(frame, hier)

    if frame["lossless"]:
        if len(sos_body) < 4 + 2 * ns:
            raise ValueError("truncated SOS header")
        ss = sos_body[1 + 2 * ns]
        al = sos_body[3 + 2 * ns] & 15
        if frame.get("arith"):
            from swiftlake_spark.operators.jpeg_arith import (
                decode_lossless_arith_planes,
            )

            order, planes, end = decode_lossless_arith_planes(
                data, pos, frame, scan, dac_dc, ss, al,
                restart_interval, differential=frame["differential"])
        else:
            from swiftlake_spark.operators.jpeg_lossless import (
                decode_lossless_planes,
            )

            order, planes, end = decode_lossless_planes(
                data, pos, frame, scan, huff_dc, ss, al,
                restart_interval, differential=frame["differential"])
        prec = frame["prec"]
        for cid in order:
            v = planes[cid]
            if frame["differential"]:
                hier["refs"][cid] = np.clip(
                    refs[cid].astype(np.int32) + v, 0, 255
                ).astype(np.uint8)
            else:
                if al:
                    v = (v << al) & 0xFFFF
                if prec > 8:
                    v = v >> (prec - 8)
                hier["refs"][cid] = v.astype(np.uint8)
    else:
        if frame.get("arith"):
            from swiftlake_spark.operators.jpeg_arith import (
                decode_arith_scan_arrays,
            )

            arrays, end = decode_arith_scan_arrays(
                data, pos, frame, scan, dac_dc, dac_ac,
                restart_interval, differential=frame["differential"])
        else:
            arrays, end = _decode_scan_arrays(
                data, pos, frame, scan, huff_dc, huff_ac,
                restart_interval, differential=frame["differential"])
        _hier_apply_arrays(frame, qt, arrays, hier, refs)
    return _next_marker(data, end)


def _next_marker(data: bytes, pos: int) -> int:
    """Skip any remaining entropy bytes/stuffing/RSTn from ``pos`` to
    the next real marker's 0xFF (hierarchical: frames follow frames)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00,) and not (
                0xD0 <= data[pos + 1] <= 0xD7):
            return pos
        pos += 1
    raise ValueError("no marker after hierarchical scan")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 (H,W,3) RGB or (H,W) grayscale."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    hier = None  # hierarchical (DHP): {"refs", "pending_exp", "order"}
    prog_coefs = None  # progressive: cid → (nblocks, 64) zigzag int32
    dac_dc: dict[int, tuple[int, int]] = {}  # DAC: table → (L, U)
    dac_ac: dict[int, int] = {}  # DAC: table → Kx
    n = len(data)

    def _fold_pending_hier_frame():
        # a hierarchical PROGRESSIVE frame ends when the next frame-
        # level marker (EXP / SOFn / EOI) arrives: fold its accumulated
        # coefficient store into the references
        nonlocal prog_coefs, frame
        if hier is not None and prog_coefs is not None \
                and frame is not None and frame.get("progressive"):
            _hier_fold_prog(frame, qt, prog_coefs, hier)
            prog_coefs = None
            frame = None

    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no segment
            continue
        if marker == 0xD9:  # EOI: no segment
            if hier is not None:
                _fold_pending_hier_frame()
                if not hier["refs"]:
                    raise ValueError("hierarchical stream with no frames")
                # every DHP-declared component must have received at
                # least one frame by EOI — silently dropping the missing
                # ones would decode a truncated multi-component stream
                # as grayscale (ADVICE r12)
                absent = [cid for cid in hier["order"]
                          if cid not in hier["refs"]]
                if absent:
                    raise ValueError(
                        "hierarchical stream ended with DHP components "
                        f"{absent} never assigned a frame"
                    )
                planes = [hier["refs"][cid] for cid in hier["order"]]
                return _color_join(planes)
            if prog_coefs is not None:
                # progressive: every scan accumulated; reconstruct now
                return _reconstruct(frame, qt, prog_coefs)
            break
        (seg_len,) = struct.unpack_from(">H", data, pos)
        if seg_len < 2:
            # a zero/one length would re-read the same marker forever
            raise ValueError(f"invalid segment length {seg_len}")
        body = data[pos + 2: pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 15
                off += 1
                if pq:
                    tab = np.frombuffer(body, dtype=">u2", count=64,
                                        offset=off).astype(np.int32)
                    off += 128
                else:
                    tab = np.frombuffer(body, dtype=np.uint8, count=64,
                                        offset=off).astype(np.int32)
                    off += 64
                qt[tq] = tab  # zigzag order
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 15
                bits = list(body[off + 1: off + 17])
                cnt = sum(bits)
                if len(bits) < 16 or off + 17 + cnt > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[off + 17: off + 17 + cnt])
                (huff_ac if tc else huff_dc)[th] = _build_decode_lut(bits, vals)
                off += 17 + cnt
        elif marker == 0xDE:  # DHP: hierarchical progression (B.3.2)
            if len(body) < 6:
                raise ValueError("truncated DHP segment")
            hh, hw = struct.unpack_from(">HH", body, 1)
            hnc = body[5]
            if len(body) < 6 + 3 * hnc:
                raise ValueError("truncated DHP component list")
            order = [body[6 + 3 * i] for i in range(hnc)]
            hier = {"refs": {}, "pending_exp": (0, 0), "order": order,
                    "w": hw, "h": hh}
        elif marker == 0xDF:  # EXP: expand reference components (B.3.3)
            if hier is None:
                raise ValueError("EXP marker outside hierarchical mode")
            _fold_pending_hier_frame()
            if len(body) < 1:
                raise ValueError("truncated EXP segment")
            hier["pending_exp"] = (body[0] >> 4, body[0] & 15)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA, 0xC3,
                        0xC5, 0xC7, 0xCD, 0xC6, 0xCE, 0xCB, 0xCF):
            _fold_pending_hier_frame()
            # SOF0/1 sequential, SOF2 progressive (huffman);
            # SOF9 sequential / SOF10 progressive arithmetic
            # (operators/jpeg_arith.py);
            # SOF3 lossless predictive (operators/jpeg_lossless.py)
            if len(body) < 6:
                raise ValueError("truncated SOF segment")
            prec = body[0]
            # T.81 B.2.2: baseline (SOF0) is 8-bit only; extended
            # sequential and progressive also allow 12-bit samples
            # (decoded natively since r11; output downscales to the
            # high 8 bits, the PNG/TIFF 16-bit convention); lossless
            # allows 2..16.
            if marker in (0xC3, 0xC7, 0xCB, 0xCF):
                if not 2 <= prec <= 16:
                    raise ValueError(f"bad lossless precision {prec}")
            elif prec != 8 and not (prec == 12 and marker != 0xC0):
                raise NotImplementedError(f"{prec}-bit JPEG needs PIL")
            if len(body) < 6:
                raise ValueError("truncated SOF segment")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF component list")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            if marker in (0xC5, 0xC7, 0xCD, 0xC6, 0xCE, 0xCF) \
                    and hier is None:
                raise ValueError(
                    "differential SOF outside a hierarchical stream")
            frame = {"w": w, "h": h, "comps": comps, "prec": prec,
                     "progressive": marker in (0xC2, 0xCA, 0xC6, 0xCE),
                     "arith": marker in (0xC9, 0xCA, 0xCD, 0xCE,
                                         0xCB, 0xCF),
                     "lossless": marker in (0xC3, 0xC7, 0xCB, 0xCF),
                     "differential": marker in (0xC5, 0xC7, 0xCD,
                                                0xC6, 0xCE, 0xCF)}
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            off = 0
            while off + 2 <= len(body):
                tc, tb = body[off] >> 4, body[off] & 15
                val = body[off + 1]
                if tc == 0:
                    li, ui = val & 15, val >> 4
                    if li > ui:
                        raise ValueError("DAC requires L <= U")
                    dac_dc[tb] = (li, ui)
                else:
                    if not 1 <= val <= 63:
                        raise ValueError(f"DAC Kx {val} out of range")
                    dac_ac[tb] = val
                off += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if not body:
                raise ValueError("empty SOS segment")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("truncated SOS header")
            if frame["progressive"]:
                if len(body) < 4 + 2 * ns:
                    raise ValueError("truncated SOS header")
                scan_list = []
                for i in range(ns):
                    cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                    scan_list.append((cs, tt >> 4, tt & 15))
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                if prog_coefs is None:
                    prog_coefs = _init_prog_coefs(frame)
                if frame.get("arith"):
                    from swiftlake_spark.operators.jpeg_arith import (
                        decode_prog_arith_scan,
                    )

                    pos = decode_prog_arith_scan(
                        data, pos, frame, scan_list, ss, se,
                        ahal >> 4, ahal & 15, dac_dc, dac_ac,
                        restart_interval, prog_coefs)
                else:
                    pos = _decode_prog_scan(
                        data, pos, frame, scan_list, ss, se,
                        ahal >> 4, ahal & 15, huff_dc, huff_ac,
                        restart_interval, prog_coefs)
                continue  # next scan (or EOI) follows
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "non-interleaved multi-scan sequential JPEG needs PIL")
            scan = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan[cs] = (tt >> 4, tt & 15)
            if set(scan) != {c["id"] for c in frame["comps"]}:
                raise ValueError(
                    "SOS component selectors do not match SOF")
            if hier is not None:
                pos = _hier_stage(data, pos, frame, scan, body, ns, qt,
                                  huff_dc, huff_ac, restart_interval,
                                  hier, dac_dc, dac_ac)
                frame = None  # stage consumed; next frame must re-SOF
                continue
            if frame.get("lossless"):
                if len(body) < 4 + 2 * ns:
                    raise ValueError("truncated SOS header")
                ss = body[1 + 2 * ns]  # predictor selector
                ahal = body[3 + 2 * ns]
                if frame.get("arith"):
                    from swiftlake_spark.operators.jpeg_arith import (
                        decode_lossless_arith_planes,
                    )

                    order, planes, _end = decode_lossless_arith_planes(
                        data, pos, frame, scan, dac_dc, ss, ahal & 15,
                        restart_interval)
                    prec8 = frame["prec"]
                    outp = np.stack([planes[cid] for cid in order], -1)
                    if ahal & 15:
                        outp = (outp << (ahal & 15)) & 0xFFFF
                    if prec8 > 8:
                        outp = outp >> (prec8 - 8)
                    outp = outp.astype(np.uint8)
                    return outp[:, :, 0] if outp.shape[2] == 1 else outp
                from swiftlake_spark.operators.jpeg_lossless import (
                    decode_lossless_scan,
                )

                return decode_lossless_scan(
                    data, pos, frame, scan, huff_dc, ss, ahal & 15,
                    restart_interval)
            if frame.get("arith"):
                from swiftlake_spark.operators.jpeg_arith import (
                    decode_arith_scan,
                )

                return decode_arith_scan(data, pos, frame, scan, qt,
                                         dac_dc, dac_ac,
                                         restart_interval)
            return _decode_scan(data, pos, frame, scan, qt, huff_dc,
                                huff_ac, restart_interval)

    if hier is not None:
        # hierarchical: EOI is the trailing 2 bytes the 4-byte loop
        # guard never enters (stages already decoded fully)
        _fold_pending_hier_frame()
        if hier["refs"]:
            absent = [cid for cid in hier["order"]
                      if cid not in hier["refs"]]
            if absent:
                # same strictness as the in-loop EOI path (ADVICE r12)
                raise ValueError(
                    "hierarchical stream ended with DHP components "
                    f"{absent} never assigned a frame"
                )
            planes = [hier["refs"][cid] for cid in hier["order"]]
            return _color_join(planes)
    if prog_coefs is not None:
        # progressive stream missing its EOI: the scans decoded fully
        # (each consumed its exact MCU count), so reconstruct anyway
        return _reconstruct(frame, qt, prog_coefs)
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    arrays, _end = _decode_scan_arrays(
        data, pos, frame, scan, huff_dc, huff_ac, restart_interval)
    return _reconstruct(frame, qt, arrays)


def _decode_scan_arrays(data, pos, frame, scan, huff_dc, huff_ac,
                        restart_interval, differential=False):
    """Sequential-scan entropy decode → (coef store, end byte pos).

    ``differential=True`` decodes a hierarchical differential frame's
    scan (T.81 F.1.1.5.1: the DC prediction PRED is 0 in differential
    frames — DC values are coded directly, not as running
    differences)."""
    comps = frame["comps"]
    hmax, vmax, mcux, mcuy = _geometry(frame)

    r = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    # per component: flat coefficient rows (mcu-major), positions
    blocks = {c["id"]: [] for c in comps}
    positions = {c["id"]: [] for c in comps}
    mcu_count = 0
    rst_seq = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                r.sync_restart(rst_seq)
                rst_seq += 1
                for k in pred:
                    pred[k] = 0
            mcu_count += 1
            for c in comps:
                cid = c["id"]
                dc_lut = huff_dc.get(scan[cid][0])
                ac_lut = huff_ac.get(scan[cid][1])
                if dc_lut is None:  # OpenDML AVI1: supply Annex-K
                    dc_lut = _default_lut(0, scan[cid][0])
                if ac_lut is None:
                    ac_lut = _default_lut(1, scan[cid][1])
                for cy in range(c["v"]):
                    for cx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        t = _decode_huff(r, dc_lut)
                        if t > 15:  # spec max DC category is 11
                            raise ValueError(f"invalid DC category {t}")
                        diff = _extend(r.get_bits(t), t) if t else 0
                        if differential:
                            coef[0] = diff  # PRED = 0 in diff frames
                        else:
                            pred[cid] += diff
                            if not -(1 << 30) < pred[cid] < (1 << 30):
                                raise ValueError(
                                    "DC predictor out of range")
                            coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, ac_lut)
                            rr, s = rs >> 4, rs & 15
                            if s == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("AC index overflow")
                            # coef stays in ZIGZAG order here; the
                            # batched dequantize un-zigzags once below
                            coef[k] = _extend(r.get_bits(s), s)
                            k += 1
                        blocks[cid].append(coef)
                        positions[cid].append(
                            (my * c["v"] + cy, mx * c["h"] + cx))

    arrays = {}
    for c in comps:
        cid = c["id"]
        bw_i = mcux * c["h"]
        arr = np.zeros((mcuy * c["v"] * bw_i, 64), dtype=np.int32)
        for (by, bx), coef in zip(positions[cid], blocks[cid]):
            arr[by * bw_i + bx] = coef
        arrays[cid] = arr
    return arrays, r.pos


def _grid_n(dim: int, samp: int, smax: int) -> int:
    """Non-interleaved block count along one axis (T.81 A.1.1/A.2.2):
    component dimension = ceil(dim·samp/smax), blocks = ceil(that/8).
    Shared by decoder geometry and the progressive encoder so the two
    can never disagree on scan block counts."""
    comp_dim = -(-(dim * samp) // smax)
    return -(-comp_dim // 8)


def _geometry(frame):
    """Per-frame MCU geometry; annotates comps with block-grid dims.

    ``bw_i``/``bh_i``: interleaved (MCU-padded) block grid — the shape
    the coefficient store is allocated at.  ``bw_n``/``bh_n``: the
    non-interleaved grid (T.81 A.2.2) that single-component scans
    iterate — top-left subset of the interleaved grid."""
    comps = frame["comps"]
    if not comps:
        raise ValueError("SOF declares zero components")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    for c in comps:
        if c["h"] < 1 or c["v"] < 1 or hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                f"non-integer sampling ratio {c['h']}x{c['v']} needs PIL")
    if w < 1 or h < 1 or w * h > (1 << 28):
        # corrupted SOF dims must not drive a multi-GB allocation
        raise ValueError(f"implausible JPEG dimensions {w}x{h}")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw_i"], c["bh_i"] = mcux * c["h"], mcuy * c["v"]
        c["bw_n"] = _grid_n(w, c["h"], hmax)
        c["bh_n"] = _grid_n(h, c["v"], vmax)
    return hmax, vmax, mcux, mcuy


def _idct_blocks(qt, tq, coefs):
    """dequantize + batched IDCT for one component's zigzag coef rows →
    (nblocks, 8, 8) float pixels WITHOUT level shift."""
    if tq not in qt:
        raise ValueError(f"missing quantization table {tq}")
    q = qt[tq]
    dq = np.zeros((len(coefs), 64), dtype=np.float64)
    dq[:, _ZIGZAG] = coefs.astype(np.float64) * q[np.newaxis, :]
    mats = dq.reshape(-1, 8, 8)
    return np.einsum("ij,njk,kl->nil", _A.T, mats, _A)


def _component_planes(frame, qt, arrays):
    """coef store → per-component uint8 planes at FRAME resolution
    (level-shifted, clamped, chroma repeat-upsampled, cropped)."""
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax, vmax, mcux, mcuy = _geometry(frame)
    planes = []
    for c in comps:
        cid = c["id"]
        prec = frame.get("prec", 8)
        pix = _idct_blocks(qt, c["tq"], arrays[cid]) + float(
            1 << (prec - 1))
        pix = np.clip(np.round(pix), 0, (1 << prec) - 1).astype(np.int32)
        if prec > 8:  # high byte (rounded), the 16-bit PNG/TIFF convention
            pix = np.minimum((pix + (1 << (prec - 9))) >> (prec - 8), 255)
        pix = pix.astype(np.uint8)
        bh, bw = c["bh_i"], c["bw_i"]
        plane = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        # upsample to full MCU grid resolution, then crop
        plane = plane.repeat(vmax // c["v"], axis=0)
        plane = plane.repeat(hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    return planes


def _diff_planes(frame, qt, arrays):
    """coef store of a DIFFERENTIAL DCT frame → per-component int32
    difference planes at frame resolution (T.81 hierarchical: no level
    shift, no output clamp — the sum with the reference is clamped).
    Subsampled differential frames are out of the native floor."""
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax, vmax, mcux, mcuy = _geometry(frame)
    if hmax != 1 or vmax != 1:
        raise NotImplementedError(
            "subsampled differential JPEG frame needs PIL")
    planes = []
    for c in comps:
        pix = _idct_blocks(qt, c["tq"], arrays[c["id"]])
        pix = np.round(pix).astype(np.int32)
        bh, bw = c["bh_i"], c["bw_i"]
        plane = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        planes.append(plane[:h, :w])
    return planes


def _color_join(planes):
    """per-component uint8 planes → gray plane or YCbCr→RGB array."""
    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG needs PIL")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _reconstruct(frame, qt, arrays):
    """coef store (per-comp (nblocks,64) zigzag int32, raster block
    order on the MCU-padded grid) → pixels.  Shared by the sequential
    and progressive paths: dequantize, batched IDCT, upsample, crop,
    YCbCr→RGB."""
    return _color_join(_component_planes(frame, qt, arrays))


# -------------------------------------------------- progressive decoding
#
# T.81 Annex G: a progressive frame carries many scans, each refining a
# (spectral band, bit position) slice of the coefficient store.  The
# store is per-component (nblocks, 64) int32 in ZIGZAG order, blocks in
# raster order on the MCU-padded grid — the same layout _reconstruct
# consumes.  Implemented scan kinds:
#   DC first   (Ss=0, Ah=0): sequential DC decode, value << Al
#   DC refine  (Ss=0, Ah>0): one raw bit per block, OR'd at bit Al
#   AC first   (Ss>0, Ah=0): run/size decode with EOBRUN, band-limited
#   AC refine  (Ss>0, Ah>0): G.1.2.3 correction-bit algorithm


def _init_prog_coefs(frame):
    _geometry(frame)  # validates dims/sampling, annotates block grids
    return {c["id"]: np.zeros((c["bh_i"] * c["bw_i"], 64), dtype=np.int32)
            for c in frame["comps"]}


def _ac_first(r, blk, ss, se, al, eobrun, ac_lut):
    """One block of an AC first scan (G.1.2.2).  Returns new EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(r, ac_lut)
        rr, s = rs >> 4, rs & 15
        if s == 0:
            if rr == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << rr) - 1  # current block's EOB consumed here
            if rr:
                eobrun += r.get_bits(rr)
            return eobrun
        k += rr
        if k > se:
            raise ValueError("AC coefficient index past Se")
        blk[k] = _extend(r.get_bits(s), s) << al
        k += 1
    return 0


def _ac_refine(r, blk, ss, se, al, eobrun, ac_lut):
    """One block of an AC refinement scan (G.1.2.3).  History-nonzero
    coefficients receive correction bits; newly-nonzero ones arrive as
    (run, size=1) codes; EOBRUN covers whole blocks whose remaining
    band is correction-bits-only.  Returns new EOBRUN."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(r, ac_lut)
            rr, s = rs >> 4, rs & 15
            val = 0
            if s:
                if s != 1:
                    raise ValueError("refinement magnitude category != 1")
                val = p1 if r.get_bit() else m1
            elif rr != 15:
                eobrun = 1 << rr  # includes the current block (tail below)
                if rr:
                    eobrun += r.get_bits(rr)
                break
            # advance past rr zero-history positions, appending
            # correction bits to the nonzero-history ones crossed
            while k <= se:
                c = int(blk[k])
                if c:
                    if r.get_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("newly-nonzero AC position past Se")
                blk[k] = val
            k += 1
    if eobrun > 0:
        # remaining band of the current block: correction bits only
        while k <= se:
            c = int(blk[k])
            if c and r.get_bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(data, pos, frame, scan_list, ss, se, ah, al,
                      huff_dc, huff_ac, restart_interval, coefs):
    """Decode one progressive scan into the coefficient store; returns
    the stream position of the next marker."""
    comps = {c["id"]: c for c in frame["comps"]}
    for cid, td, ta in scan_list:
        if cid not in comps:
            raise ValueError(f"scan component {cid} not in frame")
        if ss == 0 and ah == 0 and td not in huff_dc:
            raise ValueError(f"missing DC huffman table {td}")
        if ss > 0 and ta not in huff_ac:
            raise ValueError(f"missing AC huffman table {ta}")
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
    else:
        if len(scan_list) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError(f"bad spectral band {ss}..{se}")
    if al > 13 or (ah and ah != al + 1):
        raise ValueError(f"bad successive approximation Ah={ah} Al={al}")

    hmax, vmax, mcux, mcuy = _geometry(frame)
    differential = bool(frame.get("differential"))
    r = _BitReader(data, pos)
    pred = {cid: 0 for cid, _, _ in scan_list}
    eobrun = 0
    unit = 0
    rst_seq = 0

    def restart_if_due():
        nonlocal eobrun, rst_seq
        if restart_interval and unit and unit % restart_interval == 0:
            r.sync_restart(rst_seq)
            rst_seq += 1
            eobrun = 0
            for cid in pred:
                pred[cid] = 0

    def decode_dc(cid, td, blk):
        if ah == 0:
            t = _decode_huff(r, huff_dc[td])
            if t > 15:
                raise ValueError(f"invalid DC category {t}")
            diff = _extend(r.get_bits(t), t) if t else 0
            if differential:
                v = diff  # F.1.1.5.1: PRED = 0 in differential frames
            else:
                pred[cid] += diff
                v = pred[cid]
            # the shifted value must fit the int32 store even on
            # corrupt streams (numpy would raise OverflowError)
            if not -(1 << 30) < (v << al) < (1 << 30):
                raise ValueError("DC predictor out of range")
            blk[0] = v << al
        elif r.get_bit():
            blk[0] = int(blk[0]) | (1 << al)

    if len(scan_list) > 1:
        # interleaved scan (DC only, per the Se=0 check above) over the
        # frame MCU grid; only the scan's components contribute blocks
        for my in range(mcuy):
            for mx in range(mcux):
                restart_if_due()
                unit += 1
                for cid, td, _ta in scan_list:
                    c = comps[cid]
                    for cy in range(c["v"]):
                        for cx in range(c["h"]):
                            idx = ((my * c["v"] + cy) * c["bw_i"]
                                   + mx * c["h"] + cx)
                            decode_dc(cid, td, coefs[cid][idx])
    else:
        cid, td, ta = scan_list[0]
        c = comps[cid]
        for by in range(c["bh_n"]):
            for bx in range(c["bw_n"]):
                restart_if_due()
                unit += 1
                blk = coefs[cid][by * c["bw_i"] + bx]
                if ss == 0:
                    decode_dc(cid, td, blk)
                elif ah == 0:
                    eobrun = _ac_first(r, blk, ss, se, al, eobrun,
                                       huff_ac[ta])
                else:
                    eobrun = _ac_refine(r, blk, ss, se, al, eobrun,
                                        huff_ac[ta])

    # resynchronize: drop pad bits, skip to the next true marker
    # (stuffed FF00 and stray RSTn are entropy bytes, not markers)
    p = r.pos
    n = len(data)
    while p + 1 < n and not (
            data[p] == 0xFF and data[p + 1] != 0x00
            and not 0xD0 <= data[p + 1] <= 0xD7):
        p += 1
    if p + 1 >= n:
        raise ValueError("progressive scan ran past end of stream")
    return p


# --------------------------------------------------------------- encoder

class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, coef_zz, pred, dc_lut, ac_lut):
    diff = int(coef_zz[0]) - pred
    s = abs(diff).bit_length()
    code, ln = dc_lut[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_lut[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_lut[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_lut[0x00]  # EOB
        bw.write(code, ln)
    return int(coef_zz[0])


def _plane_coeffs(plane: np.ndarray, q: np.ndarray,
                  center: float = 128.0) -> np.ndarray:
    """(H,W) samples, 8|H and 8|W → (nblocks, 64) quantized zigzag
    ints, blocks in raster order."""
    h, w = plane.shape
    blocks = (plane.astype(np.float64) - center).reshape(
        h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = np.einsum("ij,njk,kl->nil", _A, blocks, _A.T).reshape(-1, 64)
    zzc = coef[:, _ZIGZAG]
    return np.round(zzc / q[np.newaxis, :]).astype(np.int32)


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge") if ph or pw \
        else plane


def _prepare_encode(arr, quality, subsampling, precision=8):
    """Shared encoder front end: color convert, subsample, pad to the
    MCU grid, FDCT + quantize.  Returns the per-component state both
    the baseline and progressive scan writers consume.

    ``precision=12`` widens uint8 input to 12-bit samples (v*16, so
    the decoder's high-byte downscale recovers v) and level-shifts by
    2048 — the extended-sequential/progressive 12-bit process."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"expected (H,W) or (H,W,3), got {a.shape}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    widen = 1 << (precision - 8)
    h, w = a.shape[:2]
    # wire/quantize order is ZIGZAG: the DQT payload byte k and the
    # divisor of zigzag coefficient k are the same value (T.81 B.2.4.1)
    ql = _scale_quant(_QUANT_LUMA, quality)[_ZIGZAG]
    qc = _scale_quant(_QUANT_CHROMA, quality)[_ZIGZAG]

    if gray:
        planes = [a.astype(np.uint16) * widen if widen > 1 else a]
        samp = [(1, 1)]
        qsel = [0]
    else:
        f = a.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "4:2:0":
            ph, pw = (h + 1) & ~1, (w + 1) & ~1
            cbp = _pad_to(cb, 2, 2).reshape(ph // 2, 2, pw // 2, 2)
            crp = _pad_to(cr, 2, 2).reshape(ph // 2, 2, pw // 2, 2)
            cb = cbp.mean(axis=(1, 3))
            cr = crp.mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        # widening is linear, so YCbCr in 8-bit space × widen equals
        # YCbCr of the widened samples (the +128 offsets become +2048)
        maxv = (255 * widen) if widen > 1 else 255
        dt = np.uint16 if widen > 1 else np.uint8
        tos = lambda p: np.clip(  # noqa: E731
            np.round(p * widen), 0, maxv).astype(dt)
        planes = [tos(y), tos(cb), tos(cr)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad every plane to its full MCU-grid size
    center = float(1 << (precision - 1))
    coeffs = []
    for p, (sh, sv) in zip(planes, samp):
        p = _pad_to(p, mcuy * sv * 8, mcux * sh * 8)
        coeffs.append(_plane_coeffs(
            p, ql if qsel[len(coeffs)] == 0 else qc, center))

    return {
        "gray": gray, "h": h, "w": w, "ql": ql, "qc": qc,
        "samp": samp, "qsel": qsel, "coeffs": coeffs, "prec": precision,
        "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
    }


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _huff_specs(prec: int):
    """(bits, vals) for [DC-luma, AC-luma, DC-chroma, AC-chroma]:
    Annex K for 8-bit, the flat full-symbol-range tables for 12-bit."""
    if prec == 8:
        return [(_DC_LUMA_BITS, _DC_LUMA_VALS),
                (_AC_LUMA_BITS, _AC_LUMA_VALS),
                (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
                (_AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    return [(_DC12_BITS, _DC12_VALS), (_AC12_BITS, _AC12_VALS)] * 2


def _encode_luts(prec: int):
    """[(dc luma, dc chroma), (ac luma, ac chroma)] encode LUTs."""
    t = _huff_specs(prec)
    return ([_build_encode_lut(*t[0]), _build_encode_lut(*t[2])],
            [_build_encode_lut(*t[1]), _build_encode_lut(*t[3])])


def _headers(st, sof_marker: int, restart_interval: int) -> bytearray:
    """SOI + JFIF + DQT + SOF + Annex-K DHT [+ DRI] — everything up to
    (excluding) the first SOS, shared by both encoders."""
    gray = st["gray"]
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(st["ql"].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(st["qc"].astype(np.uint8)))
    nplanes = 1 if gray else 3
    sof = bytearray([st["prec"]]) + struct.pack(">HH", st["h"], st["w"])
    sof += bytes([nplanes])
    for ci, (sh, sv) in enumerate(st["samp"]):
        sof += bytes([ci + 1, (sh << 4) | sv, st["qsel"][ci]])
    out += _seg(sof_marker, bytes(sof))

    def dht(tc: int, th: int, bits, vals) -> bytes:
        return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    tables = _huff_specs(st["prec"])
    out += dht(0, 0, *tables[0])
    out += dht(1, 0, *tables[1])
    if not gray:
        out += dht(0, 1, *tables[2])
        out += dht(1, 1, *tables[3])
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    return out


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsampling: str = "4:4:4",
                restart_interval: int = 0,
                precision: int = 8) -> bytes:
    """uint8 (H,W,3) RGB or (H,W) gray → JFIF bytes: baseline (SOF0)
    for 8-bit, extended sequential (SOF1) for ``precision=12`` (input
    widened v*16; the decoder's high-byte downscale recovers v)."""
    st = _prepare_encode(arr, quality, subsampling, precision)
    gray = st["gray"]
    samp, coeffs = st["samp"], st["coeffs"]
    mcux, mcuy = st["mcux"], st["mcuy"]
    planes_n = 1 if gray else 3

    dc_luts, ac_luts = _encode_luts(precision)

    bw = _BitWriter()
    pred = [0] * planes_n
    mcu_count = 0
    rst_seq = 0
    bws = []  # entropy segments split at restart boundaries
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bws.append(bytes(bw.out) + bytes([0xFF, 0xD0 + (rst_seq & 7)]))
                rst_seq += 1
                bw = _BitWriter()
                pred = [0] * planes_n
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samp):
                bwidth = mcux * sh  # blocks per row in this plane
                t = 1 if (not gray and ci) else 0
                for cy in range(sv):
                    for cx in range(sh):
                        bi = (my * sv + cy) * bwidth + (mx * sh + cx)
                        pred[ci] = _encode_block(
                            bw, coeffs[ci][bi], pred[ci],
                            dc_luts[t], ac_luts[t])
    bw.flush()
    bws.append(bytes(bw.out))
    entropy = b"".join(bws)

    out = _headers(st, 0xC0 if precision == 8 else 0xC1, restart_interval)
    sos = bytearray([planes_n])
    for ci in range(planes_n):
        t = 1 if (not gray and ci) else 0
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------- progressive encoder

def _enc_dc(bw, v, pred, dc_lut):
    """Huffman-code one DC difference; returns the new predictor."""
    diff = v - pred
    s = abs(diff).bit_length()
    code, ln = dc_lut[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    return v


def _enc_ac_first_block(bw, coef, ss, se, al, ac_lut):
    """AC first scan, one block (G.1.2.2 encoder side).  The Annex-K
    tables carry no EOBn>0 symbols, so every block terminates with its
    own EOB0 — valid, just not run-length-compressed across blocks."""
    vals = []
    for k in range(ss, se + 1):
        v = int(coef[k])
        t = abs(v) >> al
        vals.append(-t if v < 0 else t)
    last = -1
    for i, t in enumerate(vals):
        if t:
            last = i
    run = 0
    for i in range(last + 1):
        t = vals[i]
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_lut[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(t).bit_length()
        code, ln = ac_lut[(run << 4) | s]
        bw.write(code, ln)
        bw.write(t if t > 0 else t + (1 << s) - 1, s)
        run = 0
    if last < len(vals) - 1:
        code, ln = ac_lut[0x00]  # EOB0
        bw.write(code, ln)


def _enc_ac_refine_block(bw, coef, ss, se, al, ac_lut):
    """AC refinement scan, one block (G.1.2.3 encoder side).  Mirrors
    the decoder's crossing order: correction bits for nonzero-history
    coefficients are buffered and flushed after the symbol whose
    crossing covers their position."""
    absv = [abs(int(coef[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # band index of the last newly-nonzero coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = ss + i
    run = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            code, ln = ac_lut[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)  # correction bit for a history-nonzero coef
            continue
        code, ln = ac_lut[(run << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(coef[k]) > 0 else 0, 1)
        run = 0
        for b in br:
            bw.write(b, 1)
        br = []
    if run > 0 or br:
        code, ln = ac_lut[0x00]  # EOB0
        bw.write(code, ln)
        for b in br:
            bw.write(b, 1)


def _prog_scan(st, scan_comps, ss, se, ah, al, dc_luts, ac_luts,
               restart_interval):
    """Entropy-code one progressive scan; returns the byte segment
    (restart markers included)."""
    gray = st["gray"]
    samp, coeffs = st["samp"], st["coeffs"]
    mcux, mcuy = st["mcux"], st["mcuy"]
    bw = _BitWriter()
    segs: list[bytes] = []
    pred = {ci: 0 for ci in scan_comps}
    unit = 0
    rst_seq = 0

    def restart_if_due():
        nonlocal bw, rst_seq
        if restart_interval and unit and unit % restart_interval == 0:
            bw.flush()
            segs.append(bytes(bw.out) + bytes([0xFF, 0xD0 + (rst_seq & 7)]))
            rst_seq += 1
            bw = _BitWriter()
            for ci in pred:
                pred[ci] = 0

    def do_block(ci, bi):
        t = 1 if (not gray and ci) else 0
        coef = coeffs[ci][bi]
        if ss == 0:
            if ah == 0:
                pred[ci] = _enc_dc(bw, int(coef[0]) >> al, pred[ci],
                                   dc_luts[t])
            else:
                bw.write((int(coef[0]) >> al) & 1, 1)
        elif ah == 0:
            _enc_ac_first_block(bw, coef, ss, se, al, ac_luts[t])
        else:
            _enc_ac_refine_block(bw, coef, ss, se, al, ac_luts[t])

    if len(scan_comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                restart_if_due()
                unit += 1
                for ci in scan_comps:
                    sh, sv = samp[ci]
                    for cy in range(sv):
                        for cx in range(sh):
                            do_block(ci, (my * sv + cy) * (mcux * sh)
                                     + mx * sh + cx)
    else:
        ci = scan_comps[0]
        sh, sv = samp[ci]
        bw_n = _grid_n(st["w"], sh, st["hmax"])
        bh_n = _grid_n(st["h"], sv, st["vmax"])
        for by in range(bh_n):
            for bx in range(bw_n):
                restart_if_due()
                unit += 1
                do_block(ci, by * (mcux * sh) + bx)
    bw.flush()
    segs.append(bytes(bw.out))
    return b"".join(segs)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            subsampling: str = "4:4:4",
                            spectral_only: bool = False,
                            restart_interval: int = 0,
                            precision: int = 8) -> bytes:
    """uint8 (H,W,3) RGB or (H,W) gray → progressive (SOF2) JFIF bytes.

    Default scan script exercises the full Annex-G surface: interleaved
    DC first at Al=1, split-band AC first scans (1-5, 6-63) at Al=1,
    AC refinement scans at Ah=1/Al=0, then a DC refinement scan.  With
    ``spectral_only=True`` the script is pure spectral selection
    (Ah=Al=0 everywhere, no refinement scans).  Every block carries its
    own EOB0 (Annex-K tables have no EOBn>0 symbols), so streams are
    valid but not EOB-run-compressed — the decoder handles both."""
    st = _prepare_encode(arr, quality, subsampling, precision)
    nc = 1 if st["gray"] else 3
    a1 = 0 if spectral_only else 1

    script: list[tuple[list[int], int, int, int, int]] = []
    script.append((list(range(nc)), 0, 0, 0, a1))  # DC first
    for ci in range(nc):
        script.append(([ci], 1, 5, 0, a1))   # AC first, low band
        script.append(([ci], 6, 63, 0, a1))  # AC first, high band
    if not spectral_only:
        for ci in range(nc):
            script.append(([ci], 1, 5, 1, 0))   # AC refine
            script.append(([ci], 6, 63, 1, 0))
        script.append((list(range(nc)), 0, 0, 1, 0))  # DC refine

    dc_luts, ac_luts = _encode_luts(precision)

    out = _headers(st, 0xC2, restart_interval)
    for comps_idx, ss, se, ah, al in script:
        sos = bytearray([len(comps_idx)])
        for ci in comps_idx:
            t = 1 if (not st["gray"] and ci) else 0
            sos += bytes([ci + 1, ((t if ss == 0 else 0) << 4)
                          | (t if ss > 0 else 0)])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, bytes(sos))
        out += _prog_scan(st, comps_idx, ss, se, ah, al,
                          dc_luts, ac_luts, restart_interval)
    out += b"\xff\xd9"  # EOI
    return bytes(out)

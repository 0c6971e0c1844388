"""Lossless JPEG (ITU-T T.81 Annex H — SOF3).

The predictive lossless process survives in real corpora through DNG
raw files and DICOM medical images (≙ reference media handling intent,
SURVEY §2 multimodal columns; public T.81 Annex H math, no reference
code involved), so it joins the native JPEG
family (baseline/extended/progressive/arithmetic in operators/
jpeg.py + jpeg_arith.py).  Scope:

- precisions 2..16 (output downscales >8-bit samples to the high
  byte, the PNG/TIFF/12-bit-JPEG convention);
- all seven predictors (H.1.2.1) + the point transform (Al);
- single-component scans and interleaved multi-component scans with
  sampling factors 1x1 (the layout every known lossless writer uses —
  lossless JPEG codes RGB planes directly, no subsampled YCbCr);
- Huffman entropy coding of difference categories through the shared
  DC machinery (category 16 = +32768 with no extra bits, the lossless
  special case); differences wrap modulo 2^16 (H.1.2.3).

Restart intervals raise NotImplementedError: T.81's restart semantics
for mid-row predictor resets are writer-dependent and no mainstream
lossless producer emits them.

Both directions ship; round-trip must be BIT-EXACT — that is the
entire point of the process and the load-bearing test property.
"""

from __future__ import annotations

import struct

import numpy as np

from swiftlake_spark.operators.jpeg import (
    _BitReader,
    _BitWriter,
    _build_decode_lut,
    _build_encode_lut,
    _decode_huff,
    _extend,
    _seg,
)

# a flat 17-symbol DC table (categories 0..16) — every code 5 bits
_LL_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LL_VALS = list(range(17))


def _predict(sample: np.ndarray, x: int, y: int, sel: int,
             default: int) -> int:
    """T.81 Table H.1 prediction for sample[y, x] (int32 grid)."""
    if y == 0:
        if x == 0:
            return default
        return int(sample[0, x - 1])  # first line: left
    if x == 0:
        return int(sample[y - 1, 0])  # first column: above
    a = int(sample[y, x - 1])
    b = int(sample[y - 1, x])
    c = int(sample[y - 1, x - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1  # sel == 7


def decode_lossless_planes(data, pos, frame, scan, huff_dc, ss, al,
                           restart_interval, differential=False):
    """SOF3/SOF7 scan entropy decode → (ordered cid list,
    {cid: int32 (H,W) plane}, end byte pos).

    Non-differential: planes hold reconstructed samples (predictor
    ``ss``, mod-2^16 per H.1.2.3).  ``differential=True`` (SOF7,
    hierarchical): T.81 requires predictor selection 0 — no spatial
    prediction — and the planes hold the RAW signed differences the
    caller adds to the reference component."""
    if restart_interval:
        raise NotImplementedError(
            "lossless JPEG with restart intervals needs PIL")
    comps = frame["comps"]
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError(
            "lossless JPEG with subsampled components needs PIL")
    if differential:
        if ss != 0:
            raise ValueError(
                f"differential lossless frame requires Ss=0, got {ss}")
    elif not 1 <= ss <= 7:
        raise ValueError(f"invalid lossless predictor {ss}")
    prec = frame["prec"]
    if not 2 <= prec <= 16 or al >= prec:
        raise ValueError(f"bad lossless precision/transform {prec}/{al}")
    h, w = frame["h"], frame["w"]
    if h < 1 or w < 1 or w * h * len(comps) > (1 << 26):
        raise ValueError(f"implausible lossless dimensions {w}x{h}")
    default = 1 << (prec - 1 - al)
    luts = {}
    for cid, (dt, _at) in scan.items():
        lut = huff_dc.get(dt)
        if lut is None:
            # unlike sequential MJPG (Annex-K typical tables), T.81
            # defines NO default tables for lossless — substituting
            # our private encoder table would decode foreign streams
            # to silently wrong pixels
            raise ValueError(
                f"lossless scan references undefined DC table {dt}")
        luts[cid] = lut
    r = _BitReader(data, pos)
    planes = {c["id"]: np.zeros((h, w), np.int32) for c in comps}
    order = [c["id"] for c in comps if c["id"] in scan]
    if len(order) != len(scan):
        raise ValueError("SOS component not in SOF")
    for y in range(h):
        for x in range(w):
            for cid in order:
                s = _decode_huff(r, luts[cid])
                if s > 16:
                    raise ValueError(f"invalid lossless category {s}")
                if s == 16:
                    diff = 32768  # H.1.2.2: no extra bits
                else:
                    diff = _extend(r.get_bits(s), s) if s else 0
                if differential:
                    planes[cid][y, x] = diff
                else:
                    pred = _predict(planes[cid], x, y, ss, default)
                    planes[cid][y, x] = (pred + diff) & 0xFFFF
    return order, planes, r.pos


def decode_lossless_scan(data, pos, frame, scan, huff_dc, ss, al,
                         restart_interval):
    """SOF3 scan → uint8 image ((H,W) or (H,W,3), >8-bit samples
    downscaled to the high byte)."""
    order, planes, _end = decode_lossless_planes(
        data, pos, frame, scan, huff_dc, ss, al, restart_interval)
    prec = frame["prec"]
    out = np.stack([planes[cid] for cid in order], axis=-1)
    if al:
        out = (out << al) & 0xFFFF
    if prec > 8:
        out = out >> (prec - 8)
    out = out.astype(np.uint8)
    return out[:, :, 0] if out.shape[2] == 1 else out


def encode_jpeg_lossless(arr: np.ndarray, predictor: int = 4,
                         precision: int = 8) -> bytes:
    """uint8 (H,W) gray or (H,W,3) RGB → SOF3 lossless JPEG.

    ``precision=16`` widens v*257 so the decoder's high-byte downscale
    recovers v exactly (and the full 16-bit path is exercised).
    decode must be bit-exact — there is no quantization anywhere."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"expected (H,W) or (H,W,3), got {a.shape}")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if precision not in (8, 16):
        raise ValueError("encoder supports precision 8 or 16")
    h, w = a.shape[:2]
    nc = 1 if gray else 3
    planes = a.reshape(h, w, nc).astype(np.int32)
    if precision == 16:
        planes = planes * 257
    default = 1 << (precision - 1)
    lut = _build_encode_lut(_LL_BITS, _LL_VALS)
    bw = _BitWriter()
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                pl = planes[:, :, ci]
                pred = _predict(pl, x, y, predictor, default)
                diff = (int(pl[y, x]) - pred) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000  # smallest-magnitude representative
                if diff == -32768:
                    code, ln = lut[16]
                    bw.write(code, ln)  # category 16: no extra bits
                    continue
                s = abs(diff).bit_length()
                code, ln = lut[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    sof = bytearray([precision]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(0xC3, bytes(sof))
    out += _seg(0xC4, bytes([0x00]) + bytes(_LL_BITS) + bytes(_LL_VALS))
    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, 0])  # Ss=predictor, Se=0, Ah/Al=0
    out += _seg(0xDA, bytes(sos))
    out += bytes(bw.out)
    out += b"\xff\xd9"
    return bytes(out)

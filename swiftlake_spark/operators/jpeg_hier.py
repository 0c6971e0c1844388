"""Hierarchical JPEG (ITU-T T.81 Annex J — DHP/EXP, SOF5/SOF7).

The hierarchical process stores an image as a resolution pyramid: a
small non-differential first frame, then differential frames that each
EXP-expand the reference (J.1.1.2 interpolation) and code the residual
— DCT-quantized (SOF5) or lossless (SOF7).  Real corpora meet it in
scanned-document archives and DICOM multi-resolution objects
(≙ reference media-handling intent, SURVEY §2 multimodal columns;
public T.81 Annex J math, no reference code involved).

Scope (the native floor; everything else raises in operators/jpeg.py):

- first stage: baseline/extended sequential Huffman (SOF0/SOF1) or
  lossless (SOF3);
- refinement stages: differential sequential DCT (SOF5) with the DC
  prediction pinned to 0 (F.1.1.5.1) and differential lossless (SOF7,
  predictor selection 0 = no prediction — legal only here);
- EXP doubling with the (a + b + 1) >> 1 interpolation filter, odd
  target sizes replicate the tail sample;
- 1x1 sampling inside every stage (hierarchical refinement and chroma
  subsampling are orthogonal; mixing them is out of floor);
- references clamp to [0, 255] after every differential stage —
  encoder and decoder apply the identical float64 IDCT + round, so the
  encoder's reference replica is byte-exact against the decoder's.

The load-bearing property: ``lossless_final=True`` appends a SOF7
stage coding the exact residual, so decode(encode(x)) is BIT-EXACT for
any grayscale image (and exact in YCbCr space for color — the RGB
round trip adds only the color-transform rounding every JPEG process
shares).  ``arith=True`` swaps the entropy layer: SOF9 first stage,
SOF13/SOF14 differential refinements and a SOF15 lossless tail through
the QM coder (jpeg_arith.py) carrying the IDENTICAL coefficients, so
arithmetic and Huffman hierarchies must decode pixel-identically (the
transparency property).  With SOF6/SOF14 (progressive=True) and
SOF11/SOF15 native as of r12, every T.81 frame process decodes in the
native floor.
"""

from __future__ import annotations

import struct

import numpy as np

from swiftlake_spark.operators.jpeg import (
    _A,
    _BitWriter,
    _ZIGZAG,
    _build_encode_lut,
    _enc_ac_first_block,
    _enc_dc as _huff_enc_dc,
    _encode_block,
    _encode_luts,
    _expand_plane,
    _huff_specs,
    _pad_to,
    _plane_coeffs,
    _scale_quant,
    _seg,
    _QUANT_CHROMA,
    _QUANT_LUMA,
)
from swiftlake_spark.operators.jpeg_lossless import _LL_BITS, _LL_VALS


def _rgb_to_ycc(a: np.ndarray) -> list[np.ndarray]:
    f = a.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [np.clip(np.round(p), 0, 255).astype(np.uint8)
            for p in (y, cb, cr)]


def _downsample(p: np.ndarray) -> np.ndarray:
    """2x2 box mean to ceil-half dims (encoder's pyramid choice —
    T.81 leaves downsampling to the encoder)."""
    h, w = p.shape
    pp = _pad_to(p, 2, 2).astype(np.float64)
    m = pp.reshape((h + 1) // 2, 2, (w + 1) // 2, 2).mean(axis=(1, 3))
    return np.clip(np.round(m), 0, 255).astype(np.uint8)


def _stage_recon(coef_zz: np.ndarray, q: np.ndarray, bh: int, bw: int,
                 h: int, w: int, differential: bool) -> np.ndarray:
    """Encoder-side replica of the decoder's reconstruction of one
    stage component — identical float64 dequant+IDCT+round so the
    reference planes match the decoder's byte-for-byte."""
    dq = np.zeros((len(coef_zz), 64), dtype=np.float64)
    dq[:, _ZIGZAG] = coef_zz.astype(np.float64) * q[np.newaxis, :]
    mats = dq.reshape(-1, 8, 8)
    pix = np.einsum("ij,njk,kl->nil", _A.T, mats, _A)
    if differential:
        pix = np.round(pix).astype(np.int32)
    else:
        pix = np.clip(np.round(pix + 128.0), 0, 255).astype(np.int32)
    plane = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
             .reshape(bh * 8, bw * 8))
    return plane[:h, :w]


def _emit_dct_frame(out: bytearray, planes: list[np.ndarray],
                    qsel: list[int], qts: list[np.ndarray],
                    marker: int, differential: bool,
                    arith: bool = False) -> list[np.ndarray]:
    """Append SOF + SOS + entropy for one 1x1-sampled DCT stage; return
    the decoder-replica reconstruction (samples or differences).
    ``arith=True`` entropy-codes the same coefficients through the QM
    coder (fresh statistics per scan, F.1.4.4.1.2 conditioning)."""
    h, w = planes[0].shape
    nc = len(planes)
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, qsel[ci]])
    out += _seg(marker, bytes(sof))

    bh, bw_ = -(-h // 8), -(-w // 8)
    center = 0.0 if differential else 128.0
    coeffs = []
    for ci, p in enumerate(planes):
        padded = _pad_to(p, bh * 8, bw_ * 8)
        coeffs.append(_plane_coeffs(padded, qts[qsel[ci]], center))

    if arith:
        from swiftlake_spark.operators.jpeg_arith import (
            _AC_BINS,
            _DC_BINS,
            _FIXED_BIN,
            _QMEncoder,
            _enc_ac,
            _enc_dc,
        )

        enc = _QMEncoder()
        ntab = 1 if nc == 1 else 2
        dc_stats = [np.zeros(_DC_BINS, np.uint8) for _ in range(ntab)]
        ac_stats = [np.zeros(_AC_BINS, np.uint8) for _ in range(ntab)]
        fixed = np.array([_FIXED_BIN], np.uint8)
        pred = [0] * nc
        dc_ctx = [[0] for _ in range(nc)]
        for bi in range(bh * bw_):
            for ci in range(nc):
                t = 1 if (nc == 3 and ci) else 0
                coef = coeffs[ci][bi]
                newpred = _enc_dc(
                    enc, dc_stats[t], dc_ctx[ci], int(coef[0]),
                    0 if differential else pred[ci], 0, 1)
                if not differential:
                    pred[ci] = newpred
                _enc_ac(enc, ac_stats[t], fixed, coef, 5)
        entropy = enc.flush()
    else:
        dc_luts, ac_luts = _encode_luts(8)
        bw = _BitWriter()
        pred = [0] * nc
        for bi in range(bh * bw_):
            for ci in range(nc):
                t = 1 if (nc == 3 and ci) else 0
                newpred = _encode_block(
                    bw, coeffs[ci][bi], 0 if differential else pred[ci],
                    dc_luts[t], ac_luts[t])
                if not differential:  # PRED stays 0 in diff frames
                    pred[ci] = newpred
        bw.flush()
        entropy = bytes(bw.out)

    sos = bytearray([nc])
    for ci in range(nc):
        t = 1 if (nc == 3 and ci) else 0
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    out += entropy
    return [
        _stage_recon(coeffs[ci], qts[qsel[ci]], bh, bw_, h, w,
                     differential)
        for ci in range(nc)
    ]


def _emit_prog_frame(out: bytearray, planes: list[np.ndarray],
                     qsel: list[int], qts: list[np.ndarray],
                     marker: int, differential: bool,
                     arith: bool) -> list[np.ndarray]:
    """Append SOF + a minimal spectral-selection progression (one
    interleaved DC scan, then one full-band AC scan per component) for
    a 1x1-sampled progressive stage — SOF2/SOF6 Huffman or SOF10/SOF14
    arithmetic.  The scans transport the complete quantized
    coefficients (Ah=Al=0), so the reconstruction replica is identical
    to the sequential emitters'."""
    h, w = planes[0].shape
    nc = len(planes)
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, qsel[ci]])
    out += _seg(marker, bytes(sof))

    bh, bw_ = -(-h // 8), -(-w // 8)
    center = 0.0 if differential else 128.0
    coeffs = [
        _plane_coeffs(_pad_to(p, bh * 8, bw_ * 8), qts[qsel[ci]], center)
        for ci, p in enumerate(planes)
    ]

    def sos_seg(comps_sel, ss, se):
        sos = bytearray([len(comps_sel)])
        for ci in comps_sel:
            t = 1 if (nc == 3 and ci) else 0
            sos += bytes([ci + 1, (t << 4) | t])
        sos += bytes([ss, se, 0])
        return _seg(0xDA, bytes(sos))

    if arith:
        from swiftlake_spark.operators.jpeg_arith import (
            _AC_BINS,
            _DC_BINS,
            _FIXED_BIN,
            _QMEncoder,
            _enc_ac,
            _enc_dc,
        )

        # DC scan: interleaved, fresh statistics
        out += sos_seg(list(range(nc)), 0, 0)
        enc = _QMEncoder()
        ntab = 1 if nc == 1 else 2
        dc_stats = [np.zeros(_DC_BINS, np.uint8) for _ in range(ntab)]
        pred = [0] * nc
        dc_ctx = [[0] for _ in range(nc)]
        for bi in range(bh * bw_):
            for ci in range(nc):
                t = 1 if (nc == 3 and ci) else 0
                newpred = _enc_dc(
                    enc, dc_stats[t], dc_ctx[ci],
                    int(coeffs[ci][bi][0]),
                    0 if differential else pred[ci], 0, 1)
                if not differential:
                    pred[ci] = newpred
        out += enc.flush()
        # AC scans: one per component, full band, fresh statistics
        fixed = np.array([_FIXED_BIN], np.uint8)
        for ci in range(nc):
            t = 1 if (nc == 3 and ci) else 0
            out += sos_seg([ci], 1, 63)
            enc = _QMEncoder()
            ac_stats = np.zeros(_AC_BINS, np.uint8)
            for bi in range(bh * bw_):
                _enc_ac(enc, ac_stats, fixed, coeffs[ci][bi], 5, 1, 63, 0)
            out += enc.flush()
    else:
        dc_luts, ac_luts = _encode_luts(8)
        out += sos_seg(list(range(nc)), 0, 0)
        bw = _BitWriter()
        pred = [0] * nc
        for bi in range(bh * bw_):
            for ci in range(nc):
                t = 1 if (nc == 3 and ci) else 0
                newpred = _huff_enc_dc(
                    bw, int(coeffs[ci][bi][0]),
                    0 if differential else pred[ci], dc_luts[t])
                if not differential:
                    pred[ci] = newpred
        bw.flush()
        out += bytes(bw.out)
        for ci in range(nc):
            t = 1 if (nc == 3 and ci) else 0
            out += sos_seg([ci], 1, 63)
            bw = _BitWriter()
            for bi in range(bh * bw_):
                _enc_ac_first_block(bw, coeffs[ci][bi], 1, 63, 0,
                                    ac_luts[t])
            bw.flush()
            out += bytes(bw.out)

    return [
        _stage_recon(coeffs[ci], qts[qsel[ci]], bh, bw_, h, w,
                     differential)
        for ci in range(nc)
    ]


def _emit_lossless_diff_frame(out: bytearray,
                              diffs: list[np.ndarray],
                              arith: bool = False) -> None:
    """Append a differential-lossless frame coding the residual planes
    exactly (predictor selection 0, diffs mod 2^16) — SOF7 Huffman or
    SOF15 arithmetic."""
    h, w = diffs[0].shape
    nc = len(diffs)
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    if arith:
        from swiftlake_spark.operators.jpeg_arith import (
            _encode_lossless_arith_scan,
        )

        out += _seg(0xCF, bytes(sof))
        sos = bytearray([nc])
        for ci in range(nc):
            sos += bytes([ci + 1, 0x00])  # DAC table 0 conditioning
        sos += bytes([0, 0, 0])  # Ss=0: differential, no prediction
        out += _seg(0xDA, bytes(sos))
        out += _encode_lossless_arith_scan(
            [d.astype(np.int32) for d in diffs], 0, 0,
            differential=True)
        return
    out += _seg(0xC7, bytes(sof))
    # lossless tables live in DC slots 2/3 so the DCT stages' Annex-K
    # DC tables (slots 0/1) stay untouched
    out += _seg(0xC4, bytes([0x02]) + bytes(_LL_BITS) + bytes(_LL_VALS))
    lut = _build_encode_lut(_LL_BITS, _LL_VALS)
    bw = _BitWriter()
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                diff = int(diffs[ci][y, x]) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000
                if diff == -32768:
                    code, ln = lut[16]
                    bw.write(code, ln)
                    continue
                s = abs(diff).bit_length()
                code, ln = lut[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    bw.flush()
    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x20])  # DC table 2
    sos += bytes([0, 0, 0])  # Ss=0 (differential: no prediction)
    out += _seg(0xDA, bytes(sos))
    out += bytes(bw.out)


def encode_jpeg_hierarchical(arr: np.ndarray, quality: int = 85,
                             levels: int = 3,
                             lossless_final: bool = False,
                             arith: bool = False,
                             progressive: bool = False) -> bytes:
    """uint8 (H,W) gray or (H,W,3) RGB → hierarchical JPEG: DHP, a
    small first stage, EXP + differential DCT refinements up to full
    resolution, and optionally a SOF7 lossless correction stage that
    makes the decode bit-exact (grayscale) / YCbCr-exact (color).

    Frame processes by (arith, progressive):
    (F, F) SOF1 + SOF5 · (T, F) SOF9 + SOF13 ·
    (F, T) SOF2 + SOF6 · (T, T) SOF10 + SOF14 — all four carry the
    IDENTICAL quantized coefficients, so the decodes must be
    pixel-identical (the cross-process transparency property).  The
    lossless correction stage follows the entropy layer: SOF7 Huffman
    or SOF15 arithmetic (Annex H.1.1 conditioning)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"expected (H,W) or (H,W,3), got {a.shape}")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    h, w = a.shape[:2]
    if ((h >> (levels - 1)) < 1) or ((w >> (levels - 1)) < 1):
        raise ValueError(f"{levels} levels exceed image dims {h}x{w}")
    chans = [a] if gray else _rgb_to_ycc(a)
    nc = len(chans)
    qsel = [0] * nc if gray else [0, 1, 1]

    # pyramid: index 0 = full resolution, last = smallest
    pyramid = [chans]
    for _ in range(levels - 1):
        pyramid.append([_downsample(p) for p in pyramid[-1]])

    ql = _scale_quant(_QUANT_LUMA, quality)[_ZIGZAG]
    qc = _scale_quant(_QUANT_CHROMA, quality)[_ZIGZAG]
    qts = [ql, qc]

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(ql.astype(np.uint8)))
    if nc == 3:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8)))
    tables = _huff_specs(8)

    def dht(tc, th, bits, vals):
        return _seg(0xC4,
                    bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, *tables[0])
    out += dht(1, 0, *tables[1])
    if nc == 3:
        out += dht(0, 1, *tables[2])
        out += dht(1, 1, *tables[3])

    if arith:
        # DAC: default conditioning for every table the stages select
        dac = bytearray()
        for t in range(1 if nc == 1 else 2):
            dac += bytes([t, (1 << 4) | 0])  # DC L=0, U=1
            dac += bytes([0x10 | t, 5])  # AC Kx=5
        out += _seg(0xCC, bytes(dac))

    dhp = bytearray([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        dhp += bytes([ci + 1, 0x11, 0])  # Tq must be 0 in DHP
    out += _seg(0xDE, bytes(dhp))

    # first (non-differential) stage at the smallest level
    if progressive:
        refs = _emit_prog_frame(out, pyramid[-1], qsel, qts,
                                0xCA if arith else 0xC2, False, arith)
    else:
        refs = _emit_dct_frame(out, pyramid[-1], qsel, qts,
                               0xC9 if arith else 0xC1, False, arith)
    refs = [r.astype(np.uint8) for r in refs]

    # differential refinements up to full resolution
    for lvl in range(levels - 2, -1, -1):
        target = pyramid[lvl]
        th, tw = target[0].shape
        out += _seg(0xDF, bytes([0x11]))  # EXP: double both axes
        refs = [_expand_plane(r, th, tw) for r in refs]
        diffs = [t.astype(np.int32) - r.astype(np.int32)
                 for t, r in zip(target, refs)]
        if progressive:
            recon = _emit_prog_frame(out, diffs, qsel, qts,
                                     0xCE if arith else 0xC6, True,
                                     arith)
        else:
            recon = _emit_dct_frame(out, diffs, qsel, qts,
                                    0xCD if arith else 0xC5, True,
                                    arith)
        refs = [np.clip(r.astype(np.int32) + d, 0, 255).astype(np.uint8)
                for r, d in zip(refs, recon)]

    if lossless_final:
        diffs = [c.astype(np.int32) - r.astype(np.int32)
                 for c, r in zip(chans, refs)]
        _emit_lossless_diff_frame(out, diffs, arith=arith)

    out += b"\xff\xd9"
    return bytes(out)

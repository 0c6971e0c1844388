"""Arithmetic-coded JPEG tests (operators/jpeg_arith.py).

The load-bearing property: the arithmetic entropy layer must be
TRANSPARENT — an SOF9 encoding of the same quantized coefficients
decodes pixel-identically to the SOF0 Huffman encoding.  That pins the
statistical models and the QM coder against an independent path (the
Huffman decoder), not just against themselves.  The QM coder is also
unit-round-tripped at the bit level, the streams are checked for
smaller-than-Huffman size (the whole point of the QM coder — a subtle
estimation bug would still round-trip but lose compression), restart
markers and DAC handling are covered, and mutation fuzz holds the
decode contract.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from swiftlake_spark.operators.jpeg import decode_jpeg, encode_jpeg
from swiftlake_spark.operators.jpeg_arith import (
    _QMDecoder,
    _QMEncoder,
    _ARITH_TAB,
    encode_jpeg_arith,
)
from swiftlake_spark.operators.multimodal import decode_image_bytes


# ------------------------------------------------------------ QM coder


def test_qm_bit_roundtrip():
    rng = np.random.default_rng(0)
    for trial in range(60):
        n = int(rng.integers(1, 3000))
        nctx = int(rng.integers(1, 8))
        p = (0.05, 0.7, 0.5)[trial % 3]
        bits = (rng.random(n) < p).astype(int)
        ctxs = rng.integers(0, nctx, n)
        enc = _QMEncoder()
        st = np.zeros(nctx, np.uint8)
        for b, cx in zip(bits, ctxs):
            enc.code(st, int(cx), int(b))
        dec = _QMDecoder(enc.flush(), 0)
        st2 = np.zeros(nctx, np.uint8)
        assert [dec.decode(st2, int(cx)) for cx in ctxs] == list(bits)


def test_qm_compresses_biased_stream():
    # 5%-ones stream must compress well below 1 bit/symbol — a state
    # machine that round-trips but never adapts would fail this
    rng = np.random.default_rng(1)
    n = 20_000
    bits = (rng.random(n) < 0.05).astype(int)
    enc = _QMEncoder()
    st = np.zeros(1, np.uint8)
    for b in bits:
        enc.code(st, 0, int(b))
    assert len(enc.flush()) * 8 < 0.5 * n


def test_qm_stuffing_invariant():
    # every 0xFF in QM output must be followed by 0x00 (stuffing) —
    # otherwise the scan parser would read it as a marker
    rng = np.random.default_rng(2)
    for seed in range(20):
        bits = (rng.random(4000) < 0.5).astype(int)
        enc = _QMEncoder()
        st = np.zeros(4, np.uint8)
        for i, b in enumerate(bits):
            enc.code(st, i % 4, int(b))
        out = enc.flush()
        for i, byte in enumerate(out[:-1]):
            if byte == 0xFF:
                assert out[i + 1] == 0x00


def test_state_table_shape():
    assert len(_ARITH_TAB) == 114
    for i, (qe, nmps, nlps, _sw) in enumerate(_ARITH_TAB):
        assert 0 < qe < 0x8000
        assert 0 <= nmps < 114 and 0 <= nlps < 114
    # the fixed bin never moves
    assert _ARITH_TAB[113][1] == 113 and _ARITH_TAB[113][2] == 113


# ----------------------------------------------------- transparency


def _images(rng):
    yield rng.integers(0, 256, (16, 16), dtype=np.uint8)
    yield rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:24, 0:40]
    yield np.stack([(yy * 3 + xx * 2) % 256, (xx * 5) % 256,
                    (yy * 7) % 256], axis=-1).astype(np.uint8)
    yield np.full((8, 8), 128, dtype=np.uint8)  # all-EOB blocks


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("restart", [0, 2])
def test_arith_equals_huffman(subsampling, restart):
    rng = np.random.default_rng(restart * 10 + len(subsampling))
    for arr in _images(rng):
        if arr.ndim == 2 and subsampling == "4:2:0":
            continue
        ja = encode_jpeg_arith(arr, quality=88, subsampling=subsampling,
                               restart_interval=restart)
        jh = encode_jpeg(arr, quality=88, subsampling=subsampling,
                         restart_interval=restart)
        assert np.array_equal(decode_jpeg(ja), decode_jpeg(jh))


def test_arith_smaller_than_huffman_on_photos():
    # the QM coder's raison d'être: ~5-15% smaller on natural content
    yy, xx = np.mgrid[0:64, 0:64]
    arr = np.stack([
        (128 + 60 * np.sin(yy / 7) + 40 * np.cos(xx / 9)),
        (128 + 50 * np.sin((yy + xx) / 11)),
        (128 + 45 * np.cos(yy / 5)),
    ], axis=-1).clip(0, 255).astype(np.uint8)
    ja = encode_jpeg_arith(arr, quality=90)
    jh = encode_jpeg(arr, quality=90)
    assert len(ja) < len(jh)


def test_magic_dispatch_and_features():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    out = decode_image_bytes(encode_jpeg_arith(arr, quality=92))
    assert out.shape == (20, 30, 3)
    # lossy but near: same pixels as the huffman pipeline, so compare
    # against that decode rather than the source
    ref = decode_jpeg(encode_jpeg(arr, quality=92))
    assert np.array_equal(out, ref)


def test_hypothesis_transparency():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        h=st.integers(8, 32),
        w=st.integers(8, 32),
        gray=st.booleans(),
        quality=st.integers(60, 95),
    )
    def prop(seed, h, w, gray, quality):
        rng = np.random.default_rng(seed)
        shape = (h, w) if gray else (h, w, 3)
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        ja = encode_jpeg_arith(arr, quality=quality)
        jh = encode_jpeg(arr, quality=quality)
        assert np.array_equal(decode_jpeg(ja), decode_jpeg(jh))

    prop()


# ------------------------------------------------------- DAC handling


def test_missing_dac_uses_defaults():
    # strip the DAC segment: conditioning falls back to L=0,U=1,Kx=5 —
    # exactly what the encoder used, so the decode must not change
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    data = encode_jpeg_arith(arr, quality=85)
    pos = 2
    out = bytearray(data[:2])
    while pos + 4 <= len(data):
        marker = data[pos + 1]
        if marker == 0xDA:
            out += data[pos:]
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if marker != 0xCC:
            out += data[pos: pos + 2 + ln]
        pos += 2 + ln
    assert bytes(out) != data  # DAC was present and removed
    assert np.array_equal(decode_jpeg(bytes(out)), decode_jpeg(data))


def test_bad_dac_rejected():
    rng = np.random.default_rng(8)
    arr = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg_arith(arr))
    i = data.find(bytes([0xFF, 0xCC]))
    assert i > 0
    # DC conditioning with L > U must raise
    data[i + 5] = 0x2F  # U=2, L=15
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_arith_lossless_relabel_fails_structurally():
    # SOF11 decodes natively (r12); a sequential-arith stream relabeled
    # SOF11 must fail lossless validation (Ss=0 predictor), not slip
    # through as garbage pixels
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg_arith(arr))
    i = data.find(bytes([0xFF, 0xC9]))
    data[i + 1] = 0xCB  # morph SOF9 → SOF11 (arithmetic lossless)
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(data))


def test_sequential_scan_under_sof10_rejected():
    # a full-band interleaved scan is structurally invalid for the
    # progressive decoder (DC scan must have Se=0): morphing the SOF
    # marker must fail loudly, not decode garbage
    rng = np.random.default_rng(10)
    arr = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg_arith(arr))
    i = data.find(bytes([0xFF, 0xC9]))
    data[i + 1] = 0xCA
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


# ------------------------------------------- progressive arithmetic


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("restart", [0, 2])
def test_progressive_arith_equals_huffman_progressive(subsampling,
                                                      restart):
    from swiftlake_spark.operators.jpeg import encode_jpeg_progressive
    from swiftlake_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    rng = np.random.default_rng(restart + len(subsampling))
    for arr in _images(rng):
        if arr.ndim == 2 and subsampling == "4:2:0":
            continue
        pa = encode_jpeg_arith_progressive(
            arr, quality=87, subsampling=subsampling,
            restart_interval=restart)
        ph = encode_jpeg_progressive(
            arr, quality=87, subsampling=subsampling,
            restart_interval=restart)
        assert np.array_equal(decode_jpeg(pa), decode_jpeg(ph))
        # and vs the sequential pipeline: same coefficient store
        seq = encode_jpeg(arr, quality=87, subsampling=subsampling)
        assert np.array_equal(decode_jpeg(pa), decode_jpeg(seq))


def test_progressive_arith_mutation_fuzz():
    from swiftlake_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    base = encode_jpeg_arith_progressive(arr, quality=80)
    n = 0
    for k in range(200):
        b = bytearray(base)
        if k % 2 == 0:
            b[int(rng.integers(2, len(b)))] ^= 1 << int(rng.integers(0, 8))
        else:
            b = b[: int(rng.integers(4, len(b)))]
        try:
            out = decode_jpeg(bytes(b))
            assert out.dtype == np.uint8
        except (ValueError, NotImplementedError):
            pass
        n += 1
    assert n == 200


# --------------------------------------------------------- mutation


def test_mutation_fuzz_contract():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    payloads = [
        encode_jpeg_arith(arr, quality=80),
        encode_jpeg_arith(arr, quality=80, restart_interval=2),
    ]
    n = 0
    for base in payloads:
        for k in range(150):
            b = bytearray(base)
            mode = k % 3
            if mode == 0:
                b[int(rng.integers(2, len(b)))] ^= \
                    1 << int(rng.integers(0, 8))
            elif mode == 1:
                b = b[: int(rng.integers(4, len(b)))]
            else:
                i = int(rng.integers(len(b) // 2, len(b) - 4))
                b[i: i + 4] = rng.integers(0, 256, 4, np.uint8).tobytes()
            try:
                out = decode_jpeg(bytes(b))
                assert out.dtype == np.uint8
            except (ValueError, NotImplementedError):
                pass
            n += 1
    assert n == 300


# ------------------------------------------------------ optional golden


@pytest.mark.skipif(
    not os.environ.get("SWIFTLAKE_PIL_GOLDEN"),
    reason="PIL golden cross-check (set SWIFTLAKE_PIL_GOLDEN=1 with "
           "pillow built against a libjpeg with arithmetic support)",
)
def test_pil_golden_cross_check():
    import io

    from PIL import Image  # noqa: PLC0415

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = encode_jpeg_arith(arr, quality=90)
    via_pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    ours = decode_jpeg(data)
    assert np.array_equal(via_pil, ours)

"""FLAC codec tests (operators/flac.py).

Same strategy as the other codec suites: round-trip matrix over every
encoder shape, HAND-BUILT frame bitstreams for the decode paths the
encoder never emits (LPC subframes, left/side / right/side / mid/side
stereo decorrelation, Rice escape partitions, partition order > 0,
wasted bits), CRC tamper detection, mutation fuzz holding the decode
contract, and a hypothesis property.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from swiftlake_spark.operators.flac import (
    _BW,
    _crc8,
    _crc16,
    _utf8_coded,
    decode_flac_bytes,
    encode_flac,
)
from swiftlake_spark.operators.multimodal import decode_audio_bytes


# ------------------------------------------------------------ helpers


def _streaminfo(rate, nch, bps, total, block_size=1024):
    w = _BW()
    w.put(16, block_size)
    w.put(16, block_size)
    w.put(24, 0)
    w.put(24, 0)
    w.put(20, rate)
    w.put(3, nch - 1)
    w.put(5, bps - 1)
    w.put(36, total)
    body = w.done() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _frame_header(bs, nch_or_asgn, bps_code, frame_no=0):
    w = _BW()
    w.put(14, 0x3FFE)
    w.put(1, 0)
    w.put(1, 0)
    w.put(4, 7)  # 16-bit blocksize follows
    w.put(4, 0)  # rate from STREAMINFO
    w.put(4, nch_or_asgn)
    w.put(3, bps_code)
    w.put(1, 0)
    for b in _utf8_coded(frame_no):
        w.put(8, b)
    w.put(16, bs - 1)
    hdr = w.done()
    return hdr + bytes([_crc8(hdr)])


def _finish_frame(hdr, body_bw):
    body = body_bw.done()
    frame = hdr + body
    return frame + struct.pack(">H", _crc16(frame))


def _verbatim_subframe(w, samples, bps):
    w.put(1, 0)
    w.put(6, 1)
    w.put(1, 0)
    for v in samples:
        w.put(bps, int(v))


# --------------------------------------------------------- round-trips


@pytest.mark.parametrize("block_size", [64, 192, 1024])
@pytest.mark.parametrize("stereo", [False, True])
def test_roundtrip_matrix(block_size, stereo):
    rng = np.random.default_rng(block_size + stereo)
    for n in (1, 63, 64, 65, 1000, 4097):
        t = np.arange(n)
        base = (9000 * np.sin(t / 17) + 500 * rng.standard_normal(n))
        s = base.astype(np.int64).clip(-32768, 32767)
        if stereo:
            s = np.stack([s, np.roll(s, 3) // 2], axis=1)
        enc = encode_flac(s, rate=16_000, block_size=block_size)
        rate, dec = decode_flac_bytes(enc)
        ref = (s if s.ndim == 1 else s.mean(axis=1)) / 32768.0
        assert rate == 16_000
        assert np.array_equal(dec, ref.astype(np.float32))


def test_constant_and_verbatim_paths():
    # all-equal → CONSTANT subframe; white noise at full scale can
    # push residuals wide enough to pick VERBATIM
    c = np.full(500, -12345, np.int64)
    rate, dec = decode_flac_bytes(encode_flac(c))
    assert (dec == np.float32(-12345 / 32768.0)).all()
    rng = np.random.default_rng(0)
    v = rng.integers(-32768, 32767, 300).astype(np.int64)
    rate, dec = decode_flac_bytes(encode_flac(v, block_size=64))
    assert np.array_equal(dec, (v / 32768.0).astype(np.float32))


def test_bps_8_and_24():
    rng = np.random.default_rng(3)
    for bps in (8, 24):
        lim = 1 << (bps - 1)
        s = rng.integers(-lim, lim - 1, 700).astype(np.int64)
        enc = encode_flac(s, bps=bps, block_size=256)
        rate, dec = decode_flac_bytes(enc)
        assert np.array_equal(dec, (s / lim).astype(np.float32))


def test_magic_dispatch():
    s = np.arange(-100, 100, dtype=np.int64) * 50
    rate, dec = decode_audio_bytes(encode_flac(s, rate=8000))
    assert rate == 8000 and len(dec) == 200
    with pytest.raises(ValueError):
        decode_audio_bytes(b"OggS" + b"\x00" * 64)


def test_hypothesis_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(-32768, 32767), min_size=1, max_size=700),
        st.sampled_from([64, 177, 1024]),
    )
    def prop(vals, bs):
        s = np.array(vals, dtype=np.int64)
        rate, dec = decode_flac_bytes(encode_flac(s, block_size=bs))
        assert np.array_equal(dec, (s / 32768.0).astype(np.float32))

    prop()


# ------------------------------------- hand-built decode-only bitstreams


class TestHandBuiltFrames:
    """Decode paths the encoder never emits, reconstructed against an
    independent numpy model."""

    def test_lpc_subframe(self):
        # order-2 LPC, precision 12, shift 5, coefficients chosen so
        # the numpy reference model is easy to follow
        bps, bs = 16, 32
        coefs = [1843, -871]  # ~ 0.9 * 2^11, -0.425 * 2^11
        shift = 11  # matches the 2^11 coefficient scale (stable filter)
        warm = [100, -200]
        res = list(range(-15, 15))
        w = _BW()
        w.put(1, 0)
        w.put(6, 32 | (2 - 1))  # LPC order 2
        w.put(1, 0)  # no wasted bits
        for v in warm:
            w.put(bps, v)
        w.put(4, 12 - 1)
        w.put(5, shift)
        for c in coefs:
            w.put(12, c)
        # residual: method 0, partition order 0, rice param 6
        w.put(2, 0)
        w.put(4, 0)
        w.put(4, 6)
        for v in res:
            u = (v << 1) if v >= 0 else ((-v) << 1) - 1
            q = u >> 6
            for _ in range(q):
                w.put(1, 0)
            w.put(1, 1)
            w.put(6, u & 63)
        hdr = _frame_header(bs, 0, 4)  # mono, 16-bit
        data = _streaminfo(8000, 1, bps, bs) + _finish_frame(hdr, w)
        rate, dec = decode_flac_bytes(data)
        # independent reconstruction
        s = list(warm)
        for i in range(2, bs):
            pred = (coefs[0] * s[i - 1] + coefs[1] * s[i - 2]) >> shift
            s.append(res[i - 2] + pred)
        assert np.array_equal(
            dec, (np.array(s) / 32768.0).astype(np.float32))

    @pytest.mark.parametrize("asgn", [8, 9, 10])
    def test_stereo_decorrelation(self, asgn):
        bps, bs = 16, 24
        rng = np.random.default_rng(asgn)
        left = rng.integers(-2000, 2000, bs).astype(np.int64)
        right = rng.integers(-2000, 2000, bs).astype(np.int64)
        if asgn == 8:  # left/side
            ch0, ch1 = left, left - right
            side_idx = 1
        elif asgn == 9:  # right/side
            ch0, ch1 = left - right, right
            side_idx = 0
        else:  # mid/side
            ch0, ch1 = (left + right) >> 1, left - right
            side_idx = 1
        w = _BW()
        _verbatim_subframe(w, ch0, bps + (1 if side_idx == 0 else 0))
        _verbatim_subframe(w, ch1, bps + (1 if side_idx == 1 else 0))
        hdr = _frame_header(bs, asgn, 4)
        data = _streaminfo(8000, 2, bps, bs) + _finish_frame(hdr, w)
        rate, dec = decode_flac_bytes(data)
        exp = ((left + right) / 2.0 / 32768.0).astype(np.float32)
        assert np.array_equal(dec, exp)

    def test_partition_order_and_escape(self):
        # two partitions: rice-coded then escape-to-raw
        bps, bs = 16, 16
        vals = np.arange(bs, dtype=np.int64) * 3 - 20
        w = _BW()
        w.put(1, 0)
        w.put(6, 8)  # FIXED order 0 → residual = samples
        w.put(1, 0)
        w.put(2, 0)
        w.put(4, 1)  # partition order 1 → two partitions of 8
        w.put(4, 5)  # rice param 5 for first half
        for v in vals[:8]:
            u = (int(v) << 1) if v >= 0 else ((-int(v)) << 1) - 1
            for _ in range(u >> 5):
                w.put(1, 0)
            w.put(1, 1)
            w.put(5, u & 31)
        w.put(4, 15)  # escape
        w.put(5, 9)  # raw 9-bit residuals
        for v in vals[8:]:
            w.put(9, int(v))
        hdr = _frame_header(bs, 0, 4)
        data = _streaminfo(8000, 1, bps, bs) + _finish_frame(hdr, w)
        rate, dec = decode_flac_bytes(data)
        assert np.array_equal(dec, (vals / 32768.0).astype(np.float32))

    def test_wasted_bits(self):
        # samples all divisible by 4 → 2 wasted bits, constant subframe
        bps, bs = 16, 10
        w = _BW()
        w.put(1, 0)
        w.put(6, 0)  # CONSTANT
        w.put(1, 1)  # wasted-bits flag
        w.put(1, 0)  # unary 01 → k = 2
        w.put(1, 1)
        w.put(bps - 2, 25)  # shifted-down constant
        hdr = _frame_header(bs, 0, 4)
        data = _streaminfo(8000, 1, bps, bs) + _finish_frame(hdr, w)
        rate, dec = decode_flac_bytes(data)
        assert (dec == np.float32(100 / 32768.0)).all()

    def test_5bit_rice_method(self):
        bps, bs = 16, 8
        vals = np.array([0, -1, 2, -3, 100, -100, 7, -7], np.int64)
        w = _BW()
        w.put(1, 0)
        w.put(6, 8)
        w.put(1, 0)
        w.put(2, 1)  # method 1: 5-bit rice params
        w.put(4, 0)
        w.put(5, 4)
        for v in vals:
            u = (int(v) << 1) if v >= 0 else ((-int(v)) << 1) - 1
            for _ in range(u >> 4):
                w.put(1, 0)
            w.put(1, 1)
            w.put(4, u & 15)
        hdr = _frame_header(bs, 0, 4)
        data = _streaminfo(8000, 1, bps, bs) + _finish_frame(hdr, w)
        rate, dec = decode_flac_bytes(data)
        assert np.array_equal(dec, (vals / 32768.0).astype(np.float32))


# ------------------------------------------------------------ contracts


def test_crc_tamper_detection():
    s = (np.arange(600) * 37 % 4001 - 2000).astype(np.int64)
    enc = bytearray(encode_flac(s, block_size=256))
    # find a byte inside the first frame body and flip it; either CRC
    # trips or a structural check does — silent corruption is the bug
    mid = len(enc) // 2
    enc[mid] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac_bytes(bytes(enc))


def test_mutation_fuzz_contract():
    rng = np.random.default_rng(7)
    t = np.arange(900)
    base = encode_flac(
        (6000 * np.sin(t / 9)).astype(np.int64), block_size=128)
    n_checked = 0
    for k in range(300):
        b = bytearray(base)
        mode = k % 3
        if mode == 0:
            b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
        elif mode == 1:
            b = b[: int(rng.integers(4, len(b)))]
        else:
            i = int(rng.integers(0, len(b) - 4))
            b[i: i + 4] = rng.integers(0, 256, 4, dtype=np.uint8).tobytes()
        try:
            rate, dec = decode_flac_bytes(bytes(b))
            assert dec.dtype == np.float32
        except (ValueError, NotImplementedError):
            pass
        n_checked += 1
    assert n_checked == 300


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        encode_flac(np.array([], dtype=np.int64))
    with pytest.raises(ValueError):
        encode_flac(np.array([40000], dtype=np.int64))  # exceeds 16-bit
    with pytest.raises(ValueError):
        encode_flac(np.zeros((4, 3), dtype=np.int64))  # 3 channels
    with pytest.raises(ValueError):
        decode_flac_bytes(b"fLaX" + b"\x00" * 40)

"""Stdlib baseline-JPEG codec (VERDICT r8 ask #5).

Encoder and decoder share only the constant Annex-K tables, so a round
trip crosses two independent transform implementations (FDCT vs IDCT,
bit writer vs bit reader).  When pillow is importable the suite also
cross-checks both directions against libjpeg; in this container it is
not, so the gated tests document what runs where pillow exists.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from swiftlake_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
)
from swiftlake_spark.operators.multimodal import (  # noqa: E402
    decode_image_bytes,
)


def _gradient(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(50 + yy * 2) % 200, (30 + xx) % 200,
                     (100 + yy // 2 + xx // 2) % 200],
                    axis=-1).astype(np.uint8)


def test_flat_color_is_exact():
    img = np.full((16, 24, 3), (200, 64, 110), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert np.array_equal(out, img)  # DC-only: quantization is lossless


def test_blocky_image_is_exact():
    blocks = np.kron(np.arange(35).reshape(5, 7) * 7 % 256,
                     np.ones((8, 8))).astype(np.uint8)
    img = np.stack([blocks] * 3, axis=-1)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=75)), img)


@pytest.mark.parametrize("quality,tol_mean,tol_max", [
    (95, 1.0, 4), (75, 2.5, 8),
])
def test_smooth_gradient_roundtrip(quality, tol_mean, tol_max):
    img = _gradient()
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    d = np.abs(out.astype(int) - img.astype(int))
    assert d.mean() <= tol_mean and d.max() <= tol_max, (d.mean(), d.max())


def test_420_subsampling_and_odd_dimensions():
    img = _gradient(33, 45)  # not multiples of 8 or 16
    out = decode_jpeg(encode_jpeg(img, quality=92, subsampling="4:2:0"))
    assert out.shape == img.shape
    d = np.abs(out.astype(int) - img.astype(int))
    assert d.mean() <= 2.5, d.mean()


def test_grayscale_single_component():
    g = np.tile(np.linspace(10, 240, 40, dtype=np.uint8), (18, 1))
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.ndim == 2 and out.shape == g.shape
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 4


def test_restart_intervals():
    img = _gradient(33, 45)
    data = encode_jpeg(img, quality=92, subsampling="4:2:0",
                       restart_interval=2)
    assert b"\xff\xdd" in data  # DRI present
    assert b"\xff\xd0" in data  # at least RST0 fired
    out = decode_jpeg(data)
    d = np.abs(out.astype(int) - img.astype(int))
    assert d.mean() <= 2.5, d.mean()


def test_dispatch_uses_stdlib_decoder():
    """decode_image_bytes must decode baseline JPEG WITHOUT PIL."""
    img = _gradient(17, 23)
    out = decode_image_bytes(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() <= 1.5


def test_relabeled_lossless_marker_fails_structurally():
    """SOF11 (arithmetic lossless) decodes natively as of r12, so a
    sequential stream relabeled SOF11 must fail SOF11's OWN validation
    (a sequential SOS carries Ss=0 — an invalid lossless predictor),
    not silently decode."""
    data = bytearray(encode_jpeg(_gradient(8, 8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xCB
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(data))


def test_fake_progressive_with_baseline_scan_rejected():
    """Flipping SOF0→SOF2 on a baseline stream makes a structurally
    invalid progressive file (interleaved full-band scan): the decoder
    must reject it cleanly, not misdecode."""
    data = bytearray(encode_jpeg(_gradient(8, 8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_truncated_and_garbage_inputs_raise_cleanly():
    img = _gradient(16, 16)
    data = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(data[: len(data) // 2])


def test_wire_structure_is_baseline_jfif():
    data = encode_jpeg(_gradient(16, 16), quality=85)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    assert b"\xff\xc0" in data  # SOF0, not SOF2
    assert b"\xff\xc2" not in data[: data.find(b"\xff\xda")]
    # two DQT + four DHT for color
    assert data.count(b"\xff\xdb") >= 2
    assert data.count(b"\xff\xc4") >= 4


_has_pil = True
try:  # pragma: no cover - absent in this container
    import PIL  # noqa: F401
except ImportError:
    _has_pil = False


@pytest.mark.skipif(not _has_pil, reason="pillow not installed")
def test_libjpeg_golden_both_directions():  # pragma: no cover
    """Where pillow exists: libjpeg must decode our bytes to ~our
    pixels, and we must decode libjpeg's bytes to ~its pixels."""
    import io

    from PIL import Image

    img = _gradient()
    ours = encode_jpeg(img, quality=95)
    pil_decoded = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    d1 = np.abs(pil_decoded.astype(int) - decode_jpeg(ours).astype(int))
    assert d1.mean() <= 1.5 and d1.max() <= 6

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    theirs = buf.getvalue()
    d2 = np.abs(decode_jpeg(theirs).astype(int)
                - np.asarray(Image.open(io.BytesIO(theirs)).convert("RGB"))
                .astype(int))
    assert d2.mean() <= 1.5 and d2.max() <= 6

    # progressive, both directions: libjpeg decodes our SOF2 stream,
    # and we decode libjpeg's progressive output (r10 decoder)
    ours_p = encode_jpeg_progressive(img, quality=95)
    d3 = np.abs(np.asarray(Image.open(io.BytesIO(ours_p)).convert("RGB"))
                .astype(int) - decode_jpeg(ours_p).astype(int))
    assert d3.mean() <= 1.5 and d3.max() <= 6
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95,
                              progressive=True)
    theirs_p = buf.getvalue()
    d4 = np.abs(decode_jpeg(theirs_p).astype(int)
                - np.asarray(Image.open(io.BytesIO(theirs_p)).convert("RGB"))
                .astype(int))
    assert d4.mean() <= 1.5 and d4.max() <= 6


def test_mutation_fuzz_fails_cleanly():
    """Corrupted JPEGs must decode, or raise a clean error fast — never
    hang or escape with an unexpected exception type.  400 seeded
    single-byte mutations over two payload shapes."""
    import random
    import struct as _struct
    import time

    rng = random.Random(7)
    payloads = [
        encode_jpeg(_gradient(24, 40), quality=90),
        encode_jpeg(_gradient(17, 19), quality=80, subsampling="4:2:0",
                    restart_interval=2),
    ]
    t0 = time.time()
    outcomes = {"ok": 0, "err": 0}
    for i in range(400):
        data = bytearray(rng.choice(payloads))
        for _ in range(rng.choice((1, 1, 1, 3))):
            data[rng.randrange(2, len(data))] = rng.randrange(256)
        try:
            out = decode_jpeg(bytes(data))
            assert out.dtype == np.uint8
            outcomes["ok"] += 1
        except (ValueError, NotImplementedError, IndexError, KeyError,
                _struct.error):
            outcomes["err"] += 1
    assert outcomes["ok"] + outcomes["err"] == 400
    # sanity: mutations actually exercised both branches
    assert outcomes["err"] > 40, outcomes
    assert time.time() - t0 < 120, "mutation decode too slow — lurking loop?"


# ------------------------------------------------- progressive (SOF2)

from swiftlake_spark.operators.jpeg import (  # noqa: E402
    _ac_first,
    _ac_refine,
    _BitReader,
    encode_jpeg_progressive,
)


@pytest.mark.parametrize("kwargs", [
    dict(quality=95),
    dict(quality=80, subsampling="4:2:0"),
    dict(quality=85, spectral_only=True),
    dict(quality=90, restart_interval=3),
    dict(quality=75, subsampling="4:2:0", restart_interval=2),
])
def test_progressive_matches_baseline_decode(kwargs):
    """The progressive scan script must reconstruct the exact same
    pixels as a baseline encode of the same quantized coefficients —
    successive approximation is lossless once all scans land."""
    img = _gradient(29, 43)
    prog = decode_jpeg(encode_jpeg_progressive(img, **kwargs))
    base_kw = {k: v for k, v in kwargs.items()
               if k in ("quality", "subsampling")}
    base = decode_jpeg(encode_jpeg(img, **base_kw))
    assert prog.shape == base.shape
    assert np.array_equal(prog, base)


def test_progressive_grayscale_and_noise():
    g = _gradient(33, 41)[:, :, 0]
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(g, quality=85)),
        decode_jpeg(encode_jpeg(g, quality=85)))
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(noise, quality=95)),
        decode_jpeg(encode_jpeg(noise, quality=95)))


def test_progressive_dispatches_without_pil():
    img = _gradient(17, 23)
    out = decode_image_bytes(encode_jpeg_progressive(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() <= 1.5


def test_progressive_wire_structure():
    data = encode_jpeg_progressive(_gradient(16, 16), quality=85)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in data[: data.find(b"\xff\xda")]  # SOF2
    assert b"\xff\xc0" not in data
    # default script for color: 1 DC first + 6 AC first + 6 AC refine
    # + 1 DC refine = 14 SOS markers
    assert data.count(b"\xff\xda") == 14


def test_eobrun_across_blocks_decodes():
    """The Annex-K encoder never emits EOBn>0; exercise the decoder's
    cross-block EOBRUN skip with a hand-built stream and custom LUT."""
    # AC table: symbol 0x20 (EOBn, r=2) → code 0 (1 bit),
    #           symbol 0x01 (run 0, size 1) → code 10 (2 bits)
    lut = {(1, 0b0): 0x20, (2, 0b10): 0x01}
    # bits: EOB2 code (0), 2 extra bits (11 → eobrun = 4+3-1... )
    # stream: 0 11 | padding 1s  → eobrun = (1<<2)-1 + 0b11 = 6
    r = _BitReader(bytes([0b01100000 + 0b11111]), 0)
    blk = np.zeros(64, dtype=np.int32)
    eobrun = _ac_first(r, blk, 1, 63, 0, 0, lut)
    assert eobrun == 6 and not blk.any()
    # the next 6 blocks are skipped without reading any bits
    p_before = (r.pos, r.n)
    for i in range(6):
        eobrun = _ac_first(r, blk, 1, 63, 0, eobrun, lut)
        assert eobrun == 5 - i
    assert (r.pos, r.n) == p_before and not blk.any()


def test_eobrun_refine_reads_correction_bits():
    """In a refinement scan an EOB run still carries correction bits
    for history-nonzero coefficients of every covered block."""
    lut = {(1, 0b0): 0x10}  # EOBn r=1 → eobrun = 2 + extra
    # stream bits: EOB code '0', 1 extra bit '1' → eobrun = 2+1 = 3;
    # then correction bits for the current block's nonzero coefs: 1, 0
    r = _BitReader(bytes([0b01101111]), 0)
    blk = np.zeros(64, dtype=np.int32)
    blk[2] = 4   # gets correction bit 1 → +1 at bit 0
    blk[5] = -4  # gets correction bit 0 → unchanged
    eobrun = _ac_refine(r, blk, 1, 63, 0, 0, lut)
    assert eobrun == 2
    assert blk[2] == 5 and blk[5] == -4
    # next covered block: correction-bits only, no huffman decode
    blk2 = np.zeros(64, dtype=np.int32)
    blk2[7] = -2
    eobrun = _ac_refine(r, blk2, 1, 63, 0, eobrun, lut)
    assert eobrun == 1 and blk2[7] == -3  # read bit 1 → grew negative


def test_progressive_mutation_fuzz_fails_cleanly():
    """Corrupted progressive JPEGs must decode or raise cleanly —
    same contract as the baseline mutation fuzz."""
    import random
    import struct as _struct
    import time

    rng = random.Random(13)
    payloads = [
        encode_jpeg_progressive(_gradient(24, 40), quality=90),
        encode_jpeg_progressive(_gradient(17, 19), quality=80,
                                subsampling="4:2:0", restart_interval=2),
    ]
    t0 = time.time()
    outcomes = {"ok": 0, "err": 0}
    for i in range(400):
        data = bytearray(rng.choice(payloads))
        for _ in range(rng.choice((1, 1, 1, 3))):
            data[rng.randrange(2, len(data))] = rng.randrange(256)
        try:
            out = decode_jpeg(bytes(data))
            assert out.dtype == np.uint8
            outcomes["ok"] += 1
        except (ValueError, NotImplementedError, IndexError, KeyError,
                _struct.error):
            outcomes["err"] += 1
    assert outcomes["ok"] + outcomes["err"] == 400
    assert outcomes["err"] > 40, outcomes
    assert time.time() - t0 < 120, "mutation decode too slow — lurking loop?"


def test_progressive_property_random_images():
    """Property: progressive decode equals baseline decode of the same
    quantized coefficients for arbitrary images/shapes/settings."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(8, 40), w=st.integers(8, 40),
        seed=st.integers(0, 2**31 - 1),
        sub=st.sampled_from(["4:4:4", "4:2:0"]),
        spectral=st.booleans(),
        rst=st.sampled_from([0, 0, 3]),
    )
    def check(h, w, seed, sub, spectral, rst):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        prog = decode_jpeg(encode_jpeg_progressive(
            img, quality=85, subsampling=sub, spectral_only=spectral,
            restart_interval=rst))
        base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        assert np.array_equal(prog, base)

    check()


# ------------------------------------------------------------ 12-bit (r11)

def test_12bit_roundtrip_more_accurate_than_8bit():
    """Extended-sequential 12-bit (SOF1) and progressive 12-bit (SOF2)
    round-trip through the real decoder; with the same Annex-K-scaled
    quant tables the 4 extra sample bits make 12-bit strictly at least
    as accurate as 8-bit at every quality."""
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:24, 0:40]
    smooth = np.stack(
        [(yy * 3 + xx * 2) % 256, (yy * 5) % 256, (xx * 7) % 256],
        -1).astype(np.uint8)
    hard = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (17, 23)).astype(np.uint8)
    for img in (smooth, hard, gray):
        for q in (100, 90, 50):
            e8 = int(np.abs(decode_jpeg(encode_jpeg(img, quality=q))
                            .astype(int) - img).max())
            e12 = int(np.abs(
                decode_jpeg(encode_jpeg(img, quality=q, precision=12))
                .astype(int) - img).max())
            assert e12 <= max(e8, 1), (q, e8, e12)
    # progressive, subsampled, restart-marked variants all decode
    assert np.abs(decode_jpeg(encode_jpeg_progressive(
        smooth, quality=100, precision=12)).astype(int) - smooth).max() <= 2
    d = decode_jpeg(encode_jpeg(smooth, quality=95, precision=12,
                                subsampling="4:2:0", restart_interval=2))
    assert d.shape == smooth.shape


def test_12bit_wire_structure_and_sof0_refusal():
    """12-bit streams carry SOF1 (extended sequential) with precision
    byte 12 and full-range Huffman tables; the same stream relabeled
    SOF0 violates T.81 B.2.2 (baseline is 8-bit only) and routes to
    the seam."""
    img = np.full((8, 8), 77, np.uint8)
    data = encode_jpeg(img, precision=12)
    i = data.find(b"\xff\xc1")
    assert i > 0 and data[i + 4] == 12  # SOF1 present, precision byte
    assert data.find(b"\xff\xc0") == -1
    bad = bytearray(data)
    bad[i + 1] = 0xC0
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(bad))


def test_12bit_full_category_range_roundtrips():
    """Extremal blocks exercise DC categories up to 15 and large AC
    sizes that the Annex-K tables cannot express: alternating all-0 /
    all-255 blocks at quality 100 produce maximal DC swings."""
    img = np.zeros((8, 64), np.uint8)
    img[:, 8:16] = 255
    img[:, 24:32] = 255
    img[:, 40:48] = 255
    got = decode_jpeg(encode_jpeg(img, quality=100, precision=12))
    assert np.abs(got.astype(int) - img).max() <= 1


def test_12bit_mutation_fuzz_fails_cleanly():
    import random
    import struct
    import time

    rng0 = np.random.default_rng(83)
    img = rng0.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    payloads = [
        encode_jpeg(img, precision=12),
        encode_jpeg(img, precision=12, subsampling="4:2:0"),
        encode_jpeg_progressive(img, precision=12),
    ]
    rng = random.Random(89)
    t0 = time.time()
    outcomes = {"ok": 0, "err": 0}
    for _ in range(300):
        data = bytearray(rng.choice(payloads))
        for _m in range(rng.choice((1, 1, 3))):
            data[rng.randrange(2, len(data))] = rng.randrange(256)
        try:
            out = decode_jpeg(bytes(data))
            assert out.dtype == np.uint8
            outcomes["ok"] += 1
        except (ValueError, NotImplementedError, IndexError, KeyError,
                struct.error):
            outcomes["err"] += 1
    assert outcomes["ok"] + outcomes["err"] == 300
    assert outcomes["err"] > 30, outcomes
    assert time.time() - t0 < 90


def test_12bit_progressive_property_matches_sequential():
    """Property (the 12-bit analogue of the 8-bit progressive
    property): progressive and extended-sequential 12-bit decode of
    the same quantized coefficients are bit-identical."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        h=st.integers(8, 32), w=st.integers(8, 32),
        seed=st.integers(0, 2**31 - 1),
        sub=st.sampled_from(["4:4:4", "4:2:0"]),
        gray=st.booleans(),
    )
    def check(h, w, seed, sub, gray):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w) if gray else (h, w, 3)).astype(
            np.uint8)
        prog = decode_jpeg(encode_jpeg_progressive(
            img, quality=85, subsampling=sub, precision=12))
        base = decode_jpeg(encode_jpeg(
            img, quality=85, subsampling=sub, precision=12))
        assert np.array_equal(prog, base)

    check()


def test_avi1_dhtless_stream_uses_default_tables():
    """OpenDML MJPG ('AVI1') abbreviated JPEG omits DHT segments and
    requires decoders to supply the Annex-K typical tables; a stream
    with every DHT stripped must decode identically to the full one.
    Progressive stays strict (missing table = error)."""
    import struct

    yy, xx = np.mgrid[0:16, 0:24]
    img = np.stack([(yy * 3 + xx * 2) % 256, (yy * 5) % 256,
                    (xx * 7) % 256], -1).astype(np.uint8)
    for kw in ({}, {"subsampling": "4:2:0"}, {"restart_interval": 2}):
        full = encode_jpeg(img, quality=90, **kw)
        pos, out = 2, bytearray(b"\xff\xd8")
        while pos < len(full):
            m = full[pos + 1]
            if m == 0xDA:
                out += full[pos:]
                break
            (ln,) = struct.unpack_from(">H", full, pos + 2)
            if m != 0xC4:
                out += full[pos: pos + 2 + ln]
            pos += 2 + ln
        assert np.array_equal(decode_jpeg(bytes(out)), decode_jpeg(full)), kw

    prog = encode_jpeg_progressive(img, quality=90)
    pos, out = 2, bytearray(b"\xff\xd8")
    while pos < len(prog):
        m = prog[pos + 1]
        if m == 0xDA:
            out += prog[pos:]  # keep from first SOS on (DHTs between
            break              # scans survive; the first scan lacks its)
        (ln,) = struct.unpack_from(">H", prog, pos + 2)
        if m != 0xC4:
            out += prog[pos: pos + 2 + ln]
        pos += 2 + ln
    with pytest.raises(ValueError, match="huffman"):
        decode_jpeg(bytes(out))

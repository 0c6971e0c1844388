"""Lossless JPEG tests (operators/jpeg_lossless.py — SOF3).

The load-bearing property is BIT-EXACT round-trip for every predictor,
shape and precision — lossless has no tolerance anywhere.  No PIL
golden here: Pillow does not implement SOF3 (it needs libjpeg-turbo's
lossless fork or dcraw-family tools), which is exactly why a native
path matters for DNG/DICOM-bearing corpora.
"""

from __future__ import annotations

import numpy as np
import pytest

from swiftlake_spark.operators.jpeg import decode_jpeg, encode_jpeg
from swiftlake_spark.operators.jpeg_lossless import encode_jpeg_lossless
from swiftlake_spark.operators.multimodal import decode_image_bytes


@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_roundtrip_all_predictors(predictor):
    rng = np.random.default_rng(predictor)
    for shape in ((1, 1), (1, 9), (7, 1), (16, 16), (13, 21, 3)):
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_lossless(arr, predictor=predictor)),
            arr)


def test_16bit_precision_path():
    rng = np.random.default_rng(20)
    arr = rng.integers(0, 256, (11, 17), dtype=np.uint8)
    enc = encode_jpeg_lossless(arr, predictor=7, precision=16)
    assert np.array_equal(decode_jpeg(enc), arr)


def test_extreme_diffs_hit_category_16():
    # alternating 0/255 with predictor 1 in 16-bit space drives diffs
    # to ±65 535-range magnitudes; the wrap + category-16 special case
    # must stay exact
    arr = np.zeros((4, 32), dtype=np.uint8)
    arr[:, 1::2] = 255
    for prec in (8, 16):
        enc = encode_jpeg_lossless(arr, predictor=1, precision=prec)
        assert np.array_equal(decode_jpeg(enc), arr)


def test_magic_dispatch():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_image_bytes(encode_jpeg_lossless(arr)), arr)


def test_smaller_than_raw_on_smooth_content():
    yy, xx = np.mgrid[0:64, 0:64]
    img = ((yy * 2 + xx) % 256).astype(np.uint8)
    assert len(encode_jpeg_lossless(img, predictor=4)) < img.size


def test_hypothesis_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        gray=st.booleans(),
        predictor=st.integers(1, 7),
    )
    def prop(seed, h, w, gray, predictor):
        rng = np.random.default_rng(seed)
        shape = (h, w) if gray else (h, w, 3)
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        enc = encode_jpeg_lossless(arr, predictor=predictor)
        assert np.array_equal(decode_jpeg(enc), arr)

    prop()


def test_restart_intervals_stay_on_seam():
    # splice a DRI segment into a lossless stream: restart semantics
    # for mid-row predictor resets are writer-dependent → honest raise
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = bytearray(encode_jpeg_lossless(arr))
    i = data.find(b"\xff\xda")
    data[i:i] = b"\xff\xdd\x00\x04\x00\x02"
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg(bytes(data))


def test_subsampled_components_stay_on_seam():
    # morph the SOF sampling byte 0x11 → 0x22 (2x2): not a layout any
    # lossless writer emits; must raise, not decode garbage
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg_lossless(arr))
    i = data.find(b"\xff\xc3")
    # SOF3 body: len(2) prec(1) h(2) w(2) nc(1), then id/hv/tq triples
    data[i + 2 + 2 + 5 + 1 + 1] = 0x22
    with pytest.raises((NotImplementedError, ValueError)):
        decode_jpeg(bytes(data))


def test_baseline_still_lossy_marker_separation():
    # same pixels through SOF0 vs SOF3: only SOF3 must be bit-exact
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_lossless(arr)), arr)
    lossy = decode_jpeg(encode_jpeg(arr, quality=85))
    assert lossy.shape == arr.shape


def test_mutation_fuzz_contract():
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    base = encode_jpeg_lossless(arr, predictor=4)
    n = 0
    for k in range(300):
        b = bytearray(base)
        mode = k % 3
        if mode == 0:
            b[int(rng.integers(2, len(b)))] ^= 1 << int(rng.integers(0, 8))
        elif mode == 1:
            b = b[: int(rng.integers(4, len(b)))]
        else:
            i = int(rng.integers(len(b) // 2, max(len(b) - 4, len(b) // 2 + 1)))
            b[i: i + 4] = rng.integers(0, 256, 4, np.uint8).tobytes()
        try:
            out = decode_jpeg(bytes(b))
            assert out.dtype == np.uint8
        except (ValueError, NotImplementedError):
            pass
        n += 1
    assert n == 300

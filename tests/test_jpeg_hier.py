"""Hierarchical JPEG tests (operators/jpeg_hier.py + the DHP/EXP/
SOF5/SOF7 paths in operators/jpeg.py).

The load-bearing property is the lossless pyramid: a SOF7 correction
stage codes the exact residual, so decode(encode(x, lossless_final))
is BIT-EXACT for any grayscale image — every stage (EXP interpolation,
differential DCT with PRED=0, reference clamping, lossless diffs) must
be byte-consistent between encoder replica and decoder or the property
breaks somewhere.
"""

from __future__ import annotations

import numpy as np
import pytest

from swiftlake_spark.operators.jpeg import (
    _expand_plane,
    decode_jpeg,
    encode_jpeg,
)
from swiftlake_spark.operators.jpeg_hier import encode_jpeg_hierarchical


class TestLosslessPyramid:
    @pytest.mark.parametrize("arith,progressive", [
        (False, False), (True, False), (False, True), (True, True)])
    @pytest.mark.parametrize("shape", [(16, 24), (15, 9), (33, 47),
                                       (8, 8), (7, 64)])
    def test_gray_bit_exact(self, shape, arith, progressive):
        rng = np.random.default_rng(sum(shape))
        g = rng.integers(0, 256, shape, dtype=np.uint8)
        levels = 3 if min(shape) >= 4 else 1
        data = encode_jpeg_hierarchical(
            g, quality=85, levels=levels, lossless_final=True,
            arith=arith, progressive=progressive)
        if levels > 1:
            marker = {(False, False): b"\xff\xc5",
                      (True, False): b"\xff\xcd",
                      (False, True): b"\xff\xc6",
                      (True, True): b"\xff\xce"}[(arith, progressive)]
            assert marker in data
        # the lossless correction stage follows the entropy layer:
        # SOF7 Huffman / SOF15 arithmetic
        assert (b"\xff\xcf" if arith else b"\xff\xc7") in data
        assert np.array_equal(decode_jpeg(data), g)

    def test_four_process_transparency(self):
        """SOF1/SOF5, SOF9/SOF13, SOF2/SOF6 and SOF10/SOF14 hierarchies
        carry the IDENTICAL quantized coefficients, so all four frame
        processes must decode to the SAME pixels — DCT-only pyramid,
        no lossless tail."""
        rng = np.random.default_rng(13)
        g = (rng.integers(0, 64, (24, 40)) * 4).astype(np.uint8)
        outs = [
            decode_jpeg(encode_jpeg_hierarchical(
                g, quality=92, levels=3, arith=a, progressive=pr))
            for a in (False, True) for pr in (False, True)
        ]
        for o in outs[1:]:
            assert np.array_equal(outs[0], o)

    def test_structure_markers(self):
        g = np.zeros((16, 16), np.uint8)
        data = encode_jpeg_hierarchical(
            g, levels=2, lossless_final=True)
        for marker in (b"\xff\xde", b"\xff\xdf", b"\xff\xc1",
                       b"\xff\xc5", b"\xff\xc7"):
            assert marker in data, marker
        assert data[:3] == b"\xff\xd8\xff"  # dispatchable as JPEG

    def test_rgb_color_rounding_only(self):
        yy, xx = np.mgrid[0:24, 0:40]
        smooth = np.clip(50 + yy * 2 + xx, 0, 255).astype(np.uint8)
        rgb = np.stack([smooth, 255 - smooth, smooth // 2], axis=-1)
        out = decode_jpeg(encode_jpeg_hierarchical(
            rgb, quality=90, levels=2, lossless_final=True))
        # exact in YCbCr space; RGB adds only the color-transform
        # rounding every JPEG process shares
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1

    def test_single_level_is_plain_refinable_frame(self):
        rng = np.random.default_rng(9)
        g = rng.integers(0, 256, (12, 12), dtype=np.uint8)
        data = encode_jpeg_hierarchical(
            g, levels=1, lossless_final=True)
        assert b"\xff\xdf" not in data  # no EXP needed
        assert np.array_equal(decode_jpeg(data), g)


class TestDctPyramid:
    def test_quality_matches_sequential_ballpark(self):
        yy, xx = np.mgrid[0:32, 0:48]
        smooth = np.clip(50 + yy * 2 + xx, 0, 255).astype(np.uint8)
        hier = decode_jpeg(encode_jpeg_hierarchical(
            smooth, quality=95, levels=3))
        seq = decode_jpeg(encode_jpeg(smooth, quality=95))
        for out in (hier, seq):
            assert np.abs(out.astype(int) - smooth.astype(int)).mean() < 1.0

    def test_each_stage_refines(self):
        # more pyramid levels must not make the final output worse than
        # a tolerance band (every stage adds a quantized residual)
        rng = np.random.default_rng(21)
        base = rng.integers(60, 196, (32, 32)).astype(np.float64)
        # low-pass it so the image is representable at q=90
        k = np.ones((4, 4)) / 16.0
        from numpy.lib.stride_tricks import sliding_window_view

        sm = sliding_window_view(np.pad(base, 2, mode="edge"), (4, 4))
        img = np.clip(np.round(
            (sm * k).sum(axis=(2, 3))[:32, :32]), 0, 255).astype(np.uint8)
        for levels in (1, 2, 3):
            out = decode_jpeg(encode_jpeg_hierarchical(
                img, quality=90, levels=levels))
            err = np.abs(out.astype(int) - img.astype(int)).mean()
            assert err < 3.0, (levels, err)


class TestExpansion:
    def test_interpolation_filter_values(self):
        # T.81 J.1.1.2: inserted sample = (a + b + 1) >> 1, tail
        # replicated for odd targets
        p = np.array([[0, 10], [20, 30]], np.uint8)
        out = _expand_plane(p, 4, 4)
        assert out.tolist() == [
            [0, 5, 10, 10],
            [10, 15, 20, 20],
            [20, 25, 30, 30],
            [20, 25, 30, 30],
        ]
        out = _expand_plane(p, 3, 3)  # odd targets drop the tail pair
        assert out.tolist() == [[0, 5, 10], [10, 15, 20], [20, 25, 30]]

    def test_bad_doubling_rejected(self):
        p = np.zeros((4, 4), np.uint8)
        with pytest.raises(ValueError):
            _expand_plane(p, 4, 12)


class TestStructuralErrors:
    def test_differential_sof_outside_hierarchy(self):
        # drop the DHP AND turn the first frame differential: a SOF5
        # with no hierarchical context must be a structural error
        data = bytearray(encode_jpeg_hierarchical(
            np.zeros((16, 16), np.uint8), levels=2))
        j = data.find(b"\xff\xde")
        seg_len = int.from_bytes(data[j + 2: j + 4], "big")
        del data[j: j + 2 + seg_len]
        i = data.find(b"\xff\xc1")
        data[i + 1] = 0xC5
        with pytest.raises(ValueError):
            decode_jpeg(bytes(data))
        # without the DHP but with the frame left non-differential, the
        # first frame decodes as a plain sequential JPEG (small stage)
        data[i + 1] = 0xC1
        out = decode_jpeg(bytes(data))
        assert out.shape == (8, 8)

    def test_exp_without_dhp_rejected(self):
        g = np.zeros((8, 8), np.uint8)
        data = bytearray(encode_jpeg(g))
        # splice an EXP segment right after SOI
        data[2:2] = b"\xff\xdf\x00\x03\x11"
        with pytest.raises(ValueError):
            decode_jpeg(bytes(data))

    def test_relabeled_frames_fail_structurally(self):
        # every T.81 frame process now decodes natively, so a SOF5
        # relabeled to another process must fail that process's OWN
        # structural validation, not slip through:
        g = np.zeros((16, 16), np.uint8)
        data = bytearray(encode_jpeg_hierarchical(g, levels=2))
        i = data.find(b"\xff\xc5")
        # SOF11 (arith lossless, non-differential): sequential-style
        # SOS carries Ss=0, which is an invalid lossless predictor
        data[i + 1] = 0xCB
        with pytest.raises(ValueError):
            decode_jpeg(bytes(data))
        # SOF6 (differential progressive): Ss=0 with Se=63 is an
        # invalid progressive scan script
        data[i + 1] = 0xC6
        with pytest.raises(ValueError):
            decode_jpeg(bytes(data))

    def test_dhp_component_without_frame_rejected(self):
        # a DHP that declares a component no frame ever assigns must be
        # a structural error at EOI, not a silent grayscale decode
        # (ADVICE r12: truncated multi-component hierarchical streams
        # were dropping the missing components)
        g = np.zeros((16, 16), np.uint8)
        data = bytearray(encode_jpeg_hierarchical(g, levels=2))
        j = data.find(b"\xff\xde")
        seg_len = int.from_bytes(data[j + 2: j + 4], "big")
        body = bytearray(data[j + 4: j + 2 + seg_len])
        nf = body[5]
        extra_cid = max(body[6 + 3 * i] for i in range(nf)) + 1
        body[5] = nf + 1
        body += bytes([extra_cid, 0x11, 0x00])
        patched = (
            data[:j + 2]
            + (seg_len + 3).to_bytes(2, "big")
            + body
            + data[j + 2 + seg_len:]
        )
        with pytest.raises(ValueError, match="never assigned"):
            decode_jpeg(bytes(patched))

    def test_levels_validation(self):
        g = np.zeros((8, 8), np.uint8)
        with pytest.raises(ValueError):
            encode_jpeg_hierarchical(g, levels=0)
        with pytest.raises(ValueError):
            encode_jpeg_hierarchical(g, levels=6)  # 8 >> 5 == 0


def test_mutation_fuzz_contract():
    """Bit flips / truncations / byte splats anywhere in a hierarchical
    stream either decode or raise ValueError/NotImplementedError —
    never crash, hang, or mis-shape."""
    rng = np.random.default_rng(77)
    yy, xx = np.mgrid[0:24, 0:24]
    img = np.clip(40 + yy * 3 + xx * 2, 0, 255).astype(np.uint8)
    bases = [
        encode_jpeg_hierarchical(img, quality=90, levels=2),
        encode_jpeg_hierarchical(img, quality=90, levels=3,
                                 lossless_final=True),
        encode_jpeg_hierarchical(img, quality=90, levels=2,
                                 progressive=True),
        encode_jpeg_hierarchical(img, quality=90, levels=2,
                                 arith=True, progressive=True),
    ]
    n = 0
    for base in bases:
        for k in range(80):
            b = bytearray(base)
            mode = k % 3
            if mode == 0:
                b[int(rng.integers(0, len(b)))] ^= \
                    1 << int(rng.integers(0, 8))
            elif mode == 1:
                b = b[: int(rng.integers(4, len(b)))]
            else:
                i = int(rng.integers(0, len(b) - 6))
                b[i: i + 6] = rng.integers(0, 256, 6, np.uint8).tobytes()
            try:
                out = decode_jpeg(bytes(b))
                assert out.dtype == np.uint8
            except (ValueError, NotImplementedError):
                pass
            n += 1
    assert n == 320


def test_decode_image_dispatch():
    """Hierarchical streams enter through the ordinary magic-byte
    dispatch — no special-casing upstream."""
    from swiftlake_spark.operators.multimodal import decode_image_bytes

    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (16, 20), dtype=np.uint8)
    data = encode_jpeg_hierarchical(g, levels=2, lossless_final=True)
    assert np.array_equal(decode_image_bytes(data), g)


def test_sof11_lossless_arithmetic_bit_exact():
    """SOF11 (lossless arithmetic, Annex H.1.1): bit-exact round trips
    across predictors and shapes, gray and RGB.  The 25-context
    conditioning packing is pinned by the encoder/decoder pair (no
    mainstream encoder ever shipped this process — same caveat class
    as the QM INITDEC note)."""
    from swiftlake_spark.operators.jpeg_arith import (
        encode_jpeg_lossless_arith,
    )

    rng = np.random.default_rng(19)
    for shape in [(13, 21), (8, 8), (31, 7)]:
        for predictor in (1, 2, 4, 7):
            g = rng.integers(0, 256, shape, dtype=np.uint8)
            data = encode_jpeg_lossless_arith(g, predictor=predictor)
            assert data[3] == 0xCC or b"\xff\xcb" in data
            assert np.array_equal(decode_jpeg(data), g)
    rgb = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_lossless_arith(rgb)), rgb)


def test_sof11_mutation_fuzz():
    from swiftlake_spark.operators.jpeg_arith import (
        encode_jpeg_lossless_arith,
    )

    rng = np.random.default_rng(23)
    g = rng.integers(0, 256, (12, 18), dtype=np.uint8)
    base = encode_jpeg_lossless_arith(g)
    n = 0
    for k in range(200):
        b = bytearray(base)
        if k % 2:
            b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
        else:
            b = b[: int(rng.integers(4, len(b)))]
        try:
            out = decode_jpeg(bytes(b))
            assert out.dtype == np.uint8
        except (ValueError, NotImplementedError):
            pass
        n += 1
    assert n == 200

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


def test_progressive_marker_routes_to_seam():
    """SOF2 (progressive) must raise NotImplementedError from the stdlib
    path — decode_image_bytes then falls through to the PIL seam."""
    data = bytearray(encode_jpeg(_gradient(8, 8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
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

"""CCITT fax codec tests (operators/fax.py + TIFF compressions 2/3/4).

Strategy mirrors the other codec suites (SURVEY.md §5): hand-assembled
bitstream fixtures pin the T.4 Huffman tables and the 2-D mode codes
against the public spec (a transcription typo cannot hide behind a
self-round-trip), a round-trip matrix covers every compression/option/
layout combination, mutation fuzz proves decode never escapes with a
non-contract exception, and a PIL-gated golden cross-checks against
libtiff where the environment has it.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from swiftlake_spark.operators.fax import (
    _BitReader,
    _BitWriter,
    _read_run,
    _WHITE_DEC,
    _BLACK_DEC,
    fax_decode,
    fax_encode,
)
from swiftlake_spark.operators.multimodal import (
    decode_image_bytes,
    decode_tiff,
    encode_tiff,
)


def _bits(s: str) -> bytes:
    s = s.replace(" ", "")
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


# ------------------------------------------------------- spec fixtures


class TestSpecFixtures:
    """Hand-assembled streams from the T.4/T.6 published tables."""

    def test_white_run_8(self):
        # MH: white 8 = 10011, row byte-aligned
        assert fax_encode(np.zeros((1, 8), bool), 2) == _bits("10011")

    def test_black_after_zero_white(self):
        # row starts black: white 0 (00110101) then black 2 (11)
        assert fax_encode(np.ones((1, 2), bool), 2) == _bits(
            "00110101 11")

    def test_makeup_64(self):
        # white 64 = makeup 64 (11011) + term 0 (00110101)
        assert fax_encode(np.zeros((1, 64), bool), 2) == _bits(
            "11011 00110101")

    def test_extended_makeup_chain(self):
        # white 3000 = ext-makeup 2560 + makeup 384 + term 56
        assert fax_encode(np.zeros((1, 3000), bool), 2) == _bits(
            "000000011111 00110111 01011001")

    def test_black_makeup(self):
        # black 128: white 0 + black makeup 128 (000011001000) + term 0
        row = np.ones((1, 128), bool)
        assert fax_encode(row, 2) == _bits(
            "00110101 000011001000 0000110111")

    def test_g4_modes_bitstream(self):
        # width 8, two identical rows of white4+black4:
        # row0 vs imaginary white ref: H (001) + white 4 (1011) +
        # black 4 (011); row1 vs row0: V0 (1) at x=4, V0 at x=8;
        # then EOFB = EOL EOL.
        img = np.zeros((2, 8), bool)
        img[:, 4:] = True
        assert fax_encode(img, 4) == _bits(
            "001 1011 011 1 1 000000000001 000000000001")

    def test_g3_eol_and_tags(self):
        # 1-D G3: EOL before every row
        img = np.zeros((2, 8), bool)
        enc = fax_encode(img, 3, two_d=False)
        assert enc == _bits("000000000001 10011 000000000001 10011")
        # 2-D G3: EOL+1 (first row 1-D), EOL+0 (2-D row, all-white = V0)
        enc2 = fax_encode(img, 3, two_d=True)
        assert enc2 == _bits("000000000001 1 10011 000000000001 0 1")

    def test_g3_fill_bits_byte_align(self):
        # T4Options bit 2: every EOL(+tag) ends on a byte boundary
        img = np.zeros((3, 13), bool)
        img[1, 2:7] = True
        enc = fax_encode(img, 3, two_d=True, fill=True)
        dec = fax_decode(enc, 13, 3, 3, two_d=True)
        assert (dec == img).all()
        # first row payload starts at a byte edge (EOL+tag = 13 bits
        # → 3 fill bits pad to 16)
        assert enc[:2] == _bits("000 000000000001 1")[:2]

    def test_run_decoder_chains_makeups(self):
        r = _BitReader(_bits("000000011111 00110111 01011001"))
        assert _read_run(r, _WHITE_DEC) == 3000
        r = _BitReader(_bits("00110101"))
        assert _read_run(r, _WHITE_DEC) == 0
        r = _BitReader(_bits("0000110111"))
        assert _read_run(r, _BLACK_DEC) == 0

    def test_bitwriter_reader_symmetry(self):
        w = _BitWriter()
        for ln, code in ((1, 1), (3, 0b010), (12, 0b000000000001),
                         (7, 0b0000011)):
            w.put(ln, code)
        data = w.done()
        r = _BitReader(data)
        got = [r.get1() for _ in range(23)]
        exp = [int(c) for c in "1" "010" "000000000001" "0000011"]
        assert got == exp


# ---------------------------------------------------------- round-trip


def _shapes(rng):
    yield np.zeros((1, 1), bool)
    yield np.ones((1, 1), bool)
    yield np.zeros((5, 2700), bool)  # extended-makeup widths
    a = np.zeros((4, 2700), bool)
    a[:, 1300:] = True
    yield a
    for _ in range(12):
        h = int(rng.integers(1, 30))
        w = int(rng.integers(1, 90))
        yield rng.random((h, w)) < rng.random()
    # document-like blocks (pass/vertical mode heavy)
    blk = rng.random((6, 12)) < 0.4
    yield np.kron(blk, np.ones((4, 7), bool))


@pytest.mark.parametrize("comp,two_d,fill", [
    (2, True, False),
    (3, False, False),
    (3, True, False),
    (3, True, True),
    (3, False, True),
    (4, True, False),
])
def test_roundtrip_matrix(comp, two_d, fill):
    rng = np.random.default_rng(comp * 100 + two_d * 10 + fill)
    for black in _shapes(rng):
        enc = fax_encode(black, comp, two_d=two_d, fill=fill)
        dec = fax_decode(enc, black.shape[1], black.shape[0], comp,
                         two_d=two_d)
        assert (dec == black).all()


def test_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=60, deadline=None)
    @given(
        black=arrays(bool, st.tuples(st.integers(1, 12),
                                     st.integers(1, 48))),
        comp=st.sampled_from([2, 3, 4]),
        two_d=st.booleans(),
    )
    def prop(black, comp, two_d):
        enc = fax_encode(black, comp, two_d=two_d)
        dec = fax_decode(enc, black.shape[1], black.shape[0], comp,
                         two_d=two_d)
        assert (dec == black).all()

    prop()


# ----------------------------------------------------- TIFF integration


class TestTiffFax:
    def _doc(self, seed=7, h=21, w=45):
        rng = np.random.default_rng(seed)
        blk = rng.random((max(1, h // 3), max(1, w // 5))) < 0.35
        black = np.kron(blk, np.ones((3, 5), bool))[:h, :w]
        pad_h, pad_w = h - black.shape[0], w - black.shape[1]
        black = np.pad(black, ((0, pad_h), (0, pad_w)))
        return np.where(black, 0, 255).astype(np.uint8)

    @pytest.mark.parametrize("kw", [
        dict(ccitt=2),
        dict(ccitt=3),
        dict(ccitt=3, t4_2d=False),
        dict(ccitt=3, t4_fill=True),
        dict(ccitt=4),
    ])
    @pytest.mark.parametrize("be", [False, True])
    @pytest.mark.parametrize("rps", [None, 4])
    def test_roundtrip(self, kw, be, rps):
        arr = self._doc()
        t = encode_tiff(arr, big_endian=be, rows_per_strip=rps, **kw)
        out = decode_tiff(t)
        assert (out == arr).all()
        # and through the magic-byte dispatch
        assert (decode_image_bytes(t) == arr).all()

    def test_photometric_1_inverts(self):
        # hand-flip the photometric tag to BlackIsZero: decoded gray
        # must invert (the fax "white" follows the photometric white)
        arr = self._doc(seed=3)
        t = bytearray(encode_tiff(arr, ccitt=4))
        # find tag 262 in the IFD (II layout from encode_tiff default)
        import struct

        (ifd,) = struct.unpack_from("<I", t, 4)
        (n,) = struct.unpack_from("<H", t, ifd)
        for k in range(n):
            off = ifd + 2 + k * 12
            tag, typ, cnt = struct.unpack_from("<HHI", t, off)
            if tag == 262:
                assert struct.unpack_from("<H", t, off + 8)[0] == 0
                struct.pack_into("<H", t, off + 8, 1)
                break
        else:
            pytest.fail("photometric tag missing")
        out = decode_tiff(bytes(t))
        assert (out == 255 - arr).all()

    def test_g4_all_white_and_all_black_pages(self):
        for v in (0, 255):
            arr = np.full((9, 33), v, dtype=np.uint8)
            for comp in (2, 3, 4):
                t = encode_tiff(arr, ccitt=comp)
                assert (decode_tiff(t) == arr).all()

    def test_counts_respected_multi_strip(self):
        # G4 strips are independent coding blocks; a wrong strip-length
        # read would corrupt rows at strip boundaries
        arr = self._doc(seed=11, h=24, w=63)
        t = encode_tiff(arr, ccitt=4, rows_per_strip=5)
        assert (decode_tiff(t) == arr).all()

    def test_rejects_non_bilevel_combinations(self):
        arr = self._doc()
        with pytest.raises(ValueError):
            encode_tiff(np.dstack([arr] * 3), ccitt=4)
        with pytest.raises(ValueError):
            encode_tiff(arr, ccitt=4, tile=(8, 8))
        with pytest.raises(ValueError):
            encode_tiff(arr, ccitt=5)
        with pytest.raises(ValueError):
            encode_tiff(arr, ccitt=4, lzw=True)


# --------------------------------------------------------- mutation fuzz


def test_mutation_fuzz_never_escapes_contract():
    """Bit-flipped / truncated fax TIFFs must either decode or raise
    ValueError/NotImplementedError — never IndexError/struct.error/
    infinite loop (same contract as the other codecs' fuzz suites)."""
    rng = np.random.default_rng(42)
    arr = np.where(
        np.kron(rng.random((7, 9)) < 0.4, np.ones((3, 5), bool)),
        0, 255).astype(np.uint8)
    payloads = [
        encode_tiff(arr, ccitt=2),
        encode_tiff(arr, ccitt=3),
        encode_tiff(arr, ccitt=3, t4_2d=False),
        encode_tiff(arr, ccitt=4),
        encode_tiff(arr, ccitt=4, rows_per_strip=4),
    ]
    n_mut = 0
    for base in payloads:
        for k in range(120):
            b = bytearray(base)
            mode = k % 3
            if mode == 0:  # flip a random bit
                i = int(rng.integers(0, len(b)))
                b[i] ^= 1 << int(rng.integers(0, 8))
            elif mode == 1:  # truncate
                b = b[: int(rng.integers(8, len(b)))]
            else:  # splice garbage into the strip area
                i = int(rng.integers(len(b) // 2, len(b)))
                b[i: i + 4] = rng.integers(0, 256, 4, dtype=np.uint8
                                           ).tobytes()
            n_mut += 1
            try:
                out = decode_tiff(bytes(b))
                assert out.dtype == np.uint8
            except (ValueError, NotImplementedError):
                pass
    assert n_mut == 600


# ------------------------------------------------------ optional golden


@pytest.mark.skipif(
    not os.environ.get("SWIFTLAKE_PIL_GOLDEN"),
    reason="PIL golden cross-check (set SWIFTLAKE_PIL_GOLDEN=1 with "
           "pillow+libtiff installed)",
)
def test_pil_golden_cross_check():
    from PIL import Image  # noqa: PLC0415

    import io

    rng = np.random.default_rng(5)
    black = np.kron(rng.random((8, 10)) < 0.4, np.ones((3, 5), bool))
    arr = np.where(black, 0, 255).astype(np.uint8)
    for comp in (2, 3, 4):
        t = encode_tiff(arr, ccitt=comp)
        via_pil = np.asarray(Image.open(io.BytesIO(t)).convert("L"))
        assert (via_pil == arr).all()

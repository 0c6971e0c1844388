"""PDF text-extraction tests (operators/pdftext.py).

Round-trips run through encode_pdf (raw/Flate/ASCII85); structural
robustness is covered by xref-free extraction (object scan), damaged
tails, and mutation fuzz; filter internals (ASCII85, RunLength, PNG
predictors) get direct unit vectors so a filter bug cannot hide
behind the encoder only emitting the happy path.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from swiftlake_spark.operators.pdftext import (
    _apply_filters,
    _ascii85,
    _Name,
    _png_predictor_undo,
    _runlength,
    encode_pdf,
    extract_pdf_text,
    extract_pdf_text_bytes,
)


class TestRoundtrip:
    PAGES = ["Hello world\nSecond line with (parens) and \\ slash",
             "Page two: äöü latin-1 text\nmore"]

    @pytest.mark.parametrize("kw", [{}, {"compress": True},
                                    {"ascii85": True}])
    def test_pages_and_lines(self, kw):
        got = extract_pdf_text_bytes(
            encode_pdf(self.PAGES, **kw)).split("\f")
        assert got == self.PAGES

    def test_empty_lines_survive(self):
        assert extract_pdf_text_bytes(
            encode_pdf(["one\n\nthree"])) == "one\n\nthree"

    def test_many_pages(self):
        pages = [f"page {i}" for i in range(25)]
        got = extract_pdf_text_bytes(encode_pdf(pages)).split("\f")
        assert got == pages


class TestContentLayer:
    def _wrap(self, content: bytes) -> bytes:
        data = bytearray(encode_pdf(["placeholder"]))
        # swap in a custom content stream (uncompressed fixture)
        old = b"BT /F1 12 Tf 72 720 Td (placeholder) Tj ET"
        i = data.find(old)
        assert i > 0
        new = content
        data[i: i + len(old)] = new
        # patch the /Length of object 4
        j = data.find(b"/Length ")
        k = data.find(b" >>", j)
        data[j + 8: k] = str(len(new)).encode()
        return bytes(data)

    def test_tj_array_kerning_spaces(self):
        # TJ with a large negative kern → word break; small → none
        c = b"BT [(Hel) -40 (lo) -300 (world)] TJ ET"
        assert extract_pdf_text_bytes(self._wrap(c)) == "Hello world"

    def test_quote_operators_break_lines(self):
        c = b"BT (a) Tj (b) ' (c) \" ET"
        # " takes word/char spacing operands in real streams; the
        # interpreter only needs the line-break + show semantics
        assert extract_pdf_text_bytes(self._wrap(c)) == "a\nb\nc"

    def test_hex_string_and_utf16(self):
        c = b"BT <48656C6C6F> Tj ET"
        assert extract_pdf_text_bytes(self._wrap(c)) == "Hello"
        c = b"BT <FEFF00480069> Tj ET"
        assert extract_pdf_text_bytes(self._wrap(c)) == "Hi"

    def test_octal_escapes(self):
        c = rb"BT (\101\102\103) Tj ET"
        assert extract_pdf_text_bytes(self._wrap(c)) == "ABC"

    def test_tm_breaks_line(self):
        c = b"BT (x) Tj 1 0 0 1 72 700 Tm (y) Tj ET"
        assert extract_pdf_text_bytes(self._wrap(c)) == "x\ny"

    def test_text_outside_bt_ignored(self):
        c = b"(stray) Tj BT (kept) Tj ET"
        assert extract_pdf_text_bytes(self._wrap(c)) == "kept"


class TestStructure:
    def test_xref_free_extraction(self):
        # kill the xref table and trailer entirely: the object scan
        # must still find the pages (the most common real damage)
        data = encode_pdf(["resilient"])
        cut = data.find(b"xref")
        assert extract_pdf_text_bytes(data[:cut]) == "resilient"

    def test_damaged_length_falls_back_to_endstream_scan(self):
        data = bytearray(encode_pdf(["lengthfix"]))
        j = data.find(b"/Length ")
        k = data.find(b" >>", j)
        data[j + 8: k] = b"999999"
        assert extract_pdf_text_bytes(bytes(data)) == "lengthfix"

    def test_not_pdf_raises(self):
        with pytest.raises(ValueError):
            extract_pdf_text_bytes(b"%PNG not a pdf")
        with pytest.raises(ValueError):
            extract_pdf_text_bytes(b"%PDF-1.4\nno objects here")


class TestFilters:
    def test_ascii85_vectors(self):
        # 'Man ' is the canonical example: base-85 of 0x4D616E20
        assert _ascii85(b"9jqo^~>") == b"Man "
        assert _ascii85(b"z~>") == b"\x00\x00\x00\x00"
        with pytest.raises(ValueError):
            _ascii85(b"\xff\xff\xff\xff\xff~>")

    def test_runlength_vectors(self):
        assert _runlength(bytes([2]) + b"abc" + bytes([254, 0x78, 128])) \
            == b"abc" + b"x" * 3
        with pytest.raises(ValueError):
            _runlength(bytes([10]) + b"ab")

    def test_png_predictor_up(self):
        # two rows, predictor Up (2): second row adds the first
        raw = bytes([2, 1, 2, 3]) + bytes([2, 1, 1, 1])
        out = _png_predictor_undo(raw, 1, 8, 3)
        assert out == bytes([1, 2, 3, 2, 3, 4])

    def test_flate_with_predictor_roundtrip(self):
        rng = np.random.default_rng(3)
        rows = rng.integers(0, 256, (6, 10), dtype=np.uint8)
        # encode with PNG Up filter
        enc = bytearray()
        prev = np.zeros(10, np.uint8)
        for r in rows:
            enc.append(2)
            enc += ((r.astype(int) - prev.astype(int)) % 256
                    ).astype(np.uint8).tobytes()
            prev = r
        data = _apply_filters(
            zlib.compress(bytes(enc)), _Name("FlateDecode"),
            {"Predictor": 12, "Columns": 10})
        assert data == rows.tobytes()

    def test_image_filter_rejected(self):
        with pytest.raises(NotImplementedError):
            _apply_filters(b"x", _Name("DCTDecode"), None)


def test_spark_operator(spark):
    pages = [(i, bytearray(encode_pdf(
        [f"doc {i} page one\nline two", f"doc {i} page two"],
        compress=bool(i % 2)))) for i in range(6)]
    df = spark.createDataFrame(pages, "id bigint, data binary")
    out = {r["id"]: r for r in
           extract_pdf_text(df, "data").collect()}
    for i in range(6):
        assert out[i]["text"] == (f"doc {i} page one\nline two\n\n"
                                  f"doc {i} page two")
        assert out[i]["text_pages"] == 2


def test_mutation_fuzz_contract():
    rng = np.random.default_rng(29)
    bases = [
        encode_pdf(["fuzz target\nwith lines"]),
        encode_pdf(["fuzz"] * 3, compress=True),
        encode_pdf(["a85"], ascii85=True),
    ]
    n = 0
    for base in bases:
        for k in range(120):
            b = bytearray(base)
            mode = k % 3
            if mode == 0:
                b[int(rng.integers(0, len(b)))] ^= \
                    1 << int(rng.integers(0, 8))
            elif mode == 1:
                b = b[: int(rng.integers(10, len(b)))]
            else:
                i = int(rng.integers(0, len(b) - 6))
                b[i: i + 6] = rng.integers(0, 256, 6, np.uint8).tobytes()
            try:
                t = extract_pdf_text_bytes(bytes(b))
                assert isinstance(t, str)
            except (ValueError, NotImplementedError):
                pass
            n += 1
    assert n == 360


class TestPdfImages:
    """PDF embedded-image extraction (session-2 codecs put JPEG,
    CCITT-G4 and raw Flate scans all inside the native floor)."""

    def _fixtures(self):
        rng = np.random.default_rng(51)
        rgb = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        gray = rng.integers(0, 256, (16, 20), dtype=np.uint8)
        black = np.kron(rng.random((5, 8)) < 0.4, np.ones((3, 4), bool))
        return rgb, gray, black

    def test_three_filter_families(self):
        from swiftlake_spark.operators.pdftext import (
            encode_pdf_with_images,
            extract_pdf_images_bytes,
        )

        rgb, gray, black = self._fixtures()
        pdf = encode_pdf_with_images([rgb, gray, black])
        imgs = {i["filter"]: i for i in extract_pdf_images_bytes(pdf)}
        assert set(imgs) == {"DCTDecode", "FlateDecode",
                             "CCITTFaxDecode"}
        assert np.abs(imgs["DCTDecode"]["image"].astype(int)
                      - rgb.astype(int)).mean() < 12  # JPEG lossy
        assert np.array_equal(imgs["FlateDecode"]["image"], gray)
        assert np.array_equal(
            imgs["CCITTFaxDecode"]["image"] == 0, black)
        # text extraction coexists with image extraction
        from swiftlake_spark.operators.pdftext import (
            extract_pdf_text_bytes,
        )

        assert extract_pdf_text_bytes(pdf) == "scan page"

    def test_dct_passthrough_embeds_verbatim(self):
        """r12: a {'dct': bytes} item embeds the caller's JPEG stream
        verbatim, so wrapped-stream features (subsampling, restart
        markers) survive the container — the raw bytes must appear
        unmodified in the PDF and decode to the same pixels."""
        import numpy as np

        from swiftlake_spark.operators.jpeg import decode_jpeg, encode_jpeg
        from swiftlake_spark.operators.pdftext import (
            encode_pdf_with_images,
            extract_pdf_images_bytes,
        )

        rgb, _, _ = self._fixtures()
        jpg = encode_jpeg(rgb, quality=95, subsampling="4:2:0",
                          restart_interval=4)
        pdf = encode_pdf_with_images(
            [{"dct": jpg, "width": rgb.shape[1], "height": rgb.shape[0]}])
        assert jpg in pdf  # byte-verbatim passthrough
        imgs = extract_pdf_images_bytes(pdf)
        assert [im["filter"] for im in imgs] == ["DCTDecode"]
        assert np.array_equal(imgs[0]["image"], decode_jpeg(jpg))

    def test_unsupported_images_skip_not_fail(self):
        from swiftlake_spark.operators.pdftext import (
            encode_pdf_with_images,
            extract_pdf_images_bytes,
        )

        rgb, gray, _ = self._fixtures()
        pdf = bytearray(encode_pdf_with_images([rgb, gray]))
        i = pdf.find(b"/DCTDecode")
        pdf[i: i + 10] = b"/JPXDecode"  # out of floor → skipped
        imgs = extract_pdf_images_bytes(bytes(pdf))
        assert [im["filter"] for im in imgs] == ["FlateDecode"]

    def test_spark_explode_feeds_image_pipeline(self, spark):
        """PDF → images → the EXISTING decode_image operator on the
        re-encoded PNGs (the multimodal pipeline composition)."""
        from swiftlake_spark.operators.multimodal import decode_image
        from swiftlake_spark.operators.pdftext import (
            encode_pdf_with_images,
            extract_pdf_images,
        )

        rgb, gray, black = self._fixtures()
        df = spark.createDataFrame(
            [(0, bytearray(encode_pdf_with_images([rgb, black]))),
             (1, bytearray(encode_pdf_with_images([gray])))],
            "id bigint, data binary")
        exploded = extract_pdf_images(df, "data")
        feats = decode_image(exploded, "png").collect()
        by = {(r["id"], r["image_idx"]): r for r in feats}
        assert len(by) == 3
        assert by[(0, 0)]["src_filter"] == "DCTDecode"
        assert by[(0, 0)]["features"][0] == 32.0  # width
        assert by[(1, 0)]["width"] == 20

    def test_image_mutation_fuzz(self):
        from swiftlake_spark.operators.pdftext import (
            encode_pdf_with_images,
            extract_pdf_images_bytes,
        )

        rng = np.random.default_rng(53)
        rgb, gray, black = self._fixtures()
        base = encode_pdf_with_images([rgb, gray, black])
        for k in range(120):
            b = bytearray(base)
            if k % 2 == 0:
                b[int(rng.integers(0, len(b)))] ^= \
                    1 << int(rng.integers(0, 8))
            else:
                b = b[: int(rng.integers(10, len(b)))]
            try:
                imgs = extract_pdf_images_bytes(bytes(b))
                assert all(im["image"].dtype == np.uint8 for im in imgs)
            except (ValueError, NotImplementedError):
                pass


class TestPdfCcittFramings:
    """PDF CCITTFaxDecode framing matrix (K<0/K=0/K>0, EndOfLine,
    EncodedByteAlign — the PDF defaults differ from raw T.4 streams)
    and per-filter DecodeParms alignment on filter chains."""

    def _mask(self):
        rng = np.random.default_rng(61)
        return np.kron(rng.random((5, 8)) < 0.4, np.ones((3, 4), bool))

    @pytest.mark.parametrize("k,eol,ba", [
        (-1, False, False), (0, False, False), (1, False, False),
        (4, False, False), (0, True, False), (0, False, True),
        (4, True, True),
    ])
    def test_k_eol_align_matrix(self, k, eol, ba):
        from swiftlake_spark.operators.pdftext import (
            encode_pdf_with_images,
            extract_pdf_images_bytes,
        )

        black = self._mask()
        pdf = encode_pdf_with_images([black], ccitt_k=k, ccitt_eol=eol,
                                     ccitt_align=ba)
        imgs = extract_pdf_images_bytes(pdf)
        assert len(imgs) == 1
        assert np.array_equal(imgs[0]["image"] == 0, black)

    def test_flate_ccitt_chain_with_per_filter_parms(self):
        # [FlateDecode, CCITTFaxDecode] with DecodeParms
        # [null, <<K -1 ...>>]: the CCITT dict must reach the CCITT
        # stage, not the Flate stage
        import zlib as _z

        from swiftlake_spark.operators.fax import fax_encode_pdf
        from swiftlake_spark.operators.pdftext import (
            encode_pdf,
            extract_pdf_images_bytes,
        )

        black = self._mask()
        h, w = black.shape
        payload = _z.compress(fax_encode_pdf(black, -1))
        base = encode_pdf(["chain"])
        cut = base.find(b"xref")
        obj = (f"100 0 obj\n<< /Type /XObject /Subtype /Image "
               f"/Filter [/FlateDecode /CCITTFaxDecode] "
               f"/DecodeParms [null << /K -1 /Columns {w} "
               f"/Rows {h} >>] "
               f"/Width {w} /Height {h} /BitsPerComponent 1 "
               f"/ColorSpace /DeviceGray "
               f"/Length {len(payload)} >>\nstream\n").encode() \
            + payload + b"\nendstream\nendobj\n"
        pdf = base[:cut] + obj + base[cut:]
        imgs = extract_pdf_images_bytes(pdf)
        assert len(imgs) == 1
        assert imgs[0]["filter"] == "FlateDecode"
        assert np.array_equal(imgs[0]["image"] == 0, black)

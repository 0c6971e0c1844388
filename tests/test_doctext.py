"""HTML/DOCX extraction + unified document dispatch tests
(operators/doctext.py), including the end-to-end hand-off into the
text-pipeline stages (quality/token stats over extracted text)."""

from __future__ import annotations

import numpy as np
import pytest

from swiftlake_spark.operators.doctext import (
    encode_docx,
    extract_docx_text_bytes,
    extract_document_text,
    extract_document_text_bytes,
    extract_html_text_bytes,
)
from swiftlake_spark.operators.pdftext import encode_pdf


class TestHtml:
    def test_blocks_scripts_entities(self):
        html = (b"<html><head><style>x{}</style><script>bad()</script>"
                b"</head><body><h1>Title &amp; Co</h1>"
                b"<p>One\n two</p><div>A<br>B</div></body></html>")
        t = extract_html_text_bytes(html)
        assert t == "Title & Co\n\nOne two\n\nA\nB"

    def test_pre_preserves_spacing(self):
        t = extract_html_text_bytes(
            b"<pre>def f():\n    pass</pre>")
        assert "    pass" in t

    def test_charset_sniff(self):
        latin = ('<html><head><meta charset="iso-8859-1"></head>'
                 '<body><p>caf\xe9</p></body>').encode("latin-1")
        assert extract_html_text_bytes(latin) == "café"
        utf8 = "<p>héllo</p>".encode("utf-8")
        assert extract_html_text_bytes(utf8) == "héllo"
        # invalid utf-8 without declaration → latin-1 fallback
        assert extract_html_text_bytes(b"<p>caf\xe9</p>") == "café"

    def test_nested_skip_subtrees(self):
        t = extract_html_text_bytes(
            b"<svg><text>hidden</text></svg><p>shown</p>"
            b"<noscript><p>also hidden</p></noscript>")
        assert t == "shown"

    def test_malformed_html_never_raises(self):
        # html.parser is tolerant by design; garbage in, best-effort out
        rng = np.random.default_rng(31)
        for _ in range(50):
            junk = bytes(rng.integers(0, 256, 300, dtype=np.uint8))
            out = extract_html_text_bytes(b"<p>ok</p>" + junk)
            assert isinstance(out, str)


class TestDocx:
    def test_paragraphs_tabs(self):
        d = encode_docx(["Hello\tWorld", "Second & <para>", ""])
        assert extract_docx_text_bytes(d) == \
            "Hello\tWorld\nSecond & <para>\n"

    def test_bad_zip_raises(self):
        with pytest.raises(ValueError):
            extract_docx_text_bytes(b"PK\x03\x04garbage")

    def test_zip_without_document_xml_raises(self):
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("other.xml", "<x/>")
        with pytest.raises(ValueError, match="document.xml"):
            extract_docx_text_bytes(buf.getvalue())


class TestDispatch:
    def test_three_formats(self):
        assert extract_document_text_bytes(
            encode_pdf(["pdf text"])) == ("pdf", "pdf text")
        assert extract_document_text_bytes(
            encode_docx(["docx text"])) == ("docx", "docx text")
        assert extract_document_text_bytes(
            b"<html><body><p>html text</p></body></html>") \
            == ("html", "html text")

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            extract_document_text_bytes(b"\x00\x01plain bytes")


def test_spark_pipeline_handoff(spark):
    """Mixed raw documents → text → the EXISTING text-quality stage:
    the extraction operator's output schema feeds operators/text.py
    unchanged (the real pipeline composition)."""
    from swiftlake_spark.operators.text import text_quality

    rows = [
        (0, bytearray(encode_pdf(["The quick brown fox jumps.\n"
                                  "Over the lazy dog again."]))),
        (1, bytearray(encode_docx(["A docx paragraph with words.",
                                   "And a second one."]))),
        (2, bytearray(b"<html><body><h1>Title</h1><p>Some html "
                      b"body text here.</p></body></html>")),
    ]
    df = spark.createDataFrame(rows, "id bigint, data binary")
    extracted = extract_document_text(df, "data")
    out = {r["id"]: r for r in extracted.collect()}
    assert out[0]["text_format"] == "pdf"
    assert "quick brown fox" in out[0]["text"]
    assert out[1]["text_format"] == "docx"
    assert out[2]["text_format"] == "html"
    assert "Some html body text here." in out[2]["text"]

    stats = {r["id"]: r for r in
             text_quality(extracted, "text").collect()}
    assert stats[0]["n_tokens"] >= 9
    assert all(stats[i]["n_chars_m"] > 10 for i in range(3))
    assert all(stats[i]["quality_score"] > 0 for i in range(3))


def test_mutation_fuzz_contract():
    rng = np.random.default_rng(37)
    bases = [
        encode_docx(["fuzz paragraph one", "two"]),
        b"<html><body><p>fuzz html</p></body></html>",
        encode_pdf(["fuzz pdf"]),
    ]
    n = 0
    for base in bases:
        for k in range(100):
            b = bytearray(base)
            mode = k % 3
            if mode == 0:
                b[int(rng.integers(0, len(b)))] ^= \
                    1 << int(rng.integers(0, 8))
            elif mode == 1:
                b = b[: int(rng.integers(1, len(b)))]
            else:
                i = int(rng.integers(0, max(len(b) - 4, 1)))
                b[i: i + 4] = rng.integers(0, 256, 4, np.uint8).tobytes()
            try:
                fmt, txt = extract_document_text_bytes(bytes(b))
                assert isinstance(txt, str)
            except (ValueError, NotImplementedError):
                pass
            n += 1
    assert n == 300


class TestSubtitlesAndEpub:
    SRT = (b"1\n00:00:01,000 --> 00:00:03,500\nHello there.\n\n"
           b"2\n00:00:04,000 --> 00:00:06,000\n"
           b"<i>Second cue</i>\non two lines.\n")

    def test_srt_cues(self):
        from swiftlake_spark.operators.doctext import (
            extract_subtitles_bytes,
        )

        cues = extract_subtitles_bytes(self.SRT)
        assert cues[0] == {"start_ms": 1000, "end_ms": 3500,
                           "text": "Hello there."}
        assert cues[1]["text"] == "Second cue\non two lines."

    def test_vtt_notes_settings_voices(self):
        from swiftlake_spark.operators.doctext import (
            extract_subtitles_bytes,
        )

        vtt = (b"WEBVTT\n\nNOTE a comment\n\ncue-1\n"
               b"00:01.000 --> 00:02.500 align:start\n"
               b"First <v Bob>voiced</v> line.\n")
        cues = extract_subtitles_bytes(vtt)
        assert cues == [{"start_ms": 1000, "end_ms": 2500,
                         "text": "First voiced line."}]

    def test_bad_timing_raises(self):
        from swiftlake_spark.operators.doctext import (
            extract_subtitles_bytes,
        )

        with pytest.raises(ValueError):
            extract_subtitles_bytes(
                b"1\n00:00:05,000 --> 00:00:01,000\nbackwards\n")
        with pytest.raises(ValueError):
            extract_subtitles_bytes(b"just some text, no cues")

    def test_epub_roundtrip_and_zip_disambiguation(self):
        from swiftlake_spark.operators.doctext import (
            encode_docx,
            encode_epub,
            extract_epub_text_bytes,
        )

        ep = encode_epub(["Chapter one text.\nSecond para.",
                          "Chapter two."])
        t = extract_epub_text_bytes(ep)
        assert "Chapter one text." in t and "Chapter two." in t
        # dispatch separates the two PK-zip families
        assert extract_document_text_bytes(ep)[0] == "epub"
        assert extract_document_text_bytes(
            encode_docx(["still docx"]))[0] == "docx"

    def test_dispatch_srt_vtt(self):
        f, t = extract_document_text_bytes(self.SRT)
        assert f == "srt" and t.startswith("Hello there.")
        f, _t = extract_document_text_bytes(
            b"WEBVTT\n\n00:01.000 --> 00:02.000\nx\n")
        assert f == "vtt"

    def test_fuzz_contract(self):
        from swiftlake_spark.operators.doctext import encode_epub

        rng = np.random.default_rng(43)
        bases = [self.SRT, encode_epub(["fuzz chapter"])]
        for base in bases:
            for k in range(80):
                b = bytearray(base)
                if k % 2 == 0:
                    b[int(rng.integers(0, len(b)))] ^= \
                        1 << int(rng.integers(0, 8))
                else:
                    b = b[: int(rng.integers(1, len(b)))]
                try:
                    fmt, txt = extract_document_text_bytes(bytes(b))
                    assert isinstance(txt, str)
                except (ValueError, NotImplementedError):
                    pass

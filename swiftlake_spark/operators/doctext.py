"""HTML / DOCX text extraction + the unified document-text dispatch.

Web corpora are HTML-dominated and office documents travel as DOCX
(a zip of WordprocessingML), so the text pipeline's entry stage needs
both next to PDF (operators/pdftext.py) — ≙ reference media handling
intent, SURVEY §2: opaque binary columns, transformation in the
pipeline; parsing is stdlib (``html.parser``, ``zipfile``,
``xml.etree``), no new dependencies.

- HTML: tag-aware text extraction — script/style/template/svg/head
  subtrees dropped, block-level elements break lines, character/
  entity references decoded, whitespace normalized (runs of spaces
  collapse, ≤1 blank line), with a charset sniff (meta charset →
  declared encoding, else UTF-8 with Latin-1 fallback);
- DOCX: ZIP → ``word/document.xml`` → namespace-agnostic walk of
  ``w:p`` paragraphs / ``w:t`` runs / ``w:tab`` / ``w:br``;
- EPUB: zip of XHTML content documents, each through the HTML path;
- subtitles: SRT and WebVTT cue parsing (timestamps → ms, inline
  markup stripped) — video-caption corpora are built from these;
- dispatch: ``extract_document_text_bytes`` routes PDF / DOCX / EPUB /
  HTML / SRT / VTT by magic bytes-and-shape, and the Spark operator
  ``extract_document_text`` runs it over Arrow batches
  (``mapInPandas``) — one column of mixed raw documents in, one text
  column out, ready for the quality / lang-ID / dedup stages
  (operators/text.py, dedup.py).
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from html.parser import HTMLParser

# protects <pre> spans from whitespace normalization (private-use
# char; stray occurrences in input get normalized away first)
_PRE_MARK = "\ue000"

# subtree-skip only the tags whose content model makes unclosed tags
# rare (script/style parse as raw text; svg/template nest properly) —
# crawl HTML is full of unclosed <audio>/<iframe>/<object>, and a
# stuck skip-depth would silently eat the rest of the document (their
# inner fallback text is legitimate output anyway).  An unclosed
# <head> is recovered when <body> opens (see handle_starttag).
_SKIP_SUBTREES = {"script", "style", "noscript", "template", "svg",
                  "head"}
_BLOCK_TAGS = {"p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3",
               "h4", "h5", "h6", "tr", "table", "thead", "tbody",
               "section", "article", "header", "footer", "nav",
               "blockquote", "pre", "hr", "dt", "dd", "figcaption",
               "address", "main", "aside", "form", "fieldset"}
_VOID_SKIPLESS = {"br", "hr"}


class _TextHTMLParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0
        self._pre_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag == "body":
            # <body> implies any unclosed <head> is over — without
            # this, a missing </head> would skip the whole document
            self._skip_depth = 0
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
            return
        if tag == "pre":
            self._pre_depth += 1
        if tag in _BLOCK_TAGS:
            self._break()

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "pre":
            self._pre_depth = max(0, self._pre_depth - 1)
        if tag in _BLOCK_TAGS and tag not in _VOID_SKIPLESS:
            self._break()

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._break()

    def _break(self) -> None:
        # inside <pre> a block break (e.g. <br>) must live INSIDE the
        # protected span, or normalization strips it and the adjacent
        # lines fuse
        if self._pre_depth:
            self.parts.append(_PRE_MARK + "\n" + _PRE_MARK)
        else:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._skip_depth:
            return
        data = data.replace(_PRE_MARK, "")
        if self._pre_depth:
            self.parts.append(_PRE_MARK + data + _PRE_MARK)
        else:
            # source newlines are ordinary whitespace in HTML; line
            # structure comes from block tags only
            self.parts.append(re.sub(r"\s+", " ", data))


_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([\w.:-]+)""", re.I)


def _html_to_str(data: bytes | str) -> str:
    if isinstance(data, str):
        return data
    m = _CHARSET_RE.search(data[:4096])
    if m:
        try:
            return data.decode(m.group(1).decode("latin-1"), "replace")
        except LookupError:
            pass
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return data.decode("latin-1")


def extract_html_text_bytes(data: bytes | str) -> str:
    """HTML → visible text (blocks become line breaks, whitespace
    normalized, entities decoded, script/style subtrees dropped)."""
    p = _TextHTMLParser()
    p.feed(_html_to_str(data))
    p.close()
    raw = "".join(p.parts)

    def normalize(seg: str) -> str:
        lines = [ln.strip() for ln in seg.split("\n")]
        out: list[str] = []
        blank = True
        for ln in lines:
            if ln:
                out.append(ln)
                blank = False
            elif not blank:
                out.append("")
                blank = True
        return "\n".join(out)

    # odd chunks are <pre> spans: verbatim, exempt from normalization
    chunks = raw.split(_PRE_MARK)
    pieces = [normalize(c) if i % 2 == 0 else c
              for i, c in enumerate(chunks)]
    return "".join(pieces).strip("\n")


# ----------------------------------------------------------------- DOCX


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def extract_docx_text_bytes(data: bytes, *, _zf=None) -> str:
    """DOCX → text: ``word/document.xml`` paragraphs joined by
    newlines; tabs and explicit breaks preserved."""
    import xml.etree.ElementTree as ET

    try:
        zf = _zf if _zf is not None else zipfile.ZipFile(io.BytesIO(data))
        with zf.open("word/document.xml") as f:
            xml_bytes = f.read(1 << 26)
    except (zipfile.BadZipFile, zlib.error, EOFError) as exc:
        # open-time structure, read-time CRC and deflate failures all
        # mean a corrupt payload
        raise ValueError(f"not a valid DOCX payload: {exc}") from None
    except KeyError:
        raise ValueError("DOCX without word/document.xml") from None
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as exc:
        raise ValueError(f"bad DOCX XML: {exc}") from None
    paras: list[str] = []

    def walk_p(p) -> str:
        parts: list[str] = []
        for el in p.iter():
            t = _local(el.tag)
            if t == "t":
                parts.append(el.text or "")
            elif t == "tab":
                parts.append("\t")
            elif t == "br":
                parts.append("\n")
        return "".join(parts)

    for el in root.iter():
        if _local(el.tag) == "p":
            paras.append(walk_p(el))
    return "\n".join(paras)


def encode_docx(paragraphs: list[str]) -> bytes:
    """paragraph texts → minimal spec-shaped DOCX (for tests)."""
    ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = []
    for p in paragraphs:
        runs = []
        for i, seg in enumerate(p.split("\t")):
            if i:
                runs.append(f'<w:r><w:tab/></w:r>')
            runs.append(
                f'<w:r><w:t xml:space="preserve">{_xml_esc(seg)}'
                f"</w:t></w:r>")
        body.append(f"<w:p>{''.join(runs)}</w:p>")
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{ns}"><w:body>{"".join(body)}'
           f"</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.'
            'openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            "</Types>")
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


def _xml_esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


# -------------------------------------------------------------- dispatch


def extract_document_text_bytes(data: bytes) -> tuple[str, str]:
    """Magic-byte document dispatch → (format, text): PDF via
    operators/pdftext.py, DOCX via the ZIP path, anything that looks
    like markup via the HTML extractor, else raises ValueError (raw
    text columns don't need extraction)."""
    if data[:5] == b"%PDF-":
        from swiftlake_spark.operators.pdftext import (
            extract_pdf_text_bytes,
        )

        return "pdf", extract_pdf_text_bytes(data).replace("\f", "\n\n")
    if data[:4] == b"PK\x03\x04":
        kind, zf = _zip_kind(data)
        if kind == "docx":
            return "docx", extract_docx_text_bytes(data, _zf=zf)
        return "epub", extract_epub_text_bytes(data, _zf=zf)
    head = data[:512].lstrip()
    if head[:3] == b"\xef\xbb\xbf":  # the VTT spec allows a UTF-8 BOM
        head = head[3:].lstrip()
    if head[:6].upper() == b"WEBVTT":
        return "vtt", subtitles_text(data)
    if head[:1] == b"<" or b"<html" in head.lower() \
            or b"<!doctype" in head.lower():
        return "html", extract_html_text_bytes(data)
    if b"-->" in data[:2048]:
        return "srt", subtitles_text(data)
    raise ValueError(
        "unrecognized document payload (not PDF/DOCX/EPUB/HTML/SRT/VTT)")


def extract_document_text(df, data_col: str = "data",
                          out_col: str = "text"):
    """Spark operator: mixed raw documents (PDF/DOCX/HTML) → text +
    detected format, over Arrow batches — the entry stage ahead of
    quality / lang-ID / dedup."""
    import pandas as pd

    from pyspark.sql import types as T

    out_fields = list(df.schema.fields) + [
        T.StructField(out_col, T.StringType()),
        T.StructField(out_col + "_format", T.StringType()),
    ]
    schema = T.StructType(out_fields)

    def run(batches):
        for pdf_batch in batches:
            texts, fmts = [], []
            for b in pdf_batch[data_col]:
                if b is None:
                    texts.append(None)
                    fmts.append(None)
                    continue
                fmt, txt = extract_document_text_bytes(bytes(b))
                texts.append(txt)
                fmts.append(fmt)
            pdf_batch[out_col] = texts
            pdf_batch[out_col + "_format"] = fmts
            yield pdf_batch

    return df.mapInPandas(run, schema)


# ------------------------------------------------------ subtitles/EPUB


_TS_RE = re.compile(
    r"(?:(\d+):)?(\d{1,2}):(\d{2})[.,](\d{3})")


def _ts_ms(m: re.Match) -> int:
    h = int(m.group(1) or 0)
    return ((h * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 \
        + int(m.group(4))


def extract_subtitles_bytes(data: bytes | str) -> list[dict]:
    """SRT / WebVTT → [{start_ms, end_ms, text}] (cue order).

    Both formats are plain text: SRT cues are index + ``HH:MM:SS,mmm
    --> HH:MM:SS,mmm`` + lines; VTT starts with ``WEBVTT`` and uses
    ``.`` for millis, optional cue ids/settings, NOTE/STYLE blocks
    skipped.  Inline tags (``<i>``, voice spans, VTT timestamps) are
    stripped; literal ``<``/``>`` in cue text survive."""
    text = data if isinstance(data, str) else _html_to_str(data)
    # normalize CRLF/CR first: SRT is classically CRLF-encoded, and a
    # stray \r both breaks block splitting and pollutes cue text
    text = text.lstrip("﻿").replace("\r\n", "\n").replace(
        "\r", "\n")
    is_vtt = text.lstrip()[:6].upper() == "WEBVTT"
    if not is_vtt and "-->" not in text:
        raise ValueError("not an SRT/VTT payload")
    cues: list[dict] = []
    for block in re.split(r"\n{2,}", text.strip()):
        lines = block.split("\n")
        if not lines:
            continue
        # find the timing line (first line may be an index / cue id);
        # a block WITHOUT one is a header/comment (WEBVTT, NOTE,
        # STYLE, REGION) — a cue whose id merely starts with those
        # words still carries its --> line and parses normally
        ti = next((i for i, ln in enumerate(lines[:2])
                   if "-->" in ln), None)
        if ti is None:
            continue
        matches = list(_TS_RE.finditer(lines[ti]))
        if len(matches) < 2:
            raise ValueError(f"bad subtitle timing line: {lines[ti]!r}")
        start, end = _ts_ms(matches[0]), _ts_ms(matches[1])
        if end < start:
            raise ValueError("subtitle cue ends before it starts")
        body = "\n".join(lines[ti + 1:]).strip()
        # strip only plausible inline tags (<i>, </v>, <c.yellow>,
        # <00:01.000> VTT timestamps) — a literal '<' in cue text
        # ("i <3 you", "5 < 10") must survive
        body = re.sub(
            r"</?[A-Za-z][^>\n]{0,64}>|<\d{2}:\d{2}[^>\n]{0,16}>",
            "", body)
        cues.append({"start_ms": start, "end_ms": end, "text": body})
    if not cues:
        raise ValueError("no subtitle cues found")
    return cues


def subtitles_text(data: bytes | str) -> str:
    return "\n".join(c["text"] for c in extract_subtitles_bytes(data)
                     if c["text"])


def extract_epub_text_bytes(data: bytes, *, _zf=None) -> str:
    """EPUB (zip of XHTML) → text: every content document extracted
    with the HTML path, archive order (good enough for corpus text —
    exact spine order would need the OPF, which sloppy real-world
    EPUBs often get wrong anyway)."""
    try:
        zf = _zf if _zf is not None else zipfile.ZipFile(io.BytesIO(data))
        names = zf.namelist()
        parts: list[str] = []
        for name in names:
            low = name.lower()
            if low.endswith((".xhtml", ".html", ".htm")):
                with zf.open(name) as f:
                    parts.append(extract_html_text_bytes(
                        f.read(1 << 26)))
    except (zipfile.BadZipFile, zlib.error, EOFError) as exc:
        raise ValueError(f"not a valid EPUB payload: {exc}") from None
    if not parts:
        raise ValueError("EPUB without XHTML content documents")
    return "\n\n".join(p for p in parts if p)


def _zip_kind(data: bytes):
    """Distinguish DOCX from EPUB (both PK zips): EPUB carries an
    ``application/epub+zip`` mimetype member / OEBPS container, DOCX a
    ``word/`` tree.  Returns (kind, open ZipFile) so the extractor
    does not re-parse the central directory."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        names = set(zf.namelist())
    except (zipfile.BadZipFile, EOFError) as exc:
        raise ValueError(f"bad zip container: {exc}") from None
    if "word/document.xml" in names:
        return "docx", zf
    if "mimetype" in names:
        try:
            if b"epub" in zf.read("mimetype")[:64]:
                return "epub", zf
        except (zipfile.BadZipFile, zlib.error, KeyError, EOFError):
            pass
    if "META-INF/container.xml" in names or any(
            n.lower().endswith((".xhtml", ".html")) for n in names):
        return "epub", zf
    raise ValueError("zip payload is neither DOCX nor EPUB")


def encode_epub(chapters: list[str]) -> bytes:
    """chapter texts → minimal spec-shaped EPUB (for tests)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("META-INF/container.xml",
                    '<?xml version="1.0"?><container/>')
        for i, ch in enumerate(chapters):
            paras = "".join(f"<p>{_xml_esc(p)}</p>"
                            for p in ch.split("\n"))
            zf.writestr(
                f"OEBPS/ch{i:03d}.xhtml",
                f"<html><body>{paras}</body></html>")
    return buf.getvalue()

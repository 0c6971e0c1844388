"""PDF text extraction (public ISO 32000 / Adobe PDF 1.7 spec).

Web-scale document corpora are PDF-heavy, and an LLM data pipeline's
text stages (quality, lang-ID, dedup — operators/text.py, dedup.py)
need plain text to start from (≙ reference media handling intent,
SURVEY §2: opaque binary columns, transformation in the pipeline; the
parser is public-spec structure, no reference code involved).  This
module extracts page text stdlib-only:

- object layer: tolerant whole-file ``N G obj`` scan (survives broken
  xref tables, the most common real-world damage), literal/hex
  strings with escapes, names with ``#xx``, arrays, dicts, indirect
  references, streams with /Length resolution;
- filters: FlateDecode (+ PNG predictors 10-15 via the shared
  unfilter logic), ASCIIHexDecode, ASCII85Decode, RunLengthDecode,
  filter arrays; others (DCT/JBIG2/...) only guard image XObjects and
  are never applied to content streams we read;
- document layer: trailer/catalog discovery (scan fallback), /Pages
  tree walk with cycle guard, /Contents ref-or-array concatenation;
- content layer: BT/ET text objects, Tj/TJ/'/" show operators,
  Td/TD/T*/Tm line tracking (newlines from y-movement), TJ kerning
  gaps → spaces, literal/hex string decode (UTF-16BE with BOM, else
  PDFDocEncoding ≈ Latin-1).

Scope note: simple (1-byte) fonts only — composite Identity-H text
without a ToUnicode map is not recoverable without embedded-CMap
processing and surfaces as raw bytes; pipelines should treat
high-non-ASCII-ratio output as a quality signal (operators/text.py
quality scores do exactly that).

``encode_pdf`` writes spec-valid single- or multi-page PDFs (classic
xref, Helvetica, optional Flate compression) for tests and synthesis.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d = self.data
        n = len(d)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def token(self):
        """Next syntactic token: bytes for operators/keywords, or a
        parsed object for numbers/strings/names/arrays/dicts."""
        self._skip_ws()
        d = self.data
        n = len(d)
        if self.pos >= n:
            return None
        c = d[self.pos]
        if c == 0x2F:  # /Name
            return self._name()
        if c == 0x28:  # (literal string
            return self._literal()
        if c == 0x3C:
            if self.pos + 1 < n and d[self.pos + 1] == 0x3C:
                return self._dict()
            return self._hexstring()
        if c == 0x5B:  # [
            return self._array()
        if c == 0x5D:
            self.pos += 1
            return b"]"
        if c == 0x3E and self.pos + 1 < n and d[self.pos + 1] == 0x3E:
            self.pos += 2
            return b">>"
        if (0x30 <= c <= 0x39) or c in b"+-.":
            return self._number()
        # operator / keyword: run of regular characters
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS \
                and d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            raise ValueError(f"bad PDF token at {self.pos}")
        return d[start: self.pos]

    def _number(self):
        m = re.match(rb"[+-]?(\d+\.?\d*|\.\d+)", self.data[self.pos:])
        if not m:
            raise ValueError(f"bad PDF number at {self.pos}")
        s = m.group(0)
        self.pos += len(s)
        return float(s) if b"." in s else int(s)

    def _name(self):
        self.pos += 1
        start = self.pos
        d = self.data
        while self.pos < len(d) and d[self.pos] not in _WS \
                and d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start: self.pos]
        # #xx hex escapes in names
        out = bytearray()
        i = 0
        while i < len(raw):
            if raw[i] == 0x23 and i + 2 < len(raw):
                try:
                    out.append(int(raw[i + 1: i + 3], 16))
                    i += 3
                    continue
                except ValueError:
                    pass
            out.append(raw[i])
            i += 1
        return _Name(out.decode("latin-1"))

    def _literal(self):
        self.pos += 1
        d = self.data
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash escape
                self.pos += 1
                if self.pos >= len(d):
                    break
                e = d[self.pos]
                mapping = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8,
                           0x66: 12, 0x28: 40, 0x29: 41, 0x5C: 92}
                if e in mapping:
                    out.append(mapping[e])
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_s = bytearray()
                    while (len(oct_s) < 3 and self.pos < len(d)
                           and 0x30 <= d[self.pos] <= 0x37):
                        oct_s.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_s, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < len(d) \
                            and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return _Str(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise ValueError("unterminated PDF string")

    def _hexstring(self):
        self.pos += 1
        d = self.data
        digits = bytearray()
        while self.pos < len(d) and d[self.pos] != 0x3E:
            c = d[self.pos]
            if c not in _WS:
                digits.append(c)
            self.pos += 1
        if self.pos >= len(d):
            raise ValueError("unterminated PDF hex string")
        self.pos += 1
        if len(digits) % 2:
            digits.append(0x30)
        try:
            return _Str(bytes.fromhex(digits.decode("latin-1")))
        except ValueError as exc:
            raise ValueError(f"bad PDF hex string: {exc}") from None

    def _array(self):
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.data):
                raise ValueError("unterminated PDF array")
            if self.data[self.pos] == 0x5D:
                self.pos += 1
                return _fold_refs(out)
            out.append(self.token())

    def _dict(self):
        self.pos += 2
        items = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.data):
                raise ValueError("unterminated PDF dictionary")
            if self.data[self.pos: self.pos + 2] == b">>":
                self.pos += 2
                break
            items.append(self.token())
        items = _fold_refs(items)
        if len(items) % 2:
            raise ValueError("odd-length PDF dictionary")
        d = {}
        for k, v in zip(items[::2], items[1::2]):
            if not isinstance(k, _Name):
                raise ValueError("PDF dictionary key is not a name")
            d[k.v] = v
        return d


class _Name:
    __slots__ = ("v",)

    def __init__(self, v: str) -> None:
        self.v = v

    def __eq__(self, other):
        return isinstance(other, _Name) and other.v == self.v

    def __hash__(self):
        return hash(("name", self.v))

    def __repr__(self):
        return f"/{self.v}"


class _Str(bytes):
    """String object (literal/hex) — distinct from operator tokens,
    which stay plain ``bytes``."""

    __slots__ = ()


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num


def _fold_refs(items: list) -> list:
    """Collapse ``num gen R`` triples into _Ref objects."""
    out = []
    i = 0
    while i < len(items):
        if (i + 2 < len(items) and isinstance(items[i], int)
                and isinstance(items[i + 1], int)
                and items[i + 2] == b"R"):
            out.append(_Ref(items[i]))
            i += 3
        else:
            out.append(items[i])
            i += 1
    return out


# ------------------------------------------------------------- filters


def _png_predictor_undo(raw: bytes, colors: int, bpc: int,
                        columns: int) -> bytes:
    """PDF PNG predictors (10-15) delegate to the SAME scanline
    unfilter the PNG codec uses (operators/multimodal._png_unfilter)
    — PDF 7.4.4.4 defines them by reference to the PNG spec, so one
    implementation serves both."""
    from swiftlake_spark.operators.multimodal import _png_unfilter

    bpp = max(1, colors * bpc // 8)
    stride = (columns * colors * bpc + 7) // 8
    nrows = len(raw) // (stride + 1)
    if nrows < 1:
        raise ValueError("predictor stream shorter than one row")
    rows, _next = _png_unfilter(raw, 0, nrows, stride, bpp)
    return rows.tobytes()


def _ascii85(data: bytes) -> bytes:
    body = data.split(b"~>")[0].replace(b"<~", b"")
    body = bytes(c for c in body if c not in _WS)
    out = bytearray()
    i = 0
    while i < len(body):
        if body[i: i + 1] == b"z":
            out += b"\x00\x00\x00\x00"
            i += 1
            continue
        grp = body[i: i + 5]
        pad = 5 - len(grp)
        if pad >= 4:
            raise ValueError("bad ASCII85 group")
        grp = grp + b"u" * pad
        v = 0
        for c in grp:
            if not 0x21 <= c <= 0x75:
                raise ValueError("bad ASCII85 character")
            v = v * 85 + (c - 0x21)
        if v > 0xFFFFFFFF:
            raise ValueError("ASCII85 group overflow")
        out += v.to_bytes(4, "big")[: 4 - pad]
        i += 5
    return bytes(out)


def _runlength(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        ln = data[i]
        if ln == 128:
            break
        if ln < 128:
            chunk = data[i + 1: i + 2 + ln]
            if len(chunk) < ln + 1:
                raise ValueError("truncated RunLength literal")
            out += chunk
            i += 2 + ln
        else:
            if i + 1 >= len(data):
                raise ValueError("truncated RunLength run")
            out += bytes([data[i + 1]]) * (257 - ln)
            i += 2
    return bytes(out)


def _apply_filters(data: bytes, filters, parms) -> bytes:
    if filters is None:
        return data
    if not isinstance(filters, list):
        filters = [filters]
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    for f, pm in zip(filters, parms):
        name = f.v if isinstance(f, _Name) else str(f)
        if name in ("FlateDecode", "Fl"):
            try:
                data = zlib.decompress(data)
            except zlib.error as exc:
                raise ValueError(f"bad Flate stream: {exc}") from None
            if isinstance(pm, dict) and pm.get("Predictor", 1) != 1:
                pred = pm["Predictor"]
                if not 10 <= pred <= 15:
                    raise ValueError(f"unsupported predictor {pred}")
                data = _png_predictor_undo(
                    data, int(pm.get("Colors", 1)),
                    int(pm.get("BitsPerComponent", 8)),
                    int(pm.get("Columns", 1)))
        elif name in ("ASCIIHexDecode", "AHx"):
            digits = data.split(b">")[0]
            digits = bytes(c for c in digits if c not in _WS)
            if len(digits) % 2:
                digits += b"0"
            data = bytes.fromhex(digits.decode("latin-1"))
        elif name in ("ASCII85Decode", "A85"):
            data = _ascii85(data)
        elif name in ("RunLengthDecode", "RL"):
            data = _runlength(data)
        else:
            raise NotImplementedError(
                f"PDF filter {name} (image/crypt filters are out of "
                "the text-extraction floor)")
    return data


# ----------------------------------------------------------- documents


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class _Pdf:
    def __init__(self, data: bytes) -> None:
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF payload")
        self.data = data
        self.objects: dict[int, int] = {}  # obj num → body offset
        for m in _OBJ_RE.finditer(data):
            self.objects[int(m.group(1))] = m.end()
        if not self.objects:
            raise ValueError("PDF without indirect objects")
        self._cache: dict[int, object] = {}
        self._loading: set[int] = set()

    def obj(self, ref):
        if isinstance(ref, _Ref):
            num = ref.num
        else:
            return ref
        if num in self._cache:
            return self._cache[num]
        if num in self._loading:
            # e.g. a stream whose /Length references itself: obj() →
            # resolve() → obj() would recurse unboundedly (the
            # resolve() chain counter restarts per call)
            raise ValueError(f"cyclic PDF object reference {num}")
        off = self.objects.get(num)
        if off is None:
            return None
        self._loading.add(num)
        try:
            return self._load(num, off)
        finally:
            self._loading.discard(num)

    def _load(self, num: int, off: int):
        lex = _Lexer(self.data, off)
        val = lex.token()
        if isinstance(val, list):
            val = _fold_refs(val)
        # stream?
        save = lex.pos
        try:
            nxt = lex.token()
        except ValueError:
            nxt = None
        if nxt == b"stream" and isinstance(val, dict):
            p = lex.pos
            if self.data[p: p + 2] == b"\r\n":
                p += 2
            elif self.data[p: p + 1] in (b"\n", b"\r"):
                p += 1
            try:
                length = self.resolve(val.get("Length"))
            except ValueError:
                length = None  # cyclic/broken → damaged-length path
            if not isinstance(length, int) or length < 0 \
                    or p + length > len(self.data):
                # damaged /Length: scan for endstream
                end = self.data.find(b"endstream", p)
                if end < 0:
                    raise ValueError("unterminated PDF stream")
                length = end - p
            val = _Stream(val, self.data[p: p + length])
        else:
            lex.pos = save
        self._cache[num] = val
        return val

    def resolve(self, v):
        seen = 0
        while isinstance(v, _Ref):
            v = self.obj(v)
            seen += 1
            if seen > 32:
                raise ValueError("PDF reference chain too deep")
        return v


class _Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes) -> None:
        self.d = d
        self.raw = raw


def _decoded(pdf: _Pdf, st: _Stream) -> bytes:
    return _apply_filters(
        st.raw, pdf.resolve(st.d.get("Filter")),
        pdf.resolve(st.d.get("DecodeParms")))


def _find_pages(pdf: _Pdf) -> list[dict]:
    """Catalog → /Pages tree; falls back to scanning for /Type /Page."""
    root = None
    for num in pdf.objects:
        o = pdf.obj(_Ref(num))
        if isinstance(o, dict) and _nv(o.get("Type")) == "Catalog":
            root = o
            break
    pages: list[dict] = []

    def walk(node, depth=0):
        if node is None or depth > 64:
            return
        node = pdf.resolve(node)
        if isinstance(node, _Stream):
            return
        if not isinstance(node, dict):
            return
        t = _nv(node.get("Type"))
        if t == "Page":
            pages.append(node)
        elif t == "Pages" or "Kids" in node:
            kids = pdf.resolve(node.get("Kids")) or []
            for kid in kids:
                walk(kid, depth + 1)

    if root is not None:
        walk(root.get("Pages"))
    if not pages:  # damaged catalog: direct scan
        for num in pdf.objects:
            o = pdf.obj(_Ref(num))
            if isinstance(o, dict) and _nv(o.get("Type")) == "Page":
                pages.append(o)
    return pages


def _nv(x) -> str | None:
    return x.v if isinstance(x, _Name) else None


# ------------------------------------------------------- content layer


def _pdf_text_string(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin-1")


def _extract_content_text(content: bytes) -> str:
    lex = _Lexer(content)
    stack: list = []
    out: list[str] = []
    line: list[str] = []
    in_text = False

    def endline():
        if line:
            out.append("".join(line))
            line.clear()

    while True:
        try:
            tok = lex.token()
        except ValueError:
            break  # damaged tail: keep what we have
        if tok is None:
            break
        if isinstance(tok, bytes) and not isinstance(tok, _Str):
            op = tok
            if op == b"BT":
                in_text = True
            elif op == b"ET":
                in_text = False
                endline()
            elif in_text and op == b"Tj":
                if stack and isinstance(stack[-1], _Str):
                    line.append(_pdf_text_string(stack[-1]))
            elif in_text and op in (b"'", b'"'):
                endline()
                if stack and isinstance(stack[-1], _Str):
                    line.append(_pdf_text_string(stack[-1]))
            elif in_text and op == b"TJ":
                if stack and isinstance(stack[-1], list):
                    for el in stack[-1]:
                        if isinstance(el, _Str):
                            line.append(_pdf_text_string(el))
                        elif isinstance(el, (int, float)) and el < -150:
                            line.append(" ")  # kerning gap → word break
            elif in_text and op in (b"Td", b"TD", b"T*"):
                endline()
            elif in_text and op == b"Tm":
                endline()
            stack.clear()
        else:
            stack.append(tok)
    endline()
    return "\n".join(out)


# --------------------------------------------------------------- public


def extract_pdf_text_bytes(data: bytes, max_pages: int = 1000) -> str:
    """PDF bytes → extracted text (pages joined by form-feed)."""
    if len(data) > (1 << 28):
        raise ValueError("implausible PDF size")
    pdf = _Pdf(data)
    pages = _find_pages(pdf)[:max_pages]
    if not pages:
        raise ValueError("PDF without pages")
    texts = []
    for pg in pages:
        contents = pdf.resolve(pg.get("Contents"))
        if contents is None:
            texts.append("")
            continue
        if not isinstance(contents, list):
            contents = [contents]
        body = b"\n".join(
            _decoded(pdf, c) for c in
            (pdf.resolve(x) for x in contents)
            if isinstance(c, _Stream))
        texts.append(_extract_content_text(body))
    return "\f".join(texts)


def extract_pdf_text(df, data_col: str = "data", out_col: str = "text"):
    """Spark operator: PDF text extraction over Arrow batches
    (``mapInPandas``) — the entry stage of a document pipeline, ahead
    of quality/lang-ID/dedup."""
    import pandas as pd

    from pyspark.sql import types as T

    out_fields = list(df.schema.fields) + [
        T.StructField(out_col, T.StringType()),
        T.StructField(out_col + "_pages", T.IntegerType()),
    ]
    schema = T.StructType(out_fields)

    def run(batches):
        for pdf_batch in batches:
            texts, npages = [], []
            for b in pdf_batch[data_col]:
                if b is None:
                    texts.append(None)
                    npages.append(None)
                    continue
                t = extract_pdf_text_bytes(bytes(b))
                texts.append(t.replace("\f", "\n\n"))
                npages.append(t.count("\f") + 1)
            pdf_batch[out_col] = texts
            pdf_batch[out_col + "_pages"] = pd.array(
                npages, dtype="Int32")
            yield pdf_batch

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------------- write


def _esc(s: str) -> bytes:
    return (s.replace("\\", r"\\").replace("(", r"\(")
            .replace(")", r"\)").encode("latin-1", "replace"))


def encode_pdf(pages: list[str], *, compress: bool = False,
               ascii85: bool = False) -> bytes:
    """page texts → spec-valid classic-xref PDF (Helvetica 12pt, one
    Tj per line) for tests and payload synthesis."""
    if not pages:
        raise ValueError("no pages")
    objs: list[bytes] = []  # 1-based object bodies

    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append((f"<< /Type /Pages /Count {n_pages} "
                 f"/Kids [{kids}] >>").encode())
    for i, text in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objs.append((
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {3 + 2 * n_pages} 0 R >> >> "
            f"/Contents {content_num} 0 R >>").encode())
        lines = text.split("\n")
        parts = [b"BT /F1 12 Tf 72 720 Td"]
        for j, ln in enumerate(lines):
            if j:
                parts.append(b"0 -14 Td")
            parts.append(b"(" + _esc(ln) + b") Tj")
        parts.append(b"ET")
        body = b" ".join(parts)
        filt = b""
        if compress:
            body = zlib.compress(body)
            filt = b"/Filter /FlateDecode "
        elif ascii85:
            enc = bytearray()
            for k in range(0, len(body), 4):
                grp = body[k: k + 4]
                pad = 4 - len(grp)
                v = int.from_bytes(grp + b"\x00" * pad, "big")
                cs = bytearray()
                for _ in range(5):
                    cs.append(0x21 + v % 85)
                    v //= 85
                enc += bytes(reversed(cs))[: 5 - pad]
            body = bytes(enc) + b"~>"
            filt = b"/Filter /ASCII85Decode "
        objs.append(b"<< " + filt
                    + f"/Length {len(body)} >>\nstream\n".encode()
                    + body + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


# --------------------------------------------------------- image layer


def extract_pdf_images_bytes(data: bytes, max_images: int = 256
                             ) -> list[dict]:
    """PDF → decoded embedded images (scanned-document corpora are
    PDFs wrapping JPEG/CCITT/raw bitmaps).

    Walks every /Subtype /Image XObject stream and decodes:
    - /DCTDecode → the native JPEG family (operators/jpeg.py —
      baseline/progressive/arithmetic/lossless);
    - /CCITTFaxDecode → operators/fax.py's PDF framing (K<0 G4,
      K=0 1-D rows, K>0 per-row tag bit; /EndOfLine and
      /EncodedByteAlign honored — the PDF defaults differ from raw
      T.4 streams), using /Columns//Rows//DecodeParms;
    - /FlateDecode or unfiltered raw samples with /Width//Height//
      BitsPerComponent 8 and DeviceRGB/DeviceGray.

    Returns [{image: (H,W[,3]) uint8 array, width, height, filter}];
    images whose filters are outside this floor (JPX, JBIG2, masks)
    are skipped, not fatal — a corpus job wants the decodable subset.
    """
    pdf = _Pdf(data)
    out: list[dict] = []
    for num in sorted(pdf.objects):
        if len(out) >= max_images:
            break
        try:
            o = pdf.obj(_Ref(num))
        except ValueError:
            continue
        if not isinstance(o, _Stream):
            continue
        d = o.d
        if _nv_or(pdf, d.get("Subtype")) != "Image":
            continue
        try:
            w = int(pdf.resolve(d.get("Width")))
            h = int(pdf.resolve(d.get("Height")))
        except (TypeError, ValueError):
            continue
        if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
            continue
        filters = pdf.resolve(d.get("Filter"))
        if not isinstance(filters, list):
            filters = [filters] if filters is not None else []
        fnames = [f.v if isinstance(f, _Name) else None
                  for f in filters]
        # DecodeParms aligns PER FILTER (PDF 7.4.1): keep the list
        # shape so a [Flate, CCITT] chain applies the predictor dict
        # to Flate and the K/Columns dict to CCITT, not vice versa
        raw_parms = pdf.resolve(d.get("DecodeParms"))
        if isinstance(raw_parms, list):
            parms_list = [pdf.resolve(x) for x in raw_parms]
        else:
            parms_list = [raw_parms]
        parms_list += [None] * (len(filters) - len(parms_list))
        try:
            if "DCTDecode" in fnames or "DCT" in fnames:
                from swiftlake_spark.operators.jpeg import decode_jpeg

                idx = max(i for i, n in enumerate(fnames)
                          if n in ("DCTDecode", "DCT"))
                raw = _apply_filters(o.raw, filters[:idx] or None,
                                     parms_list[:idx] or None)
                img = decode_jpeg(bytes(raw))
            elif "CCITTFaxDecode" in fnames or "CCF" in fnames:
                from swiftlake_spark.operators.fax import (
                    fax_decode_pdf,
                )

                idx = max(i for i, n in enumerate(fnames)
                          if n in ("CCITTFaxDecode", "CCF"))
                pm = parms_list[idx] if isinstance(parms_list[idx],
                                                   dict) else {}
                k = int(pdf.resolve(pm.get("K", 0)) or 0)
                cols = int(pdf.resolve(pm.get("Columns", 1728)) or 1728)
                rows = int(pdf.resolve(pm.get("Rows", h)) or h)
                raw = _apply_filters(o.raw, filters[:idx] or None,
                                     parms_list[:idx] or None)
                black = fax_decode_pdf(
                    bytes(raw), cols, rows, k,
                    end_of_line=bool(pdf.resolve(pm.get("EndOfLine"))),
                    byte_align=bool(
                        pdf.resolve(pm.get("EncodedByteAlign"))))
                img = np.where(black, 0, 255).astype(np.uint8)
            else:
                raw = _apply_filters(
                    o.raw, filters or None, parms_list)
                bpc = int(pdf.resolve(d.get("BitsPerComponent", 8))
                          or 8)
                cs = _nv_or(pdf, d.get("ColorSpace"))
                if bpc != 8 or cs not in ("DeviceRGB", "DeviceGray"):
                    raise NotImplementedError(
                        f"raw image bpc={bpc} cs={cs}")
                nch = 3 if cs == "DeviceRGB" else 1
                if len(raw) < w * h * nch:
                    raise ValueError("raw image shorter than W*H")
                arr = np.frombuffer(raw, np.uint8,
                                    w * h * nch).reshape(h, w, nch)
                img = arr[:, :, 0] if nch == 1 else arr
        except (ValueError, NotImplementedError):
            continue  # outside the decode floor: skip, don't fail
        out.append({"image": img, "width": int(img.shape[1]),
                    "height": int(img.shape[0]),
                    "filter": next((n for n in fnames if n), "raw")})
    return out


def _nv_or(pdf: _Pdf, v):
    v = pdf.resolve(v)
    return v.v if isinstance(v, _Name) else None


def extract_pdf_images(df, data_col: str = "data"):
    """Spark operator: EXPLODE PDFs into one row per decodable
    embedded image, re-encoded as lossless PNG bytes so the row feeds
    the existing image pipeline (decode_image, phash dedup) unchanged."""
    from pyspark.sql import types as T

    from swiftlake_spark.operators.explode_util import explode_blobs

    def rows_for(blob: bytes):
        from swiftlake_spark.operators.multimodal import encode_png

        for i, im in enumerate(extract_pdf_images_bytes(blob)):
            yield {"image_idx": i, "width": im["width"],
                   "height": im["height"], "src_filter": im["filter"],
                   "png": encode_png(im["image"])}

    return explode_blobs(df, data_col, [
        T.StructField("image_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("src_filter", T.StringType()),
        T.StructField("png", T.BinaryType()),
    ], rows_for)


def encode_pdf_with_images(images: list, *, text: str = "scan page",
                           ccitt_k: int = -1,
                           ccitt_eol: bool = False,
                           ccitt_align: bool = False) -> bytes:
    """Embed images into a spec-valid PDF (for tests): uint8 RGB
    arrays → DCTDecode (JPEG), bool black-masks → CCITTFaxDecode
    (framing per ``ccitt_k``/``ccitt_eol``/``ccitt_align``), gray
    arrays → FlateDecode raw.  A dict item
    ``{"dct": jpeg_bytes, "width": w, "height": h}`` embeds an
    already-encoded JPEG verbatim (DCTDecode passthrough), so callers
    control quality/subsampling/restart markers of the wrapped
    stream."""
    import zlib as _z

    from swiftlake_spark.operators.fax import fax_encode_pdf
    from swiftlake_spark.operators.jpeg import encode_jpeg

    if not -1 <= ccitt_k <= 8:
        raise ValueError("ccitt_k out of the fixture range")
    base = encode_pdf([text])
    # append image XObjects as extra numbered objects before the xref;
    # the tolerant object scan picks them up regardless of xref state
    cut = base.find(b"xref")
    out = bytearray(base[:cut])
    next_num = 100
    for arr in images:
        if isinstance(arr, dict):
            payload = bytes(arr["dct"])
            w, h = int(arr["width"]), int(arr["height"])
            entries = (f"/Filter /DCTDecode /Width {w} /Height {h} "
                       f"/BitsPerComponent 8 /ColorSpace /DeviceRGB")
            out += (f"{next_num} 0 obj\n<< /Type /XObject "
                    f"/Subtype /Image {entries} "
                    f"/Length {len(payload)} >>\nstream\n").encode()
            out += payload + b"\nendstream\nendobj\n"
            next_num += 1
            continue
        arr = np.asarray(arr)
        if arr.dtype == bool:
            h, w = arr.shape
            payload = fax_encode_pdf(arr, ccitt_k,
                                     end_of_line=ccitt_eol,
                                     byte_align=ccitt_align)
            flags = ""
            if ccitt_eol:
                flags += " /EndOfLine true"
            if ccitt_align:
                flags += " /EncodedByteAlign true"
            entries = (f"/Filter /CCITTFaxDecode /Width {w} "
                       f"/Height {h} /BitsPerComponent 1 "
                       f"/ColorSpace /DeviceGray "
                       f"/DecodeParms << /K {ccitt_k} /Columns {w} "
                       f"/Rows {h}{flags} >>")
        elif arr.ndim == 3:
            h, w = arr.shape[:2]
            payload = encode_jpeg(arr.astype(np.uint8), quality=95)
            entries = (f"/Filter /DCTDecode /Width {w} /Height {h} "
                       f"/BitsPerComponent 8 /ColorSpace /DeviceRGB")
        else:
            h, w = arr.shape
            payload = _z.compress(arr.astype(np.uint8).tobytes())
            entries = (f"/Filter /FlateDecode /Width {w} /Height {h} "
                       f"/BitsPerComponent 8 /ColorSpace /DeviceGray")
        out += (f"{next_num} 0 obj\n<< /Type /XObject "
                f"/Subtype /Image {entries} "
                f"/Length {len(payload)} >>\nstream\n").encode()
        out += payload + b"\nendstream\nendobj\n"
        next_num += 1
    out += base[cut:]
    return bytes(out)

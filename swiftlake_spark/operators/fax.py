"""CCITT fax codecs for bilevel TIFF strips (public ITU-T T.4 / T.6).

Scanned-document corpora are full of Group 3 / Group 4 fax TIFFs (≙
reference media handling intent, SURVEY §2 multimodal columns: the
reference treats media payloads as opaque binary columns — e.g.
``core/src/main/java/com/arcesium/swiftlake/common/InputFiles.java``
hands bytes through untyped; decode happens in the pipeline — while
the codec itself is public ITU-T spec math, no reference code
involved).  This module implements the three TIFF fax compressions from
the public specs alone:

- compression 2 — "Modified Huffman" 1-D RLE, every row byte-aligned,
  no EOL codes (TIFF 6.0 §Section 10);
- compression 3 — ITU-T T.4 (Group 3): rows prefixed by EOL
  ``000000000001``; T4Options (tag 292) bit 0 selects 2-D coding (each
  EOL then carries a 1-bit tag: 1 = next row 1-D, 0 = 2-D), bit 2
  means fill bits pad EOLs to byte boundaries;
- compression 4 — ITU-T T.6 (Group 4): pure 2-D coding against the
  previous row (imaginary all-white row above the first), no EOLs,
  optional EOFB terminator.

Both directions are implemented (the encoder exists so tests and the
q145 synthesis path can round-trip without any binary dependency), and
the Huffman tables are transcribed from T.4 Tables 2/3/4 — they are
pinned by hand-assembled bitstream fixtures in ``tests/test_fax.py``
so a transcription typo cannot hide behind a self-round-trip.

Pixel convention: the coder works on "black masks" — boolean (H, W)
arrays, True = black ink.  Every fax row starts with a (possibly
empty) WHITE run, per spec.  Mapping to TIFF sample space
(PhotometricInterpretation 0 = WhiteIsZero → white sample 0) happens
in the TIFF layer, not here.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------- tables
# T.4 terminating (0..63) and make-up (64..1728) codes, plus the shared
# extended make-ups (1792..2560).  Entries: run -> (bit_length, code).

_WHITE_TERM = {
    0: (8, 0b00110101), 1: (6, 0b000111), 2: (4, 0b0111), 3: (4, 0b1000),
    4: (4, 0b1011), 5: (4, 0b1100), 6: (4, 0b1110), 7: (4, 0b1111),
    8: (5, 0b10011), 9: (5, 0b10100), 10: (5, 0b00111), 11: (5, 0b01000),
    12: (6, 0b001000), 13: (6, 0b000011), 14: (6, 0b110100),
    15: (6, 0b110101), 16: (6, 0b101010), 17: (6, 0b101011),
    18: (7, 0b0100111), 19: (7, 0b0001100), 20: (7, 0b0001000),
    21: (7, 0b0010111), 22: (7, 0b0000011), 23: (7, 0b0000100),
    24: (7, 0b0101000), 25: (7, 0b0101011), 26: (7, 0b0010011),
    27: (7, 0b0100100), 28: (7, 0b0011000), 29: (8, 0b00000010),
    30: (8, 0b00000011), 31: (8, 0b00011010), 32: (8, 0b00011011),
    33: (8, 0b00010010), 34: (8, 0b00010011), 35: (8, 0b00010100),
    36: (8, 0b00010101), 37: (8, 0b00010110), 38: (8, 0b00010111),
    39: (8, 0b00101000), 40: (8, 0b00101001), 41: (8, 0b00101010),
    42: (8, 0b00101011), 43: (8, 0b00101100), 44: (8, 0b00101101),
    45: (8, 0b00000100), 46: (8, 0b00000101), 47: (8, 0b00001010),
    48: (8, 0b00001011), 49: (8, 0b01010010), 50: (8, 0b01010011),
    51: (8, 0b01010100), 52: (8, 0b01010101), 53: (8, 0b00100100),
    54: (8, 0b00100101), 55: (8, 0b01011000), 56: (8, 0b01011001),
    57: (8, 0b01011010), 58: (8, 0b01011011), 59: (8, 0b01001010),
    60: (8, 0b01001011), 61: (8, 0b00110010), 62: (8, 0b00110011),
    63: (8, 0b00110100),
}

_WHITE_MAKEUP = {
    64: (5, 0b11011), 128: (5, 0b10010), 192: (6, 0b010111),
    256: (7, 0b0110111), 320: (8, 0b00110110), 384: (8, 0b00110111),
    448: (8, 0b01100100), 512: (8, 0b01100101), 576: (8, 0b01101000),
    640: (8, 0b01100111), 704: (9, 0b011001100), 768: (9, 0b011001101),
    832: (9, 0b011010010), 896: (9, 0b011010011), 960: (9, 0b011010100),
    1024: (9, 0b011010101), 1088: (9, 0b011010110),
    1152: (9, 0b011010111), 1216: (9, 0b011011000),
    1280: (9, 0b011011001), 1344: (9, 0b011011010),
    1408: (9, 0b011011011), 1472: (9, 0b010011000),
    1536: (9, 0b010011001), 1600: (9, 0b010011010),
    1664: (6, 0b011000), 1728: (9, 0b010011011),
}

_BLACK_TERM = {
    0: (10, 0b0000110111), 1: (3, 0b010), 2: (2, 0b11), 3: (2, 0b10),
    4: (3, 0b011), 5: (4, 0b0011), 6: (4, 0b0010), 7: (5, 0b00011),
    8: (6, 0b000101), 9: (6, 0b000100), 10: (7, 0b0000100),
    11: (7, 0b0000101), 12: (7, 0b0000111), 13: (8, 0b00000100),
    14: (8, 0b00000111), 15: (9, 0b000011000), 16: (10, 0b0000010111),
    17: (10, 0b0000011000), 18: (10, 0b0000001000),
    19: (11, 0b00001100111), 20: (11, 0b00001101000),
    21: (11, 0b00001101100), 22: (11, 0b00000110111),
    23: (11, 0b00000101000), 24: (11, 0b00000010111),
    25: (11, 0b00000011000), 26: (12, 0b000011001010),
    27: (12, 0b000011001011), 28: (12, 0b000011001100),
    29: (12, 0b000011001101), 30: (12, 0b000001101000),
    31: (12, 0b000001101001), 32: (12, 0b000001101010),
    33: (12, 0b000001101011), 34: (12, 0b000011010010),
    35: (12, 0b000011010011), 36: (12, 0b000011010100),
    37: (12, 0b000011010101), 38: (12, 0b000011010110),
    39: (12, 0b000011010111), 40: (12, 0b000001101100),
    41: (12, 0b000001101101), 42: (12, 0b000011011010),
    43: (12, 0b000011011011), 44: (12, 0b000001010100),
    45: (12, 0b000001010101), 46: (12, 0b000001010110),
    47: (12, 0b000001010111), 48: (12, 0b000001100100),
    49: (12, 0b000001100101), 50: (12, 0b000001010010),
    51: (12, 0b000001010011), 52: (12, 0b000000100100),
    53: (12, 0b000000110111), 54: (12, 0b000000111000),
    55: (12, 0b000000100111), 56: (12, 0b000000101000),
    57: (12, 0b000001011000), 58: (12, 0b000001011001),
    59: (12, 0b000000101011), 60: (12, 0b000000101100),
    61: (12, 0b000001011010), 62: (12, 0b000001100110),
    63: (12, 0b000001100111),
}

_BLACK_MAKEUP = {
    64: (10, 0b0000001111), 128: (12, 0b000011001000),
    192: (12, 0b000011001001), 256: (12, 0b000001011011),
    320: (12, 0b000000110011), 384: (12, 0b000000110100),
    448: (12, 0b000000110101), 512: (13, 0b0000001101100),
    576: (13, 0b0000001101101), 640: (13, 0b0000001001010),
    704: (13, 0b0000001001011), 768: (13, 0b0000001001100),
    832: (13, 0b0000001001101), 896: (13, 0b0000001110010),
    960: (13, 0b0000001110011), 1024: (13, 0b0000001110100),
    1088: (13, 0b0000001110101), 1152: (13, 0b0000001110110),
    1216: (13, 0b0000001110111), 1280: (13, 0b0000001010010),
    1344: (13, 0b0000001010011), 1408: (13, 0b0000001010100),
    1472: (13, 0b0000001010101), 1536: (13, 0b0000001011010),
    1600: (13, 0b0000001011011), 1664: (13, 0b0000001100100),
    1728: (13, 0b0000001100101),
}

# extended make-ups (T.4 Table 4) — colour-independent
_EXT_MAKEUP = {
    1792: (11, 0b00000001000), 1856: (11, 0b00000001100),
    1920: (11, 0b00000001101), 1984: (12, 0b000000010010),
    2048: (12, 0b000000010011), 2112: (12, 0b000000010100),
    2176: (12, 0b000000010101), 2240: (12, 0b000000010110),
    2304: (12, 0b000000010111), 2368: (12, 0b000000011100),
    2432: (12, 0b000000011101), 2496: (12, 0b000000011110),
    2560: (12, 0b000000011111),
}

# 2-D mode codes (T.4 §4.2.1.3.7, identical in T.6)
_MODE_P = (4, 0b0001)
_MODE_H = (3, 0b001)
_MODE_V = {  # offset a1 - b1 -> code
    0: (1, 0b1),
    1: (3, 0b011), 2: (6, 0b000011), 3: (7, 0b0000011),
    -1: (3, 0b010), -2: (6, 0b000010), -3: (7, 0b0000010),
}

_EOL = (12, 0b000000000001)


def _decode_map(term, makeup):
    m = {}
    for run, (ln, code) in {**term, **makeup, **_EXT_MAKEUP}.items():
        m[(ln, code)] = run
    return m


_WHITE_DEC = _decode_map(_WHITE_TERM, _WHITE_MAKEUP)
_BLACK_DEC = _decode_map(_BLACK_TERM, _BLACK_MAKEUP)
_MAX_CODE_LEN = 14  # longest run code is 13 bits; EOL is 12


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def align(self) -> None:
        if self.n:
            self.put(8 - self.n, 0)

    def bitpos(self) -> int:
        return len(self.buf) * 8 + self.n

    def done(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos

    def peek1(self) -> int:
        byte = self.data[self.pos >> 3]
        return (byte >> (7 - (self.pos & 7))) & 1

    def get1(self) -> int:
        if self.pos >= len(self.data) * 8:
            raise ValueError("truncated fax stream")
        b = self.peek1()
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(r: _BitReader, dec: dict) -> int:
    """One MH run: optional make-up chain + terminating code."""
    total = 0
    while True:
        ln, code = 0, 0
        while True:
            code = (code << 1) | r.get1()
            ln += 1
            if ln > _MAX_CODE_LEN:
                raise ValueError("bad fax run code")
            run = dec.get((ln, code))
            if run is not None:
                break
        total += run
        if run < 64:  # terminating code ends the run
            return total
        if total > 1 << 20:
            raise ValueError("implausible fax run")


def _write_run(w: _BitWriter, run: int, white: bool) -> None:
    term = _WHITE_TERM if white else _BLACK_TERM
    makeup = _WHITE_MAKEUP if white else _BLACK_MAKEUP
    if run < 0:
        raise ValueError("negative fax run")
    while run > 2560 + 63:
        w.put(*_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        mk = min(run & ~63, 2560)
        w.put(*(makeup.get(mk) or _EXT_MAKEUP[mk]))
        run -= mk
    w.put(*term[run])


def _transitions(row: np.ndarray) -> list[int]:
    """Positions where colour changes, starting colour white; a row of
    width W yields transitions in (0, W]; even indices are white→black."""
    d = np.flatnonzero(np.diff(row.astype(np.int8))) + 1
    t = list(d)
    if row[0]:  # row starts black: implicit white→black transition at 0
        t.insert(0, 0)
    return t


def _row_runs(row: np.ndarray) -> list[int]:
    """Alternating white/black run lengths summing to len(row)."""
    t = _transitions(row)
    w = len(row)
    runs, prev = [], 0
    for pos in (*t, w):
        runs.append(pos - prev)
        prev = pos
    if runs and runs[-1] == 0:
        runs.pop()
    return runs or [w]


def _encode_row_1d(w: _BitWriter, row: np.ndarray) -> None:
    white = True
    for run in _row_runs(row):
        _write_run(w, run, white)
        white = not white


def _decode_row_1d(r: _BitReader, width: int) -> np.ndarray:
    row = np.zeros(width, dtype=bool)
    x, white = 0, True
    while x < width:
        run = _read_run(r, _WHITE_DEC if white else _BLACK_DEC)
        if x + run > width:
            raise ValueError("fax row overruns width")
        if not white:
            row[x: x + run] = True
        x += run
        white = not white
    return row


def _encode_row_2d(w: _BitWriter, row: np.ndarray,
                   ref_t: list[int], width: int) -> None:
    """T.4/T.6 2-D coding of ``row`` against reference transitions."""
    cur_t = _transitions(row)
    a0, color_white, ci = -1, True, 0  # ci: index into cur_t of a1

    def b1b2() -> tuple[int, int]:
        # b1: first ref transition > a0 with opposite colour to a0's
        # colour run, i.e. ref index parity matches current colour
        # (even = white→black, consumed while coding a white run)
        j = 0
        while j < len(ref_t) and (ref_t[j] <= a0
                                  or (j & 1) != (0 if color_white else 1)):
            j += 1
        b1 = ref_t[j] if j < len(ref_t) else width
        b2 = ref_t[j + 1] if j + 1 < len(ref_t) else width
        return b1, b2

    while a0 < width:
        a1 = cur_t[ci] if ci < len(cur_t) else width
        b1, b2 = b1b2()
        if b2 < a1:  # pass mode
            w.put(*_MODE_P)
            a0 = b2
            continue
        if abs(a1 - b1) <= 3:  # vertical mode
            w.put(*_MODE_V[a1 - b1])
            a0 = a1
            color_white = not color_white
            ci += 1
        else:  # horizontal mode: two runs from max(a0, 0)
            a2 = cur_t[ci + 1] if ci + 1 < len(cur_t) else width
            start = max(a0, 0)
            w.put(*_MODE_H)
            _write_run(w, a1 - start, color_white)
            _write_run(w, a2 - a1, not color_white)
            a0 = a2
            ci += 2
        if a0 >= width:
            break


def _decode_row_2d(r: _BitReader, ref_t: list[int],
                   width: int) -> np.ndarray:
    row = np.zeros(width, dtype=bool)
    a0, color_white = -1, True

    def b1b2() -> tuple[int, int]:
        j = 0
        while j < len(ref_t) and (ref_t[j] <= a0
                                  or (j & 1) != (0 if color_white else 1)):
            j += 1
        b1 = ref_t[j] if j < len(ref_t) else width
        b2 = ref_t[j + 1] if j + 1 < len(ref_t) else width
        return b1, b2

    while a0 < width:
        # mode code: V0=1, VR1=011, VL1=010, H=001, P=0001,
        # VR2=000011, VL2=000010, VR3=0000011, VL3=0000010
        if r.get1():
            mode, off = "V", 0
        elif r.get1():
            mode, off = "V", 1 if r.get1() else -1
        elif r.get1():
            mode = "H"
        elif r.get1():
            mode = "P"
        elif r.get1():
            mode, off = "V", 2 if r.get1() else -2
        elif r.get1():
            mode, off = "V", 3 if r.get1() else -3
        else:
            raise ValueError("unsupported fax 2-D extension code")
        b1, b2 = b1b2()
        if mode == "P":
            if not color_white:
                row[max(a0, 0): b2] = True
            a0 = b2
        elif mode == "V":
            a1 = b1 + off
            # changing elements are strictly increasing (T.6 §2.2.3):
            # a zero-progress V mode marks a corrupt stream
            if a1 <= a0 or a1 > width:
                raise ValueError("fax vertical mode out of range")
            if not color_white:
                row[max(a0, 0): a1] = True
            a0 = a1
            color_white = not color_white
        else:  # horizontal: two MH runs, colour unchanged after
            start = max(a0, 0)
            r1 = _read_run(r, _WHITE_DEC if color_white else _BLACK_DEC)
            r2 = _read_run(r, _BLACK_DEC if color_white else _WHITE_DEC)
            if start + r1 + r2 > width or start + r1 + r2 <= a0:
                raise ValueError("fax horizontal runs overrun width")
            if color_white:
                row[start + r1: start + r1 + r2] = True
            else:
                row[start: start + r1] = True
            a0 = start + r1 + r2
    return row


def _expect_eol(r: _BitReader, max_fill: int = 4096) -> None:
    """Consume fill zeros + the 12-bit EOL ``000000000001``.

    T.4 fill exists for transmission pacing (minimum scan-line time),
    so real-world G3 streams can pad EOLs with far more than the
    byte-alignment 0-7 bits our encoder writes — tolerate up to 4096
    before declaring the stream corrupt."""
    zeros = 0
    while True:
        b = r.get1()
        if b:
            if zeros < 11:
                raise ValueError("bad fax EOL")
            return
        zeros += 1
        if zeros > 11 + max_fill:
            raise ValueError("fax EOL fill too long")


# ------------------------------------------------------------- public


def fax_encode(black: np.ndarray, compression: int, *,
               two_d: bool = True, fill: bool = False) -> bytes:
    """Encode a boolean black-mask (H, W) as a TIFF fax strip.

    compression 2 → MH RLE (rows byte-aligned, no EOL);
    compression 3 → G3 with leading EOL per row (``two_d`` selects the
    T4Options bit-0 mode; ``fill`` byte-aligns each EOL);
    compression 4 → G4 (pure 2-D, EOFB appended).
    """
    b = np.asarray(black, dtype=bool)
    if b.ndim != 2 or b.size == 0:
        raise ValueError("black mask must be non-empty (H, W)")
    h, width = b.shape
    w = _BitWriter()
    if compression == 2:
        for y in range(h):
            _encode_row_1d(w, b[y])
            w.align()
        return w.done()
    if compression == 3:
        ref_t: list[int] | None = None
        for y in range(h):
            if fill:
                # pad so EOL (+tag bit in 2-D mode) ends on a byte edge
                tag = 1 if two_d else 0
                pad = (-(w.bitpos() + 12 + tag)) % 8
                if pad:
                    w.put(pad, 0)
            w.put(*_EOL)
            if two_d:
                one_d = y == 0
                w.put(1, 1 if one_d else 0)
                if one_d:
                    _encode_row_1d(w, b[y])
                else:
                    _encode_row_2d(w, b[y], ref_t, width)
                ref_t = _transitions(b[y])
            else:
                _encode_row_1d(w, b[y])
        return w.done()
    if compression == 4:
        ref_t = []  # imaginary white reference line
        for y in range(h):
            _encode_row_2d(w, b[y], ref_t, width)
            ref_t = _transitions(b[y])
        w.put(*_EOL)  # EOFB
        w.put(*_EOL)
        return w.done()
    raise ValueError(f"not a fax compression: {compression}")


def fax_decode(data: bytes, width: int, height: int, compression: int, *,
               two_d: bool = True) -> np.ndarray:
    """Decode a TIFF fax strip → boolean black-mask (height, width).

    Tolerates fill bits before G3 EOLs and an optional leading EOL;
    stops after ``height`` rows (EOFB and trailing pad ignored).
    """
    if width < 1 or height < 1 or width * height > (1 << 28):
        raise ValueError(f"implausible fax dimensions {width}x{height}")
    if not data:
        raise ValueError("empty fax stream")
    r = _BitReader(data)
    rows: list[np.ndarray] = []
    if compression == 2:
        for _ in range(height):
            rows.append(_decode_row_1d(r, width))
            r.align()
    elif compression == 3:
        ref_t: list[int] | None = None
        for _ in range(height):
            _expect_eol(r)
            if two_d:
                one_d = bool(r.get1())
                if one_d:
                    row = _decode_row_1d(r, width)
                else:
                    if ref_t is None:
                        raise ValueError("fax 2-D row without reference")
                    row = _decode_row_2d(r, ref_t, width)
                ref_t = _transitions(row)
            else:
                row = _decode_row_1d(r, width)
            rows.append(row)
    elif compression == 4:
        ref_t = []
        for _ in range(height):
            row = _decode_row_2d(r, ref_t, width)
            ref_t = _transitions(row)
            rows.append(row)
    else:
        raise ValueError(f"not a fax compression: {compression}")
    return np.stack(rows)


def fax_encode_pdf(black: np.ndarray, k: int, *,
                   end_of_line: bool = False,
                   byte_align: bool = False) -> bytes:
    """Encode with PDF CCITTFaxDecode framing (PDF 32000 §7.4.6) —
    distinct from the raw TIFF strip framings above: K<0 pure 2-D
    (G4), K=0 1-D rows, K>0 per-row tag bit selecting 1-D/2-D; EOL
    prefixes only when ``end_of_line`` (the PDF default is FALSE,
    unlike T.4 streams), row starts byte-aligned only when
    ``byte_align``."""
    b = np.asarray(black, dtype=bool)
    if b.ndim != 2 or b.size == 0:
        raise ValueError("black mask must be non-empty (H, W)")
    h, width = b.shape
    w = _BitWriter()
    ref_t: list[int] | None = None
    for y in range(h):
        if byte_align:
            w.align()
        if end_of_line:
            w.put(*_EOL)
        if k < 0:
            _encode_row_2d(w, b[y], ref_t if ref_t is not None else [],
                           width)
        elif k == 0:
            _encode_row_1d(w, b[y])
        else:
            one_d = ref_t is None
            w.put(1, 1 if one_d else 0)
            if one_d:
                _encode_row_1d(w, b[y])
            else:
                _encode_row_2d(w, b[y], ref_t, width)
        ref_t = _transitions(b[y])
    return w.done()


def fax_decode_pdf(data: bytes, columns: int, rows: int, k: int, *,
                   end_of_line: bool = False,
                   byte_align: bool = False) -> np.ndarray:
    """Decode PDF CCITTFaxDecode payloads → boolean black-mask
    (rows, columns); the framing mirror of :func:`fax_encode_pdf`
    (tolerates EOLs-with-fill when ``end_of_line``)."""
    if columns < 1 or rows < 1 or columns * rows > (1 << 28):
        raise ValueError(
            f"implausible fax dimensions {columns}x{rows}")
    if not data:
        raise ValueError("empty fax stream")
    r = _BitReader(data)
    out: list[np.ndarray] = []
    ref_t: list[int] | None = None
    for _ in range(rows):
        if byte_align:
            r.align()
        if end_of_line:
            _expect_eol(r)
        if k < 0:
            row = _decode_row_2d(
                r, ref_t if ref_t is not None else [], columns)
        elif k == 0:
            row = _decode_row_1d(r, columns)
        else:
            one_d = bool(r.get1())
            if one_d:
                row = _decode_row_1d(r, columns)
            else:
                if ref_t is None:
                    raise ValueError("fax 2-D row without reference")
                row = _decode_row_2d(r, ref_t, columns)
        ref_t = _transitions(row)
        out.append(row)
    return np.stack(out)

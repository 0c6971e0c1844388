"""FLAC audio codec (public xiph.org format spec / RFC 9639).

Audio corpora are FLAC-heavy (it is the canonical lossless interchange
format), so the engine's stdlib audio floor needs a native path — the
same rationale as the fax/TIFF/JPEG codecs (≙ reference media handling
intent, SURVEY §2 multimodal columns: opaque binary columns, decode in
the pipeline; the codec is public xiph/RFC-9639 spec math, no
reference code involved).

Decoder scope (every subframe type in the spec):
- STREAMINFO + metadata-block skipping;
- frames with fixed or variable blocking strategy, all block-size /
  sample-rate / sample-size header codes, UTF-8-coded frame numbers,
  CRC-8 (header) and CRC-16 (frame) verified;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients, signed shift), wasted-bits unpacking;
- Rice-coded residuals (4- and 5-bit parameters, partition orders,
  escape-to-raw partitions);
- stereo decorrelation: independent, left/side, right/side, mid/side.

Encoder scope (for tests and the q108 synthesis path — enough to
produce spec-valid streams without any binary dependency): mono or
independent-stereo, CONSTANT / VERBATIM / FIXED 0-4 chosen per frame
by residual cost, Rice partition order 0 with escape fallback.
LPC and the stereo-decorrelation decode paths are exercised by
hand-built subframe bitstreams in ``tests/test_flac.py``.

Bit-exactness contract: decode(encode(x)) == x for any int samples
within the bit depth — pinned by round-trip and hypothesis tests.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ CRC

_CRC8_TBL = np.zeros(256, dtype=np.uint8)
_CRC16_TBL = np.zeros(256, dtype=np.uint16)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TBL[_i] = _c
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 \
            else (_c << 1) & 0xFFFF
    _CRC16_TBL[_i] = _c


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TBL[c ^ b]
    return int(c)


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TBL[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------------- bit plumbing


class _BR:
    """MSB-first bit reader that remembers byte offsets for CRC spans."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.pos = byte_pos * 8

    def get(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated FLAC stream")
        v = 0
        pos = self.pos
        while n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def get_signed(self, n: int) -> int:
        v = self.get(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self, limit: int = 1 << 20) -> int:
        q = 0
        while not self.get(1):
            q += 1
            if q > limit:
                raise ValueError("implausible FLAC unary run")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BW:
    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, n: int, v: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.put(8 - self.n, 0)

    def done(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _utf8_coded(value: int) -> bytes:
    """FLAC's UTF-8-style coding of frame/sample numbers (≤36 bits)."""
    if value < 0x80:
        return bytes([value])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31),
                         (7, 36)):
        if value < (1 << bits):
            out = bytearray(nbytes)
            for k in range(nbytes - 1, 0, -1):
                out[k] = 0x80 | (value & 0x3F)
                value >>= 6
            out[0] = ((0xFE << (7 - nbytes)) & 0xFF) | value
            return bytes(out)
    raise ValueError("frame number exceeds 36 bits")


def _utf8_decode(r: _BR) -> int:
    b0 = r.get(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("bad FLAC coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = r.get(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
              13: 8192, 14: 16384, 15: 32768}
_SSIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
               4: [4, -6, 4, -1]}


# --------------------------------------------------------------- decode


def _residual(r: _BR, bs: int, order: int) -> list[int]:
    method = r.get(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.get(4)
    nparts = 1 << po
    if bs % nparts:
        raise ValueError("FLAC partition order does not divide blocksize")
    out: list[int] = []
    for p in range(nparts):
        n = bs >> po
        if p == 0:
            n -= order
            if n < 0:
                raise ValueError("FLAC predictor order exceeds partition")
        param = r.get(pbits)
        if param == escape:
            raw = r.get(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(r.get_signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = r.unary()
                u = (q << param) | r.get(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _subframe(r: _BR, bs: int, bps: int) -> np.ndarray:
    if r.get(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = r.get(6)
    wasted = 0
    if r.get(1):
        wasted = r.unary() + 1
        bps -= wasted
        if bps < 1:
            raise ValueError("FLAC wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        out = np.full(bs, r.get_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([r.get_signed(bps) for _ in range(bs)],
                       dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED
        order = stype & 7
        warm = [r.get_signed(bps) for _ in range(order)]
        res = _residual(r, bs, order)
        coef = _FIXED_COEF[order]
        s = warm + [0] * len(res)
        for i in range(order, bs):
            v = res[i - order] + sum(
                c * s[i - 1 - j] for j, c in enumerate(coef))
            if not -(1 << 40) < v < (1 << 40):
                # no spec-legal stream (bps ≤ 32) reaches 2^40; a
                # corrupted one must not grow unbounded Python ints
                raise ValueError("FLAC fixed prediction diverged")
            s[i] = v
        out = np.array(s, dtype=np.int64)
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        warm = [r.get_signed(bps) for _ in range(order)]
        prec = r.get(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision code")
        shift = r.get_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coef = [r.get_signed(prec) for _ in range(order)]
        res = _residual(r, bs, order)
        s = warm + [0] * len(res)
        for i in range(order, bs):
            acc = sum(c * s[i - 1 - j] for j, c in enumerate(coef))
            v = res[i - order] + (acc >> shift)
            if not -(1 << 40) < v < (1 << 40):
                raise ValueError("FLAC LPC prediction diverged")
            s[i] = v
        out = np.array(s, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac_bytes(data: bytes) -> tuple[int, np.ndarray]:
    """FLAC → (sample_rate, mono float32 in [-1, 1]); multi-channel
    downmixes by mean (same convention as :func:`decode_wav_bytes`)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    rate = nch = bps = None
    total = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        head = data[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1: pos + 4])
        body = data[pos + 4: pos + 4 + ln]
        if len(body) < ln:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:  # STREAMINFO
            if ln < 34:
                raise ValueError("short FLAC STREAMINFO")
            br = _BR(body)
            br.get(16)  # min blocksize
            br.get(16)  # max blocksize
            br.get(24)
            br.get(24)
            rate = br.get(20)
            nch = br.get(3) + 1
            bps = br.get(5) + 1
            total = br.get(36)
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type")
        pos += 4 + ln
    if rate is None:
        raise ValueError("FLAC without STREAMINFO")
    if rate < 1 or nch < 1 or nch > 8 or bps < 4 or bps > 32:
        raise ValueError(
            f"implausible FLAC STREAMINFO rate={rate} nch={nch} bps={bps}")

    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        frame_start = pos
        r = _BR(data, pos)
        if r.get(14) != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        if r.get(1):
            raise ValueError("FLAC reserved header bit set")
        r.get(1)  # blocking strategy
        bs_code = r.get(4)
        sr_code = r.get(4)
        ch_asgn = r.get(4)
        ss_code = r.get(3)
        if r.get(1):
            raise ValueError("FLAC reserved header bit set")
        _utf8_decode(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            bs = r.get(8) + 1
        elif bs_code == 7:
            bs = r.get(16) + 1
        else:
            bs = _BLOCKSIZE[bs_code]
        if sr_code == 12:
            r.get(8)
        elif sr_code in (13, 14):
            r.get(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        hdr_end = r.byte_pos()
        crc8 = r.get(8)
        if _crc8(data[frame_start:hdr_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ss_code == 0:
            fbps = bps
        elif ss_code in _SSIZE:
            fbps = _SSIZE[ss_code]
        else:
            raise ValueError("reserved FLAC sample size code")
        if ch_asgn < 8:
            fnch = ch_asgn + 1
            if fnch != nch:
                raise ValueError("FLAC frame channel count mismatch")
            sub = [_subframe(r, bs, fbps) for _ in range(fnch)]
        elif ch_asgn in (8, 9, 10):
            if nch != 2:
                raise ValueError("FLAC stereo decorrelation needs 2 ch")
            # the side channel carries one extra bit
            if ch_asgn == 8:  # left/side
                left = _subframe(r, bs, fbps)
                side = _subframe(r, bs, fbps + 1)
                sub = [left, left - side]
            elif ch_asgn == 9:  # right/side
                side = _subframe(r, bs, fbps + 1)
                right = _subframe(r, bs, fbps)
                sub = [right + side, right]
            else:  # mid/side
                mid = _subframe(r, bs, fbps)
                side = _subframe(r, bs, fbps + 1)
                m2 = (mid << 1) | (side & 1)
                sub = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(
                f"reserved FLAC channel assignment {ch_asgn}")
        r.align()
        body_end = r.byte_pos()
        crc16 = r.get(16)
        if _crc16(data[frame_start:body_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(nch):
            chans[c].append(sub[c])
        got += bs
        pos = r.byte_pos()
    if not chans[0]:
        raise ValueError("FLAC without audio frames")
    arr = np.stack([np.concatenate(c) for c in chans])  # (nch, n)
    if total:
        arr = arr[:, :total]
    mono = arr.mean(axis=0)
    return rate, (mono / float(1 << (bps - 1))).astype(np.float32)


# --------------------------------------------------------------- encode


def _write_rice(w: _BW, res: np.ndarray) -> None:
    """Residual coding method 0 (4-bit Rice), partition order 0."""
    u = np.where(res >= 0, res.astype(np.int64) << 1,
                 ((-res.astype(np.int64)) << 1) - 1)
    best_p, best_cost = 0, None
    mean = float(u.mean()) if len(u) else 0.0
    guess = max(0, int(np.log2(mean + 1)))
    for p in range(max(0, guess - 2), min(15, guess + 3)):
        cost = int((u >> p).sum()) + len(u) * (p + 1)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    max_q = int((u >> best_p).max()) if len(u) else 0
    if best_p >= 15 or max_q > 1 << 16:
        # escape partition: raw n-bit residuals
        w.put(2, 0)
        w.put(4, 0)
        w.put(4, 15)
        width = max(1, int(np.abs(res).max()).bit_length() + 1) \
            if len(res) else 1
        width = min(width, 31)
        w.put(5, width)
        for v in res:
            w.put(width, int(v))
        return
    w.put(2, 0)
    w.put(4, 0)  # partition order 0
    w.put(4, best_p)
    for uv in u:
        q = int(uv) >> best_p
        for _ in range(q):
            w.put(1, 0)
        w.put(1, 1)
        if best_p:
            w.put(best_p, int(uv) & ((1 << best_p) - 1))


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _encode_subframe(w: _BW, s: np.ndarray, bps: int) -> None:
    if len(s) and (s == s[0]).all():
        w.put(1, 0)
        w.put(6, 0)  # CONSTANT
        w.put(1, 0)
        w.put(bps, int(s[0]))
        return
    best_o, best_cost = 0, None
    cands = {}
    for o in range(0, min(4, len(s) - 1) + 1):
        res = _fixed_residual(s, o)
        cost = int(np.minimum(np.abs(res), 1 << 30).sum())
        cands[o] = res
        if best_cost is None or cost < best_cost:
            best_o, best_cost = o, cost
    res = cands[best_o]
    if len(res) and int(np.abs(res).max()) > (1 << 29):
        w.put(1, 0)
        w.put(6, 1)  # VERBATIM
        w.put(1, 0)
        for v in s:
            w.put(bps, int(v))
        return
    w.put(1, 0)
    w.put(6, 8 | best_o)  # FIXED
    w.put(1, 0)
    for v in s[:best_o]:
        w.put(bps, int(v))
    _write_rice(w, res)


def encode_flac(samples: np.ndarray, rate: int = 8000, *,
                bps: int = 16, block_size: int = 1024) -> bytes:
    """int samples (mono ``(n,)`` or stereo ``(n, 2)``) → FLAC bytes.

    Values must fit ``bps`` signed bits.  Stereo writes independent
    channels; subframes pick CONSTANT/VERBATIM/FIXED-0..4 per block by
    residual cost.  ``decode_flac_bytes(encode_flac(x))`` recovers the
    mono downmix bit-exactly (scaled by 2^(bps-1))."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2) or s.shape[0] == 0:
        raise ValueError("samples must be non-empty (n,), (n,1) or (n,2)")
    if block_size < 16 or block_size > 65535:
        raise ValueError("block_size out of range")
    if bps < 8 or bps > 24:
        raise ValueError("encoder supports bps 8..24")
    if not 1 <= rate < (1 << 20):  # STREAMINFO field is 20 bits
        raise ValueError("sample rate out of range")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if s.min() < lo or s.max() > hi:
        raise ValueError(f"samples exceed {bps}-bit range")
    n, nch = s.shape
    total = n

    head = _BW()
    # fixed-blocksize stream: STREAMINFO carries the nominal blocksize
    # (the final frame may be shorter, per spec)
    head.put(16, block_size)
    head.put(16, block_size)
    head.put(24, 0)
    head.put(24, 0)
    head.put(20, rate)
    head.put(3, nch - 1)
    head.put(5, bps - 1)
    head.put(36, total)
    streaminfo = head.done() + b"\x00" * 16  # MD5 unset (all zero)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    out += streaminfo

    for fi, start in enumerate(range(0, n, block_size)):
        blk = s[start: start + block_size]
        bs = blk.shape[0]
        w = _BW()
        w.put(14, 0x3FFE)
        w.put(1, 0)
        w.put(1, 0)  # fixed blocksize stream
        w.put(4, 7)  # block size: 16 bits follow (bs - 1)
        w.put(4, 0)  # sample rate: from STREAMINFO
        w.put(4, nch - 1)  # independent channels
        w.put(3, {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}.get(bps, 0))
        w.put(1, 0)
        for b in _utf8_coded(fi):
            w.put(8, b)
        w.put(16, bs - 1)
        hdr = w.done()  # byte-aligned by construction
        w = _BW()
        for c in range(nch):
            _encode_subframe(w, blk[:, c].astype(np.int64), bps)
        body = w.done()
        frame = hdr + bytes([_crc8(hdr)]) + body
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)

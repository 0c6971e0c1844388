"""Container-metadata probe for compressed media (no decode).

At corpus scale the pipeline filters media by metadata — duration,
sample rate, dimensions, bitrate — long before it pays for a decode
(≙ reference media handling intent, SURVEY §2 multimodal columns: the
reference carries typed metadata next to opaque payload bytes).  The
codecs whose samples we decode natively (WAV/AIFF/FLAC, images, AVI/
Y4M) surface metadata through their decoders; the compressed formats
that honestly raise on decode (MP3, MP4/M4A, WebM/Matroska, Ogg
Vorbis/Opus) still have fully PUBLIC header structure, so this module
extracts their metadata header-level only:

- MP3 (MPEG-1/2/2.5 Layer I-III): ID3v2 skip, frame-sync walk with
  per-frame bitrate/samplerate tables → exact duration (VBR-safe),
  mean bitrate, channel mode;
- MP4/M4A (ISO BMFF): box walk (32/64-bit sizes) → mvhd timescale/
  duration, first video tkhd dimensions, mdhd sample rate;
- WebM/Matroska: EBML vint walk → Info TimestampScale + Duration;
- Ogg: page walk → codec id (Vorbis/Opus), rate from the id header,
  duration from the last page's granule position.

Everything returns a uniform dict; the Spark operator ``probe_media``
runs it over Arrow batches in ``mapInPandas``.  Corrupt payloads raise
ValueError (mutation-fuzzed), unknown magics raise ValueError — this
is a probe, not a sniffer of last resort.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- MP3

_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}  # version bits → rates
_BR_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
        416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
        384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        320),
}
_BR_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224,
        256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}


def _mp3_frame(data: bytes, pos: int):
    """Parse one MPEG audio frame header → (frame_bytes, samples,
    rate, bitrate_kbps, channels) or None if no sync at pos."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos: pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver = (b1 >> 3) & 3  # 0=2.5, 2=MPEG2, 3=MPEG1 (1 reserved)
    layer = 4 - ((b1 >> 1) & 3)  # 1..3; (b1>>1)&3==0 reserved
    if ver == 1 or (b1 >> 1) & 3 == 0:
        return None
    br_idx = b2 >> 4
    sr_idx = (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    rate = _MP3_RATES[ver][sr_idx]
    table = _BR_V1 if ver == 3 else _BR_V2
    kbps = table[layer][br_idx]
    pad = (b2 >> 1) & 1
    channels = 1 if (b3 >> 6) & 3 == 3 else 2
    if layer == 1:
        nbytes = (12 * kbps * 1000 // rate + pad) * 4
        samples = 384
    else:
        samples = 1152
        coef = 144
        if layer == 3 and ver != 3:
            samples, coef = 576, 72
        if layer == 2:
            samples, coef = 1152, 144
        nbytes = coef * kbps * 1000 // rate + pad
    if nbytes < 4:
        return None
    return nbytes, samples, rate, kbps, channels


def probe_mp3(data: bytes) -> dict:
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + sz
    end = len(data)
    if end - pos > 128 and data[end - 128: end - 125] == b"TAG":
        end -= 128  # ID3v1 tail
    # resync: tolerate junk before the first frame (bounded)
    first = None
    limit = min(pos + 65536, end)
    while pos < limit:
        f = _mp3_frame(data, pos)
        if f:
            first = f
            break
        pos += 1
    if first is None:
        raise ValueError("no MPEG audio frame sync found")
    frames = 0
    total_samples = 0
    kbps_sum = 0
    rate = first[2]
    channels = first[4]
    while pos < end:
        f = _mp3_frame(data, pos)
        if f is None:
            break  # trailing junk/truncated final frame
        nbytes, samples, rate, kbps, channels = f
        frames += 1
        total_samples += samples
        kbps_sum += kbps
        pos += nbytes
        if frames > 1 << 22:
            raise ValueError("implausible MP3 frame count")
    if frames == 0:
        raise ValueError("no complete MP3 frames")
    return {
        "format": "mp3",
        "duration_ms": int(total_samples * 1000 / rate),
        "sample_rate": rate,
        "channels": channels,
        "width": None, "height": None,
        "bitrate_kbps": int(round(kbps_sum / frames)),
        "n_frames": frames,
    }


def encode_mp3_shaped(n_frames: int = 40, rate_idx: int = 0,
                      kbps_idx: int = 9, mono: bool = True) -> bytes:
    """Spec-shaped MPEG-1 Layer III frame sequence (zeroed payloads)
    for tests — headers are real, audio data is silence-shaped."""
    rate = _MP3_RATES[3][rate_idx]
    kbps = _BR_V1[3][kbps_idx]
    out = bytearray()
    for i in range(n_frames):
        pad = i % 2  # exercise the padding bit
        nbytes = 144 * kbps * 1000 // rate + pad
        hdr = bytes([
            0xFF,
            0xFB,  # MPEG1, Layer III, no CRC
            (kbps_idx << 4) | (rate_idx << 2) | (pad << 1),
            0xC0 if mono else 0x00,
        ])
        out += hdr + b"\x00" * (nbytes - 4)
    return bytes(out)


# ------------------------------------------------------------- MP4/BMFF


def _walk_boxes(data: bytes, lo: int, hi: int, depth: int = 0):
    if depth > 16:
        raise ValueError("MP4 box nesting too deep")
    pos = lo
    while pos + 8 <= hi:
        (sz,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4: pos + 8]
        body = pos + 8
        if sz == 1:
            if body + 8 > hi:
                raise ValueError("truncated MP4 largesize")
            (sz,) = struct.unpack_from(">Q", data, body)
            body += 8
        elif sz == 0:
            sz = hi - pos  # box extends to end
        if sz < 8 or pos + sz > hi:
            raise ValueError("bad MP4 box size")
        yield btype, body, pos + sz, depth
        if btype in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            yield from _walk_boxes(data, body, pos + sz, depth + 1)
        pos += sz


def probe_mp4(data: bytes) -> dict:
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    brand = data[8:12].decode("latin-1").strip()
    duration_ms = rate = None
    width = height = None
    for btype, lo, hi, _d in _walk_boxes(data, 0, len(data)):
        if btype == b"mvhd" and duration_ms is None:
            ver = data[lo] if lo < hi else 0
            # v0 reads 8 bytes at lo+12 (needs 20); v1 reads 12 at
            # lo+20 (needs 32)
            if lo + (32 if ver == 1 else 20) > hi:
                raise ValueError("truncated mvhd box")
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", data, lo + 20)
            else:
                ts, dur = struct.unpack_from(">II", data, lo + 12)
            if ts > 0:
                duration_ms = int(dur * 1000 / ts)
        elif btype == b"tkhd" and width is None:
            # width/height live after ver/flags(4) + times/ids
            # (20 v0 / 32 v1) + reserved(8) + layer..volume(8) +
            # matrix(36) → body offset 76 (v0) / 88 (v1)
            ver = data[lo]
            off = lo + (88 if ver == 1 else 76)
            if off + 8 <= hi:
                w16, h16 = struct.unpack_from(">II", data, off)
                if w16 and h16:  # 16.16 fixed point; 0 for audio tracks
                    width, height = w16 >> 16, h16 >> 16
        elif btype == b"mdhd" and rate is None:
            if lo + 24 > hi:
                raise ValueError("truncated mdhd box")
            ver = data[lo]
            if ver == 1:
                (ts,) = struct.unpack_from(">I", data, lo + 20)
            else:
                (ts,) = struct.unpack_from(">I", data, lo + 12)
            # mdhd timescale for audio tracks IS the sample rate; for
            # video it is the tick rate — report the first one seen
            rate = ts or None
    if duration_ms is None:
        raise ValueError("MP4 without mvhd")
    return {
        "format": f"mp4/{brand}",
        "duration_ms": duration_ms,
        "sample_rate": rate,
        "channels": None,
        "width": width, "height": height,
        "bitrate_kbps": None,
        "n_frames": None,
    }


def encode_mp4_shaped(duration_ms: int = 2500, timescale: int = 1000,
                      width: int = 320, height: int = 240) -> bytes:
    """Minimal spec-shaped MP4 (ftyp + moov{mvhd, trak{tkhd}}) for
    tests."""
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = (bytes([0, 0, 0, 0]) + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale,
                          duration_ms * timescale // 1000)
            + b"\x00" * 80)
    tkhd = (bytes([0, 0, 0, 7]) + b"\x00" * 72
            + struct.pack(">II", width << 16, height << 16))
    moov = box(b"moov", box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd)))
    return box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42") + moov


# --------------------------------------------------------- EBML / WebM


def _ebml_vint(data: bytes, pos: int, strip_marker: bool):
    if pos >= len(data):
        raise ValueError("truncated EBML vint")
    b0 = data[pos]
    if b0 == 0:
        raise ValueError("invalid EBML vint")
    n = 8 - b0.bit_length()  # leading zeros → total length n+1
    length = n + 1
    if pos + length > len(data):
        raise ValueError("truncated EBML vint body")
    v = b0 & ((1 << (7 - n)) - 1) if strip_marker else b0
    for k in range(1, length):
        v = (v << 8) | data[pos + k]
    return v, pos + length


def probe_webm(data: bytes) -> dict:
    if data[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not an EBML payload")
    scale = 1_000_000  # ns per tick, Matroska default
    duration_ticks = None
    doctype = "matroska"

    def walk(lo: int, hi: int, depth: int) -> None:
        nonlocal scale, duration_ticks, doctype
        if depth > 8:
            raise ValueError("EBML nesting too deep")
        pos = lo
        while pos < hi:
            eid, pos = _ebml_vint(data, pos, strip_marker=False)
            esz, pos = _ebml_vint(data, pos, strip_marker=True)
            if pos + esz > hi:
                raise ValueError("truncated EBML element body")
            end = pos + esz
            if eid == 0x4282:  # DocType
                doctype = data[pos:end].decode("latin-1", "replace")
            elif eid in (0x1A45DFA3, 0x18538067, 0x1549A966):
                walk(pos, end, depth + 1)  # header / Segment / Info
            elif eid == 0x2AD7B1:  # TimestampScale
                scale = int.from_bytes(data[pos:end], "big")
            elif eid == 0x4489:  # Duration (float32/64)
                if esz == 4:
                    (duration_ticks,) = struct.unpack_from(
                        ">f", data, pos)
                elif esz == 8:
                    (duration_ticks,) = struct.unpack_from(
                        ">d", data, pos)
                else:
                    raise ValueError("bad EBML Duration size")
            pos = end

    walk(0, len(data), 0)
    if duration_ticks is None:
        raise ValueError("EBML stream without Duration")
    return {
        "format": doctype,
        "duration_ms": int(duration_ticks * scale / 1e6),
        "sample_rate": None,
        "channels": None,
        "width": None, "height": None,
        "bitrate_kbps": None,
        "n_frames": None,
    }


def encode_webm_shaped(duration_ms: int = 1800,
                       doctype: bytes = b"webm") -> bytes:
    """Minimal EBML header + Segment{Info{TimestampScale, Duration}}."""
    def el(eid: int, body: bytes) -> bytes:
        idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
        if len(body) > 126:
            raise ValueError("fixture element too long")
        return idb + bytes([0x80 | len(body)]) + body

    header = el(0x1A45DFA3, el(0x4282, doctype))
    info = el(0x1549A966,
              el(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
              + el(0x4489, struct.pack(">d", float(duration_ms))))
    return header + el(0x18538067, info)


# ----------------------------------------------------------------- Ogg


def probe_ogg(data: bytes) -> dict:
    if data[:4] != b"OggS":
        raise ValueError("not an Ogg payload")
    pos = 0
    rate = None
    codec = "unknown"
    preskip = 0
    channels = None
    last_granule = 0
    n_pages = 0
    while pos + 27 <= len(data):
        if data[pos: pos + 4] != b"OggS":
            raise ValueError("bad Ogg page capture pattern")
        (granule,) = struct.unpack_from("<q", data, pos + 6)
        nseg = data[pos + 26]
        seg_table = data[pos + 27: pos + 27 + nseg]
        if len(seg_table) < nseg:
            raise ValueError("truncated Ogg segment table")
        body = pos + 27 + nseg
        size = int(np.sum(np.frombuffer(seg_table, np.uint8)))
        if body + size > len(data):
            raise ValueError("truncated Ogg page body")
        payload = data[body: body + size]
        if n_pages == 0:
            if payload[:7] == b"\x01vorbis" and len(payload) >= 16:
                codec = "vorbis"
                channels = payload[11]
                (rate,) = struct.unpack_from("<I", payload, 12)
            elif payload[:8] == b"OpusHead" and len(payload) >= 14:
                codec = "opus"
                channels = payload[9]
                (preskip,) = struct.unpack_from("<H", payload, 10)
                rate = 48_000  # Opus granules always run at 48 kHz
        if granule > 0:
            last_granule = max(last_granule, granule)
        n_pages += 1
        pos = body + size
    if n_pages == 0 or rate is None:
        raise ValueError("Ogg without a recognized id header")
    samples = max(last_granule - (preskip if codec == "opus" else 0), 0)
    return {
        "format": f"ogg/{codec}",
        "duration_ms": int(samples * 1000 / rate),
        "sample_rate": rate,
        "channels": channels,
        "width": None, "height": None,
        "bitrate_kbps": None,
        "n_frames": n_pages,
    }


def encode_ogg_shaped(codec: str = "vorbis", rate: int = 44_100,
                      total_samples: int = 44_100 * 3,
                      channels: int = 2) -> bytes:
    """Minimal spec-shaped Ogg: id-header page + one data page whose
    granule position encodes the total sample count (CRCs zeroed —
    the probe reads structure, not checksums)."""
    def page(granule: int, payload: bytes, seq: int, flags: int) -> bytes:
        segs = []
        rest = len(payload)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        segs.append(rest)
        return (b"OggS" + bytes([0, flags])
                + struct.pack("<q", granule)
                + struct.pack("<III", 1, seq, 0)
                + bytes([len(segs)]) + bytes(segs) + payload)

    if codec == "vorbis":
        idh = (b"\x01vorbis" + struct.pack("<I", 0)
               + bytes([channels]) + struct.pack("<I", rate)
               + b"\x00" * 12 + b"\x01")
    elif codec == "opus":
        idh = (b"OpusHead" + bytes([1, channels])
               + struct.pack("<H", 312)  # pre-skip
               + struct.pack("<I", rate) + struct.pack("<hB", 0, 0))
    else:
        raise ValueError("codec must be vorbis or opus")
    return (page(0, idh, 0, 2)  # BOS
            + page(total_samples, b"\x00" * 64, 1, 4))  # EOS


# ------------------------------------------------------------- dispatch


def probe_media_bytes(data: bytes) -> dict:
    """Magic-byte dispatch over the compressed-container probes."""
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return probe_mp4(data)
    if data[:4] == b"\x1aE\xdf\xa3":
        return probe_webm(data)
    if data[:4] == b"OggS":
        return probe_ogg(data)
    if data[:3] == b"ID3" or (len(data) > 1 and data[0] == 0xFF
                              and (data[1] & 0xE0) == 0xE0):
        return probe_mp3(data)
    raise ValueError("unrecognized compressed-media container")


def probe_media(df, data_col: str = "data", out_col: str = "probe"):
    """Spark operator: header-level metadata for MP3/MP4/WebM/Ogg
    columns via ``mapInPandas`` (Arrow batches, no sample decode —
    the cheap pre-filter stage of a media pipeline)."""
    import pandas as pd

    from pyspark.sql import types as T

    out_fields = list(df.schema.fields) + [
        T.StructField(out_col, T.StructType([
            T.StructField("format", T.StringType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("bitrate_kbps", T.IntegerType()),
        ])),
    ]
    schema = T.StructType(out_fields)

    def run(batches):
        for pdf in batches:
            probes = []
            for b in pdf[data_col]:
                if b is None:
                    probes.append(None)
                    continue
                p = probe_media_bytes(bytes(b))
                probes.append({k: p.get(k) for k in (
                    "format", "duration_ms", "sample_rate", "channels",
                    "width", "height", "bitrate_kbps")})
            pdf[out_col] = probes
            yield pdf

    return df.mapInPandas(run, schema)

"""Container-metadata probe tests (operators/mediaprobe.py).

Fixtures are spec-shaped payloads built by the module's own encoders
(headers real, payloads zeroed) plus hand-computed duration
expectations that never run through the probe under test.  Mutation
fuzz holds the ValueError contract over all four container families.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from swiftlake_spark.operators.mediaprobe import (
    encode_mp3_shaped,
    encode_mp4_shaped,
    encode_ogg_shaped,
    encode_webm_shaped,
    probe_media,
    probe_media_bytes,
    probe_mp3,
)


class TestMp3:
    def test_duration_from_frame_walk(self):
        # 40 frames × 1152 samples at 44.1 kHz → 1044 ms (floor)
        p = probe_media_bytes(encode_mp3_shaped(40))
        assert p["format"] == "mp3"
        assert p["duration_ms"] == int(40 * 1152 * 1000 / 44100)
        assert p["sample_rate"] == 44100 and p["channels"] == 1
        assert p["bitrate_kbps"] == 128 and p["n_frames"] == 40

    def test_id3v2_skip_and_id3v1_tail(self):
        id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
        id3v1 = b"TAG" + b"\x00" * 125
        p = probe_media_bytes(id3v2 + encode_mp3_shaped(10) + id3v1)
        assert p["n_frames"] == 10

    def test_vbr_mean_bitrate(self):
        a = encode_mp3_shaped(10, kbps_idx=9)   # 128 kbps
        b = encode_mp3_shaped(10, kbps_idx=14)  # 320 kbps
        p = probe_mp3(a + b)
        assert p["n_frames"] == 20
        assert p["bitrate_kbps"] == (128 + 320) // 2

    def test_sample_rates_and_stereo(self):
        p = probe_mp3(encode_mp3_shaped(8, rate_idx=1, mono=False))
        assert p["sample_rate"] == 48000 and p["channels"] == 2

    def test_junk_prefix_resync(self):
        p = probe_mp3(b"\x00garbage\x12" + encode_mp3_shaped(5))
        assert p["n_frames"] == 5

    def test_no_sync_raises(self):
        with pytest.raises(ValueError):
            probe_mp3(b"\x00" * 5000)


class TestMp4:
    def test_mvhd_and_dimensions(self):
        p = probe_media_bytes(
            encode_mp4_shaped(duration_ms=2500, width=320, height=240))
        assert p["format"] == "mp4/isom"
        assert p["duration_ms"] == 2500
        assert (p["width"], p["height"]) == (320, 240)

    def test_timescale_conversion(self):
        p = probe_media_bytes(
            encode_mp4_shaped(duration_ms=1500, timescale=90_000))
        assert p["duration_ms"] == 1500

    def test_missing_mvhd_raises(self):
        data = encode_mp4_shaped()
        # truncate to the ftyp box only
        (sz,) = struct.unpack_from(">I", data, 0)
        with pytest.raises(ValueError):
            probe_media_bytes(data[:sz])


class TestWebm:
    def test_duration_and_doctype(self):
        p = probe_media_bytes(encode_webm_shaped(1800))
        assert p["format"] == "webm" and p["duration_ms"] == 1800
        p = probe_media_bytes(
            encode_webm_shaped(900, doctype=b"matroska"))
        assert p["format"] == "matroska" and p["duration_ms"] == 900

    def test_missing_duration_raises(self):
        # header only, no Segment/Info
        data = encode_webm_shaped(100)
        with pytest.raises(ValueError):
            probe_media_bytes(data[:8])


class TestOgg:
    def test_vorbis_duration(self):
        p = probe_media_bytes(
            encode_ogg_shaped("vorbis", rate=44100,
                              total_samples=44100 * 3))
        assert p["format"] == "ogg/vorbis"
        assert p["duration_ms"] == 3000
        assert p["sample_rate"] == 44100 and p["channels"] == 2

    def test_opus_preskip(self):
        p = probe_media_bytes(
            encode_ogg_shaped("opus", total_samples=48000 * 2 + 312))
        assert p["format"] == "ogg/opus"
        assert p["duration_ms"] == 2000  # granule minus 312 pre-skip

    def test_unknown_codec_raises(self):
        data = bytearray(encode_ogg_shaped("vorbis"))
        i = data.find(b"\x01vorbis")
        data[i: i + 7] = b"\x01xxxxxx"
        with pytest.raises(ValueError):
            probe_media_bytes(bytes(data))


def test_unknown_container_raises():
    with pytest.raises(ValueError):
        probe_media_bytes(b"RIFF....WAVE")  # decodable, not probe-able
    with pytest.raises(ValueError):
        probe_media_bytes(b"\x00\x01\x02\x03" * 8)


def test_spark_operator(spark):
    rows = [
        (0, bytearray(encode_mp3_shaped(20))),
        (1, bytearray(encode_mp4_shaped(duration_ms=1200, width=64,
                                        height=48))),
        (2, bytearray(encode_webm_shaped(750))),
        (3, bytearray(encode_ogg_shaped("opus",
                                        total_samples=48000 + 312))),
    ]
    df = spark.createDataFrame(rows, "id bigint, data binary")
    out = {r["id"]: r["probe"] for r in
           probe_media(df, "data").collect()}
    assert out[0]["format"] == "mp3"
    assert out[0]["duration_ms"] == int(20 * 1152 * 1000 / 44100)
    assert out[1]["width"] == 64 and out[1]["duration_ms"] == 1200
    assert out[2]["format"] == "webm" and out[2]["duration_ms"] == 750
    assert out[3]["format"] == "ogg/opus"
    assert out[3]["duration_ms"] == 1000


def test_mutation_fuzz_contract():
    rng = np.random.default_rng(21)
    payloads = [
        encode_mp3_shaped(15),
        encode_mp4_shaped(),
        encode_webm_shaped(500),
        encode_ogg_shaped("vorbis"),
        encode_ogg_shaped("opus"),
    ]
    n = 0
    for base in payloads:
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
                p = probe_media_bytes(bytes(b))
                assert isinstance(p, dict)
            except ValueError:
                pass
            n += 1
    assert n == 500

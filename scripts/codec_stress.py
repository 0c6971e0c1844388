"""1x vs 10x scale rehearsal for the r11 decode paths (codec floor).

The dedup/join families were rehearsed in r9/r10 (corpus_stress.py,
skew_stress.py) because their cost is data-SHAPED; the codec family's
cost is per-row work inside ``mapInPandas`` Arrow batches, so the claim
to verify is different: decode wall-clock scales LINEARLY with payload
count (no driver collection, no batch blow-up), for every container the
r11 floor covers — mixed images (PNG/JPEG/arith-JPEG/TIFF-deflate/
CCITT-G4/GIF), audio (WAV-PCM / WAV-mulaw / FLAC), and AVI/MJPG +
Y4M video.

Measures wall time at 1x and 10x per family and prints a table for
PERF.md.  Pass signal: 10x wall <= ~10x the 1x wall (batch overheads
amortize, so usually well under), and constant per-payload cost.

Usage: python scripts/codec_stress.py [factor]      (default 10)
"""

from __future__ import annotations

import os
import struct
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from swiftlake_spark.config import EngineConfig  # noqa: E402
from swiftlake_spark.session import build_session  # noqa: E402
from swiftlake_spark.operators.multimodal import (  # noqa: E402
    decode_audio,
    decode_image,
    encode_avi_mjpeg,
    encode_gif,
    encode_png,
    encode_tiff,
    encode_wav,
    sample_frames,
    ulaw_encode,
)
from swiftlake_spark.operators.jpeg import encode_jpeg  # noqa: E402

BASE = 400  # payloads per family at 1x


def synth_images(n: int, seed: int = 11) -> list[bytes]:
    from swiftlake_spark.operators.jpeg_arith import encode_jpeg_arith

    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        h, w = int(rng.integers(24, 64)), int(rng.integers(24, 64))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(yy * 3 + xx + i) % 256, (yy + i) % 256,
                        (xx * 2) % 256], -1).astype(np.uint8)
        k = i % 7
        if k == 0:
            out.append(encode_png(img))
        elif k == 1:
            out.append(encode_jpeg(img, quality=90))
        elif k == 2:
            out.append(encode_tiff(img, deflate=True, predictor=2))
        elif k == 4:  # r11 session 2: QM entropy decode in the mix
            out.append(encode_jpeg_arith(img, quality=90))
        elif k == 5:  # r11 session 2: G4 fax decode in the mix
            bil = np.where(img[:, :, 0] < 128, 0, 255).astype(np.uint8)
            out.append(encode_tiff(bil, ccitt=4))
        elif k == 6:  # r12: hierarchical pyramid decode in the mix
            from swiftlake_spark.operators.jpeg_hier import (
                encode_jpeg_hierarchical,
            )

            out.append(encode_jpeg_hierarchical(
                img, quality=90, levels=2,
                lossless_final=bool(i % 2), arith=bool(i % 4 == 2)))
        else:
            # GIF needs a <=256-color palette: gradient frame
            g = ((yy * 7 + xx) % 64).astype(np.uint8)
            out.append(encode_gif([np.stack([g * 4, g * 2, g], -1)]))
    return out


def synth_audio(n: int) -> list[bytes]:
    from swiftlake_spark.operators.flac import encode_flac

    out = []
    for i in range(n):
        x = np.sin(np.linspace(0, 50, 4000) * (1 + i % 7)).astype(np.float32)
        if i % 3 == 0:
            out.append(encode_wav(x, 8000))
        elif i % 3 == 1:  # G.711 mu-law WAV
            mu = ulaw_encode(np.round(x * 32767).astype(np.int32)).tobytes()
            fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
            out.append(b"RIFF" + struct.pack("<I", 28 + len(mu)) + b"WAVE"
                       + b"fmt " + struct.pack("<I", 16) + fmt
                       + b"data" + struct.pack("<I", len(mu)) + mu)
        else:  # r11 session 2: FLAC (fixed predictors + Rice)
            q = np.round(x * 32767).astype(np.int64)
            out.append(encode_flac(q, rate=8000, block_size=1024))
    return out


def synth_video(n: int) -> list[bytes]:
    from swiftlake_spark.operators.multimodal import encode_y4m

    yy, xx = np.mgrid[0:24, 0:32]
    out = []
    for i in range(n):
        frames = [np.stack([(yy * 3 + k + i) % 256, (xx + k) % 256,
                            (yy + xx) % 256], -1).astype(np.uint8)
                  for k in range(6)]
        if i % 2 == 0:
            out.append(encode_avi_mjpeg(frames, fps=12, quality=85))
        else:  # r11 session 2: Y4M with the pointer-skip sampling
            out.append(encode_y4m(frames, fps=12, colorspace="C444"))
    return out


def run_family(spark, name: str, payloads: list[bytes], op) -> float:
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "id bigint, data binary").repartition(32)
    t0 = time.time()
    n = op(df).count()
    dt = time.time() - t0
    assert n == len(payloads), (name, n)
    return dt


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = build_session(EngineConfig(app_name="codec-stress"))
    fams = {
        "images(mixed)": (synth_images, lambda d: decode_image(d, "data")),
        "audio(wav+g711)": (synth_audio, lambda d: decode_audio(d, "data")),
        "video(avi-mjpg)": (
            synth_video,
            lambda d: sample_frames(d, "data", every_ms=250)),
    }
    print(f"| family | 1x ({BASE}) | {factor}x ({BASE * factor}) | ratio |")
    print("|---|---|---|---|")
    for name, (synth, op) in fams.items():
        t1 = run_family(spark, name, synth(BASE), op)
        t1 = min(t1, run_family(spark, name, synth(BASE), op))  # warm
        tn = run_family(spark, name, synth(BASE * factor), op)
        print(f"| {name} | {t1:.2f}s | {tn:.2f}s | {tn / t1:.1f}x |")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

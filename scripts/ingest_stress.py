"""1x vs 10x scale rehearsal for the document-ingestion paths.

Companion to codec_stress.py (r11): the extraction family's cost is
also per-row work inside ``mapInPandas``, so the claim to verify is
the same — wall-clock scales (sub-)linearly with payload count, no
driver collection, no batch blow-up — for the four entry stages:

- warc: WARC.gz blobs (3 records each) → exploded response rows;
- documents: mixed PDF / DOCX / HTML → text via the unified dispatch;
- probe: MP3/MP4/WebM/Ogg header-level metadata;
- webdataset: tar shards → grouped sample rows;
- subtitles+epub: SRT / WebVTT cues + EPUB chapters via the dispatch
  (r12, VERDICT r11 ask #9);
- pdf_images: PDFs wrapping JPEG XObjects → exploded decoded-image
  rows — the RECURSIVE path (PDF → image → codec floor) whose explode
  factor must stay payload-bound (r12).

Usage: python scripts/ingest_stress.py [factor]      (default 10)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from swiftlake_spark.config import EngineConfig  # noqa: E402
from swiftlake_spark.session import build_session  # noqa: E402
from swiftlake_spark.operators.doctext import (  # noqa: E402
    encode_docx,
    encode_epub,
    extract_document_text,
)
from swiftlake_spark.operators.mediaprobe import (  # noqa: E402
    encode_mp3_shaped,
    encode_mp4_shaped,
    encode_ogg_shaped,
    encode_webm_shaped,
    probe_media,
)
from swiftlake_spark.operators.pdftext import (  # noqa: E402
    encode_pdf,
    encode_pdf_with_images,
    extract_pdf_images,
)
from swiftlake_spark.operators.warc import (  # noqa: E402
    encode_warc,
    warc_records,
)
from swiftlake_spark.operators.archives import (  # noqa: E402
    encode_webdataset,
    webdataset_samples,
)
from swiftlake_spark.operators.multimodal import encode_png  # noqa: E402

import numpy as np  # noqa: E402

BASE = 400  # payloads per family at 1x


def synth_warc(n: int) -> list[bytes]:
    out = []
    for i in range(n):
        recs = [
            {"type": "warcinfo", "payload": b"software: stress\r\n"},
            {"type": "response", "uri": f"http://x.example/{i}",
             "payload": (f"<html><body><h1>Doc {i}</h1>"
                         f"<p>{'crawl text ' * 30}</p></body></html>"
                         ).encode()},
            {"type": "response", "uri": f"http://y.example/{i}",
             "payload": (f"<html><body><p>{'more words ' * 20}"
                         f"</p></body></html>").encode()},
        ]
        out.append(encode_warc(recs, per_record_gzip=bool(i % 2)))
    return out


def synth_documents(n: int) -> list[bytes]:
    out = []
    for i in range(n):
        text = f"Document {i}. " + "sentence with words. " * 40
        k = i % 3
        if k == 0:
            out.append(encode_pdf([text, text], compress=True))
        elif k == 1:
            out.append(encode_docx([text] * 3))
        else:
            out.append((f"<html><body><h1>t{i}</h1><p>{text}</p>"
                        f"</body></html>").encode())
    return out


def synth_probe(n: int) -> list[bytes]:
    out = []
    for i in range(n):
        k = i % 4
        if k == 0:
            out.append(encode_mp3_shaped(60, kbps_idx=5 + i % 8))
        elif k == 1:
            out.append(encode_mp4_shaped(duration_ms=1000 + i))
        elif k == 2:
            out.append(encode_webm_shaped(500 + i))
        else:
            out.append(encode_ogg_shaped(
                "opus" if i % 2 else "vorbis",
                total_samples=48_000 + i * 97))
    return out


def synth_wds(n: int) -> list[bytes]:
    rng = np.random.default_rng(7)
    out = []
    for i in range(n):
        samples = []
        for j in range(4):
            img = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
            samples.append({"__key__": f"s{i:05d}/{j}",
                            "png": encode_png(img),
                            "txt": f"caption {i}/{j}".encode()})
        out.append(encode_webdataset(samples, gz=bool(i % 2)))
    return out


def synth_subs_epub(n: int) -> list[bytes]:
    out = []
    for i in range(n):
        text = f"cue text {i} " + "line of dialog " * 10
        k = i % 3
        if k == 0:
            out.append("".join(
                f"{j}\n00:00:{j:02d},000 --> 00:00:{j + 1:02d},000\n"
                f"{text}\n\n" for j in range(1, 6)).encode())
        elif k == 1:
            out.append(("WEBVTT\n\n" + "".join(
                f"00:00:{j:02d}.000 --> 00:00:{j + 1:02d}.000\n"
                f"{text}\n\n" for j in range(1, 6))).encode())
        else:
            out.append(encode_epub([text] * 3))
    return out


def synth_pdf_images(n: int) -> list[bytes]:
    rng = np.random.default_rng(11)
    out = []
    for i in range(n):
        imgs = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
                for _ in range(2)]
        out.append(encode_pdf_with_images(imgs, text=f"scan {i}"))
    return out


def run_family(spark, name, payloads, op) -> float:
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "id bigint, data binary").repartition(32)
    t0 = time.time()
    n = op(df).count()
    dt = time.time() - t0
    assert n >= len(payloads), (name, n)
    return dt


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = build_session(EngineConfig(app_name="ingest-stress"))
    fams = {
        "warc(explode)": (synth_warc, lambda d: warc_records(d, "data")),
        "documents(pdf+docx+html)": (
            synth_documents,
            lambda d: extract_document_text(d, "data")),
        "probe(mp3+mp4+webm+ogg)": (
            synth_probe, lambda d: probe_media(d, "data")),
        "webdataset(4-sample shards)": (
            synth_wds, lambda d: webdataset_samples(d, "data")),
        "subtitles+epub": (
            synth_subs_epub, lambda d: extract_document_text(d, "data")),
        "pdf_images(2 jpeg/pdf)": (
            synth_pdf_images, lambda d: extract_pdf_images(d, "data")),
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

"""TAR / WebDataset archive ingestion.

Large-scale multimodal training sets ship as tar shards of grouped
samples (the WebDataset convention: ``<key>.jpg`` + ``<key>.txt`` +
``<key>.json`` per sample, thousands of samples per shard) — ≙
reference source-ingestion intent, SURVEY §2 sources; parsing is
stdlib ``tarfile``/``gzip``.

- ``iter_tar_members``: plain or gzip tar → (name, bytes) per regular
  member, bounded per-member size;
- ``group_webdataset``: members → samples keyed by the basename
  before the FIRST dot (so ``a/001.seg.png`` groups under ``a/001``
  with field ``seg.png``), archive order preserved;
- ``webdataset_samples``: the Spark operator — one WARC-style explode
  from shard blobs to sample rows carrying a ``map<string,binary>``
  of fields, ready for decode_image / extract_document_text /
  decode_audio on the individual fields.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zlib


def iter_tar_members(data: bytes, *, max_member: int = 1 << 28):
    """Yield (name, payload) for every regular file in a tar / tar.gz
    blob.  Corrupt archives raise ValueError."""
    if data[:2] == b"\x1f\x8b":
        try:
            with gzip.GzipFile(fileobj=io.BytesIO(data)) as f:
                data = f.read(1 << 30)
        except (OSError, EOFError, zlib.error) as exc:
            raise ValueError(f"bad tar.gz container: {exc}") from None
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:")
    except tarfile.TarError as exc:
        raise ValueError(f"not a tar archive: {exc}") from None
    with tf:
        try:
            for m in tf:
                if not m.isreg():
                    continue
                if m.size > max_member:
                    raise ValueError(
                        f"tar member {m.name!r} exceeds size bound")
                f = tf.extractfile(m)
                if f is None:
                    continue
                yield m.name, f.read(max_member)
        except tarfile.TarError as exc:
            raise ValueError(f"corrupt tar archive: {exc}") from None


def group_webdataset(members) -> list[dict]:
    """(name, bytes) pairs → WebDataset samples: key = path up to the
    first dot in the basename, fields keyed by the remainder."""
    samples: dict[str, dict] = {}
    order: list[str] = []
    for name, payload in members:
        base = name.rsplit("/", 1)[-1]
        if "." in base:
            stem, ext = base.split(".", 1)
        else:
            stem, ext = base, ""
        prefix = name[: len(name) - len(base)]
        key = prefix + stem
        if key not in samples:
            samples[key] = {"__key__": key}
            order.append(key)
        if ext == "__key__":
            # a member literally named '<stem>.__key__' must not
            # clobber the reserved key slot (it would put bytes into
            # the StringType sample_key column downstream)
            ext = "__key__.raw"
        samples[key][ext] = payload
    return [samples[k] for k in order]


def webdataset_samples(df, data_col: str = "data"):
    """Spark operator: EXPLODE tar/WebDataset shard blobs into one row
    per sample — (sample_key, fields map<string,binary>).  Downstream
    stages pick fields out of the map (``element_at(fields, 'jpg')``)
    and feed the existing decode/extract operators."""
    from pyspark.sql import types as T

    from swiftlake_spark.operators.explode_util import explode_blobs

    def rows_for(blob: bytes):
        for s in group_webdataset(iter_tar_members(blob)):
            yield {"sample_key": s["__key__"],
                   "fields": {k: v for k, v in s.items()
                              if k != "__key__"}}

    return explode_blobs(df, data_col, [
        T.StructField("sample_key", T.StringType()),
        T.StructField("fields",
                      T.MapType(T.StringType(), T.BinaryType())),
    ], rows_for)


def encode_webdataset(samples: list[dict], *, gz: bool = False
                      ) -> bytes:
    """samples [{__key__, <ext>: bytes...}] → tar shard (for tests)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for s in samples:
            key = s["__key__"]
            for ext, payload in s.items():
                if ext == "__key__":
                    continue
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    out = buf.getvalue()
    return gzip.compress(out) if gz else out

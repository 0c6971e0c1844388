"""Multimodal column conventions + processing plumbing.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; heavy decode / feature-extraction runs in Arrow-batched
``mapInPandas`` so the Spark-side contract (schema, partitioning, batch
shape) is real even where the codec itself is stubbed.

The actual decoders (PIL/ffmpeg/torchaudio) are NOT in this
environment; :func:`decode_image` & friends raise
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake (seeded from the payload bytes) produces stable
features so pipelines and tests can run end-to-end.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical multimodal column schema: (data, meta)
MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media_meta(
    df: DataFrame, data_col: str, fmt: str, out_col: str = "meta"
) -> DataFrame:
    """Fill the metadata struct for an existing binary column (sizes are
    real; dimensions need decode → left NULL here)."""
    return df.withColumn(
        out_col,
        F.struct(
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.length(F.col(data_col)).cast("bigint").alias("n_bytes"),
        ),
    )


_FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = _FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real image/audio encoder: seeds a PRNG
    from the payload CRC so the 'embedding' is stable across runs."""
    rng = np.random.RandomState(zlib.crc32(payload) & 0x7FFFFFFF)
    return rng.standard_normal(dim).astype(np.float32)


def decode_image(
    df: DataFrame,
    data_col: str = "data",
    out_col: str = "features",
    *,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract an image column via ``mapInPandas``.

    STUB: real decoding needs an image library absent from this
    environment.  With ``fake=True`` a deterministic payload-seeded
    feature vector flows through the identical Spark plumbing (schema,
    Arrow batches, partition preservation)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this environment); "
            "pass fake=True for the deterministic test double"
        )
    out_fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.FloatType()))
    ]
    out_schema = T.StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = [
                None if b is None else _fake_features(bytes(b)).tolist()
                for b in pdf[data_col]
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)


def resize_image(
    df: DataFrame, data_col: str = "data", *, width: int, height: int, fake: bool = False
) -> DataFrame:
    """STUB resize: real path needs an image library.  The fake keeps the
    payload but rewrites the metadata dimensions (plumbing-true)."""
    if not fake:
        raise NotImplementedError("image resize requires an image library")
    return df.withColumn(
        "meta",
        F.col("meta").withField("width", F.lit(width).cast("int")).withField(
            "height", F.lit(height).cast("int")
        ),
    )


def sample_frames(
    df: DataFrame,
    data_col: str = "data",
    *,
    every_ms: int,
    fake: bool = False,
    out_col: str = "frames",
) -> DataFrame:
    """STUB video frame sampling: emits one fake frame-feature per
    ``every_ms`` of (fake) duration; real path needs ffmpeg."""
    if not fake:
        raise NotImplementedError("frame sampling requires ffmpeg bindings")
    out_fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.ArrayType(T.FloatType())))
    ]
    out_schema = T.StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for b in pdf[data_col]:
                if b is None:
                    frames.append(None)
                    continue
                payload = bytes(b)
                n = max(1, (len(payload) % 5000) // max(every_ms, 1) + 1)
                frames.append(
                    [_fake_features(payload + bytes([i % 256])).tolist() for i in range(n)]
                )
            pdf[out_col] = frames
            yield pdf

    return df.mapInPandas(run, out_schema)


def decode_audio(
    df: DataFrame,
    data_col: str = "data",
    out_col: str = "audio_features",
    *,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract an audio column via ``mapInPandas``
    (completes the image/audio/video triad).

    STUB: real decoding needs torchaudio/ffmpeg, absent here.  With
    ``fake=True`` the payload-seeded deterministic features flow through
    the identical plumbing, plus a struct of waveform-style scalars
    (duration from byte length at a nominal 16 kB/s, fake rms / zero-
    crossing rate) so downstream schemas are realistic."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires torchaudio/ffmpeg (not in this "
            "environment); pass fake=True for the deterministic test double"
        )
    out_fields = df.schema.fields + [
        T.StructField(
            out_col,
            T.StructType(
                [
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("rms", T.FloatType()),
                    T.StructField("zcr", T.FloatType()),
                    T.StructField("mel", T.ArrayType(T.FloatType())),
                ]
            ),
        )
    ]
    out_schema = T.StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[data_col]:
                if b is None:
                    feats.append(None)
                    continue
                payload = bytes(b)
                mel = _fake_features(payload)
                feats.append(
                    {
                        "duration_ms": int(len(payload) * 1000 / 16_000),
                        "rms": float(np.abs(mel).mean()),
                        "zcr": float((np.diff(np.sign(mel)) != 0).mean()),
                        "mel": mel.tolist(),
                    }
                )
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(run, out_schema)

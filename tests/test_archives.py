"""TAR / WebDataset ingestion tests (operators/archives.py) incl. the
multimodal composition: shard → samples → decode the image field with
the existing codec dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from swiftlake_spark.operators.archives import (
    encode_webdataset,
    group_webdataset,
    iter_tar_members,
    webdataset_samples,
)


def _shard(n=4, seed=0):
    from swiftlake_spark.operators.multimodal import encode_png

    rng = np.random.default_rng(seed)
    samples = []
    for i in range(n):
        img = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
        samples.append({
            "__key__": f"shard0/{i:05d}",
            "png": encode_png(img),
            "txt": f"caption for sample {i}".encode(),
            "meta.json": b'{"ok": true}',
        })
    return samples


@pytest.mark.parametrize("gz", [False, True])
def test_member_walk_and_grouping(gz):
    data = encode_webdataset(_shard(), gz=gz)
    members = list(iter_tar_members(data))
    assert len(members) == 12  # 4 samples × 3 fields
    grouped = group_webdataset(members)
    assert [g["__key__"] for g in grouped] == \
        [f"shard0/{i:05d}" for i in range(4)]
    # first-dot split: 'meta.json' stays one field name
    assert set(grouped[0]) == {"__key__", "png", "txt", "meta.json"}
    assert grouped[1]["txt"] == b"caption for sample 1"


def test_corrupt_archives_raise():
    with pytest.raises(ValueError):
        list(iter_tar_members(b"definitely not a tar" * 40))
    with pytest.raises(ValueError):
        list(iter_tar_members(b"\x1f\x8bbroken gzip"))


def test_spark_explode_and_image_field_decode(spark):
    """Shard blobs → sample rows → decode the 'png' field with the
    EXISTING image pipeline (the WebDataset training-prep shape)."""
    from pyspark.sql import functions as F

    from swiftlake_spark.operators.multimodal import decode_image

    blobs = [(0, bytearray(encode_webdataset(_shard(3, seed=1)))),
             (1, bytearray(encode_webdataset(_shard(2, seed=2),
                                             gz=True)))]
    df = spark.createDataFrame(blobs, "shard bigint, data binary")
    samples = webdataset_samples(df, "data")
    assert samples.count() == 5
    imgs = samples.select(
        "shard", "sample_key",
        F.element_at("fields", "png").alias("data"),
        F.element_at("fields", "txt").cast("string").alias("caption"))
    feats = decode_image(imgs, "data").collect()
    assert len(feats) == 5
    for r in feats:
        assert r["features"][0] == 10.0 and r["features"][1] == 8.0
        assert r["caption"].startswith("caption for sample")


def test_mutation_fuzz_contract():
    rng = np.random.default_rng(47)
    bases = [encode_webdataset(_shard(2)),
             encode_webdataset(_shard(2), gz=True)]
    for base in bases:
        for k in range(100):
            b = bytearray(base)
            if k % 2 == 0:
                b[int(rng.integers(0, len(b)))] ^= \
                    1 << int(rng.integers(0, 8))
            else:
                b = b[: int(rng.integers(1, len(b)))]
            try:
                for _name, _payload in iter_tar_members(bytes(b)):
                    pass
            except ValueError:
                pass

"""FileIO storage seam: the in-memory object-store fake must carry the
whole commit protocol (conditional-put claim, no rename) and the Iceberg
interop read path (staging downloads) — ≙ reference FileIO +
aws/SwiftLakeS3FileIO.java:109-117 (newInputFiles downloads to a local
staging dir; writes upload staged files)."""

import json
import threading

import pytest

from swiftlake_spark import fileio as fio
from swiftlake_spark.tables.metadata import (
    CommitConflict,
    TableMetadata,
    load_metadata,
    write_new_version,
)


@pytest.fixture(autouse=True)
def _fresh_stores():
    for name in ("t", "cc", "ice"):
        fio.reset_memory_store(name)
    yield
    for name in ("t", "cc", "ice"):
        fio.reset_memory_store(name)


# ------------------------------------------------------------- primitives
def test_memory_fileio_primitives(tmp_path):
    io = fio.MemoryFileIO(staging_dir=str(tmp_path / "stage"))
    io.write_text("mem://t/a/b.txt", "hello")
    assert io.exists("mem://t/a/b.txt")
    assert io.read_text("mem://t/a/b.txt") == "hello"
    assert io.list("mem://t/a") == ["b.txt"]
    io.write_text("mem://t/a/c/d.txt", "x")
    assert io.list("mem://t/a") == ["b.txt", "c"]  # S3-style prefix listing
    assert not io.exists("mem://t/missing")
    with pytest.raises(FileNotFoundError):
        io.read_bytes("mem://t/missing")

    # atomic claim = conditional put
    io.try_claim("mem://t/claim.json", "one")
    with pytest.raises(FileExistsError):
        io.try_claim("mem://t/claim.json", "two")
    assert io.read_text("mem://t/claim.json") == "one"

    # replace is a plain overwrite (per-key atomic PUT)
    io.replace_text("mem://t/claim.json", "three")
    assert io.read_text("mem://t/claim.json") == "three"

    # staging download round-trips bytes for local readers
    lp = io.local_path("mem://t/a/b.txt")
    assert open(lp).read() == "hello"

    # upload publishes a local file
    src = tmp_path / "up.bin"
    src.write_bytes(b"\x00\x01")
    io.upload(str(src), "mem://t/up.bin")
    assert io.read_bytes("mem://t/up.bin") == b"\x00\x01"

    io.delete("mem://t/up.bin")
    assert not io.exists("mem://t/up.bin")


def test_scheme_dispatch():
    assert isinstance(fio.fileio_for("/tmp/x"), fio.LocalFileIO)
    assert isinstance(fio.fileio_for("file:///tmp/x"), fio.LocalFileIO)
    assert isinstance(fio.fileio_for("mem://t/x"), fio.MemoryFileIO)
    with pytest.raises(NotImplementedError):
        fio.fileio_for("s3://bucket/key")
    assert fio.join("mem://t/tbl", "metadata", "v1.json") == "mem://t/tbl/metadata/v1.json"


# ------------------------------------------- commit protocol on the fake
def _meta(location: str) -> TableMetadata:
    return TableMetadata(
        table_uuid="u1",
        location=location,
        schema_json={"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}}
        ]},
        partition_spec=[],
        sort_order=[],
        properties={},
        snapshots=[],
        refs={},
    )


def test_commit_conflict_on_memory_store():
    """Two writers race the same next version against the object-store
    fake: exactly one wins; the loser sees CommitConflict from the
    conditional put — no POSIX O_EXCL involved."""
    loc = "mem://cc/tbl"
    a, b = _meta(loc), _meta(loc)
    write_new_version(a)
    assert a.version == 1
    with pytest.raises(CommitConflict):
        write_new_version(b)
    # loser reloads and retries on top of the winner
    reloaded = load_metadata(loc)
    assert reloaded.version == 1
    write_new_version(reloaded)
    assert reloaded.version == 2
    assert load_metadata(loc).version == 2


def test_commit_claim_threaded_race():
    """N concurrent claimants, exactly one winner per version."""
    loc = "mem://cc/race"
    base = _meta(loc)
    write_new_version(base)
    wins, losses = [], []

    def contend():
        m = load_metadata(loc)
        try:
            write_new_version(m)
            wins.append(m.version)
        except CommitConflict:
            losses.append(1)

    threads = [threading.Thread(target=contend) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) >= 1
    assert len(set(wins)) == len(wins)  # no two winners claimed the same version
    assert len(wins) + len(losses) == 8
    io = fio.fileio_for(loc)
    final = load_metadata(loc)
    assert final.version == 1 + len(wins)
    # every committed version is a valid JSON document
    for v in range(1, final.version + 1):
        json.loads(io.read_text(f"mem://cc/race/metadata/v{v}.json"))


# ------------------------------------------------- Iceberg interop on mem
def rows(df, *cols):
    out = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in out.collect())


def test_iceberg_read_through_memory_store(spark, tmp_path):
    """Write an Iceberg table staged locally with mem:// URIs embedded,
    publish to the fake store, then read it back purely through FileIO
    staging — metadata json, avro manifests AND parquet data files all
    come out of the object store."""
    from swiftlake_spark.sources.iceberg import IcebergTable
    from swiftlake_spark.sources.iceberg_write import IcebergWriter

    remote = "mem://ice/t1"
    stage = str(tmp_path / "ice_stage")
    w = IcebergWriter(stage, uri_base=remote)
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.5), (3, "c", None)],
        "id BIGINT, name STRING, amount DOUBLE",
    )
    w.append(df)
    w.publish(remote)

    t = IcebergTable(spark, remote)
    assert rows(t.scan(), "id", "name", "amount") == [
        (1, "a", 10.0), (2, "b", 20.5), (3, "c", None),
    ]
    # a second snapshot published incrementally is visible after re-open
    w.append(spark.createDataFrame([(4, "d", 4.0)], df.schema))
    w.publish(remote)
    t2 = IcebergTable(spark, remote)
    assert t2.scan().count() == 4

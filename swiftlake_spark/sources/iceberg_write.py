"""Minimal Iceberg v2 table writer (spec-conformant layout, small tables).

Produces a directory any Iceberg runtime can read: parquet data files
with ``PARQUET:field_id`` column metadata, Avro manifests + manifest
list (sources/avro.py), ``v<N>.metadata.json`` and
``version-hint.text``.  Exists for interop round-trip tests (the reader
in sources/iceberg.py must be exercised against real wire format) and
for exporting small dimension tables to Iceberg consumers.

SCALE CAVEAT: rows pass through the driver via Arrow (`toArrow`), so
this is for bounded tables only — the distributed write path of this
engine is the native format (tables/table.py); exporting 100 TB to
Iceberg would need a Spark-side writer stamping field IDs, which plain
``df.write.parquet`` cannot do.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from swiftlake_spark.sources.avro import write_container

_SPARK_TO_ICEBERG = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.DateType(): "date",
    T.StringType(): "string",
    T.BinaryType(): "binary",
    T.TimestampType(): "timestamptz",
    T.TimestampNTZType(): "timestamp",
}

# Avro schemas: the v2 manifest-list / manifest_entry subset every
# reader must understand (Iceberg spec "Manifests" / "Manifest Lists").
MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


_AVRO_PRIM = {
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BooleanType(): "boolean",
}


def _kv_array(name: str, value_type: str) -> dict:
    """Iceberg's array-as-map wire shape: array<record{key, value}>."""
    return {
        "type": "array",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int"},
                {"name": "value", "type": value_type},
            ],
        },
        "logicalType": "map",
    }


def _manifest_schema(partition_fields: list[dict] | None = None) -> dict:
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": {
                    "type": "record",
                    "name": "r102",
                    "fields": partition_fields or [],
                },
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {
                "name": "null_value_counts",
                "type": ["null", _kv_array("k121_v122", "long")],
                "field-id": 110,
            },
            {
                "name": "lower_bounds",
                "type": ["null", _kv_array("k126_v127", "bytes")],
                "field-id": 125,
            },
            {
                "name": "upper_bounds",
                "type": ["null", _kv_array("k129_v130", "bytes")],
                "field-id": 128,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"], "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


def _stamp_arrow_schema(schema: pa.Schema, ids: dict[str, int]) -> pa.Schema:
    """Attach PARQUET:field_id metadata to every (nested) struct field,
    descending lists as ``.element`` and maps as ``.key``/``.value`` —
    the same path convention the reader resolves by."""

    def stamp_field(field: pa.Field, path: str) -> pa.Field:
        f2 = pa.field(field.name, stamp_type(field.type, path), field.nullable)
        fid = ids.get(path)
        if fid is not None:
            f2 = f2.with_metadata({b"PARQUET:field_id": str(fid).encode()})
        return f2

    def stamp_type(t: pa.DataType, path: str) -> pa.DataType:
        if pa.types.is_struct(t):
            return pa.struct(
                [stamp_field(t.field(i), f"{path}.{t.field(i).name}" if path else t.field(i).name)
                 for i in range(t.num_fields)]
            )
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return pa.list_(stamp_type(t.value_type, f"{path}.element"))
        if pa.types.is_map(t):
            return pa.map_(
                stamp_type(t.key_type, f"{path}.key"),
                stamp_type(t.item_type, f"{path}.value"),
            )
        return t

    return pa.schema([stamp_field(schema.field(i), schema.field(i).name)
                      for i in range(len(schema.names))])


def _pvalue(v: Any, transform: str) -> Any:
    import datetime as _dt

    from swiftlake_spark.tables.transforms import _mm3_serialize, murmur3_32

    if v is None:
        return None
    if transform == "identity":
        # spec partition-value encoding: dates as int days, timestamps as
        # long micros (what readers decode from avro manifests)
        if isinstance(v, _dt.datetime):
            epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
            return (v - epoch) // _dt.timedelta(microseconds=1)
        if isinstance(v, _dt.date):
            return (v - _dt.date(1970, 1, 1)).days
        return v
    if transform.startswith("bucket["):
        n = int(transform[len("bucket["):-1])
        return (murmur3_32(_mm3_serialize(v)) & 0x7FFFFFFF) % n
    raise ValueError(f"writer supports identity/bucket, not {transform!r}")


def _stats_for(tbl: pa.Table, schema: T.StructType, field_ids: dict[str, int]):
    """Per-column null counts + min/max bounds in the Iceberg
    single-value binary serialization (spec Appendix D)."""
    import struct as _s

    import pyarrow.compute as pc

    _ENC = {
        T.IntegerType(): lambda v: _s.pack("<i", v),
        T.LongType(): lambda v: _s.pack("<q", v),
        T.FloatType(): lambda v: _s.pack("<f", v),
        T.DoubleType(): lambda v: _s.pack("<d", v),
        T.StringType(): lambda v: v.encode("utf-8"),
        T.BooleanType(): lambda v: b"\x01" if v else b"\x00",
    }
    nulls, lowers, uppers = [], [], []
    for f in schema.fields:
        fid = field_ids[f.name]
        col = tbl.column(f.name)
        nulls.append({"key": fid, "value": col.null_count})
        enc = _ENC.get(f.dataType)
        if enc is None or col.null_count == len(col):
            continue
        lo, hi = pc.min(col).as_py(), pc.max(col).as_py()
        if lo is not None:
            lowers.append({"key": fid, "value": enc(lo)})
            uppers.append({"key": fid, "value": enc(hi)})
    return nulls, lowers, uppers


def _ice_type(dtype: T.DataType, prefix: str, ids: dict[str, int], alloc) -> Any:
    """Spark type → Iceberg JSON type with per-field ids at every depth
    (struct fields carry ``id``; lists/maps carry element/key/value ids,
    allocated with stable synthetic keys so re-serialization is stable)."""
    if isinstance(dtype, T.StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": ids[f"{prefix}.{f.name}" if prefix else f.name],
                    "name": f.name,
                    "required": False,
                    "type": _ice_type(
                        f.dataType, f"{prefix}.{f.name}" if prefix else f.name, ids, alloc
                    ),
                }
                for f in dtype.fields
            ],
        }
    if isinstance(dtype, T.ArrayType):
        return {
            "type": "list",
            "element-id": alloc(f"{prefix}#element"),
            "element": _ice_type(dtype.elementType, f"{prefix}.element", ids, alloc),
            "element-required": False,
        }
    if isinstance(dtype, T.MapType):
        return {
            "type": "map",
            "key-id": alloc(f"{prefix}#key"),
            "key": _ice_type(dtype.keyType, f"{prefix}.key", ids, alloc),
            "value-id": alloc(f"{prefix}#value"),
            "value": _ice_type(dtype.valueType, f"{prefix}.value", ids, alloc),
            "value-required": False,
        }
    it = _SPARK_TO_ICEBERG.get(dtype)
    if it is None:
        if isinstance(dtype, T.DecimalType):
            it = f"decimal({dtype.precision},{dtype.scale})"
        else:
            raise ValueError(f"no Iceberg mapping for {dtype}")
    return it


def _iceberg_schema_json(
    schema: T.StructType, ids: dict[str, int], schema_id: int, alloc
) -> dict:
    body = _ice_type(schema, "", ids, alloc)
    return {"type": "struct", "schema-id": schema_id, "fields": body["fields"]}


class IcebergWriter:
    """Build an Iceberg v2 table directory snapshot-by-snapshot."""

    def __init__(
        self,
        location: str,
        partition_spec: list[dict] | None = None,
        uri_base: str | None = None,
    ) -> None:
        """``partition_spec``: [{"name", "transform", "source"}] with
        transform ∈ {identity, bucket[N]} (the fixture subset; the READER
        additionally prunes truncate/year/month/day/hour).

        ``uri_base``: the URI prefix embedded in manifests/metadata for
        every file.  Defaults to ``file://<location>``.  Pass the table's
        FINAL object-store location (e.g. ``mem://store/tbl``) to write
        locally and :meth:`publish` afterwards — the reference's S3 flow:
        files are staged on local disk, then uploaded, and the metadata
        refers to the remote URIs (SwiftLakeS3FileIO.java upload path)."""
        self.location = location
        self.uri_base = uri_base or f"file://{location}"
        os.makedirs(os.path.join(location, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(location, "data"), exist_ok=True)
        self.table_uuid = str(uuid.uuid4())
        self.version = 0
        self.snapshots: list[dict] = []
        self.schemas: list[dict] = []
        self.field_ids: dict[str, int] = {}
        self.next_id = 1
        self.seq = 0
        self._manifests: list[dict] = []  # live manifest-list entries
        self.partition_spec = partition_spec or []

    def _uri(self, rel: str) -> str:
        """Embedded URI for a file written at <location>/<rel> — remote
        when uri_base points at an object store (publish() uploads)."""
        return f"{self.uri_base.rstrip('/')}/{rel}"

    def _assign_ids(self, schema: T.StructType) -> None:
        from swiftlake_spark.tables.evolution import iter_struct_paths

        for path, _f in iter_struct_paths(schema):
            if path not in self.field_ids:
                self.field_ids[path] = self.next_id
                self.next_id += 1

    def _alloc(self, key: str) -> int:
        """Stable id for container nodes (list element / map key/value)."""
        if key not in self.field_ids:
            self.field_ids[key] = self.next_id
            self.next_id += 1
        return self.field_ids[key]

    def rename_column(self, old: str, new: str) -> None:
        """Metadata-only rename: same field id, new name — top-level or
        nested dotted path; descendants keep their ids (spec rename).
        Commits a new schema + metadata version immediately, so readers
        see the rename without a subsequent append."""
        from swiftlake_spark.tables.evolution import rekey_renamed

        fid = self.field_ids[old]
        new_path = f"{old.rsplit('.', 1)[0]}.{new}" if "." in old else new
        self.field_ids = rekey_renamed(self.field_ids, old, new_path)
        if self.schemas:
            import copy

            sj = copy.deepcopy(self.schemas[-1])

            def walk(t: Any) -> None:
                if not isinstance(t, dict):
                    return
                for f in t.get("fields", []):
                    if f.get("id") == fid:
                        f["name"] = new
                    walk(f.get("type"))
                for k in ("element", "key", "value"):
                    walk(t.get(k))

            walk(sj)
            sj["schema-id"] = len(self.schemas)
            self.schemas.append(sj)
            self._write_metadata()

    def _partition_value(self, row: dict, pf: dict) -> Any:
        return _pvalue(row[pf["source"]], pf["transform"])

    def _column_stats(self, tbl: pa.Table, schema: T.StructType):
        return _stats_for(tbl, schema, self.field_ids)

    def _partition_avro_fields(self, df_schema: T.StructType) -> list[dict]:
        out = []
        for i, pf in enumerate(self.partition_spec):
            if pf["transform"] == "identity":
                src = df_schema[pf["source"]].dataType
                if isinstance(src, T.DateType):
                    at = "int"  # date ordinal (days since epoch)
                elif isinstance(src, (T.TimestampType, T.TimestampNTZType)):
                    at = "long"  # micros since epoch
                else:
                    at = _AVRO_PRIM.get(src)
                if at is None:
                    raise ValueError(f"no avro mapping for partition {src}")
            else:
                at = "int"  # bucket ordinal
            out.append(
                {"name": pf["name"], "type": ["null", at], "field-id": 1000 + i}
            )
        return out

    def append(self, df: DataFrame) -> int:
        """Append a snapshot from a (bounded) DataFrame; returns its id.
        With a partition spec, rows split into one data file per distinct
        partition tuple and manifests record the typed partition values."""
        self._assign_ids(df.schema)
        self.seq += 1
        snap_id = int(time.time() * 1000) * 1000 + self.seq

        at = df.toArrow()
        at = at.cast(_stamp_arrow_schema(at.schema, self.field_ids))

        # split into per-partition file groups
        groups: dict[tuple, list[int]] = {}
        if self.partition_spec:
            rows = at.to_pylist()
            for i, row in enumerate(rows):
                key = tuple(self._partition_value(row, pf) for pf in self.partition_spec)
                groups.setdefault(key, []).append(i)
        else:
            groups[()] = list(range(at.num_rows))

        entries = []
        for key, idxs in groups.items():
            part_tbl = at.take(idxs)
            rel = f"data/{uuid.uuid4().hex[:12]}.parquet"
            fpath = os.path.join(self.location, rel)
            pq.write_table(part_tbl, fpath)
            nulls, lowers, uppers = self._column_stats(part_tbl, df.schema)
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 0,
                        "file_path": self._uri(rel),
                        "file_format": "PARQUET",
                        "partition": {
                            pf["name"]: key[i]
                            for i, pf in enumerate(self.partition_spec)
                        },
                        "record_count": part_tbl.num_rows,
                        "file_size_in_bytes": os.path.getsize(fpath),
                        "null_value_counts": nulls,
                        "lower_bounds": lowers,
                        "upper_bounds": uppers,
                    },
                }
            )

        return self._commit_snapshot(entries, df.schema, snap_id, at.num_rows)

    def append_distributed(self, df: DataFrame) -> int:
        """Distributed append: each Spark task writes its partitions'
        parquet files with pyarrow (field IDs stamped, per-file bounds
        computed executor-side); only file METADATA returns to the
        driver for the snapshot commit — the 100 TB export shape.
        Requires storage visible to all executors (shared FS, or
        local mode)."""
        import pandas as pd

        self._assign_ids(df.schema)
        self.seq += 1
        snap_id = int(time.time() * 1000) * 1000 + self.seq
        loc = self.location
        ub = self.uri_base.rstrip("/")
        fids = dict(self.field_ids)
        spec = list(self.partition_spec)
        schema = df.schema

        info_schema = T.StructType(
            [
                T.StructField("rel", T.StringType()),
                T.StructField("rows", T.LongType()),
                T.StructField("size", T.LongType()),
                T.StructField("partition_json", T.StringType()),
                T.StructField("stats_pickle", T.BinaryType()),
            ]
        )

        from pyspark.sql.pandas.types import to_arrow_schema

        # build against the Spark-derived arrow schema: pandas widens
        # nullable ints to float64, and from_pandas(schema=...) restores
        # the true types (NaN → null) before the field-id stamp
        target = _stamp_arrow_schema(to_arrow_schema(schema), fids)

        def write_files(batches):
            import pickle

            for pdf in batches:
                if not len(pdf):
                    continue
                at = pa.Table.from_pandas(pdf, schema=target, preserve_index=False)
                groups: dict[tuple, list[int]] = {}
                if spec:
                    for i, row in enumerate(at.to_pylist()):
                        key = tuple(
                            _pvalue(row[pf["source"]], pf["transform"]) for pf in spec
                        )
                        groups.setdefault(key, []).append(i)
                else:
                    groups[()] = list(range(at.num_rows))
                out = []
                for key, idxs in groups.items():
                    part = at.take(idxs)
                    rel = f"data/{uuid.uuid4().hex[:12]}.parquet"
                    fpath = os.path.join(loc, rel)
                    pq.write_table(part, fpath)
                    out.append(
                        {
                            "rel": rel,
                            "rows": part.num_rows,
                            "size": os.path.getsize(fpath),
                            "partition_json": json.dumps(
                                {pf["name"]: key[i] for i, pf in enumerate(spec)}
                            ),
                            "stats_pickle": pickle.dumps(
                                _stats_for(part, schema, fids)
                            ),
                        }
                    )
                yield pd.DataFrame(out)

        src = df
        if spec:
            # co-locate rows of a partition so files don't fragment
            from pyspark.sql import functions as F

            src = df.repartition(*[F.col(pf["source"]) for pf in spec])
        infos = src.mapInPandas(write_files, info_schema).collect()

        import pickle

        entries, n_rows = [], 0
        for r in infos:
            nulls, lowers, uppers = pickle.loads(bytes(r["stats_pickle"]))
            n_rows += r["rows"]
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 0,
                        "file_path": f"{ub}/{r['rel']}",
                        "file_format": "PARQUET",
                        "partition": json.loads(r["partition_json"]),
                        "record_count": r["rows"],
                        "file_size_in_bytes": r["size"],
                        "null_value_counts": nulls,
                        "lower_bounds": lowers,
                        "upper_bounds": uppers,
                    },
                }
            )
        return self._commit_snapshot(entries, df.schema, snap_id, n_rows)

    def _commit_snapshot(
        self, entries: list[dict], df_schema: T.StructType, snap_id: int, n_rows: int
    ) -> int:
        man_rel = f"metadata/manifest-{snap_id}.avro"
        write_container(
            os.path.join(self.location, man_rel),
            _manifest_schema(self._partition_avro_fields(df_schema)),
            entries,
        )

        self._manifests.append(
            {
                "manifest_path": self._uri(man_rel),
                "manifest_length": os.path.getsize(os.path.join(self.location, man_rel)),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": self.seq,
                "min_sequence_number": self.seq,
                "added_snapshot_id": snap_id,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": n_rows,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
        ml_rel = f"metadata/snap-{snap_id}.avro"
        write_container(
            os.path.join(self.location, ml_rel),
            MANIFEST_LIST_SCHEMA,
            list(self._manifests),
        )

        schema_id = len(self.schemas)
        self.schemas.append(
            _iceberg_schema_json(df_schema, self.field_ids, schema_id, self._alloc)
        )
        self.snapshots.append(
            {
                "snapshot-id": snap_id,
                # spec field: consumers walk ancestry through it
                **(
                    {"parent-snapshot-id": self.snapshots[-1]["snapshot-id"]}
                    if self.snapshots
                    else {}
                ),
                "sequence-number": self.seq,
                "timestamp-ms": int(time.time() * 1000) + self.seq,
                "summary": {"operation": "append"},
                "manifest-list": self._uri(ml_rel),
                "schema-id": schema_id,
            }
        )
        self._write_metadata()
        return snap_id

    def publish(self, remote_location: str) -> str:
        """Upload every file of the locally-staged table to
        ``remote_location`` (any fileio scheme) — the reference's S3
        write flow: stage locally, upload, metadata already refers to
        the remote URIs when the writer was built with
        ``uri_base=remote_location``.  Returns the remote location."""
        from swiftlake_spark import fileio as _fio

        io = _fio.fileio_for(remote_location)
        for root, _dirs, files in os.walk(self.location):
            for fn in files:
                src = os.path.join(root, fn)
                rel = os.path.relpath(src, self.location)
                dst = _fio.join(remote_location, rel)
                # incremental publish: data files and avro manifests are
                # immutable (uuid/snapshot-id named) — skip re-uploading
                # existing ones; metadata json/hint always overwrite
                if (rel.startswith("data/") or rel.endswith(".avro")) and io.exists(dst):
                    continue
                io.upload(src, dst)
        return remote_location

    def commit_schema(self, schema: T.StructType) -> None:
        """Record a schema change (e.g. after rename_column) without data."""
        self._assign_ids(schema)
        self.schemas.append(
            _iceberg_schema_json(schema, self.field_ids, len(self.schemas), self._alloc)
        )
        self._write_metadata()

    def _write_metadata(self) -> None:
        self.version += 1
        meta: dict[str, Any] = {
            "format-version": 2,
            "table-uuid": self.table_uuid,
            # the table's REAL root: the publish target when staging for
            # a remote store, not the local staging dir (readers resolve
            # relative paths and record metadata against this)
            "location": (
                self.uri_base[len("file://"):]
                if self.uri_base.startswith("file://")
                else self.uri_base
            ),
            "last-sequence-number": self.seq,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": self.next_id - 1,
            "current-schema-id": len(self.schemas) - 1,
            "schemas": self.schemas,
            "default-spec-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": pf["name"],
                            "transform": pf["transform"],
                            "source-id": self.field_ids[pf["source"]],
                            "field-id": 1000 + i,
                        }
                        for i, pf in enumerate(self.partition_spec)
                    ],
                }
            ],
            "last-partition-id": 999,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {},
            "current-snapshot-id": (
                self.snapshots[-1]["snapshot-id"] if self.snapshots else -1
            ),
            "snapshots": self.snapshots,
        }
        with open(
            os.path.join(self.location, "metadata", f"v{self.version}.metadata.json"), "w"
        ) as f:
            json.dump(meta, f)
        with open(
            os.path.join(self.location, "metadata", "version-hint.text"), "w"
        ) as f:
            f.write(str(self.version))

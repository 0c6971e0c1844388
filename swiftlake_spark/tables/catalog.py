"""Directory catalog: ``warehouse/<db>/<table>`` with time-travel name sugar.

Counterpart of the reference's hadoop-catalog usage plus its table-name
grammar — ``db.t$timestamp_<epoch_ms>``, ``$snapshot_<id>``,
``$branch_<name>``, ``$tag_<name>`` (sql/SqlQueryProcessor.java:371-402,
sql/TimeTravelOptions.java:24-45, README.md:744-757).
"""

from __future__ import annotations

import os
import re
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from swiftlake_spark.tables.metadata import (
    TableMetadata,
    load_metadata,
    write_new_version,
)
from swiftlake_spark.tables.table import Table
from swiftlake_spark import fileio as _io
from swiftlake_spark.tables.transforms import parse_spec

_SUFFIX_RE = re.compile(
    r"^(?P<base>[\w.]+?)(?:\$(?P<kind>timestamp|snapshot|branch|tag)_(?P<arg>[\w.-]+))?$"
)


class Catalog:
    def __init__(
        self, spark: SparkSession, warehouse: str, guard=None,
        metric_collectors=None,
    ) -> None:
        self.spark = spark
        # remote warehouses (fileio schemes, e.g. mem://) keep their URI;
        # file:// is the LOCAL filesystem — normalize it to a plain path
        # so the write path (which treats file:// as local) and the
        # metadata path agree on one root; bare paths become absolute
        if warehouse.startswith("file://"):
            warehouse = warehouse[len("file://"):]
        self.warehouse = warehouse if "://" in warehouse else os.path.abspath(warehouse)
        self.guard = guard  # plans.guards.ScanGuard | None, applied to scans
        # engine-owned shared list of callables (plans.metrics.dispatch
        # targets); passed by REFERENCE into every Table so collectors
        # registered later still observe existing handles
        self.metric_collectors = metric_collectors if metric_collectors is not None else []
        if "://" not in self.warehouse:
            os.makedirs(self.warehouse, exist_ok=True)

    # ------------------------------------------------------------- ddl
    def create_table(
        self,
        name: str,
        schema: T.StructType | str,
        partition_spec: list[str] | None = None,
        sort_order: list[str] | None = None,
        properties: dict[str, str] | None = None,
    ) -> Table:
        """``name`` is ``db.table``; ``partition_spec`` uses Spark-DDL
        transform terms (``bucket(16, c)``, ``days → day(c)`` etc.);
        ``sort_order`` items are ``"col [ASC|DESC] [NULLS FIRST|LAST]"``.

        DDL strings may use the logical types ``UUID`` and ``TIME``
        (which Spark lacks): they map to STRING (canonical lowercase
        8-4-4-4-12 form) and BIGINT (micros since midnight) physical
        columns — the reference's own mappings
        (sql/SchemaEvolution.java:478,484) — and the logical type is
        recorded as a ``logical-type.<col>`` table property.  Helpers in
        :mod:`swiftlake_spark.functions` produce/render both forms."""
        logical: dict[str, str] = {}
        if isinstance(schema, str):
            parts = []
            for coldef in schema.split(","):
                toks = coldef.strip().split()
                # match 'col UUID' with or without trailing constraint
                # tokens (NOT NULL, COMMENT ...) — a 2-token-only check
                # broke the documented logical types on any constraint
                if len(toks) >= 2 and toks[1].upper() in ("UUID", "TIME"):
                    logical[toks[0]] = toks[1].lower()
                    toks[1] = {"UUID": "STRING", "TIME": "BIGINT"}[toks[1].upper()]
                parts.append(" ".join(toks))
            schema = T.StructType.fromDDL(", ".join(parts))
        location = self._location(name)
        if _io.fileio_for(location).list(_io.join(location, "metadata")):
            raise ValueError(f"table {name} already exists")
        if "://" not in location:
            os.makedirs(os.path.join(location, "data"), exist_ok=True)
        spec = [
            {"name": t.name, "source": t.source, "param": t.param}
            for t in (parse_spec(s) for s in (partition_spec or []))
        ]
        for d in spec:
            if d["source"] not in schema.fieldNames():
                raise ValueError(f"partition source column {d['source']!r} not in schema")
        parsed_sort = [_parse_sort(x) for x in (sort_order or [])]
        for d in parsed_sort:
            if d["col"] not in schema.fieldNames():
                raise ValueError(f"sort column {d['col']!r} not in schema")
        meta = TableMetadata(
            table_uuid=uuid.uuid4().hex,
            location=location,
            schema_json=schema.jsonValue(),
            partition_spec=spec,
            sort_order=parsed_sort,
            properties={
                **{f"logical-type.{c}": t for c, t in logical.items()},
                **(properties or {}),
            },
            snapshots=[],
            refs={},
            version=0,
        )
        # v1 is the create (version counter starts at 0 → claim v1)
        write_new_version(meta)
        return Table(self.spark, meta, guard=self.guard,
                     metric_collectors=self.metric_collectors)

    def drop_table(self, name: str) -> None:
        loc = self._location(name)
        from swiftlake_spark.catalog_service import default_catalog_service

        default_catalog_service().drop(loc)
        io = _io.fileio_for(loc)
        if "://" in loc:
            for rel in io.list_recursive(loc):
                io.delete(_io.join(loc, rel))
            return
        import shutil

        shutil.rmtree(loc)

    def table_exists(self, name: str) -> bool:
        loc = self._location(name)
        return bool(_io.fileio_for(loc).list(_io.join(loc, "metadata")))

    def list_tables(self) -> list[str]:
        io = _io.fileio_for(self.warehouse)
        out = []
        for db in io.list(self.warehouse):
            dbdir = _io.join(self.warehouse, db)
            if "://" not in dbdir and not os.path.isdir(dbdir):
                continue
            for t in io.list(dbdir):
                if io.list(_io.join(dbdir, t, "metadata")):
                    out.append(f"{db}.{t}")
        return out

    # ------------------------------------------------------------- read
    def table(self, name: str) -> Table:
        base, _, _ = self._parse_name(name)
        return Table(self.spark, load_metadata(self._location(base)), guard=self.guard,
                     metric_collectors=self.metric_collectors)

    def load(self, name: str, filter=None) -> DataFrame:
        """Load a table as a DataFrame, honoring time-travel suffixes."""
        base, kind, arg = self._parse_name(name)
        t = Table(self.spark, load_metadata(self._location(base)), guard=self.guard,
                  metric_collectors=self.metric_collectors)
        kwargs: dict[str, Any] = {}
        if kind == "timestamp":
            kwargs["as_of_ms"] = int(arg)
        elif kind == "snapshot":
            kwargs["snapshot_id"] = int(arg)
        elif kind == "branch":
            kwargs["branch"] = arg
        elif kind == "tag":
            kwargs["tag"] = arg
        return t.scan(filter, **kwargs)

    # -------------------------------------------------------------- sql
    def resolve_sql(self, sql: str) -> str:
        """Replace ``db.table[$suffix]`` references with registered temp
        views so ``spark.sql`` can run the query.  The Spark analog of the
        reference's placeholder rewrite (SqlQueryProcessor.java:130-236) —
        except Catalyst does all real analysis; we only bridge names."""
        pattern = re.compile(
            r"(?<![\w.])([A-Za-z_]\w*\.[A-Za-z_]\w*(?:\$(?:timestamp|snapshot|branch|tag)_[\w.-]+)?)"
        )

        def repl(m: re.Match) -> str:
            ref = m.group(1)
            base = ref.split("$")[0]
            if not self.table_exists(base):
                return ref
            # a short digest disambiguates refs that collapse to the same
            # sanitized name (db.t$branch_x vs a real table db.t_branch_x)
            import hashlib as _hl

            view = (
                "swl_" + re.sub(r"[^\w]", "_", ref)
                + "_" + _hl.md5(ref.encode()).hexdigest()[:6]
            )
            self.load(ref).createOrReplaceTempView(view)
            return view

        # never rewrite inside string literals: split on quoted segments
        # ('' escapes included) and substitute only outside them
        parts = re.split(r"('(?:[^']|'')*')", sql)
        return "".join(
            p if i % 2 else pattern.sub(repl, p) for i, p in enumerate(parts)
        )

    # ----------------------------------------------------------- helpers
    def _location(self, name: str) -> str:
        parts = name.split(".")
        if len(parts) != 2:
            raise ValueError(f"table name must be db.table, got {name!r}")
        return _io.join(self.warehouse, *parts)

    @staticmethod
    def _parse_name(name: str) -> tuple[str, str | None, str | None]:
        m = _SUFFIX_RE.match(name)
        if not m:
            raise ValueError(f"bad table name {name!r}")
        return m.group("base"), m.group("kind"), m.group("arg")


def _parse_sort(s: str) -> dict:
    toks = s.split()
    col = toks[0]
    asc = True
    nulls_first: bool | None = None
    up = [t.upper() for t in toks[1:]]
    if "DESC" in up:
        asc = False
    if "NULLS" in up:
        i = up.index("NULLS")
        if i + 1 >= len(up) or up[i + 1] not in ("FIRST", "LAST"):
            raise ValueError(f"bad sort term {s!r}: NULLS needs FIRST|LAST")
        nulls_first = up[i + 1] == "FIRST"
    if nulls_first is None:
        nulls_first = asc
    return {"col": col, "asc": asc, "nulls_first": nulls_first}

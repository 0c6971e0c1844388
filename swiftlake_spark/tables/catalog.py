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
    r"^(?P<base>[\w.]+?)(?:\$(?P<kind>timestamp|snapshot|branch|tag)_(?P<arg>[\w.:+-]+))?$"
)


def _timestamp_arg_ms(arg: str) -> int:
    """``$timestamp_`` argument → epoch ms.  Two spellings: bare digits
    are epoch milliseconds; anything else parses as ISO-8601 — the
    reference's own form (README.md:743 ``$timestamp_1986-10-26T01:21:00``,
    sql/SqlQueryProcessor.java:371-402).  Naive timestamps are UTC (the
    engine pins the session zone to UTC, config A28); an explicit offset
    is honored."""
    if arg.isdigit():
        return int(arg)
    import datetime as _dt

    try:
        ts = _dt.datetime.fromisoformat(arg)
    except ValueError:
        raise ValueError(
            f"bad $timestamp_ argument {arg!r}: epoch ms or ISO-8601"
        ) from None
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=_dt.timezone.utc)
    return int(ts.timestamp() * 1000)


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
        # kill-switch for resolve_sql's WHERE-conjunct manifest pruning
        # (extraction is inclusive-by-construction, but an operator
        # escape hatch costs nothing)
        self.sql_pruning = True
        # join-filter pushdown (reference README "Joining with a filter
        # table"): for inner-join equi edges, collect the other side's
        # distinct join keys (bounded) and prune this table's manifest
        # with an IN filter — manifest-level dynamic partition pruning.
        self.join_filter_pushdown = True
        self.join_filter_max_keys = 200
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
        try:
            loc = self._location(name)
        except ValueError:
            # a name that doesn't parse as db.table is simply not a
            # lakehouse table (engine.sql uses this to route DML)
            return False
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

    def load(self, name: str, filter=None, *, filter_rows: bool = True) -> DataFrame:
        """Load a table as a DataFrame, honoring time-travel suffixes."""
        base, kind, arg = self._parse_name(name)
        t = Table(self.spark, load_metadata(self._location(base)), guard=self.guard,
                  metric_collectors=self.metric_collectors)
        kwargs: dict[str, Any] = {"filter_rows": filter_rows}
        if kind == "timestamp":
            kwargs["as_of_ms"] = _timestamp_arg_ms(arg)
        elif kind == "snapshot":
            kwargs["snapshot_id"] = int(arg)
        elif kind == "branch":
            kwargs["branch"] = arg
        elif kind == "tag":
            kwargs["tag"] = arg
        return t.scan(filter, **kwargs)

    # -------------------------------------------------------------- sql
    _REF_RE = re.compile(
        # the arg charset admits ':' and '+' for ISO-8601 offsets — an
        # arithmetic '+' glued directly onto a $suffix ref without spaces
        # is not meaningful SQL, so the greed is safe
        r"(?<![\w.])([A-Za-z_]\w*\.[A-Za-z_]\w*"
        r"(?:\$(?:timestamp|snapshot|branch|tag)_[\w.:+-]+)?)"
    )

    _AS_OF_RE = re.compile(
        r"((?<![\w.])[A-Za-z_]\w*\.[A-Za-z_]\w*)\s+(?:FOR\s+)?"
        r"(TIMESTAMP|SYSTEM_TIME|VERSION|SYSTEM_VERSION)\s+AS\s+OF\s+"
        r"('(?:[^']|'')*'|\d+)",
        re.IGNORECASE,
    )

    def _rewrite_as_of(self, sql: str) -> str:
        """Spark's idiomatic time-travel spelling → the engine's
        ``$suffix`` sugar: ``db.t TIMESTAMP AS OF '2020-01-01 00:00:00'``
        becomes ``db.t$timestamp_2020-01-01T00:00:00`` and ``db.t
        VERSION AS OF 42`` becomes ``db.t$snapshot_42`` (SYSTEM_TIME /
        SYSTEM_VERSION variants accepted).  Only rewrites names that ARE
        lakehouse tables, so the clause still reaches Spark untouched
        for its own tables.  Matching runs on the literal-masked copy
        (same length, offsets align), so quoted text can't fake a ref."""
        from swiftlake_spark.tables.sqlextract import mask_literals

        masked = mask_literals(sql)
        out: list[str] = []
        last = 0
        for m in self._AS_OF_RE.finditer(masked):
            name = m.group(1)
            try:
                if not self.table_exists(name):
                    continue
            except Exception:
                continue
            kind = m.group(2).upper()
            raw = sql[m.start(3) : m.end(3)]
            arg = raw[1:-1].replace("''", "'").strip() if raw.startswith("'") else raw
            if kind in ("TIMESTAMP", "SYSTEM_TIME"):
                suffix = "timestamp_" + arg.replace(" ", "T")
            else:
                if not arg.isdigit():
                    raise ValueError(
                        f"VERSION AS OF takes a snapshot id; for branches/"
                        f"tags use {name}$branch_<name> / {name}$tag_<name>"
                    )
                suffix = "snapshot_" + arg
            out.append(sql[last : m.start()])
            out.append(f"{name}${suffix}")
            last = m.end()
        if not out:
            return sql
        out.append(sql[last:])
        return "".join(out)

    def resolve_sql(self, sql: str) -> str:
        """Replace ``db.table[$suffix]`` references with registered temp
        views so ``spark.sql`` can run the query — and prune each view's
        manifest with the WHERE conjuncts provably local to that table
        (tables/sqlextract.py; ≙ SqlQueryProcessor.java:130-236, which
        extracts per-table conditions before planning file lists).
        Catalyst does all real analysis; extraction only shrinks the
        file list (never re-applied to rows — filter_rows=False), so a
        skipped or unparseable conjunct costs pruning, not correctness.
        Spark's ``TIMESTAMP/VERSION AS OF`` spelling is normalized to
        the ``$suffix`` sugar first (:meth:`_rewrite_as_of`)."""
        import hashlib as _hl

        from swiftlake_spark.dml.sqlfilter import parse_filter
        from swiftlake_spark.tables import expressions as E
        from swiftlake_spark.tables.sqlextract import analyze, mask_literals

        sql = self._rewrite_as_of(sql)
        masked = mask_literals(sql)
        exists_cache: dict[str, bool] = {}

        def _exists(base: str) -> bool:
            if base not in exists_cache:
                try:
                    exists_cache[base] = self.table_exists(base)
                except Exception:
                    exists_cache[base] = False
            return exists_cache[base]

        # literal masking replaces quoted content with 'xxx' (no dots),
        # so refs can no longer match inside string literals
        occs = [
            m for m in self._REF_RE.finditer(masked)
            if _exists(m.group(1).split("$")[0])
        ]
        if not occs:
            return sql

        struct_cache: dict[str, T.StructType | None] = {}

        def _struct_of(base: str) -> T.StructType | None:
            if base not in struct_cache:
                try:
                    meta = load_metadata(self._location(base))
                    struct_cache[base] = T.StructType.fromJson(meta.schema_json)
                except Exception:
                    struct_cache[base] = None
            return struct_cache[base]

        def _columns_of(name: str) -> set[str] | None:
            base = name.split("$")[0]
            if "." in base and _exists(base):
                st = _struct_of(base)
                return {f.name for f in st.fields} if st is not None else None
            try:
                return {f.name for f in self.spark.table(name).schema.fields}
            except Exception:
                return None

        infos: dict = {}
        if self.sql_pruning:
            try:
                infos = analyze(sql, masked, _columns_of, _exists)
            except Exception:  # noqa: BLE001 — extraction is best-effort
                infos = {}

        # group occurrences per ref text: an occurrence is a FROM table
        # (analysis matched its span), a column qualifier (followed by
        # ``.word``), or other.  Filters are only safe per-occurrence when
        # EVERY occurrence is a FROM ref; with exactly one FROM ref the
        # qualifiers denote that same instance and share its view; any
        # other mix falls back to one shared unpruned view.
        by_ref: dict[str, dict[str, list]] = {}
        for m in occs:
            g = by_ref.setdefault(m.group(1), {"from": [], "qual": [], "other": []})
            if m.span(1) in infos:
                g["from"].append(m)
            else:
                nxt = masked[m.end(1):m.end(1) + 2]
                if len(nxt) == 2 and nxt[0] == "." and (nxt[1].isalpha() or nxt[1] == "_"):
                    g["qual"].append(m)
                else:
                    g["other"].append(m)

        registered: dict[tuple[str, str], str] = {}

        def _register(ref: str, info, extra=None, extra_tag: str = "") -> str:
            exprs, texts = [], []
            if info is not None and info.conjuncts:
                st = _struct_of(ref.split("$")[0])
                for c in info.conjuncts:
                    try:
                        exprs.append(parse_filter(c, st))
                        texts.append(c)
                    except Exception:  # unparseable conjunct → skip it
                        pass
            if extra is not None:
                exprs.append(extra)
                texts.append(extra_tag)
            ftext = " AND ".join(texts)
            key = (ref, ftext)
            if key in registered:
                return registered[key]
            # a short digest disambiguates refs that collapse to the same
            # sanitized name (db.t$branch_x vs a real table db.t_branch_x);
            # the filter text joins the digest so differently-pruned views
            # of one table never collide (same text → same name → safe
            # re-registration with identical content)
            digest = ref if not ftext else ref + "\x00" + ftext
            view = (
                "swl_" + re.sub(r"[^\w]", "_", ref)
                + "_" + _hl.md5(digest.encode()).hexdigest()[:6]
            )
            expr = E.and_(*exprs) if exprs else None
            self.load(ref, expr, filter_rows=False).createOrReplaceTempView(view)
            registered[key] = view
            return view

        occ_view: dict[int, str] = {}
        # FROM occurrences eligible for join-filter strengthening: their
        # view is exclusively theirs (per-occurrence or single-FROM
        # plan).  followers: occurrence ids (qualifiers) that must adopt
        # a strengthened view name along with their FROM occurrence.
        solo: list = []
        followers: dict[int, list[int]] = {}
        for ref, g in by_ref.items():
            all_ms = g["from"] + g["qual"] + g["other"]
            if not g["qual"] and not g["other"]:
                for m in g["from"]:
                    occ_view[id(m)] = _register(ref, infos[m.span(1)])
                    solo.append(m)
                    followers[id(m)] = []
            elif len(g["from"]) == 1 and not g["other"]:
                view = _register(ref, infos[g["from"][0].span(1)])
                for m in all_ms:
                    occ_view[id(m)] = view
                solo.append(g["from"][0])
                followers[id(g["from"][0])] = [
                    id(m) for m in g["qual"]
                ]
            else:
                view = _register(ref, None)
                for m in all_ms:
                    occ_view[id(m)] = view

        # ---- join-filter pushdown (README "Joining with a filter
        # table"): an inner-join equi edge lets this table's manifest be
        # pruned by the OTHER side's distinct key set.  The keys are
        # collected from the other side's already-registered PRUNE-ONLY
        # view (a superset of its true rows — sound) or, for plain Spark
        # relations, the raw view; collection is bounded by
        # join_filter_max_keys and abandoned beyond it.  Like the base
        # extraction this only shrinks file lists; rows still come from
        # the original SQL.
        if self.join_filter_pushdown and solo:
            from pyspark.sql import functions as _F

            span_to_view = {m.span(1): occ_view[id(m)] for m in occs}
            cap = self.join_filter_max_keys
            records_cache: dict[str, int] = {}

            def _records_of(base: str) -> int:
                if base not in records_cache:
                    try:
                        meta = load_metadata(self._location(base))
                        records_cache[base] = sum(
                            e.records
                            for e in meta.read_manifest(meta.current_snapshot())
                        )
                    except Exception:  # noqa: BLE001
                        records_cache[base] = 1 << 62
                return records_cache[base]
            for m in solo:
                info = infos[m.span(1)]
                if not info.equi:
                    continue
                extra_exprs, tags = [], []
                for my_col, other_name, other_span, other_col in info.equi:
                    try:
                        if other_span is not None and other_span in span_to_view:
                            # an UNFILTERED lakehouse other side offers
                            # its full key domain — only worth collecting
                            # when the table itself is tiny (a true dim,
                            # per its manifest record count); otherwise
                            # the IN set can't beat the base prune and
                            # the distinct job is wasted
                            oinfo0 = infos.get(other_span)
                            if oinfo0 is None or not oinfo0.conjuncts:
                                base_o = (oinfo0.ref.split("$")[0]
                                          if oinfo0 is not None else None)
                                if base_o is None or _records_of(base_o) > cap * 50:
                                    continue
                            odf = self.spark.table(span_to_view[other_span])
                            # the other side's view is PRUNE-ONLY; its
                            # extracted conjuncts (implied by the real
                            # WHERE) row-filter the KEY COLLECTION so the
                            # key set reflects the dim's selectivity —
                            # still a superset of the join-reachable keys
                            oinfo = infos.get(other_span)
                            if oinfo is not None and oinfo.conjuncts:
                                ost = _struct_of(oinfo.ref.split("$")[0])
                                for c in oinfo.conjuncts:
                                    try:
                                        odf = odf.where(
                                            parse_filter(c, ost).column()
                                        )
                                    except Exception:  # noqa: BLE001
                                        pass
                        elif other_name is not None and "." not in other_name:
                            odf = self.spark.table(other_name)
                        else:
                            continue
                        rows = (
                            odf.select(other_col)
                            .where(_F.col(other_col).isNotNull())
                            .distinct().limit(cap + 1).collect()
                        )
                        if len(rows) > cap:
                            continue
                        vals = [r[0] for r in rows]
                        extra_exprs.append(E.in_(my_col, vals))
                        digest = _hl.md5(
                            repr(sorted(map(repr, vals))).encode()
                        ).hexdigest()[:8]
                        tags.append(f"__jf_{my_col}_{digest}")
                    except Exception:  # noqa: BLE001 — pushdown is best-effort
                        continue
                if extra_exprs:
                    view = _register(
                        info.ref, info, E.and_(*extra_exprs), " AND ".join(tags)
                    )
                    occ_view[id(m)] = view
                    for fid in followers.get(id(m), []):
                        occ_view[fid] = view

        out, last = [], 0
        for m in sorted(occs, key=lambda m: m.start(1)):
            out.append(sql[last:m.start(1)])
            out.append(occ_view[id(m)])
            last = m.end(1)
        out.append(sql[last:])
        return "".join(out)

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

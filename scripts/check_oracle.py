"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row counts, column sets and
values (column-name-sorted, row-sorted — order-insensitive, like the
driver's value-hash).  Exit code 0 iff everything matches.

Also importable: ``tests/test_oracle_gate.py`` parametrizes over the same
registry and calls :func:`check_query` per query, making ``pytest tests/``
green imply the oracle gate passes for the FULL registry (every entry in
``swiftlake_spark.queries.REGISTRY``, not just the driver's 50-slot sample).

Usage:  python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from swiftlake_spark.queries import REGISTRY, _load_all  # noqa: E402
from swiftlake_spark.queries.base import TABLES  # noqa: E402
from swiftlake_spark.session import build_session  # noqa: E402
from swiftlake_spark.config import EngineConfig  # noqa: E402


def canon_value(v):
    """Canonicalize a cell for comparison (mirrors FIXTURES.md §4).

    Decimals are compared EXACTLY at their declared scale (r13, VERDICT
    r12 ask #3): the old ``repr(float(v))`` collapse erased precisely the
    class of difference that made the committed-green r12 q121 driver-red
    (the driver hashes the decimal rendering; the replica must be at
    least as strict, never weaker).
    """
    import datetime
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return repr(v)  # full precision — we demand bit-identical doubles
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"  # exact, scale-preserving; never collapses to float
    if isinstance(v, datetime.datetime):
        # tz-awareness is part of the rendering: a naive 12:00 must NOT
        # silently equal an aware 12:00+00:00 (same erasure class as the
        # decimal float-collapse — the driver may render the offset)
        if v.tzinfo is not None:
            return v.strftime("%Y-%m-%d %H:%M:%S.%f%z")
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return repr(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def make_oracle_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """DuckDB connection with the fixture tables registered as views.

    TimeZone pinned to UTC to match the Spark session
    (spark.sql.session.timeZone=UTC in config.py) regardless of host zone —
    otherwise TIMESTAMPTZ→naive casts in oracles shift on non-UTC hosts.
    """
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def check_query(spark, con, qd, sf_dir: str):
    """Run one registry entry on Spark + DuckDB and compare.

    Returns (error_message | None, spark_row_count).
    """
    import decimal

    from pyspark.sql.types import DecimalType

    sdf = qd.fn(spark, sf_dir)
    s_cols = sdf.columns
    # Convention breach tripwire (r13, VERDICT r12 ask #3): computed
    # numerics must end as DOUBLE on both sides — the driver's hash
    # canonicalization of DECIMAL renderings is unobservable from the
    # repo (the r12 q121 lesson), so any decimal output column fails
    # loudly here before it can fail silently at the driver.  Checked
    # BEFORE collect() (ADVICE r13): the schema alone decides, so a
    # breaching query doesn't pay a full Spark execution first.
    dec_cols = [f.name for f in sdf.schema.fields if isinstance(f.dataType, DecimalType)]
    if qd.oracle is not None and dec_cols:
        return (
            f"Spark output has DECIMAL columns {dec_cols} — breaches the "
            "cast-back-to-DOUBLE convention (queries/__init__.py docstring); "
            "the driver's decimal hash rendering is unobservable (r12 q121)",
            0,
        )
    s_rows = [tuple(r) for r in sdf.collect()]
    if qd.oracle is None:
        return None, len(s_rows)
    res = con.execute(qd.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    if any(isinstance(v, decimal.Decimal) for r in d_rows for v in r):
        return (
            "oracle output contains DECIMAL values — breaches the "
            "cast-back-to-DOUBLE convention (queries/__init__.py docstring)",
            len(s_rows),
        )

    sc, sr = canon_rows(s_cols, s_rows)
    dc, dr = canon_rows(d_cols, d_rows)
    if sc != dc:
        return f"columns spark={sc} duckdb={dc}", len(s_rows)
    if len(sr) != len(dr):
        return f"rowcount spark={len(sr)} duckdb={len(dr)}", len(s_rows)
    bad = [(a, b) for a, b in zip(sr, dr) if a != b]
    if bad:
        return (
            f"{len(bad)}/{len(sr)} rows differ; first: spark={bad[0][0]} duckdb={bad[0][1]}",
            len(s_rows),
        )
    return None, len(s_rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    _load_all()

    spark = build_session(EngineConfig(app_name="oracle-check", cpus=8))
    con = make_oracle_con(sf_dir)

    failures = []
    for name, qd in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            err, n_rows = check_query(spark, con, qd, sf_dir)
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: error: {exc}")
            continue
        if err:
            failures.append(name)
            print(f"FAIL  {name}: {err}")
        elif qd.oracle is None:
            print(f"ok    {name}: rows-only ({n_rows} rows, {time.time()-t0:.1f}s)")
        else:
            print(f"ok    {name}: {n_rows} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

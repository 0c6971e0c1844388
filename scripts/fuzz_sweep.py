"""Offline differential-fuzz sweep: many seeds, both execution paths.

Runs the generated corpus over BOTH the plain-parquet path (spark.sql)
and the engine path (native partitioned tables via engine.sql, WHERE
extraction + manifest pruning) against DuckDB on the same data.

Usage:
    python scripts/fuzz_sweep.py [n_seeds] [seed0] [sf_dir]   # read path
    python scripts/fuzz_sweep.py --dml [n_seeds] [seed0]      # write path
    python scripts/fuzz_sweep.py --scd2 [n_seeds] [seed0]     # SCD2 model
    python scripts/fuzz_sweep.py --evo [n_seeds] [seed0]      # schema evolution
    python scripts/fuzz_sweep.py --mixed [n_seeds] [seed0]    # DML x reads
    python scripts/fuzz_sweep.py --ddl [n_seeds] [seed0]      # textual DDL

--dml sweeps the DML state machine (tests/test_dml_fuzz.run_sequence):
random append / overwrite / SCD1 / update / delete sequences against a
DuckDB mirror, one fresh table per seed.

Not part of the pytest suite (wall-clock); the suite pins seeds 0-199
(read) and three write seeds.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.check_oracle import canon_rows, make_oracle_con  # noqa: E402
from tests.sql_fuzz import generate_corpus, sample_pools  # noqa: E402
from tests.test_engine_sql_fuzz import (  # noqa: E402
    PARTITION_SPECS,
    _TABLES,
    to_engine_sql,
)


def main_dml(n: int, seed0: int) -> int:
    import tempfile

    from swiftlake_spark.config import EngineConfig
    from swiftlake_spark.session import build_session
    from tests.test_dml_fuzz import run_sequence

    spark = build_session(
        EngineConfig(app_name="dml-fuzz-sweep", cpus=8, shuffle_partitions=8)
    )
    t0 = time.time()
    bad = 0
    for k in range(n):
        seed = seed0 + k
        try:
            run_sequence(spark, tempfile.mkdtemp(prefix="dmlfuzz_"), seed)
        except Exception as exc:  # noqa: BLE001
            bad += 1
            print(f"DML FAILURE seed {seed}: {exc}", flush=True)
        if (k + 1) % 5 == 0:
            print(f"... {k + 1}/{n} ({time.time() - t0:.0f}s)", flush=True)
    print(f"dml sweep done: {n} seeds, {bad} failures, {time.time() - t0:.0f}s")
    return 1 if bad else 0


def main_pytest_style(n: int, seed0: int, module: str, fn_name: str,
                      label: str) -> int:
    """Sweep a (spark, tmp_path, seed)-style pytest fuzz over many seeds."""
    import importlib
    import tempfile

    from swiftlake_spark.config import EngineConfig
    from swiftlake_spark.session import build_session

    fn = getattr(importlib.import_module(module), fn_name)
    spark = build_session(
        EngineConfig(app_name=f"{label}-fuzz-sweep", cpus=8,
                     shuffle_partitions=8)
    )

    class _P:  # tmp_path stand-in
        def __init__(self, d):
            self._d = d

        def __truediv__(self, other):
            return os.path.join(self._d, other)

    t0 = time.time()
    bad = 0
    for k in range(n):
        seed = seed0 + k
        try:
            fn(spark, _P(tempfile.mkdtemp(prefix=f"{label}fuzz_")), seed)
        except Exception as exc:  # noqa: BLE001
            bad += 1
            print(f"{label.upper()} FAILURE seed {seed}: {exc}", flush=True)
        if (k + 1) % 5 == 0:
            print(f"... {k + 1}/{n} ({time.time() - t0:.0f}s)", flush=True)
    print(f"{label} sweep done: {n} seeds, {bad} failures, "
          f"{time.time() - t0:.0f}s")
    return 1 if bad else 0


def main_scd2(n: int, seed0: int) -> int:
    return main_pytest_style(
        n, seed0, "tests.test_scd2_model_fuzz",
        "test_scd2_merges_match_model", "scd2",
    )


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--dml":
        n = int(args[1]) if len(args) > 1 else 30
        seed0 = int(args[2]) if len(args) > 2 else 2000
        return main_dml(n, seed0)
    if args and args[0] == "--scd2":
        n = int(args[1]) if len(args) > 1 else 30
        seed0 = int(args[2]) if len(args) > 2 else 5000
        return main_scd2(n, seed0)
    if args and args[0] == "--mixed":
        n = int(args[1]) if len(args) > 1 else 40
        seed0 = int(args[2]) if len(args) > 2 else 9000
        return main_pytest_style(
            n, seed0, "tests.test_mixed_fuzz",
            "test_mixed_read_write_matches_mirror", "mixed",
        )
    if args and args[0] == "--ddl":
        n = int(args[1]) if len(args) > 1 else 40
        seed0 = int(args[2]) if len(args) > 2 else 11000
        return main_pytest_style(
            n, seed0, "tests.test_ddl_fuzz",
            "test_ddl_sequence_matches_mirror", "ddl",
        )
    if args and args[0] == "--evo":
        n = int(args[1]) if len(args) > 1 else 30
        seed0 = int(args[2]) if len(args) > 2 else 7000
        return main_pytest_style(
            n, seed0, "tests.test_evolution_fuzz",
            "test_evolution_sequences_match_mirror", "evo",
        )
    n = int(args[0]) if args else 500
    seed0 = int(args[1]) if len(args) > 1 else 200
    sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.001"

    from swiftlake_spark.config import EngineConfig
    from swiftlake_spark.engine import SwiftLakeEngine
    from swiftlake_spark.queries.base import load
    from swiftlake_spark.session import build_session

    spark = build_session(
        EngineConfig(app_name="fuzz-sweep", cpus=8, shuffle_partitions=8)
    )
    import tempfile

    eng = SwiftLakeEngine(spark, warehouse=tempfile.mkdtemp(prefix="fuzz_wh_"))
    for t in _TABLES:
        df = load(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        eng.catalog.create_table(
            f"fuzz.{t}", df.schema, partition_spec=PARTITION_SPECS.get(t)
        )
        eng.insert_into(f"fuzz.{t}").dataframe(df).execute()

    con = make_oracle_con(sf_dir)
    queries = generate_corpus(n, sample_pools(con), seed0=seed0)
    t0 = time.time()
    bad = 0
    for k, sql in enumerate(queries):
        seed = seed0 + k
        try:
            res = con.execute(sql)
            d_cols = [d[0].lower() for d in res.description]
            d_rows = res.fetchall()
            dc, dr = canon_rows(d_cols, d_rows)
            for label, frame in (
                ("spark", spark.sql(sql)),
                ("engine", eng.sql(to_engine_sql(sql))),
            ):
                sc, sr = canon_rows(frame.columns, [tuple(r) for r in frame.collect()])
                sc = [c.lower() for c in sc]
                if sc != dc or len(sr) != len(dr) or any(
                    a != b for a, b in zip(sr, dr)
                ):
                    bad += 1
                    print(f"MISMATCH seed {seed} [{label}]\n  {sql}", flush=True)
        except Exception as exc:  # noqa: BLE001
            bad += 1
            print(f"ERROR seed {seed}: {exc}\n  {sql}", flush=True)
        if (k + 1) % 50 == 0:
            print(f"... {k + 1}/{n} ({time.time() - t0:.0f}s)", flush=True)
    print(f"sweep done: {n} seeds, {bad} failures, {time.time() - t0:.0f}s")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

"""Generate the vendored real-Iceberg golden fixture (VERDICT r10 ask #6).

Run this ONCE on any machine where pyiceberg is installed:

    python scripts/gen_iceberg_golden.py

It makes the REAL Apache Iceberg implementation write a small v2 table
(metadata JSON + Avro manifests + parquet, two snapshots so the reader
exercises manifest-list merging and time travel) under
``tests/fixtures/iceberg_golden/table`` plus an ``expected.json`` with
the rows pyiceberg itself reads back.  Commit the directory;
``tests/test_iceberg_interop.py::test_vendored_real_iceberg_golden``
activates automatically and pins ``sources/iceberg.py`` against an
artifact the real runtime produced — closing the spec-vs-runtime gap
without adding a dependency.

This sandbox has neither pyiceberg nor network access, so the script
exits with instructions here; it is committed so the fixture can be
produced the moment an environment allows.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(_REPO, "tests", "fixtures", "iceberg_golden")


def main() -> int:
    try:
        import pyarrow as pa
        from pyiceberg.catalog.sql import SqlCatalog
    except ImportError as exc:
        print(f"pyiceberg unavailable ({exc}); run where it is installed")
        return 2

    if os.path.isdir(GOLDEN):
        shutil.rmtree(GOLDEN)
    os.makedirs(GOLDEN)
    wh = os.path.join(GOLDEN, "_wh")
    cat = SqlCatalog(
        "golden",
        uri=f"sqlite:///{os.path.join(GOLDEN, '_cat.db')}",
        warehouse=f"file://{wh}",
    )
    cat.create_namespace("g")
    schema = pa.schema(
        [
            pa.field("id", pa.int64(), nullable=False),
            pa.field("name", pa.string()),
            pa.field("score", pa.float64()),
        ]
    )
    tbl = cat.create_table("g.t", schema=schema)
    tbl.append(
        pa.table(
            {"id": [1, 2, 3], "name": ["a", "b", None], "score": [1.5, None, 3.5]},
            schema=schema,
        )
    )
    tbl.append(
        pa.table(
            {"id": [4, 5], "name": ["d", "e"], "score": [4.5, 5.5]},
            schema=schema,
        )
    )
    rows = sorted(
        ([r["id"], r["name"], r["score"]] for r in tbl.scan().to_arrow().to_pylist()),
        key=lambda r: r[0],
    )
    # relocate the table dir to a stable path and drop catalog scaffolding
    src = tbl.location().removeprefix("file://")
    dst = os.path.join(GOLDEN, "table")
    shutil.copytree(src, dst)
    shutil.rmtree(wh)
    os.remove(os.path.join(GOLDEN, "_cat.db"))
    with open(os.path.join(GOLDEN, "expected.json"), "w") as fh:
        json.dump(
            {
                "columns": ["id", "name", "score"],
                "rows": rows,
                "snapshots": 2,
                # Iceberg metadata embeds ABSOLUTE URIs; record the
                # prefix the real runtime wrote so the reader can remap
                # it to wherever the fixture lands (IcebergTable
                # path_rewrites).
                "original_prefix": tbl.location(),
            },
            fh,
            indent=1,
        )
    print(f"wrote {dst} ({len(rows)} rows, 2 snapshots) — commit the directory")
    return 0


if __name__ == "__main__":
    sys.exit(main())

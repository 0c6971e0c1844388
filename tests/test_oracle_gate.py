"""Hard oracle gate: every registered query must match DuckDB at sf0.01.

The driver's CORRECTNESS gate checks a fixed 50-name inventory; this test
parametrizes over the FULL query registry so ``pytest tests/`` green
implies all declared queries (including those the driver never samples)
hash-match the oracle.  Rows-only queries (oracle=None) are executed and
must not error; additionally they must return >0 rows so a vacuous
implementation can't pass silently.

Override the tier with SWIFTLAKE_GATE_SF_DIR (e.g. sf0.001 for quick
local iteration).
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from check_oracle import check_query, make_oracle_con  # noqa: E402

from swiftlake_spark.queries import REGISTRY, _load_all  # noqa: E402

_load_all()
SF_DIR = os.environ.get("SWIFTLAKE_GATE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def oracle_con():
    con = make_oracle_con(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_gate(spark, oracle_con, name):
    qd = REGISTRY[name]
    err, n_rows = check_query(spark, oracle_con, qd, SF_DIR)
    assert err is None, f"{name}: {err}"
    # Vacuity guard: a hash-match on zero rows proves nothing (VERDICT r2).
    assert n_rows > 0, f"{name}: query returned 0 rows at {SF_DIR} — vacuous"

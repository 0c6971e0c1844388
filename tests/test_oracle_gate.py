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


def test_canon_decimal_is_exact_at_declared_scale():
    """The replica must be at least as strict as the driver's hash
    (VERDICT r12 ask #3 pinning test).

    The r12 escape: ``canon_value`` collapsed Decimal → repr(float(v)),
    erasing decimal scale/rendering — exactly the difference that made
    the committed-green q121 driver-red.  Decimals now compare exactly
    at declared scale and never equal a float rendering of the same
    number.
    """
    from decimal import Decimal

    from check_oracle import canon_value

    # scale is significant: 123.40 (scale 2) != 123.4 (scale 1)
    assert canon_value(Decimal("123.40")) != canon_value(Decimal("123.4"))
    # a Decimal never canonicalizes equal to the float of the same value
    assert canon_value(Decimal("123.4")) != canon_value(123.4)
    # equal Decimals at equal scale still match
    assert canon_value(Decimal("123.40")) == canon_value(Decimal("123.40"))

    # naive vs tz-aware timestamps render distinctly (same erasure class)
    import datetime as dt

    naive = dt.datetime(2026, 1, 1, 12, 0, 0)
    aware = dt.datetime(2026, 1, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
    assert canon_value(naive) != canon_value(aware)
    assert canon_value(aware) == canon_value(aware)


def test_check_query_rejects_decimal_output(spark, oracle_con):
    """A Spark result schema with DECIMAL columns fails loudly in the
    replica — the committed r12 q121 shape (val DECIMAL(18,2)) must be
    red BEFORE it reaches the driver, whose decimal canonicalization the
    repo cannot observe."""
    from swiftlake_spark.queries import QueryDef

    def decimal_shaped(spark_, sf_dir):
        df = spark_.range(3)
        from pyspark.sql import functions as F

        return df.select(
            F.col("id").alias("row_key"),
            (F.col("id") * 1.5).cast("decimal(18,2)").alias("val"),
        )

    qd = QueryDef(
        name="synthetic_decimal",
        fn=decimal_shaped,
        oracle="SELECT 1 AS row_key, CAST(1.50 AS DECIMAL(18,2)) AS val",
    )
    err, _ = check_query(spark, oracle_con, qd, SF_DIR)
    assert err is not None and "DECIMAL" in err, (
        f"decimal output columns must be red-flagged by the replica, got: {err}"
    )

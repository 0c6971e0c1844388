"""Type-mapping helpers for reference types Spark lacks (SURVEY.md §1.2).

- UUID → canonical lowercase ``8-4-4-4-12`` string
  (reference emits canonical form: sql/SchemaEvolution.java:484).
- TIME → microseconds since midnight as BIGINT
  (reference maps TIME to micros: sql/SchemaEvolution.java:478,
  mybatis/type/LocalTimeTypeHandler.java).

Both mappings are pure Catalyst expressions (whole-stage codegen, no
Python), so they cost nothing at 100 TB and are reproducible by any
ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICROS_PER_DAY = 86_400_000_000


def uuid_from_hex(hex32: Column) -> Column:
    """Canonical UUID string from 32 hex chars (e.g. an md5 digest):
    lowercase, dash-grouped 8-4-4-4-12 — the reference's storage form."""
    h = F.lower(hex32)
    # F.concat (not concat_ws): NULL input must yield NULL, not '' —
    # concat_ws skips NULL arguments and would corrupt nullity
    return F.concat(
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"),
        F.substring(h, 17, 4), F.lit("-"),
        F.substring(h, 21, 12),
    )


def is_canonical_uuid(s: Column) -> Column:
    """True iff ``s`` is a canonical lowercase UUID string."""
    return s.rlike(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")


def time_of_day_micros(ts: Column) -> Column:
    """TIME value of a timestamp as micros-since-midnight (BIGINT).

    Accepts TIMESTAMP and TIMESTAMP_NTZ; the session zone is pinned UTC
    (config.py), so the NTZ→TZ cast preserves wall time.
    """
    return F.pmod(F.unix_micros(ts.cast("timestamp")), F.lit(MICROS_PER_DAY))


def micros_to_time_string(micros: Column) -> Column:
    """Render micros-since-midnight as ``HH:MM:SS.ffffff`` (the canonical
    TIME literal form, micros precision — reference DateTimeUtil)."""
    h = (micros / 3_600_000_000).cast("bigint")
    m = F.pmod((micros / 60_000_000).cast("bigint"), F.lit(60))
    s = F.pmod((micros / 1_000_000).cast("bigint"), F.lit(60))
    us = F.pmod(micros, F.lit(1_000_000))
    return F.concat(
        F.lpad(h.cast("string"), 2, "0"), F.lit(":"),
        F.lpad(m.cast("string"), 2, "0"), F.lit(":"),
        F.lpad(s.cast("string"), 2, "0"), F.lit("."),
        F.lpad(us.cast("string"), 6, "0"),
    )

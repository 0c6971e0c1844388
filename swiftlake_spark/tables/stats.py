"""Per-file column statistics from parquet footers.

The write path collects (records, size, per-column min/max/null-count)
for every data file it produced — the same metrics the reference reads
back from parquet footers after DuckDB COPY
(writer/BaseDataFileWriter.java:353+, "prepareNewDataFiles").

Footer reads are metadata-only (no data pages).  Values are stored
JSON-portably: dates/timestamps as ISO strings, binary dropped, strings
truncated to 64 chars with the max bumped so bounds stay valid.
"""

from __future__ import annotations

import datetime as dt
import os
from typing import Any

import pyarrow.parquet as pq

_TRUNC = 64
_MAX_CP = 0x10FFFF


def _bump_max(s: str) -> str | None:
    """Smallest convenient string > every string with prefix ``s``:
    bump the LAST NON-MAXIMAL character (dropping anything after it),
    skipping the surrogate range — ≙ Iceberg UnicodeUtil.truncateStringMax.
    Bumping only the final char would raise on U+10FFFF and could mint a
    lone surrogate from U+D7FF.  None when every char is maximal (no
    finite upper bound → the max stat must be dropped, not fabricated)."""
    for i in range(len(s) - 1, -1, -1):
        cp = ord(s[i])
        if cp < _MAX_CP:
            ncp = cp + 1
            if 0xD800 <= ncp <= 0xDFFF:
                ncp = 0xE000
            return s[:i] + chr(ncp)
    return None


def _portable(v: Any, for_max: bool = False) -> Any:
    if v is None:
        return None
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, dt.datetime) else v.isoformat()
    if isinstance(v, bytes):
        return None  # binary bounds aren't worth the encoding trouble
    if isinstance(v, str) and len(v) > _TRUNC:
        if for_max:
            # truncating a max needs a bump so the truncated bound still
            # upper-bounds the real value; None (all-maximal) drops it
            return _bump_max(v[:_TRUNC])
        return v[:_TRUNC]
    return v


def collect_file_stats(abs_path: str) -> tuple[int, int, dict[str, dict[str, Any]]]:
    """→ (num_rows, byte_size, {col: {min,max,nulls}}) for one file.

    Soundness: a recorded "nulls" count must cover EVERY row group or be
    absent — an all-NULL row group has no min/max but DOES have a null
    count; skipping it while keeping other groups' counts would record
    nulls=0 for a file containing NULLs, and delete/overwrite would then
    drop whole files on an unsound not_null verdict (silent data loss).
    Min/max and null tracking are therefore independent per column."""
    f = pq.ParquetFile(abs_path)
    md = f.metadata
    num_rows = md.num_rows
    # top-level columns only (nested stats skipped, like the reference
    # which prunes on top-level fields)
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    have_mm: dict[str, bool] = {}
    have_nc: dict[str, bool] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaf — skip
                continue
            try:  # pyarrow raises lazily ("Cannot extract statistics for
                # type") for exotic logical types — treat as no stats
                st = col.statistics
            except Exception:
                st = None
            if st is None:
                have_mm[name] = False
                have_nc[name] = False
                continue
            nc = st.null_count
            if nc is None:
                have_nc[name] = False
            elif have_nc.setdefault(name, True):
                nulls[name] = nulls.get(name, 0) + nc
            try:
                if not st.has_min_max:
                    have_mm[name] = False
                    continue
                if have_mm.get(name) is False:
                    continue
                mn, mx = st.min, st.max
            except Exception:
                have_mm[name] = False
                continue
            have_mm.setdefault(name, True)
            if name not in mins or _lt(mn, mins[name]):
                mins[name] = mn
            if name not in maxs or _lt(maxs[name], mx):
                maxs[name] = mx
    out: dict[str, dict[str, Any]] = {}
    for name in set(list(mins) + list(nulls) + list(have_mm) + list(have_nc)):
        entry: dict[str, Any] = {}
        if have_mm.get(name) and name in mins:
            pmin = _portable(mins.get(name))
            pmax = _portable(maxs.get(name), for_max=True)
            if pmin is not None:
                entry["min"] = pmin
            if pmax is not None:
                entry["max"] = pmax
        if have_nc.get(name) and name in nulls:
            entry["nulls"] = nulls[name]
        out[name] = entry
    return num_rows, os.path.getsize(abs_path), out


def _lt(a: Any, b: Any) -> bool:
    try:
        return a < b
    except TypeError:
        return False

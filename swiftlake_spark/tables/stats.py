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
from typing import Any

import pyarrow.parquet as pq

_TRUNC = 64


def _portable(v: Any, for_max: bool = False) -> Any:
    if v is None:
        return None
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, dt.datetime) else v.isoformat()
    if isinstance(v, bytes):
        return None  # binary bounds aren't worth the encoding trouble
    if isinstance(v, str) and len(v) > _TRUNC:
        if for_max:
            # truncating a max needs the last kept char bumped so the
            # truncated bound still upper-bounds the real value
            s = v[:_TRUNC]
            return s[:-1] + chr(ord(s[-1]) + 1)
        return v[:_TRUNC]
    return v


def collect_file_stats(abs_path: str) -> tuple[int, int, dict[str, dict[str, Any]]]:
    """→ (num_rows, byte_size, {col: {min,max,nulls}}) for one file."""
    f = pq.ParquetFile(abs_path)
    md = f.metadata
    num_rows = md.num_rows
    size = md.serialized_size
    # top-level columns only (nested stats skipped, like the reference
    # which prunes on top-level fields)
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    have: dict[str, bool] = {}
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
                if st is None or not st.has_min_max:
                    have[name] = False
                    continue
                if have.get(name) is False:
                    continue
                mn, mx = st.min, st.max
                nc = st.null_count
            except Exception:
                have[name] = False
                continue
            have.setdefault(name, True)
            if name not in mins or _lt(mn, mins[name]):
                mins[name] = mn
            if name not in maxs or _lt(maxs[name], mx):
                maxs[name] = mx
            if nc is not None:
                nulls[name] = nulls.get(name, 0) + nc
    out: dict[str, dict[str, Any]] = {}
    for name in set(list(mins) + list(nulls)):
        if have.get(name) is False:
            entry = {}
        else:
            entry = {
                "min": _portable(mins.get(name)),
                "max": _portable(maxs.get(name), for_max=True),
            }
        if name in nulls:
            entry["nulls"] = nulls[name]
        out[name] = entry
    import os

    return num_rows, os.path.getsize(abs_path), out


def _lt(a: Any, b: Any) -> bool:
    try:
        return a < b
    except TypeError:
        return False

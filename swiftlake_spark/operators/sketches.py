"""Frequency sketches: count-min over a relational counter table.

The count-min sketch (Cormode & Muthukrishnan 2005) estimates per-key
frequencies with d hash rows of w counters each: every occurrence
increments one counter per row, and a key's estimate is the MIN of its
d counters — never an undercount, overcounts only through collisions
(E[overcount] <= N/w per row, so the min over d rows is tight for
heavy keys).  The classic use at corpus scale is heavy-hitter
detection over an unbounded key space (terms, URLs, fingerprints)
where an exact groupBy would shuffle every distinct key.

Spark-first formulation (same idiom as the bloom membership filter in
``operators/dedup.py``): the sketch is never a mutable array —

- the COUNTER TABLE is a relation of (row, position, count) built by
  one posexplode + groupBy, bounded by d * 2^bits rows REGARDLESS of
  corpus size (broadcastable);
- a probe key's estimate is a map-side posexplode + broadcast join +
  one min-per-key aggregation.

The hash rows are disjoint hex windows of one MD5 (two nibbles per
row), so DuckDB derives the IDENTICAL sketch and the operator
certifies under a FULL hash-match oracle (q154) — estimates match
bit-for-bit including collision inflation, and the zero-false-negative
invariant (est >= true count) is checked per key.

100 TB shape: the corpus pass is one shuffle whose output is bounded
by d*w rows; the probe pass is one shuffle keyed by the probe value.
Nothing reaches the driver; no Python eval anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_positions(col: Column, d: int = 4, bits_per_pos: int = 8) -> Column:
    """The d per-row counter positions of a value — array<int> of ``d``
    integers in [0, 2^bits_per_pos), from disjoint hex windows of one
    MD5 (``d * bits_per_pos <= 128``).  Engine-portable: DuckDB derives
    identical positions from the same hex arithmetic."""
    if not 1 <= d * bits_per_pos <= 128:
        raise ValueError("d * bits_per_pos must fit one MD5 (<= 128)")
    if bits_per_pos % 4:
        raise ValueError("bits_per_pos must be a whole number of nibbles")
    nh = bits_per_pos // 4  # hex chars per position
    h = F.md5(col)
    return F.array(*[
        F.conv(F.substring(h, 1 + nh * r, nh), 16, 10).cast("int")
        for r in range(d)
    ])


def count_min_frequencies(
    corpus: DataFrame,
    probe: DataFrame,
    value_col: str,
    *,
    d: int = 4,
    bits_per_pos: int = 8,
    out_col: str = "cm_estimate",
    broadcast_counters: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min frequency estimate of each DISTINCT ``probe[value_col]``
    over the occurrences in ``corpus[value_col]`` (one corpus row = one
    occurrence).

    Returns one row per distinct probe value: ``(value_col, out_col)``
    with ``out_col`` BIGINT.  Estimates are >= the true occurrence
    count by construction (min over d colliding counters); a value
    absent from the corpus gets the pure collision mass of its
    positions (possibly 0).

    ``broadcast_counters=False`` shuffles the counter join instead —
    for configurations where d * 2^bits_per_pos is pushed past
    broadcast range.

    ``weight_col`` (r14, guide §2.3 "aggregate before you shuffle"):
    when the caller already holds pre-aggregated (value, count) rows —
    e.g. several sketches built over one corpus share a single token
    count pass — pass the count column and each corpus row contributes
    ``weight_col`` occurrences: counters become SUM(weight) per
    position, which equals counting raw occurrences exactly (integer
    sums), while the counter build hashes |distinct values| rows
    instead of |occurrences|.
    """
    pos = cm_positions(F.col(value_col), d, bits_per_pos)
    if weight_col is None:
        counters = (
            corpus.select(F.posexplode(pos).alias("__r", "__p"))
            .groupBy("__r", "__p")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
    else:
        counters = (
            corpus.select(
                F.col(weight_col).alias("__w"),
                F.posexplode(pos).alias("__r", "__p"),
            )
            .groupBy("__r", "__p")
            .agg(F.sum("__w").alias("__c"))
        )
    if broadcast_counters:
        counters = F.broadcast(counters)
    return (
        probe.select(value_col).distinct()
        .select(value_col, F.posexplode(pos).alias("__r", "__p"))
        .join(counters, ["__r", "__p"], "left")
        .groupBy(value_col)
        .agg(
            F.min(F.coalesce("__c", F.lit(0)))
            .cast("bigint")
            .alias(out_col)
        )
    )

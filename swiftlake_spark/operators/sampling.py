"""Deterministic sampling and dataset splitting.

Training pipelines need samples and train/eval splits that are
REPRODUCIBLE across runs, engines, and data relayouts — so nothing here
uses ``rand()``: membership is a pure function of the row's key.

- :func:`hash_sample`      — keep ~fraction of rows by key-hash bucket.
- :func:`hash_split`       — disjoint named splits (train/val/test) with
  given weights; every key lands in exactly one split, stable forever.
- :func:`stratified_limit` — at most n rows per group (window row_number
  by hashed order — deterministic "random" within the group).

The md5 variants are portable to the SQL oracle; the xxhash64 fast path
is the default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _bucket(key: Column, salt: str, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(salt), key), F.lit(_BUCKETS))
    # portable: first 8 hex chars of md5 → int.  NULL keys hash a
    # sentinel instead of propagating — a NULL bucket would silently
    # DROP every NULL-key row from hash_sample and pin them to the last
    # split in hash_split, diverging from the xxhash64 path (which
    # hashes NULL deterministically); the sentinel keeps both paths
    # deterministic-per-key on NULLs and portable to a SQL oracle
    # (coalesce(k, '\x00NULL') spells the same there)
    k = F.coalesce(key.cast("string"), F.lit("\x00NULL"))
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), k)), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(_BUCKETS),
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    *,
    salt: str = "sample",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic ~fraction sample keyed on ``key_col``: the same keys
    are selected on every run and on every engine with the same hash."""
    return df.filter(
        _bucket(F.col(key_col), salt, hash_fn) < int(fraction * _BUCKETS)
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    *,
    salt: str = "split",
    hash_fn: str = "xxhash64",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split with ~weight
    proportions.  Keys are stable: re-running never moves a key between
    train and test (the property that keeps eval sets uncontaminated)."""
    total = sum(weights.values())
    b = _bucket(F.col(key_col), salt, hash_fn)
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = b < int(acc * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_limit(
    df: DataFrame,
    group_col: str,
    n: int,
    *,
    key_col: str,
    salt: str = "strat",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """At most ``n`` rows per group, chosen by deterministic hashed order
    (a reproducible per-group subsample)."""
    order = _bucket(F.col(key_col), salt, hash_fn)
    w = W.partitionBy(group_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def mixing_weights(
    df: DataFrame,
    group_col: str,
    tokens_col: str | Column,
    *,
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Corpus-mixing weights: per-group sampling multipliers that steer
    the token distribution toward a target mix (the static data-mixing
    step of Pile/Dolma-style corpus assembly).

    Per group: ``(group, n_docs, n_tokens, actual_share, target_share,
    weight)`` where ``weight = target_share / actual_share`` — the
    factor to multiply the group's sampling rate by (>1 means the group
    is under-represented and repeats/upsamples).  ``target_shares``
    maps group → desired token share; groups not in the map get 0.0
    (dropped from the mix); with no map the target is uniform across
    the groups present.

    Scale (100 TB): one aggregate shuffle on the group key (map-side
    partial sums); the share math runs over the per-group result, which
    is tiny — the unpartitioned window is over #groups rows, never data
    rows.  Deterministic: plain integer sums and IEEE division (no
    rand(), no transcendentals).
    """
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    per = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens).cast("bigint").alias("n_tokens"),
    )
    w = W.partitionBy()
    total = F.sum("n_tokens").over(w)
    if target_shares is None:
        tgt = F.lit(1.0) / F.count(F.lit(1)).over(w)
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target_shares.items() for x in
              (kv[0], float(kv[1]))]
        )
        tgt = F.coalesce(mapping[F.col("group")], F.lit(0.0))
    actual = F.col("n_tokens").cast("double") / total
    # a zero-token group has no defined upsampling factor: its weight
    # is NULL by construction (explicitly, not via silent non-ANSI
    # divide-by-zero), and callers must drop or special-case it
    weight = F.when(F.col("n_tokens") > 0, tgt / actual)
    return per.select(
        "group", "n_docs", "n_tokens",
        actual.alias("actual_share"),
        tgt.alias("target_share"),
        weight.alias("weight"),
    )


def quantile_outliers(
    df: DataFrame,
    value_col: str,
    *,
    by: str | None = None,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Flag rows whose ``value_col`` falls outside the [lo, hi]
    percent-rank band within their group — the distribution-tail filter
    of a quality pipeline (drop freakishly short/long documents per
    language rather than by a global constant).

    Adds ``cd`` (cume_dist: fraction of group rows with value ≤ this
    row's), ``cd_rev`` (fraction with value ≥ it), and ``is_outlier``
    (``cd < lo OR cd_rev < 1 - hi``).  Tail fractions rather than
    percent_rank, on both ends: percent_rank pins the group minimum to
    0 (< lo always) and cume_dist pins the maximum to 1 (> hi always),
    so either alone flags an extreme row unconditionally — the
    two-sided form flags nothing on a degenerate all-equal group and
    is symmetric under value reflection.  ``cd_rev`` derives from the
    SAME ascending sort ((n - rank + 1)/n; rank-with-ties = #rows<v +
    1), so there is no second window sort; every rational is identical
    in Spark and ANSI SQL, so flags hash-match an oracle bit-for-bit.

    Scale (100 TB): one shuffle on the group key; the sort is
    within-partition.  A global (ungrouped) call serializes into a
    single partition — pass ``by`` at scale.
    """
    part = W.partitionBy(by) if by is not None else W.partitionBy()
    ordered = part.orderBy(F.col(value_col))
    n = F.count(F.lit(1)).over(part)
    cd = F.cume_dist().over(ordered)
    cd_rev = (n - F.rank().over(ordered) + 1).cast("double") / n
    return (
        df.withColumn("cd", cd)
        .withColumn("cd_rev", cd_rev)
        .withColumn(
            "is_outlier", (F.col("cd") < F.lit(float(lo)))
            | (F.col("cd_rev") < F.lit(1.0 - float(hi)))
        )
    )


def token_budget_waterfill(
    caps: DataFrame,
    group_col: str,
    cap_col: str,
    budget,
) -> DataFrame:
    """Water-filling token-budget allocation across corpus groups.

    Given per-group available token counts (``cap_col``) and a global
    ``budget`` (int, or a 1-row/1-col DataFrame computed from the same
    data), allocate the budget as evenly as possible without exceeding
    any group's availability: small groups are taken whole (saturated),
    the remainder is split equally — the equal-weight water-fill
    ``alloc_g = min(cap_g, L)`` with the level L chosen so that
    Σ alloc = min(budget, Σ cap).

    Closed form, no iteration: sort groups by capacity ascending; group
    at position r (of n) saturates iff ``cap_r · (n−r+1) ≤ budget −
    cum_before_r`` (greedy prefix — the standard water-filling
    argument); with k saturated groups holding ``sat`` tokens, the
    level is ``(budget − sat) / (n − k)``.  All comparisons are on
    BIGINT products, the level is one exact double division, so the
    result hash-matches an ANSI-SQL oracle bit-for-bit.

    Returns ``group_col, cap, alloc (double), saturated (bool)``.

    Scale (100 TB): runs on the per-group relation — thousands of rows
    after the one aggregate shuffle that produced ``caps`` — so the
    single-partition window is deliberate and cheap; never call this on
    a per-document relation.
    """
    if isinstance(budget, DataFrame):
        b = F.broadcast(budget.select(F.col(budget.columns[0]).alias("__b")))
        sized = caps.select(
            F.col(group_col), F.col(cap_col).cast("bigint").alias("cap")
        ).crossJoin(b)
    else:
        sized = caps.select(
            F.col(group_col),
            F.col(cap_col).cast("bigint").alias("cap"),
            F.lit(int(budget)).cast("bigint").alias("__b"),
        )
    w = W.partitionBy().orderBy(F.col("cap"), F.col(group_col))
    ranked = sized.select(
        group_col,
        "cap",
        "__b",
        F.row_number().over(w).alias("__r"),
        F.coalesce(
            F.sum("cap").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("__cum"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("__n"),
    ).withColumn(
        "saturated",
        F.col("cap") * (F.col("__n") - F.col("__r") + 1)
        <= F.col("__b") - F.col("__cum"),
    )
    lvl = ranked.agg(
        F.coalesce(F.sum(F.when(F.col("saturated"), F.col("cap"))), F.lit(0)).alias(
            "__sat"
        ),
        F.coalesce(F.sum(F.col("saturated").cast("bigint")), F.lit(0)).alias("__k"),
        F.max("__n").alias("__n2"),
        F.max("__b").alias("__b2"),
    )
    return (
        ranked.crossJoin(F.broadcast(lvl))
        .select(
            group_col,
            "cap",
            F.when(F.col("saturated"), F.col("cap").cast("double"))
            .otherwise(
                (F.col("__b2") - F.col("__sat")).cast("double")
                / (F.col("__n2") - F.col("__k")).cast("double")
            )
            .alias("alloc"),
            "saturated",
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
    out_col: str = "chunk",
) -> DataFrame:
    """Split long documents into fixed token windows with overlap —
    the standard pretraining prep step ahead of packing (q76): a doc
    of N whitespace tokens yields ceil-ish windows starting every
    ``max_tokens - overlap`` tokens, each carrying up to
    ``max_tokens`` tokens.

    Pure Catalyst (sequence → transform → posexplode; no Python eval),
    so chunking is row-local with zero shuffles — at 100 TB the plan
    is scan → project → generate, and the explode factor is bounded by
    N/(max_tokens-overlap) per document.

    Output: input columns + ``{out_col}_idx`` (0-based window index),
    ``{out_col}`` (window text), ``{out_col}_n_tokens``.  Empty/
    whitespace-only documents yield a single empty chunk (idx 0), so
    no rows are silently dropped.
    """
    if max_tokens < 1 or not 0 <= overlap < max_tokens:
        raise ValueError("need max_tokens >= 1 and 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.when(F.trim(F.col(text_col)) == "", F.array()).otherwise(toks)
    n = F.size(toks)
    # Window starts: 0, step, 2*step, ... but only starts that carry at
    # least one NEW token (s == 0 or s + overlap < n) — a start at
    # s >= n - overlap would emit a window that is 100% overlap of its
    # predecessor (e.g. a doc of exactly max_tokens tokens must yield ONE
    # chunk, not two identical ones).  Dropping those starts loses no
    # coverage: the kept maximum start s_max > n - overlap - 1 - step, so
    # s_max + max_tokens > n - 1 and the final window reaches the last
    # token.
    last_new = F.greatest(n - F.lit(overlap) - F.lit(1), F.lit(0))
    starts = F.sequence(
        F.lit(0),
        last_new - (last_new % F.lit(step)),
        F.lit(step),
    )
    chunks = F.transform(
        starts,
        lambda s: F.concat_ws(
            " ", F.slice(toks, s + 1, F.lit(max_tokens))
        ),
    )
    return (
        df.withColumn("__chunks", chunks)
        .select(
            "*",
            F.posexplode("__chunks").alias(f"{out_col}_idx", out_col),
        )
        .drop("__chunks")
        .withColumn(
            f"{out_col}_n_tokens",
            F.when(F.col(out_col) == "", F.lit(0)).otherwise(
                F.size(F.split(F.col(out_col), " ", -1))
            ),
        )
    )

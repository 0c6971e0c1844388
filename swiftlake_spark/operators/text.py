"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.  All JVM-side column expressions (no Python in
the hot path) — these run as map-only stages with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# Tiny marker-word profiles for the heuristic language scorer.  Real
# pipelines swap in character n-gram models; the operator shape (score
# per language, argmax) is what matters here.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
}

_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_whitespace(text: Column) -> Column:
    """DuckDB-parity token split: the empty string yields one empty
    token and leading whitespace yields empty leading tokens — matching
    ``string_split`` in the DuckDB oracles that certify every consumer
    (q42/q51/q52/q54/...).  "Fixing" the edge here without changing all
    oracles would break hash certification; the fixtures are
    single-space separated, so counts agree in practice."""
    return F.split(text, r"\s+")


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """Token count: whitespace split or a BPE-ish regex (letters runs,
    digit runs, single punctuation — a crude proxy for subword counts)."""
    if mode == "whitespace":
        return F.size(tokens_whitespace(text))
    if mode == "bpe":
        return F.size(F.regexp_extract_all(text, F.lit(_BPE_ISH), 0))
    raise ValueError(mode)


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality-signal columns: lengths, token stats, punctuation /
    digit / stopword ratios, repetition (distinct-token ratio)."""
    text = F.col(text_col)
    toks = tokens_whitespace(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stop = F.size(F.filter(toks, lambda w: w.isin(*LANG_MARKERS["en"])))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    punct = F.length(F.regexp_replace(text, r"[^\.,;:!?]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    avg_word_len = (n_chars - (n_tok - 1)) / n_tok
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_chars_m", n_chars)
        .withColumn("avg_word_len", avg_word_len)
        .withColumn("stopword_ratio", stop / n_tok)
        .withColumn("distinct_token_ratio", distinct_ratio)
        .withColumn("punct_ratio", punct / n_chars)
        .withColumn("digit_ratio", digits / n_chars)
        .withColumn(
            "quality_score",
            (
                F.least(n_tok / 64.0, F.lit(1.0)) * 0.4
                + F.col("distinct_token_ratio") * 0.4
                + (1 - F.col("punct_ratio")) * 0.1
                + (1 - F.col("digit_ratio")) * 0.1
            ),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: marker-word hit-rate per language, argmax.
    Ties break lexicographically (deterministic)."""
    toks = tokens_whitespace(F.col(text_col))
    n = F.size(toks)
    scored = df
    for lang, markers in sorted(LANG_MARKERS.items()):
        hits = F.size(F.filter(toks, lambda w: w.isin(*markers)))
        scored = scored.withColumn(f"__score_{lang}", hits / n)
    pairs = F.array(
        *[
            F.struct(
                F.col(f"__score_{lang}").alias("score"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(pairs)  # struct compare: score first, then lang
    out = scored.withColumn(out_col, best["lang"]).withColumn(
        f"{out_col}_score", best["score"]
    )
    return out.drop(*[f"__score_{lang}" for lang in LANG_MARKERS])


def fingerprint(
    df: DataFrame, id_col: str, text_col: str = "text", shingle_k: int = 3
) -> DataFrame:
    """Content fingerprints: full-text hash + min/max shingle hashes
    (a 3-value sketch usable for containment screening)."""
    from swiftlake_spark.operators.dedup import shingles

    sh = shingles(df, id_col, text_col, shingle_k)
    # the sketch key gets a reserved name so a caller whose id column is
    # itself named 'id' doesn't hit AMBIGUOUS_REFERENCE on the join
    sketch = sh.groupBy("id").agg(
        F.min(F.xxhash64("sh")).alias("min_shingle_hash"),
        F.max(F.xxhash64("sh")).alias("max_shingle_hash"),
    ).withColumnRenamed("id", "__fp_id")
    return (
        df.withColumn("content_hash", F.xxhash64(F.col(text_col)))
        .join(sketch, F.col(id_col) == F.col("__fp_id"), "left")
        .drop("__fp_id")
    )


# PII patterns chosen to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB oracle): no lookaround, no backreferences, ASCII \b only.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Redact PII spans and attach per-category match counts.

    Adds ``n_<category>`` count columns and ``out_col`` with each match
    replaced by ``<CATEGORY>``.  Patterns apply in list order (counts are
    taken before that category's replacement), so earlier replacements
    mask later patterns exactly as the redacted text implies.  Map-only
    column expressions — no shuffle, no Python; at 100 TB this is a
    pure scan-transform stage that pipelines with any downstream op.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    out = df
    red: Column = F.col(text_col)
    for name, pat in pats:
        out = out.withColumn(f"n_{name}", F.regexp_count(red, F.lit(pat)))
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
        # re-anchor so each count sees prior categories already redacted
        out = out.withColumn("__red", red)
        red = F.col("__red")
    return out.withColumnRenamed("__red", out_col)


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms,
    with the RATIONAL idf variant ``(N - df + 0.5) / (df + 0.5)`` (the
    raw odds ratio, no log).  Dropping the log keeps every arithmetic
    step inside exactly-specified IEEE +,-,*,/ — bit-identical across
    engines (libm ``ln`` is NOT), so the score hash-certifies against a
    SQL oracle; the ranking it induces for single-term queries is
    identical, and for multi-term queries it is the same family of
    scores retrieval stacks tune anyway.

    Per-term contributions are routed through DECIMAL(28,10) before the
    per-doc sum so the aggregate is order-independent (FIXTURES.md §4).

    Scale: tokens explode map-side but are filtered to the query terms
    BEFORE the (id, term) count shuffle; df/N/avgdl are tiny aggregates
    broadcast back.  Returns (id, score) for docs containing ≥1 term.
    """
    # r14 (guide §2.3 "project before the exchange", applied to the
    # generator): the query-term filter now runs INSIDE the token array
    # before explode, so the generator emits only matching tokens
    # (|terms| per doc at most) instead of every token of the corpus —
    # the exploded row volume drops from O(corpus tokens) to O(matches).
    # Same rows survive as the old explode-then-filter, so tf is
    # unchanged.
    toks = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t.isin(*terms))
        ).alias("tok"),
    )
    stats = df.select(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.size(F.split(F.col(text_col), " "))).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tf = (
        toks.groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # spelled EXACTLY like the SQL oracle: every operand double first
    idf = (F.col("n").cast("double") - F.col("df") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = (
        (idf * (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / denom)
    ).cast("decimal(28,10)")
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("id")
        .agg(F.sum(contrib).alias("__s"))
        .select("id", F.col("__s").cast("double").alias("score"))
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf with the
    rational idf ``N / df`` (no log — same engine-portability argument
    as :func:`bm25_scores`; the per-document ranking is identical since
    log is monotonic and idf enters each term's score once).

    Returns (id, rnk, tok, tf, df, score), rnk 1..k, ties broken by
    token text for determinism.

    Scale: (id, tok) count shuffle with map-side combine; df is a
    second small shuffle over distinct (tok); the final top-k is a
    per-doc window — no global sort.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    # N as a broadcast 1-row aggregate inside the plan, not an eager
    # df.count() — that would be a second full pass over the corpus
    stats = df.select(F.count(F.lit(1)).cast("double").alias("n"))
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # r14 (guide §2.4 "remove shuffles outright"): df was a SECOND
    # aggregation of tf joined back onto tf — the explode+count subtree
    # ran twice and the join added its own exchanges.  df is just the
    # row count of tf per tok, so a count window over a tok-partitioned
    # exchange produces the identical value with tf computed ONCE
    # (plans/r14/q127_tfidf_topterms_{before,after}.txt: 8 exchanges →
    # 3, one explode pass instead of two).
    wt = W.partitionBy("tok")
    scored = tf.withColumn("df", F.count(F.lit(1)).over(wt))
    score = F.col("tf") * (F.col("n") / F.col("df"))
    wd = W.partitionBy("id").orderBy(score.desc(), F.col("tok"))
    return (
        scored.crossJoin(F.broadcast(stats))
        .withColumn("rnk", F.row_number().over(wd))
        .filter(F.col("rnk") <= k)
        .select("id", "rnk", "tok", "tf", "df", score.alias("score"))
    )


def hashed_importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_cond: Column,
) -> DataFrame:
    """DSIR-style data selection weights from hashed token features.

    Tokens hash into 16 buckets (first hex char of md5 — portable to
    every SQL engine); the target distribution is estimated from the
    rows matching ``target_cond``, the raw distribution from all rows,
    and each document's weight is the MEAN per-token probability ratio
    p_target(bucket)/p_raw(bucket) — the rational-arithmetic sibling of
    DSIR's mean log-ratio (log dropped for cross-engine bit-exactness;
    the induced ordering is what selection uses, and a monotone map of
    per-bucket ratios preserves single-bucket orderings).

    Returns (id, n_tokens, weight); higher ⇒ more target-like.

    Scale: one token-explode pass builds BOTH distributions (map-side
    combine onto 16 keys ⇒ the distribution aggregate is effectively
    free); the 16-row ratio table broadcasts back onto the token stream
    and the per-doc mean is one shuffle on id.
    """
    # r14 (guide §2.4): the token stream fed two consumers (the global
    # bucket distribution and the per-doc mean), so the corpus was
    # exploded TWICE.  Pre-aggregating to (id, bucket) token counts
    # right after the explode gives one shared exchange both consumers
    # reuse: the distribution re-aggregates the (docs x 16)-row relation
    # by bucket (tiny), and the per-doc sum uses cnt * r — an exact
    # integer multiple of the DECIMAL(28,10) ratio, identical to summing
    # r once per token row, so weights are bit-unchanged
    # (plans/r14/q125_dsir_weights_{before,after}.txt: one explode pass
    # instead of two, reused exchange).
    toks = df.select(
        F.col(id_col).alias("id"),
        target_cond.cast("int").alias("__is_t"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).withColumn(
        "b",
        F.expr("instr('0123456789abcdef', substring(md5(tok), 1, 1))"),
    )
    per = toks.groupBy("id", "b").agg(
        F.count(F.lit(1)).alias("cnt"),
        # target_cond is a row-level (per-doc) predicate, constant
        # within a doc's tokens
        F.first("__is_t").alias("__is_t"),
    )
    dist = per.groupBy("b").agg(
        F.sum("cnt").alias("c"),
        F.sum(F.col("cnt") * F.col("__is_t")).alias("ct"),
    )
    tot = dist.agg(
        F.sum("c").alias("t"), F.sum("ct").alias("tt")
    )
    ratio = (
        dist.crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                (F.col("ct").cast("double") / F.col("tt"))
                / (F.col("c").cast("double") / F.col("t"))
            ).alias("r"),
        )
    )
    return (
        per.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            # type discipline: (26,10) x (11,0) -> decimal(38,10) with NO
            # precision-loss adjustment, so the product is the exact
            # integer multiple of the rounded ratio (a 28,10 x bigint
            # product would hit Spark's allowPrecisionLoss re-scale to
            # (38,6) and ROUND — breaking bit-parity with the per-token
            # sum).  Bounds: |r| < 1e16 and cnt < 1e11 hold for any real
            # corpus (cnt is one document's token count in one bucket).
            F.sum(
                F.col("r").cast("decimal(26,10)")
                * F.col("cnt").cast("decimal(11,0)")
            ).alias("__s"),
        )
        .select(
            "id",
            "n_tokens",
            (F.col("__s").cast("double") / F.col("n_tokens")).alias("weight"),
        )
    )


def ngram_repetition(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 2
) -> DataFrame:
    """Within-document n-gram repetition (the Gopher repetition signals
    q75's length/stopword rules don't cover): per document, the
    duplicate-n-gram fraction ``1 - distinct/total`` and the most-common
    n-gram's share of all n-grams.  High values mark degenerate,
    loop-generated, or boilerplate text.

    Returns (id, n_ngrams, n_distinct, dup_frac, top_frac).

    Scale: gram explode collapses straight into a (doc, gram) count with
    map-side combine; the per-doc rollup is one more small aggregate on
    id.  Nothing cross-document — trivially partition-parallel.
    """
    w = F.split(F.col(text_col), " ")
    arr = F.aggregate(
        F.array(w),
        F.array().cast("array<string>"),
        lambda _acc, wv: F.when(
            F.size(wv) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(wv) - n),
                lambda i: F.concat_ws(" ", F.slice(wv, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    grams = df.select(F.col(id_col).alias("id"), F.explode(arr).alias("g"))
    cnt = grams.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("id")
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("__mx"),
        )
        .select(
            "id",
            "n_ngrams",
            "n_distinct",
            (
                F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_ngrams")
            ).alias("dup_frac"),
            (F.col("__mx").cast("double") / F.col("n_ngrams")).alias("top_frac"),
        )
    )


_TRACKING_PARAM = r"^(utm_[^=]*|ref|fbclid|gclid|sessionid)="


def canonical_url(url: Column) -> Column:
    """Crawl-style URL canonicalization, pure Catalyst (map-only):

    - drop the fragment (``#...``) and the scheme (``https://`` etc.);
    - lowercase the host and strip a leading ``www.``;
    - drop tracking query params (``utm_*``, ``ref``, ``fbclid``,
      ``gclid``, ``sessionid``) and SORT the survivors so param order
      doesn't split identical resources;
    - strip trailing slashes from the path.

    Two raw URLs that differ only in scheme case, ``www``, param order,
    tracking params, fragment or a trailing slash canonicalize to the
    same string; group on the result (one hash shuffle) to dedup a
    crawl.  100 TB: this is a per-row expression — dedup cost is the
    one exchange on the canonical key.
    """
    no_frag = F.regexp_replace(url, r"#.*$", "")
    rest = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    host_raw = F.regexp_extract(rest, r"^[^/?]*", 0)
    host = F.regexp_replace(F.lower(host_raw), r"^www\.", "")
    pathq = F.substring(rest, F.length(host_raw) + 1, 1 << 30)
    path = F.regexp_replace(F.regexp_extract(pathq, r"^[^?]*", 0), r"/+$", "")
    q = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM),
        )
    )
    canon_q = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(host, path, canon_q)


def normalize_for_dedup(text: Column) -> Column:
    """Dedup-canonical text normalization, pure Catalyst (map-only) —
    the preprocessing every fuzzy-dedup family (MinHash / SimHash /
    n-gram) runs first so cosmetic variation doesn't split duplicates:

    - lowercase;
    - every digit run → ``0`` (dates/ids/counters don't distinguish
      documents);
    - punctuation/symbols (anything not letter/digit/whitespace) →
      dropped;
    - whitespace runs (incl. newlines/tabs) → one space, ends trimmed.

    Per-row expression — at 100 TB the normalization is free relative
    to the dedup shuffle that follows; group on md5(normalized) for the
    exact-canonical tier."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[0-9]+", "0")
    t = F.regexp_replace(t, r"[^a-z0-9\s]+", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def char_diversity(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Character-distribution quality signals per document, all exact
    rationals (hash-identical across engines — no logs):

    - ``n_chars``: character count;
    - ``n_distinct_chars``: alphabet size used;
    - ``simpson``: 1 - Σ p_c² (collision probability complement — the
      rational stand-in for entropy: 0 for a single repeated char,
      →1 for uniform over a large alphabet);
    - ``top_char_share``: max_c p_c.

    Degenerate machine text (base64 blobs, padding runs, single-char
    floods) separates cleanly from prose on (simpson, top_char_share).
    Σ count² and max(count) are integer aggregates, so the doubles are
    single exact divisions.  100 TB: explode → one partial-agg shuffle
    on (id, char), one on id; both combine map-side.
    """
    chars = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.filter(F.split(F.col(text_col), ""), lambda c: c != "")).alias("ch"),
    )
    per_char = chars.groupBy("id", "ch").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_char.groupBy("id")
        .agg(
            F.sum("c").cast("bigint").alias("n_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("__s2"),
            F.max("c").alias("__mx"),
        )
        .select(
            "id",
            "n_chars",
            "n_distinct_chars",
            (
                F.lit(1.0)
                - F.col("__s2").cast("double")
                / (F.col("n_chars") * F.col("n_chars")).cast("double")
            ).alias("simpson"),
            (F.col("__mx").cast("double") / F.col("n_chars").cast("double")).alias(
                "top_char_share"
            ),
        )
    )


def zipf_slope_stats(
    df: DataFrame, text_col: str = "text", top_v: int = 1024
) -> DataFrame:
    """Binary-decade Zipf slope of the corpus token distribution.

    Natural-language token frequencies follow freq ∝ rank^s with
    s ≈ -1; heavily duplicated or machine-generated corpora flatten or
    steepen the curve, so the slope is a cheap corpus-health signal.
    To stay bit-exact across engines (FIXTURES.md §4: no
    transcendentals), rank and frequency are bucketed to their binary
    decades — x = floor(log2 rank) and y = floor(log2 freq) via
    ``length(bin(v)) - 1``, both exact integers — and the least-squares
    slope over the top ``top_v`` ranks is assembled from BIGINT sums:
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), one exact double
    division.  Returns one row: ``n_ranked``, ``slope``.

    100 TB: token counts partial-aggregate map-side (one shuffle); the
    rank window runs on the top_v-truncated relation only — the global
    sort is over ``top_v`` rows, never the vocabulary.
    """
    freqs = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok"))
        .limit(top_v)
    )
    ranked = freqs.select(
        "freq",
        F.row_number()
        .over(W.partitionBy().orderBy(F.col("freq").desc(), F.col("tok")))
        .alias("rank"),
    ).select(
        (F.length(F.bin(F.col("rank"))) - 1).cast("bigint").alias("x"),
        (F.length(F.bin(F.col("freq"))) - 1).cast("bigint").alias("y"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranked"),
        (
            (
                F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
                - F.sum("x") * F.sum("y")
            ).cast("double")
            / (
                F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x")
            ).cast("double")
        ).alias("slope"),
    )

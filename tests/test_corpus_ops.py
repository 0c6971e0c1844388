"""Round-9 corpus operators: substring-span dedup, BM25/TF-IDF scoring,
DSIR importance weights, edit-distance near-dup.  Planted-fixture tests
complement the DuckDB-oracle certification of q123-q128."""

import pytest
from pyspark.sql import functions as F


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


# ------------------------------------------------------- duplicate_spans


def test_duplicate_spans_merges_overlapping_windows(spark):
    from swiftlake_spark.operators.dedup import duplicate_spans

    # docs 1 and 2 share a 12-token run inside otherwise-unique context;
    # with n=8 the run contributes 5 overlapping dup grams per doc that
    # must merge into ONE maximal span of exactly 12 tokens
    shared = " ".join(f"s{i}" for i in range(12))
    d1 = "a1 a2 a3 " + shared + " a4 a5"
    d2 = "b1 b2 " + shared + " b3 b4 b5 b6"
    d3 = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    out = duplicate_spans(
        _mk(spark, [(1, d1), (2, d2), (3, d3)]), "doc_id", "text", n=8
    ).collect()
    spans = {r["id"]: r for r in out}
    assert set(spans) == {1, 2}
    # doc 1: shared run occupies 1-based token positions 4..15
    assert (spans[1]["span_start"], spans[1]["span_end"]) == (4, 15)
    assert spans[1]["span_tokens"] == 12 and spans[1]["n_tokens"] == 17
    # doc 2: positions 3..14
    assert (spans[2]["span_start"], spans[2]["span_end"]) == (3, 14)
    assert spans[2]["span_tokens"] == 12


def test_duplicate_spans_within_doc_repeat_not_flagged(spark):
    from swiftlake_spark.operators.dedup import duplicate_spans

    # the 8-gram repeats INSIDE doc 1 only — min_docs=2 counts distinct
    # docs, so self-repetition is not a cross-doc duplicate
    run = " ".join(f"r{i}" for i in range(8))
    d1 = run + " x1 x2 " + run
    out = duplicate_spans(
        _mk(spark, [(1, d1), (2, "u1 u2 u3 u4 u5 u6 u7 u8 u9")]),
        "doc_id",
        "text",
        n=8,
    ).collect()
    assert out == []


def test_duplicate_spans_disjoint_runs_stay_separate(spark):
    from swiftlake_spark.operators.dedup import duplicate_spans

    runA = " ".join(f"a{i}" for i in range(8))
    runB = " ".join(f"b{i}" for i in range(8))
    # doc 1 carries both runs separated by a 3-token unique gap (< n, so
    # the spans are non-overlapping but nearby); docs 2/3 carry one each
    d1 = runA + " g1 g2 g3 " + runB
    out = duplicate_spans(
        _mk(spark, [(1, d1), (2, runA), (3, runB)]), "doc_id", "text", n=8
    )
    got = {
        (r["id"], r["span_start"], r["span_end"]) for r in out.collect()
    }
    assert (1, 1, 8) in got and (1, 12, 19) in got
    assert (2, 1, 8) in got and (3, 1, 8) in got


def test_duplicate_spans_short_docs_yield_nothing(spark):
    from swiftlake_spark.operators.dedup import duplicate_spans

    out = duplicate_spans(
        _mk(spark, [(1, "a b c"), (2, "a b c")]), "doc_id", "text", n=8
    ).collect()
    assert out == []


# --------------------------------------------------- editdist_near_dups


def test_editdist_near_dups_blocking_and_threshold(spark):
    from swiftlake_spark.operators.dedup import editdist_near_dups

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy cat", "en"),  # dist 3
        (3, "the quick brown fox jumps over the lazy dog", "de"),  # other block
        (4, "completely different text that shares nothing", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")
    out = editdist_near_dups(
        df, "doc_id", "text", block_cols=["lang"], prefix=60, max_dist=5
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["dist"] for r in out}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == 3


def test_editdist_near_dups_length_filter_prunes(spark):
    from swiftlake_spark.operators.dedup import editdist_near_dups

    rows = [
        (1, "aaaa", "en", 4),
        (2, "aaab", "en", 4),
        (3, "aaaa" + "z" * 200, "en", 204),  # same 4-char prefix, far length
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, n_chars INT"
    )
    out = editdist_near_dups(
        df,
        "doc_id",
        "text",
        block_cols=["lang"],
        prefix=4,
        max_dist=2,
        len_col="n_chars",
        max_len_delta=10,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


# -------------------------------------------------------------- bm25


def test_bm25_matches_python_model(spark):
    from swiftlake_spark.operators.text import bm25_scores

    corpus = {
        1: "spark join window spark filter",
        2: "join table scan scan scan",
        3: "window window window window spark",
        4: "nothing relevant here at all",
    }
    terms = ["spark", "join", "window"]
    df = _mk(spark, sorted(corpus.items()))
    out = {r["id"]: r["score"] for r in bm25_scores(df, "doc_id", "text", terms).collect()}

    # reference model (same rational-idf formula)
    toks = {i: t.split(" ") for i, t in corpus.items()}
    N = len(corpus)
    avgdl = sum(len(w) for w in toks.values()) / N
    dfreq = {
        t: sum(1 for w in toks.values() if t in w) for t in terms
    }
    expect = {}
    for i, w in toks.items():
        s = 0.0
        for t in terms:
            tf = w.count(t)
            if not tf:
                continue
            idf = (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            contrib = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(w) / avgdl))
            s += round(contrib, 10)  # DECIMAL(28,10) routing
        if s:
            expect[i] = s
    assert set(out) == set(expect)
    for i in expect:
        assert out[i] == pytest.approx(expect[i], abs=1e-9)
    # doc 4 contains no term: absent, not zero
    assert 4 not in out


# ------------------------------------------------------ tfidf_top_terms


def test_tfidf_top_terms_ranking_and_ties(spark):
    from swiftlake_spark.operators.text import tfidf_top_terms

    df = _mk(
        spark,
        [
            (1, "rare rare common common common"),
            (2, "common common common other other"),
        ],
    )
    out = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append((r["rnk"], r["tok"]))
    # doc 1: 'rare' tf=2 df=1 → score 4.0; 'common' tf=3 df=2 → 3.0
    assert sorted(by_doc[1]) == [(1, "rare"), (2, "common")]
    # doc 2: 'other' tf=2 df=1 → 4.0; 'common' tf=3 df=2 → 3.0
    assert sorted(by_doc[2]) == [(1, "other"), (2, "common")]


# ------------------------------------------- hashed_importance_weights


def test_importance_weights_favor_target_like_docs(spark):
    from swiftlake_spark.operators.text import hashed_importance_weights

    # target rows use vocabulary A, raw-only rows vocabulary B; a held
    # out doc written in vocabulary A must out-weigh one in vocabulary B
    va = "alpha beta gamma delta"
    vb = "omega sigma theta kappa"
    rows = [
        (1, va, "en"),
        (2, va, "en"),
        (3, vb, "fr"),
        (4, vb, "fr"),
        (10, va, "xx"),  # target-like holdout
        (11, vb, "xx"),  # raw-like holdout
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")
    out = {
        r["id"]: r["weight"]
        for r in hashed_importance_weights(
            df, "doc_id", "text", F.col("lang") == "en"
        ).collect()
    }
    assert out[10] > out[11]
    assert out[1] == out[10] and out[3] == out[11]
    assert all(r >= 0 for r in out.values())


# ------------------------------------------------- differential fuzz


def _spans_reference(corpus: dict[int, str], n: int = 8, min_docs: int = 2):
    """Pure-Python twin of duplicate_spans: mark every position whose
    n-gram occurs in >= min_docs distinct docs, merge overlapping
    windows into maximal spans."""
    grams: dict[str, set[int]] = {}
    toks = {i: t.split(" ") for i, t in corpus.items()}
    for i, w in toks.items():
        for p in range(len(w) - n + 1):
            grams.setdefault(" ".join(w[p : p + n]), set()).add(i)
    out = set()
    for i, w in toks.items():
        marked = [
            p + 1  # 1-based
            for p in range(len(w) - n + 1)
            if len(grams[" ".join(w[p : p + n])]) >= min_docs
        ]
        spans = []
        for p in marked:
            if spans and p <= spans[-1][1] - n + 1 + n - 1:  # overlap/adjacency
                spans[-1][1] = max(spans[-1][1], p + n - 1)
            else:
                spans.append([p, p + n - 1])
        for s, e in spans:
            out.add((i, s, e, e - s + 1, len(w)))
    return out


def test_duplicate_spans_matches_reference_on_random_corpora(spark):
    import random

    from swiftlake_spark.operators.dedup import duplicate_spans

    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(5):
        corpus = {}
        # base docs of 10-60 random tokens
        for i in range(40):
            corpus[i] = " ".join(rng.choices(vocab, k=rng.randint(10, 60)))
        # plant shared runs: copy a random slice of one doc into another
        for _ in range(10):
            src, dst = rng.sample(range(40), 2)
            sw = corpus[src].split(" ")
            if len(sw) < 12:
                continue
            a = rng.randrange(0, len(sw) - 10)
            run = sw[a : a + rng.randint(8, min(20, len(sw) - a))]
            dw = corpus[dst].split(" ")
            at = rng.randrange(0, len(dw) + 1)
            corpus[dst] = " ".join(dw[:at] + run + dw[at:])
        df = spark.createDataFrame(
            sorted(corpus.items()), "doc_id BIGINT, text STRING"
        )
        got = {
            (r["id"], r["span_start"], r["span_end"], r["span_tokens"], r["n_tokens"])
            for r in duplicate_spans(df, "doc_id", "text", n=8).collect()
        }
        want = _spans_reference(corpus)
        assert got == want, (
            f"trial {trial}: {sorted(got ^ want)[:10]} differ "
            f"({len(got)} got, {len(want)} want)"
        )


# --------------------------------------------------- quantize_int8_stats


def test_quantize_int8_stats_known_values(spark):
    import math

    from swiftlake_spark.operators.similarity import quantize_int8_stats

    rows = [
        (1, [1.0, -0.5, 0.25], 7),
        (2, [0.0, 0.0], 8),          # zero vector: q=0, err=0
        (3, [2.0], 9),               # single element: q=±127 exactly
    ]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    out = {r["id"]: r for r in quantize_int8_stats(
        df, "vec_id", "embedding", "label").collect()}
    # vec 1: m=1.0, scale=127; q = floor(x*127+0.5)
    qs = [math.floor(x * 127.0 + 0.5) for x in (1.0, -0.5, 0.25)]
    errs = [abs(x - q / 127.0) for x, q in zip((1.0, -0.5, 0.25), qs)]
    expect = sum(round(e, 12) for e in errs) / 3
    assert out[1]["max_q"] == 127
    assert out[1]["err_mean"] == pytest.approx(expect, abs=1e-12)
    assert out[1]["n_els"] == 3
    assert out[2]["err_mean"] == 0.0 and out[2]["max_q"] == 0
    assert out[3]["max_q"] == 127 and out[3]["err_mean"] == pytest.approx(0.0, abs=1e-12)


def test_quantize_int8_stats_exact_decimal_sum(spark):
    """Pin the r14 per-row rewrite's decimal exactness: ``err_sum`` must
    equal the EXACT sum of the per-element errors each rounded (half-up)
    to 12 decimals — the DECIMAL(28,12)-quantization contract of the
    pre-r14 explode/sum shape — with no scale-11 reduction sneaking in
    through ``aggregate()``'s add-type promotion, and the output column
    must keep the DecimalType(38,12)/bigint schema the oracle hashes."""
    import math
    from decimal import Decimal, ROUND_HALF_UP

    from pyspark.sql.types import DecimalType, LongType

    from swiftlake_spark.operators.similarity import quantize_int8_stats

    # 40 elements whose errors exercise the 12th decimal digit
    vec = [((-1) ** i) * (0.013 + i * 0.0137) for i in range(40)]
    df = spark.createDataFrame(
        [(1, vec, 0)], "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    row = quantize_int8_stats(df, "vec_id", "embedding", "label").collect()[0]
    xs = [float(__import__("numpy").float32(v)) for v in vec]
    m = max(abs(x) for x in xs)
    scale = 127.0 / m
    want = Decimal(0)
    for x in xs:
        q = math.floor(x * scale + 0.5)
        want += Decimal(repr(abs(x - q / scale))).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )
    assert row["err_sum"] == want
    assert row["n_els"] == 40
    schema = {f.name: f.dataType for f in quantize_int8_stats(
        df, "vec_id", "embedding", "label").schema.fields}
    assert schema["err_sum"] == DecimalType(38, 12)
    assert schema["n_els"] == LongType()


# ------------------------------------------------------ ngram_repetition


def test_ngram_repetition_known_values(spark):
    from swiftlake_spark.operators.text import ngram_repetition

    rows = [
        (1, "a b a b a b"),      # bigrams: ab,ba,ab,ba,ab → 5 total, 2 distinct
        (2, "u v w x y"),        # all distinct
        (3, "z"),                # too short: no bigrams, absent from output
    ]
    out = {r["id"]: r for r in ngram_repetition(
        _mk(spark, rows), "doc_id", "text", n=2).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["n_ngrams"], out[1]["n_distinct"]) == (5, 2)
    assert out[1]["dup_frac"] == pytest.approx(1 - 2 / 5)
    assert out[1]["top_frac"] == pytest.approx(3 / 5)
    assert out[2]["dup_frac"] == 0.0 and out[2]["top_frac"] == pytest.approx(1 / 4)


def test_ngram_decontaminate_flags_and_short_docs(spark):
    from swiftlake_spark.operators.dedup import ngram_decontaminate

    docs = spark.createDataFrame([
        (1, "a b c d e f g h i j"),   # 7 4-grams, 3 hit eval's 6-token doc
        (2, "a b c d e x y z w q"),   # 2 hit
        (3, "u v"),                   # shorter than n: no gram evidence
        (4, "p q r s t u v w"),       # zero overlap
    ], "doc_id BIGINT, text STRING")
    ev = spark.createDataFrame(
        [(100, "a b c d e f")], "eid BIGINT, etext STRING")
    out = {r["id"]: r for r in ngram_decontaminate(
        docs, ev, "doc_id", "text", eval_id_col="eid",
        eval_text_col="etext", n=4, threshold=0.3).collect()}
    assert out[1]["n_grams"] == 7 and out[1]["n_hit"] == 3
    assert out[1]["is_contaminated"]
    assert out[2]["n_hit"] == 2 and not out[2]["is_contaminated"]
    assert out[3]["n_grams"] == 0 and out[3]["hit_frac"] == 0.0
    assert not out[3]["is_contaminated"]
    assert out[4]["n_hit"] == 0


def test_ngram_decontaminate_matches_python_model(spark):
    """Differential vs a direct Python set model on random corpora."""
    import random

    from swiftlake_spark.operators.dedup import ngram_decontaminate

    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(2, 40))))
            for i in range(60)]
    ev = [(1000 + i, " ".join(rng.choice(vocab) for _ in range(25)))
          for i in range(5)]
    n = 5

    def grams(text):
        t = text.split(" ")
        return [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]

    ev_set = {g for _, e in ev for g in grams(e)}
    expect = {}
    for i, text in enumerate(d[1] for d in docs):
        g = grams(text)
        hits = sum(1 for x in g if x in ev_set)
        expect[docs[i][0]] = (len(g), hits)

    out = ngram_decontaminate(
        spark.createDataFrame(docs, "doc_id BIGINT, text STRING"),
        spark.createDataFrame(ev, "doc_id BIGINT, text STRING"),
        "doc_id", "text", n=n, threshold=0.2)
    for r in out.collect():
        assert (r["n_grams"], r["n_hit"]) == expect[r["id"]], r["id"]
        want_frac = (expect[r["id"]][1] / expect[r["id"]][0]
                     if expect[r["id"]][0] else 0.0)
        assert abs(r["hit_frac"] - want_frac) < 1e-12


def test_mixing_weights_uniform_and_explicit_target(spark):
    from swiftlake_spark.operators.sampling import mixing_weights

    df = spark.createDataFrame(
        [("web", 10), ("web", 30), ("code", 40), ("books", 20)],
        "src STRING, tok BIGINT")
    out = {r["group"]: r for r in
           mixing_weights(df, "src", "tok").collect()}
    assert out["web"]["n_docs"] == 2 and out["web"]["n_tokens"] == 40
    # uniform target: each of 3 groups wants 1/3 of 100 tokens
    assert abs(out["web"]["actual_share"] - 0.4) < 1e-12
    assert abs(out["web"]["weight"] - (1 / 3) / 0.4) < 1e-12
    assert abs(out["books"]["weight"] - (1 / 3) / 0.2) < 1e-12

    out2 = {r["group"]: r for r in mixing_weights(
        df, "src", "tok",
        target_shares={"web": 0.9, "code": 0.1}).collect()}
    assert abs(out2["web"]["weight"] - 0.9 / 0.4) < 1e-12
    assert out2["books"]["target_share"] == 0.0  # absent from target: drop
    assert out2["books"]["weight"] == 0.0


def test_quantile_outliers_band_and_ties(spark):
    from swiftlake_spark.operators.sampling import quantile_outliers

    rows = [(i, "en", i) for i in range(1, 101)] + \
           [(200 + i, "de", 5) for i in range(10)]  # all-ties group
    df = spark.createDataFrame(rows, "id BIGINT, lang STRING, v BIGINT")
    out = quantile_outliers(df, "v", by="lang", lo=0.05, hi=0.95).collect()
    en = {r["id"]: r for r in out if r["lang"] == "en"}
    # cd(i) = i/100 < .05 → 1-4; cd_rev(i) = (101-i)/100 < (1 - .95)
    # → 96-100: IEEE 1.0-0.95 is 0.050000000000000044, so cd_rev = .05
    # sits strictly below it.  The oracle mirrors the same arithmetic,
    # so the boundary is deterministic, merely not decimal-intuitive.
    assert [i for i in range(1, 101) if en[i]["is_outlier"]] == \
        [1, 2, 3, 4, 96, 97, 98, 99, 100]
    # an all-ties group has cd = cd_rev = 1.0 everywhere → nothing flagged
    assert all(not r["is_outlier"] for r in out if r["lang"] == "de")


def test_chunk_documents_model_and_plan(spark):
    """r11 session 2: fixed-window chunking with overlap — window
    starts/sizes match a Python reference model over edge shapes
    (empty, shorter-than-window, exact multiple, one-over), overlap
    windows share the expected boundary tokens, and the plan stays
    pure JVM (sequence/transform/posexplode, no Python eval)."""
    from collections import defaultdict

    from swiftlake_spark.operators.sampling import chunk_documents

    rows = [(0, " ".join(f"w{i}" for i in range(1000))),
            (1, "short doc"),
            (2, ""),
            (3, "   "),
            (4, " ".join(f"t{i}" for i in range(512))),
            (5, " ".join(f"u{i}" for i in range(513)))]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = chunk_documents(df, "text", max_tokens=512, overlap=64).collect()
    by = defaultdict(list)
    for r in out:
        by[r["doc_id"]].append(r)

    def starts(n, mx=512, ov=64):
        # a start s is kept iff s == 0 or s + ov < n (every window must
        # carry >= 1 new token — a doc of exactly mx tokens is ONE chunk)
        return [0] if n == 0 else list(range(0, max(n - ov, 1), mx - ov))

    lens = {0: 1000, 1: 2, 2: 0, 3: 0, 4: 512, 5: 513}
    for did, n in lens.items():
        got = sorted(r["chunk_idx"] for r in by[did])
        assert got == list(range(len(starts(n)))), (did, got)
        for r in by[did]:
            s = r["chunk_idx"] * (512 - 64)
            exp_n = max(0, min(512, n - s)) if n else 0
            assert r["chunk_n_tokens"] == exp_n, (did, r["chunk_idx"])
    # overlap boundary: window 1 of doc 0 starts at token 448
    w1 = next(r for r in by[0] if r["chunk_idx"] == 1)
    assert w1["chunk"].split(" ")[0] == "w448"
    assert w1["chunk"].split(" ")[63] == "w511"  # the 64 shared tokens

    plan = chunk_documents(df, "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan

    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, "text", max_tokens=64, overlap=64)

"""Skew-guard activation under a genuinely skewed corpus (VERDICT r6
ask #3): the guards were correctness-tested before; these tests put the
exact skew they exist for in front of them and assert they FIRE —
via the semantic_dedup stats hook, not by re-deriving internals."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from tests.skew_corpus import synth_documents, synth_embeddings


def _emb_df(spark, n, dim=16, seed=11):
    t = synth_embeddings(n, dim=dim, seed=seed)
    pdf = t.to_pandas()
    pdf["embedding"] = pdf["embedding"].apply(lambda v: [float(x) for x in v])
    return spark.createDataFrame(
        pdf, schema="vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )


def test_semantic_dedup_resplit_guard_fires_under_skew(spark):
    """One Zipf topic holds ~half the corpus → the coarse quantizer
    puts far more than max_cluster_size members behind one centroid →
    the re-split guard MUST run and must leave every final cluster at
    or under the bound (or exhaust its rounds trying)."""
    from swiftlake_spark.operators.similarity import semantic_dedup

    emb = _emb_df(spark, 3000, dim=16)
    stats: dict = {}
    out = semantic_dedup(
        emb,
        n_clusters=8,  # deliberately coarse: guarantees an oversized cluster
        threshold=0.95,
        max_cluster_size=256,
        stats=stats,
    )
    rows = out.collect()
    assert len(rows) == 3000

    # exact-dup pre-reduction fired: ~20% of rows are exact copies
    assert stats["n_reps"] < 3000 * 0.9

    # the re-split guard ran at least once and bounded the pair stage
    assert len(stats["split_rounds"]) >= 1
    assert stats["split_rounds"][0]["oversized_clusters"] >= 1
    assert stats["split_rounds"][0]["members"] > 256
    assert stats["final_max_cluster"] <= 256

    # exact copies are always deduped (they share a representative)
    t = synth_embeddings(3000, dim=16, seed=11).to_pandas()
    by_vec: dict = {}
    n_exact_dups = 0
    for vid, v in zip(t["vec_id"], t["embedding"]):
        key = tuple(np.asarray(v, dtype=np.float32).tolist())
        if key in by_vec:
            n_exact_dups += 1
        else:
            by_vec[key] = vid
    dropped = sum(1 for r in rows if not r["keep"])
    assert dropped >= n_exact_dups  # every exact copy dropped, plus near-dups


def test_semantic_dedup_no_guard_on_uniform_corpus(spark):
    """Control: a uniform (unskewed, unduplicated) corpus must NOT trip
    the guard — otherwise the stress assertion above proves nothing."""
    from swiftlake_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((600, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        schema="vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    stats: dict = {}
    out = semantic_dedup(
        df, n_clusters=8, max_cluster_size=256, stats=stats
    )
    assert out.count() == 600
    assert stats["n_reps"] == 600  # no exact dups to pre-reduce
    assert stats["split_rounds"] == []  # guard stayed quiet
    assert stats["final_max_cluster"] <= 256


def test_simhash_bucket_bound_under_skewed_near_dups(spark):
    """SimHash banding on a corpus where ~45% of documents are near-dups
    of ONE topic: candidate generation must stay band-bucketed (no
    all-pairs) yet still find the planted pairs.  The documented bound:
    within-bucket blow-up only for genuinely identical signatures,
    which ARE the output."""
    from swiftlake_spark.operators.dedup import simhash_near_dups

    t = synth_documents(800, seed=7)
    df = spark.createDataFrame(t.to_pandas())
    pairs = simhash_near_dups(df, "doc_id", "text", max_hamming=3)
    n = pairs.count()
    assert n > 0  # the skewed topic's near-dups are found
    # sanity: far fewer than all-pairs of the big topic (~360² / 2)
    assert n < 40_000


def test_minhash_lsh_dedup_skewed_topic_recall(spark):
    """MinHash-LSH end-to-end on the skewed corpus: documents of the
    dominant topic (4% token mutation) are near-dups at J≥0.5 and the
    banded pipeline must catch most sibling pairs without any all-pairs
    stage; the control junk docs must not collapse."""
    from swiftlake_spark.operators.dedup import (
        dedup_corpus_by_pairs,
        minhash_lsh_dedup,
    )

    t = synth_documents(600, seed=7)
    pdf = t.to_pandas()
    df = spark.createDataFrame(pdf)
    pairs = minhash_lsh_dedup(df, "doc_id", "text", threshold=0.5)
    assert pairs.count() > 0
    kept = dedup_corpus_by_pairs(df, pairs, "doc_id")
    n_kept = kept.count()
    # the dominant topic (~45% of 600, minus junk) collapses to a
    # handful of survivors; junk (~10%) survives — so the corpus shrinks
    # hard but nowhere near to zero
    assert n_kept < 450
    assert n_kept > 30


def test_minhash_star_edges_match_full_pairs_for_dedup(spark):
    """The mega-cluster guard (star_edges) must give the SAME corpus-
    dedup answer as the exact pair list on a skewed corpus — star edges
    under-enumerate pairs, but connected components union each bucket
    identically, so keeper sets agree."""
    from swiftlake_spark.operators.dedup import (
        dedup_corpus_by_pairs,
        minhash_lsh_dedup,
    )

    t = synth_documents(600, seed=7)
    df = spark.createDataFrame(t.to_pandas())
    kept_pairs = {
        r["doc_id"]
        for r in dedup_corpus_by_pairs(
            df, minhash_lsh_dedup(df, "doc_id", "text", threshold=0.5), "doc_id"
        ).select("doc_id").collect()
    }
    kept_star = {
        r["doc_id"]
        for r in dedup_corpus_by_pairs(
            df,
            minhash_lsh_dedup(
                df, "doc_id", "text", threshold=0.5, star_edges=True
            ),
            "doc_id",
        ).select("doc_id").collect()
    }
    assert kept_star == kept_pairs
    # and the star edge count is corpus-linear, not cluster-quadratic
    n_star = minhash_lsh_dedup(
        df, "doc_id", "text", threshold=0.5, star_edges=True
    ).count()
    n_pairs = minhash_lsh_dedup(df, "doc_id", "text", threshold=0.5).count()
    assert n_star < n_pairs / 5  # the dominant cluster's clique collapsed


def _megablock_docs(spark, n=400, seed=3):
    """Planted edit-distance mega-block: every doc shares (lang, 4-char
    prefix) — one block holds the WHOLE corpus — but tail lengths spread
    0..2000 chars, the realistic boilerplate-header shape a crawl
    produces.  Length-bucketing is the only blocking that cuts it."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        tail_len = int(rng.randint(0, 2000))
        tail = "".join(rng.choice(list("abcdefgh "), size=tail_len))
        rows.append((i, "PAGE not found: " + tail, "en"))
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")


def test_editdist_length_bucket_exact_and_cuts_megablock(spark):
    """len_bucket_width must (a) return EXACTLY the pairs of the
    unbucketed join with the same |Δlen| ≤ w filter — the ±1-probe
    construction is exact, not approximate — and (b) cut the candidate
    pair count of the planted mega-block by a large factor."""
    from swiftlake_spark.operators.dedup import editdist_near_dups

    d = _megablock_docs(spark).withColumn("pfx4", F.substring("text", 1, 4))
    d = d.withColumn("n_chars", F.length("text"))
    w = 40
    kw = dict(block_cols=["lang", "pfx4"], prefix=60, max_dist=20)
    plain = editdist_near_dups(
        d, "doc_id", "text", len_col="n_chars", max_len_delta=w, **kw
    )
    bucketed = editdist_near_dups(d, "doc_id", "text", len_bucket_width=w, **kw)
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    p = sorted((r["id_a"], r["id_b"], r["dist"]) for r in plain.collect())
    b = sorted((r["id_a"], r["id_b"], r["dist"]) for r in bucketed.collect())
    assert p == b and len(p) > 0

    # candidate-pair accounting: unbucketed = one block of n → n(n-1)/2;
    # bucketed = Σ over (block, bucket-window) — compute both from the
    # same relation the operator blocks on
    n = d.count()
    unbucketed_pairs = n * (n - 1) // 2
    sizes = (
        d.groupBy((F.length("text") / w).cast("long").alias("b"))
        .count()
        .collect()
    )
    by_b = {r["b"]: r["count"] for r in sizes}
    bucketed_pairs = sum(
        c * (c - 1) // 2 + c * by_b.get(bk + 1, 0) for bk, c in by_b.items()
    )
    assert bucketed_pairs * 10 < unbucketed_pairs, (
        f"bucketing should cut candidates ≥10x: {bucketed_pairs} vs "
        f"{unbucketed_pairs}"
    )


def test_editdist_length_bucket_boundary_pairs_survive(spark):
    """Pairs straddling a bucket boundary (len w-1 vs w+1) must be
    found — the ±1 probe exists exactly for them."""
    from swiftlake_spark.operators.dedup import editdist_near_dups

    w = 10
    rows = [
        (1, "x" * (w - 1), "en"),   # bucket 0
        (2, "x" * (w + 1), "en"),   # bucket 1, |Δlen|=2 ≤ w
        (3, "x" * (3 * w + 2), "en"),  # far: dropped by the ≤w window
    ]
    d = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING"
    ).withColumn("pfx4", F.substring("text", 1, 4))
    out = editdist_near_dups(
        d, "doc_id", "text",
        block_cols=["lang", "pfx4"], prefix=60, max_dist=8,
        len_bucket_width=w,
    )
    got = sorted((r["id_a"], r["id_b"]) for r in out.collect())
    assert got == [(1, 2)]
    # r10 review: a bucket narrower than max_dist would silently drop
    # pairs the distance threshold accepts — rejected loudly
    import pytest

    with pytest.raises(ValueError, match="must be >="):
        editdist_near_dups(
            d, "doc_id", "text",
            block_cols=["lang", "pfx4"], prefix=60, max_dist=20,
            len_bucket_width=w,
        )

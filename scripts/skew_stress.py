"""1× vs 10× skew stress for the dedup/ANN operator family (VERDICT r6
ask #3).

Synthesizes Zipf-skewed corpora (tests/skew_corpus.py) at 1× (5k docs /
2k vectors — the sf0.1 shape) and 10× (50k / 20k), runs each operator
end-to-end, and prints a markdown table of wall times, the 10×/1×
ratio, and whether the semantic-dedup re-split guard fired.  Paste the
table into PERF.md.

Linear-ish ratios (≲10× work for 10× data, modulo fixed Spark overhead
at the 1× end, which deflates the 1× denominator and INFLATES the
ratio) are the pass signal; a quadratic blow-up would show as ≫10×.

Usage: python scripts/skew_stress.py [factor]     (default 10)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from swiftlake_spark.config import EngineConfig  # noqa: E402
from swiftlake_spark.session import build_session  # noqa: E402
from tests.skew_corpus import write_corpus  # noqa: E402

BASE_DOCS, BASE_VECS = 5_000, 2_000


def load(spark, d, name):
    return spark.read.parquet(f"{d}/{name}.parquet")


def run_all(spark, d, dim=32):
    """→ {op: (seconds, note)} — each op materialized via count()."""
    from swiftlake_spark.operators.dedup import (
        dedup_corpus_by_pairs,
        minhash_lsh_dedup,
        simhash_near_dups,
    )
    from swiftlake_spark.operators.similarity import (
        embedding_near_dups,
        semantic_dedup,
    )

    out: dict[str, tuple[float, str]] = {}
    docs = load(spark, d, "documents")
    embs = load(spark, d, "embeddings")

    # star_edges: the mega-cluster guard.  The Zipf corpus puts ~45% of
    # documents in ONE near-dup cluster, so the exact pair list is
    # inherently |cluster|² (~240M pairs at 10×) — no banding fixes
    # that.  Clustering via star edges is the scalable contract and
    # what corpus dedup consumes.
    t0 = time.perf_counter()
    pairs = minhash_lsh_dedup(
        docs, "doc_id", "text", threshold=0.5, star_edges=True
    )
    pairs = pairs.persist()
    n = pairs.count()
    out["minhash_lsh_star"] = (time.perf_counter() - t0, f"{n} edges")

    t0 = time.perf_counter()
    n = dedup_corpus_by_pairs(docs, pairs, "doc_id").count()
    out["cc_dedup_corpus"] = (time.perf_counter() - t0, f"{n} kept")
    pairs.unpersist()

    t0 = time.perf_counter()
    n = simhash_near_dups(docs, "doc_id", "text", max_hamming=3).count()
    out["simhash_near_dups"] = (time.perf_counter() - t0, f"{n} pairs")

    # star_edges again: the giant semantic topic shares hyperplane
    # signs, so its LSH bucket's exact pair list is |cluster|² (115×
    # wall-time at 10× before the guard; see PERF.md)
    t0 = time.perf_counter()
    n = embedding_near_dups(
        embs, id_col="vec_id", vec_col="embedding", dim=dim, threshold=0.95,
        star_edges=True,
    ).count()
    out["embedding_near_dups_star"] = (time.perf_counter() - t0, f"{n} edges")

    stats: dict = {}
    t0 = time.perf_counter()
    n = (
        semantic_dedup(embs, max_cluster_size=1024, stats=stats)
        .filter("NOT keep")
        .count()
    )
    guard = (
        f"guard {len(stats['split_rounds'])}r,max {stats['final_max_cluster']}"
        if stats["split_rounds"]
        else f"no guard,max {stats['final_max_cluster']}"
    )
    out["semantic_dedup"] = (time.perf_counter() - t0, f"{n} dups; {guard}")

    # same operator under a deliberately coarse quantizer: the oversized
    # cluster is guaranteed, so this row shows the re-split guard's COST
    # when it fires (the pytest asserts that it fires; this measures it)
    stats2: dict = {}
    t0 = time.perf_counter()
    n = (
        semantic_dedup(
            embs, n_clusters=8, max_cluster_size=512, stats=stats2
        )
        .filter("NOT keep")
        .count()
    )
    guard2 = (
        f"guard {len(stats2['split_rounds'])}r,max {stats2['final_max_cluster']}"
        if stats2["split_rounds"]
        else f"no guard,max {stats2['final_max_cluster']}"
    )
    out["semantic_dedup_coarse"] = (time.perf_counter() - t0, f"{n} dups; {guard2}")
    return out


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = build_session(EngineConfig(app_name="skew-stress"))
    with tempfile.TemporaryDirectory(prefix="skew_stress_") as tmp:
        d1 = write_corpus(f"{tmp}/x1", BASE_DOCS, BASE_VECS)
        dN = write_corpus(f"{tmp}/x{factor}", BASE_DOCS * factor, BASE_VECS * factor)
        run_all(spark, d1)  # warm the session so 1× isn't charged JIT cost
        r1 = run_all(spark, d1)
        rN = run_all(spark, dN)
    print(f"\n| operator | 1× ({BASE_DOCS}d/{BASE_VECS}v) | "
          f"{factor}× | ratio | {factor}× note |")
    print("|---|---|---|---|---|")
    for op in r1:
        t1, _ = r1[op]
        tN, note = rN[op]
        print(f"| {op} | {t1:.2f} s | {tN:.2f} s | {tN / t1:.1f}× | {note} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

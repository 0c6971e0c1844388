"""1× vs 10× scale rehearsal for the round-9 corpus operators
(VERDICT r9 ask #4): duplicate_spans (substring dedup) and
editdist_near_dups (record-linkage near-dup), the two operators whose
cost is data-shaped rather than fixed — plus a PLANTED mega-block
(every doc shares the (lang, 4-char-prefix) blocking key; tail lengths
spread 0..2000 chars) that models the boilerplate-header crawl shape.

Measures wall time, output rows and candidate-pair counts at 1× and
10×, for editdist both WITHOUT and WITH the ``len_bucket_width``
refinement the operator now ships (exact for the ≤w length window; see
tests/test_skew_guards.py for the exactness proof-by-test).  Paste the
table into PERF.md.

Pass signal: duplicate_spans and bucketed editdist scale ≲ 10× wall for
10× docs; the unbucketed mega-block join shows the quadratic blow-up
the bucket exists to prevent.

Usage: python scripts/corpus_stress.py [factor]     (default 10)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from swiftlake_spark.config import EngineConfig  # noqa: E402
from swiftlake_spark.session import build_session  # noqa: E402
from tests.skew_corpus import synth_documents  # noqa: E402

BASE_DOCS = 2_000
BASE_BLOCK = 1_000  # planted mega-block size at 1×


def synth_megablock(n: int, seed: int = 3) -> pa.Table:
    rng = np.random.RandomState(seed)
    texts = []
    for _ in range(n):
        tail_len = int(rng.randint(0, 2000))
        texts.append(
            "PAGE not found: " + "".join(rng.choice(list("abcdefgh "), size=tail_len))
        )
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64) + 10_000_000),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["mega"] * n),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )


def build(out_dir: str, n_docs: int, n_block: int, seed: int = 7) -> str:
    os.makedirs(out_dir, exist_ok=True)
    t = synth_documents(n_docs, seed)
    m = synth_megablock(n_block, seed + 1)
    pq.write_table(pa.concat_tables([t, m]), f"{out_dir}/documents.parquet")
    return out_dir


def run_all(spark, d: str, with_unbucketed: bool) -> dict[str, tuple[float, str]]:
    from pyspark.sql import functions as F

    from swiftlake_spark.operators.dedup import duplicate_spans, editdist_near_dups

    out: dict[str, tuple[float, str]] = {}
    docs = spark.read.parquet(f"{d}/documents.parquet")
    docs = docs.withColumn("pfx4", F.substring("text", 1, 4))

    t0 = time.perf_counter()
    spans = duplicate_spans(docs, "doc_id", "text", n=8, min_docs=2)
    n_spans = spans.count()
    out["duplicate_spans"] = (time.perf_counter() - t0, f"{n_spans} spans")

    kw = dict(block_cols=["lang", "pfx4"], prefix=60, max_dist=20)
    if with_unbucketed:
        t0 = time.perf_counter()
        plain = editdist_near_dups(
            docs, "doc_id", "text", len_col="n_chars", max_len_delta=40, **kw
        )
        n_plain = plain.count()
        out["editdist (no bucket)"] = (time.perf_counter() - t0, f"{n_plain} pairs")

    t0 = time.perf_counter()
    bucketed = editdist_near_dups(docs, "doc_id", "text", len_bucket_width=40, **kw)
    n_b = bucketed.count()
    out["editdist (len-bucket 40)"] = (time.perf_counter() - t0, f"{n_b} pairs")

    # candidate-pair accounting (what the join must HASH-PROBE before any
    # predicate): Σ|block|² unbucketed vs Σ per (block, adjacent-bucket)
    rel = docs.select("lang", "pfx4", (F.length("text") / 40).cast("long").alias("b"))
    blocks = rel.groupBy("lang", "pfx4").count().collect()
    cand_plain = sum(r["count"] * (r["count"] - 1) // 2 for r in blocks)
    bb = rel.groupBy("lang", "pfx4", "b").count().collect()
    sizes = {(r["lang"], r["pfx4"], r["b"]): r["count"] for r in bb}
    cand_bucket = sum(
        c * (c - 1) // 2 + c * sizes.get((lg, px, bk + 1), 0)
        for (lg, px, bk), c in sizes.items()
    )
    out["candidate pairs"] = (
        0.0,
        f"unbucketed {cand_plain:,} / bucketed {cand_bucket:,} "
        f"({cand_plain / max(cand_bucket, 1):.0f}x cut)",
    )
    return out


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = build_session(
        EngineConfig(app_name="corpus-stress", cpus=8, shuffle_partitions=32)
    )
    d1 = build(tempfile.mkdtemp(prefix="corpus1x_"), BASE_DOCS, BASE_BLOCK)
    dN = build(
        tempfile.mkdtemp(prefix="corpusNx_"), BASE_DOCS * factor, BASE_BLOCK * factor
    )
    # warm
    spark.read.parquet(f"{d1}/documents.parquet").count()

    print(f"\n1x: {BASE_DOCS}+{BASE_BLOCK} docs")
    r1 = run_all(spark, d1, with_unbucketed=True)
    for k, (s, note) in r1.items():
        print(f"  {k:28s} {s:7.2f}s  {note}")

    print(f"\n{factor}x: {BASE_DOCS * factor}+{BASE_BLOCK * factor} docs "
          "(unbucketed editdist skipped above 10k-doc mega-block: the "
          "quadratic candidate count is the measured point, not the wall)")
    rN = run_all(spark, dN, with_unbucketed=(factor * BASE_BLOCK <= 10_000))
    for k, (s, note) in rN.items():
        print(f"  {k:28s} {s:7.2f}s  {note}")

    print("\n| op | 1x wall | {f}x wall | ratio | notes |".format(f=factor))
    print("|---|---|---|---|---|")
    for k in rN:
        if k == "candidate pairs":
            continue
        s1 = r1.get(k, (float("nan"), ""))[0]
        sN = rN[k][0]
        ratio = sN / s1 if s1 == s1 and s1 > 0 else float("nan")
        print(f"| {k} | {s1:.2f}s | {sN:.2f}s | {ratio:.1f}x | "
              f"1x: {r1.get(k, (0, '?'))[1]}; {factor}x: {rN[k][1]} |")
    print(f"| candidate pairs | — | — | — | 1x: {r1['candidate pairs'][1]}; "
          f"{factor}x: {rN['candidate pairs'][1]} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())

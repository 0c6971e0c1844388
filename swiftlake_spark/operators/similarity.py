"""Embedding similarity search over ``array<float>`` columns.

- :func:`cosine_topk`      — brute-force baseline: broadcast the query
  set, vectorized cosine in a Pandas UDF (Arrow batches, numpy matmul),
  per-query window top-k.  One pass over the big side, no shuffle of it.
- :func:`lsh_bucketize` / :func:`ann_cosine_topk` — the scale path:
  random-hyperplane LSH buckets (deterministic seed) shrink the
  candidate set; exact cosine re-rank inside matching buckets.
- :func:`embedding_near_dups` — near-duplicate pairs by cosine ≥
  threshold inside LSH buckets.

At 100 TB: the brute path is a full scan per query batch (fine for a
broadcastable query set); the LSH path shuffles only (bucket) keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)  # deterministic: same buckets every run
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q_emb",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for every query vector.

    The query set is collected once (it is small by contract — a probe
    batch, not a table) and broadcast into a Pandas UDF that computes a
    numpy matmul per Arrow batch; then a window keeps top-k per query.
    """
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    q_ids = [r[query_id_col] for r in q_rows]
    q_mat = np.array([r[query_vec_col] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((q_ids, q_norm))

    # query ids keep their ACTUAL type — hard-coding long would crash on
    # string/uuid ids, which nothing in this contract forbids
    qid_type = queries.schema[query_id_col].dataType
    out_schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("query_id", qid_type),
                T.StructField("cosine", T.DoubleType()),
            ]
        )
    )

    @F.pandas_udf(out_schema)
    def sims(vecs: pd.Series) -> pd.Series:
        ids, qn = bc.value
        m = np.array(vecs.tolist(), dtype=np.float64)  # batch × dim
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cos = (m / norms) @ qn.T  # batch × n_queries
        return pd.Series(
            [
                [{"query_id": ids[j], "cosine": float(row[j])} for j in range(len(ids))]
                for row in cos
            ]
        )

    exploded = (
        emb.select(F.col(id_col).alias("cand_id"), sims(F.col(vec_col)).alias("s"))
        .select("cand_id", F.explode("s").alias("s"))
        .select("cand_id", F.col("s.query_id").alias("query_id"), F.col("s.cosine").alias("cosine"))
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        exploded.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cosine", "rn")
    )


def lsh_bucketize(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane signature: bucket = sign-bit pattern of the
    vector against ``n_planes`` fixed hyperplanes (deterministic seed).
    Vectors with high cosine land in the same bucket with high
    probability (SimHash for angles)."""
    planes = _hyperplanes(dim, n_planes, seed)
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast(planes)

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        signs = (m @ bc.value.T) > 0  # batch × n_planes
        weights = (1 << np.arange(signs.shape[1])).astype(np.int64)
        return pd.Series(signs @ weights)

    return emb.withColumn(out_col, bucket(F.col(vec_col)))


def lsh_bucketize_multi(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Multi-table LSH: one (table, bucket) row per input row per table.

    OR-amplification — ``n_planes`` keeps every table's buckets small
    (2^n_planes key space), ``n_tables`` independent plane sets recover
    the recall a single fine-grained table would lose.  All tables are
    computed in ONE Pandas UDF pass (one matmul against the stacked
    plane matrix), then exploded; the only shuffle downstream is on the
    (table, bucket) join key.
    """
    planes = np.vstack(
        [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    )  # (n_tables·n_planes) × dim
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((planes, n_planes, n_tables))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        p, np_, nt = bc.value
        m = np.array(vecs.tolist(), dtype=np.float64)
        signs = (m @ p.T) > 0  # batch × (nt·np_)
        weights = (1 << np.arange(np_)).astype(np.int64)
        per_table = [signs[:, t * np_ : (t + 1) * np_] @ weights for t in range(nt)]
        return pd.Series(np.stack(per_table, axis=1).tolist())

    return (
        emb.withColumn("__bks", buckets(F.col(vec_col)))
        .select("*", F.posexplode("__bks").alias("table", "bucket"))
        .drop("__bks")
    )


def ann_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q_emb",
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: LSH-bucket both sides, exact cosine only where
    buckets match.  Recall < 1 by construction; ``n_planes`` trades
    recall for candidate-set size within a table, ``n_tables`` > 1 adds
    OR-amplification (a candidate matches if ANY table buckets it with
    the query — recall 1-(1-p)^T for per-table collision rate p) at the
    cost of T bucket keys per vector.  Candidates are distinct-ed before
    scoring so multi-table hits are verified once."""
    if n_tables > 1:
        e = lsh_bucketize_multi(
            emb, vec_col=vec_col, dim=dim, n_planes=n_planes, n_tables=n_tables
        )
        q = lsh_bucketize_multi(
            queries.withColumnRenamed(query_vec_col, "__qv"),
            vec_col="__qv",
            dim=dim,
            n_planes=n_planes,
            n_tables=n_tables,
        )
        cand = (
            e.join(F.broadcast(q), ["table", "bucket"])
            .select(
                F.col(id_col).alias("cand_id"),
                F.col(vec_col).alias("__ev"),
                F.col(query_id_col).alias("query_id"),
                F.col("__qv"),
            )
            .dropDuplicates(["query_id", "cand_id"])
        )
    else:
        e = lsh_bucketize(emb, vec_col=vec_col, dim=dim, n_planes=n_planes)
        q = lsh_bucketize(
            queries.withColumnRenamed(query_vec_col, "__qv"),
            vec_col="__qv",
            dim=dim,
            n_planes=n_planes,
        )
        cand = e.join(F.broadcast(q), "bucket").select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).alias("__ev"),
            F.col(query_id_col).alias("query_id"),
            F.col("__qv"),
        )
    dot = F.aggregate(
        F.zip_with("__ev", "__qv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = cand.select(
        "query_id",
        "cand_id",
        (dot / (norm(F.col("__ev")) * norm(F.col("__qv")))).alias("cosine"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cosine", "rn")
    )


def embedding_near_dups(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
    star_edges: bool = False,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) via multi-table LSH.

    n_planes=16 bounds every table at 2^16 buckets (the within-bucket
    self-join stays tiny at any corpus size); n_tables=4 independent
    tables restore recall (a pair is a candidate if ANY table buckets it
    together).  Candidates are distinct-ed before the exact cosine check
    so a pair matched by several tables is verified once.

    ``star_edges=True`` is the mega-cluster guard (10× skew stress: one
    semantic topic holding ~half the corpus shares hyperplane signs, so
    its bucket's pair list is |cluster|² — 115× wall-time at 10× data
    before this guard).  Each (table, bucket) emits only (bucket-min,
    member) edges: O(corpus · n_tables) candidates, verified exactly,
    the right contract when the output feeds clustering/dedup rather
    than an exhaustive pair report (same tradeoff as
    operators.dedup.lsh_candidate_pairs)."""
    b = lsh_bucketize_multi(
        emb, vec_col=vec_col, dim=dim, n_planes=n_planes, n_tables=n_tables, seed=seed
    )
    if star_edges:
        hubs = b.groupBy("table", "bucket").agg(
            F.min(id_col).alias("__hub_id")
        )
        hub_vecs = b.select(
            F.col(id_col).alias("__hub_id"), F.col(vec_col).alias("__va"),
            "table", "bucket",
        ).dropDuplicates(["__hub_id", "table", "bucket"])
        pairs = (
            # hub_vecs carries full vectors and is corpus-proportional —
            # shuffle_hash, same reasoning as semantic_dedup's pair join
            b.join(hubs, ["table", "bucket"])
            .filter(F.col(id_col) > F.col("__hub_id"))
            .join(hub_vecs.hint("shuffle_hash"), ["__hub_id", "table", "bucket"])
            .select(
                F.col("__hub_id").alias("id_a"),
                F.col(id_col).alias("id_b"),
                "__va",
                F.col(vec_col).alias("__vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        l, r = b.alias("l"), b.alias("r")
        pairs = (
            # both sides are the full bucketized corpus: broadcasting one
            # is wrong at every scale — shuffle-hash co-partitions on the
            # bucket key instead
            l.join(
                r.hint("shuffle_hash"),
                (F.col("l.table") == F.col("r.table"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            )
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
                F.col(f"l.{vec_col}").alias("__va"),
                F.col(f"r.{vec_col}").alias("__vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    dot = F.aggregate(
        F.zip_with(
            F.col("__va"), F.col("__vb"),
            lambda a, b2: a.cast("double") * b2.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            (dot / (norm(F.col("__va")) * norm(F.col("__vb")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ivf_index(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
    sample_size: int = 65536,
    max_iter: int = 10,
):
    """IVF coarse quantizer → (indexed DataFrame with a ``centroid_id``
    column, centroid matrix).

    The k-means fit runs driver-side (numpy, fixed seed) on a bounded
    deterministic sample — ``orderBy(xxhash64(id)).limit(n)`` executes as
    TakeOrderedAndProject (map-side partial top-k, no full shuffle), so
    at 100 TB the fit cost is one scan + a ``sample_size × dim`` driver
    matrix.  Corpus assignment is a single map-only Pandas-UDF pass
    (argmin of squared L2 against the broadcast centroids)."""
    samp = (
        emb.select(F.col(vec_col).alias("__v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample_size)
        .collect()
    )
    X = np.array([r["__v"] for r in samp], dtype=np.float64)
    rng = np.random.RandomState(seed)
    k = min(n_clusters, len(X))
    centroids = X[rng.choice(len(X), size=k, replace=False)]
    x2 = (X * X).sum(axis=1)
    for _ in range(max_iter):
        d = x2[:, None] + (centroids * centroids).sum(axis=1)[None, :] - 2.0 * (X @ centroids.T)
        assign = d.argmin(axis=1)
        new = np.vstack(
            [
                X[assign == j].mean(axis=0) if (assign == j).any() else centroids[j]
                for j in range(k)
            ]
        )
        if np.allclose(new, centroids):
            break
        centroids = new

    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast(centroids)

    @F.pandas_udf(T.IntegerType())
    def assign_udf(vecs: pd.Series) -> pd.Series:
        C = bc.value
        m = np.array(vecs.tolist(), dtype=np.float64)
        d = (m * m).sum(axis=1)[:, None] + (C * C).sum(axis=1)[None, :] - 2.0 * (m @ C.T)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    assigned = emb.withColumn("centroid_id", assign_udf(F.col(vec_col)))
    return assigned, centroids


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q_emb",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """IVF search: for each query, probe the ``n_probe`` nearest
    centroids and run exact cosine only inside those inverted lists.
    Scans ~n_probe/n_clusters of the corpus instead of all of it."""
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    probe_rows = []
    for r in q_rows:
        qv = np.asarray(r[query_vec_col], dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        order = np.argsort(-(cn @ qn))[:n_probe]
        for cid in order:
            probe_rows.append((r[query_id_col], int(cid), qv.tolist()))
    spark = indexed.sparkSession
    probes = spark.createDataFrame(
        probe_rows, "query_id BIGINT, centroid_id INT, __qv ARRAY<DOUBLE>"
    )
    cand = indexed.join(F.broadcast(probes), "centroid_id").select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("__ev"),
        "query_id",
        "__qv",
    )
    dot = F.aggregate(
        F.zip_with("__ev", "__qv", lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_e = F.sqrt(
        F.aggregate(
            F.transform("__ev", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    norm_q = F.sqrt(
        F.aggregate(F.transform("__qv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    scored = cand.select(
        "query_id", "cand_id", (dot / (norm_e * norm_q)).alias("cosine")
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cosine", "rn")
    )


def semantic_dedup(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    threshold: float = 0.95,
    seed: int = 42,
    max_cluster_size: int = 4096,
    max_split_rounds: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster embeddings with the IVF coarse quantizer, then compare pairs
    ONLY within a cluster; any pair with cosine ≥ ``threshold`` marks
    the higher id a duplicate (``dup_of`` = lowest qualifying earlier
    id).  → (id, keep, dup_of).

    Scale: within-cluster pair work is Σ|cluster|² ≈ n²/k, so the
    cluster count must GROW with the corpus (SemDeDup's own scaling) —
    the default sizes k ≈ n/512 (≥16), keeping expected per-cluster
    membership ~512 and total pair work ~O(n · 512).  Two guards bound
    the SKEWED case where one centroid swallows a popular region:

    1. **Exact-duplicate pre-reduction**: vectors are grouped by value
       first and only each group's minimum-id representative enters the
       pair stage.  Identical vectors — the common skew driver, and the
       one k-means can never split — cost one groupBy instead of a
       |group|² self-join; members inherit ``dup_of =
       coalesce(dup_of(rep), rep)``, which is provably the same answer
       the all-pairs formulation gives (any qualifying earlier id has a
       representative that also qualifies and is no larger).
    2. **Oversized-cluster re-splitting**: clusters still above
       ``max_cluster_size`` after (1) are re-quantized with fresh
       finer centroids (composite cluster key, up to
       ``max_split_rounds`` rounds) — SemDeDup's own recursive
       refinement.  Near-dup pairs split across sub-clusters are missed,
       the same within-cluster-only recall tradeoff the base algorithm
       already makes.

    Shuffles: one groupBy on the vector value, one per split round on
    the cluster key, one for the pair join; cosine is a ``zip_with``
    fold, JVM-side.

    ``stats``: pass a dict to receive guard observability (n_reps,
    n_clusters, one entry per split round with the oversized-cluster
    count and member total, and the final max cluster size) — the
    skew-stress suite asserts on these instead of re-deriving them."""
    v0 = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    # rep assignment is a WINDOW min over the vector value, not a
    # groupBy+self-join: the join form hashes the raw float array as a
    # join key, and when Catalyst's (parquet-size-based) estimate puts
    # the grouped side under the broadcast threshold it builds a hashed
    # relation of boxed arrays — observed to blow the heap at corpus
    # sizes whose on-disk footprint looks tiny.  The window is one
    # shuffle on the same key with no driver-side build at any size.
    # members feeds BOTH the pair stage (via reps) and the final
    # inheritance join; assigned feeds the size probe AND both sides of
    # the pair self-join — persist each or the window+IVF lineage
    # recomputes up to 4×.  (At sf0.1's 2k vectors the call is fixed-
    # overhead-dominated and the persist is noise; the recompute factor
    # is what matters when the corpus is the cost.)
    members = v0.withColumn(
        "rep_id", F.min("id").over(W.partitionBy("vec"))
    ).persist()
    reps = members.filter(F.col("id") == F.col("rep_id")).select("id", "vec")

    if n_clusters is None:
        n_clusters = max(16, int(reps.count() // 512) + 1)
    if stats is not None:
        stats["n_reps"] = reps.count()
        stats["n_clusters"] = n_clusters
        stats["split_rounds"] = []
    indexed, _ = ivf_index(
        reps, id_col="id", vec_col="vec", n_clusters=n_clusters, seed=seed
    )
    assigned = indexed.select(
        "id", "vec", F.col("centroid_id").cast("string").alias("ckey")
    ).persist()

    # re-split clusters that exceed the pair-work bound (skewed centroid):
    # re-quantize ONLY the oversized clusters' members with fresh finer
    # centroids; the composite key keeps refinement within each cluster
    prev = assigned  # pre-loop cache, released when a refinement replaces it
    for rnd in range(max_split_rounds):
        sizes = assigned.groupBy("ckey").agg(F.count(F.lit(1)).alias("n"))
        big = [r["ckey"] for r in sizes.filter(F.col("n") > max_cluster_size).collect()]
        if not big:
            break
        over = assigned.filter(F.col("ckey").isin(big))
        rest = assigned.filter(~F.col("ckey").isin(big))
        n_over = over.count()
        if stats is not None:
            stats["split_rounds"].append(
                {"oversized_clusters": len(big), "members": n_over}
            )
        sub_k = max(2, int(n_over // max(max_cluster_size // 2, 1)) + 1)
        sub, _ = ivf_index(
            over, id_col="id", vec_col="vec", n_clusters=sub_k, seed=seed + rnd + 1
        )
        refined = sub.select(
            "id",
            "vec",
            F.concat_ws("/", "ckey", F.col("centroid_id").cast("string")).alias("ckey"),
        )
        assigned = rest.unionByName(refined).persist()
        assigned.count()  # materialize before unpersisting the parent
        prev.unpersist()
        prev = assigned

    if stats is not None:
        row = (
            assigned.groupBy("ckey")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("m"))
            .collect()[0]
        )
        stats["final_max_cluster"] = row["m"] or 0

    norm = F.sqrt(F.aggregate(F.col("vec"), F.lit(0.0), lambda a, x: a + x * x))
    v = assigned.select("id", "ckey", "vec", norm.alias("nrm"))
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.vec"), F.col("b.vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        # shuffle-hash, never broadcast: both sides are the full rep
        # corpus (with vectors) — broadcasting one is exactly wrong at
        # scale, and size estimates on array columns undershoot badly
        # enough that Catalyst sometimes tries
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.ckey") == F.col("b.ckey")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    rep_dup = pairs.groupBy(F.col("id_b").alias("rep_id")).agg(
        F.min("id_a").alias("rep_dup_of")
    )
    out = members.join(rep_dup, "rep_id", "left").select(
        "id",
        F.when(F.col("id") == F.col("rep_id"), F.col("rep_dup_of"))
        .otherwise(F.coalesce(F.col("rep_dup_of"), F.col("rep_id")))
        .alias("dup_of"),
    )
    out = out.select("id", F.col("dup_of").isNull().alias("keep"), "dup_of")
    # materialize the (narrow, one-row-per-vector) verdict, then release
    # the working caches — without this every call leaks 2-3 persisted
    # frames for the session lifetime.  persist()+count rather than
    # localCheckpoint (r10 review): a checkpointed frame's blocks are
    # only freed by JVM GC, so a registry/caller unpersist() would be a
    # no-op and the bounded-lifecycle contract (artifacts.clear(),
    # engine.close()) could not actually release it.  The caller owns
    # the returned frame's unpersist.
    out = out.persist()
    out.count()
    members.unpersist()
    assigned.unpersist()
    return out


def quantize_int8_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column with
    reconstruction-error accounting — the storage/bandwidth side of
    vector search (a product-quantization building block): per vector,
    ``scale = 127/max|x|``, ``q_i = floor(x_i·scale + 0.5)``,
    reconstruction ``q_i/scale``.  Returns per-vector stats
    (id, label, err_mean, max_q).

    Engine-portable determinism: ``floor(x·s + 0.5)`` instead of
    ``round`` (rounding modes differ across engines; floor is exact
    IEEE), per-element errors route through a scale-12 DECIMAL before
    the order-dependent sum.  The EXACT decimal sum (``err_sum``) and
    the element count are returned alongside the double mean so
    downstream aggregation can stay in decimals — re-casting a
    full-precision double quotient to DECIMAL is where engines'
    rounding of the last digit diverges (measured: Spark vs DuckDB
    disagree on the 12th decimal of ``err_mean``).  Zero vectors
    quantize to 0, zero error.

    Scale (r14, guide §2.4/§3.3): everything is per-row array
    expressions — the per-vector max, the quantized errors and their
    exact decimal sum never leave the row, so there is NO element
    explode, NO per-id max shuffle and NO join back onto the element
    stream (the pre-r14 shape exploded the vector twice and
    broadcast-joined the per-id max against the exploded elements —
    an element-cardinality aggregate at any scale).  Per-vector state
    is the vector itself; downstream aggregates combine map-side.

    Decimal exactness inside ``aggregate()``: a DECIMAL(37,12)
    accumulator plus DECIMAL(27,12) element terms keeps every addition
    at precision 38, so Spark never reduces the scale (a (38,12) two-
    sided add would round to scale 11); the same-scale cast back to
    (37,12) is overflow-checked, never rounded, and the final widen to
    DECIMAL(38,12) matches the old ``sum(DECIMAL(28,12))`` output type
    bit-for-bit (verified value-equal across the whole embeddings
    fixture and pinned by the oracle hash).
    """
    base = df.filter(F.size(F.col(vec_col)) > 0).select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.expr(
            f"array_max(transform({vec_col}, xf -> abs(CAST(xf AS DOUBLE))))"
        ).alias("m"),
        F.col(vec_col).alias("__vec"),
    )
    q_expr = "FLOOR(CAST(xf AS DOUBLE) * (127.0D / m) + 0.5D)"
    err_expr = f"abs(CAST(xf AS DOUBLE) - {q_expr} / (127.0D / m))"
    term = f"CAST(IF(m > 0, {err_expr}, 0.0D) AS DECIMAL(27,12))"
    return base.select(
        "id",
        "label",
        F.expr(
            "CAST(aggregate(__vec, CAST(0 AS DECIMAL(37,12)), (acc, xf) -> "
            f"CAST(acc + coalesce({term}, CAST(0 AS DECIMAL(27,12))) "
            "AS DECIMAL(37,12))) AS DECIMAL(38,12))"
        ).alias("err_sum"),
        F.size("__vec").cast("bigint").alias("n_els"),
        F.expr(
            f"IF(m > 0, array_max(transform(__vec, xf -> abs({q_expr}))), 0L)"
        ).alias("max_q"),
    ).withColumn("err_mean", F.col("err_sum").cast("double") / F.col("n_els"))

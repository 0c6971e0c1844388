"""End-to-end training-data pipeline over the full stack: read raw
documents → quality score → language ID → exact dedup → near-dup drop →
write to a lang-partitioned lakehouse table → incremental second batch
via batch transaction → maintenance.  The north-star use case
(BASELINE.json) in one flow."""

import pytest
from pyspark.sql import functions as F

from swiftlake_spark.engine import SwiftLakeEngine
from swiftlake_spark.tables import E

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def engine(spark, tmp_path):
    return SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "wh"))


def test_document_pipeline_end_to_end(engine, spark):
    from swiftlake_spark.operators.dedup import exact_dedup, minhash_lsh_dedup
    from swiftlake_spark.operators.text import lang_id, text_quality
    from swiftlake_spark.queries.base import load

    raw = load(spark, SF, "documents")
    n_raw = raw.count()

    # 1. quality + language signals (pure column expressions, one pass)
    scored = lang_id(text_quality(raw))

    # 2. quality gate
    kept = scored.filter(
        (F.col("quality_score") > 0.3) & (F.col("n_tokens") >= 8)
    )

    # 3. exact dedup (hash window; keep lowest doc_id)
    deduped = exact_dedup(kept, "doc_id", ["text"]).filter("is_keeper").drop(
        "is_keeper", "group_size"
    )

    # 4. near-dup pairs → drop the higher id of each pair
    pairs = minhash_lsh_dedup(
        deduped, "doc_id", "text", n_hashes=16, bands=8, threshold=0.8
    )
    drop_ids = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    final = deduped.join(drop_ids, "doc_id", "left_anti")

    # 5. land in a lang-partitioned lakehouse table
    engine.catalog.create_table(
        "corpus.docs",
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT, "
        "lang_pred STRING, quality_score DOUBLE",
        partition_spec=["lang"],
        sort_order=["doc_id ASC"],
    )
    engine.insert_into("corpus.docs").dataframe(
        final.select(
            "doc_id", "text", "lang", "source", "n_chars", "lang_pred", "quality_score"
        )
    ).execute()

    t = engine.catalog.table("corpus.docs")
    n_final = t.scan().count()
    assert 0 < n_final <= n_raw
    # partition pruning works on the landed table
    t.scan(E.col_eq("lang", "en"))
    assert t.last_scan_metrics.pruned_files > 0

    # 6. incremental batch: re-offer already-landed content under new ids;
    # dedup-against-table finds nothing new, while quality-rejected docs
    # from the raw feed DO come back as fresh
    landed_again = t.scan().select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    existing_hashes = t.scan().select(F.md5("text").alias("h")).distinct()

    def fresh_of(batch):
        return (
            batch.withColumn("h", F.md5("text"))
            .join(existing_hashes, "h", "left_anti")
            .drop("h")
        )

    assert fresh_of(landed_again).count() == 0
    n_fresh_raw = fresh_of(raw.select("doc_id", "text", "lang", "source", "n_chars")).count()
    assert n_fresh_raw == n_raw - n_final  # exactly the filtered-out docs

    # 7. maintenance keeps the table healthy
    before_files = len(t.meta.read_manifest(t.meta.current_snapshot()))
    t.compact(target_file_size_bytes=1 << 26)
    t.refresh()
    t.expire_snapshots(keep_last=1)
    t.vacuum(older_than_ms=0)
    assert t.scan().count() == n_final  # nothing lost
    hist = [r["operation"] for r in t.history().collect()]
    assert "append" in hist


def test_embedding_pipeline_end_to_end(engine, spark):
    from swiftlake_spark.operators.similarity import cosine_topk, lsh_bucketize
    from swiftlake_spark.queries.base import load

    emb = load(spark, SF, "embeddings")
    # bucketize once, store buckets alongside vectors in the lakehouse
    bucketed = lsh_bucketize(emb, dim=64, n_planes=8)
    engine.catalog.create_table(
        "corpus.vectors",
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT, bucket BIGINT",
        partition_spec=["bucket(16, vec_id)"],
    )
    engine.insert_into("corpus.vectors").dataframe(bucketed).execute()
    t = engine.catalog.table("corpus.vectors")
    assert t.scan().count() == emb.count()

    # query the stored table with the brute-force searcher
    stored = t.scan().select("vec_id", "embedding")
    q = stored.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    top = cosine_topk(stored.filter(F.col("vec_id") >= 2), q, k=3)
    assert top.count() == 6

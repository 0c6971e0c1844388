"""SparkSession factory.

One place where every engine session is configured, equivalent to the
reference's DuckDB instance bootstrap (``SwiftLakeEngine.java:409-446``:
memory limit, threads, UTC).  Spark-side we additionally turn on AQE
(runtime re-planning, partition coalescing, skew-join splitting) and the
Arrow transfer path for the Pandas-UDF operators.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from swiftlake_spark.config import EngineConfig


def build_session(config: EngineConfig | None = None) -> SparkSession:
    cfg = config or EngineConfig()
    b = (
        SparkSession.builder.master(cfg.effective_master)
        .appName(cfg.app_name)
        .config("spark.sql.session.timeZone", cfg.session_timezone)
        .config("spark.sql.shuffle.partitions", str(cfg.effective_shuffle_partitions))
        .config("spark.sql.adaptive.enabled", str(cfg.adaptive).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", str(cfg.adaptive).lower())
        .config("spark.sql.adaptive.skewJoin.enabled", str(cfg.adaptive).lower())
        .config("spark.sql.execution.arrow.pyspark.enabled", str(cfg.arrow).lower())
        .config("spark.sql.autoBroadcastJoinThreshold", cfg.broadcast_threshold)
        .config("spark.sql.files.maxPartitionBytes", cfg.max_partition_bytes)
        .config("spark.sql.parquet.compression.codec", cfg.parquet_compression)
        # row-group sizing: parquet writer block size tracks the reference's
        # 122_880-row groups only approximately (Spark sizes by bytes);
        # 128 MiB blocks are the parquet-mr default and scan-friendly.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
    )
    if cfg.driver_memory:
        b = b.config("spark.driver.memory", cfg.driver_memory)
    for k, v in cfg.extra_conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_existing(spark: SparkSession, cfg: EngineConfig) -> SparkSession:
    """Apply the runtime-settable subset of the config to a session we did
    not create (the driver hands us one in ``__spark_entry__.entry``)."""
    spark.conf.set("spark.sql.session.timeZone", cfg.session_timezone)
    spark.conf.set("spark.sql.shuffle.partitions", str(cfg.effective_shuffle_partitions))
    try:
        spark.conf.set("spark.sql.adaptive.enabled", str(cfg.adaptive).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", cfg.broadcast_threshold)
    except Exception:
        pass  # conf may be static in some deployments; best-effort
    return spark

"""SparkSession factory tuned for this engine.

Local testing runs on a single JVM (local[N]); the configs below are the
ones that matter for correctness (UTC timestamps vs the DuckDB oracle,
Arrow for pandas UDFs) and for scale posture (AQE on, shuffle partitions
sized to cores, skew-join handling). On a real cluster the same builder is
used with a different master and shuffle-partition count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "labs_stream_processing_examples_scala_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults follow the project harness: ``local[$SPARK_GRAFT_CPUS]``
    (32 on the driver box) and shuffle partitions = cores. AQE is on so
    runtime statistics can re-plan joins (broadcast switch, skew split) —
    the 100 TB posture relies on it.
    """
    # before the JVM launches: put a host protobuf runtime (if any) on
    # PYTHONPATH so transformWithStateInPandas workers can import it
    from labs_stream_processing_examples_scala_spark.protobuf_host import ensure_protobuf

    ensure_protobuf()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fixture parquet carries TIMESTAMP(NANOS) which Spark cannot read
        # natively; read as long and convert (sources.batch.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_persisted_rdds(spark: SparkSession) -> int:
    """Unpersist every RDD the context still holds and return how many
    were released. The managed operator caches (dedup/similarity) are
    dropped by ``dedup.invalidate_cache()``; what remains afterwards is
    localCheckpoint generations (e.g. the two-star component loop),
    whose storage otherwise lives until context shutdown. Call at
    suite/bench teardown so nothing persisted outlives the run."""
    scala_sc = spark.sparkContext._jsc.sc()
    it = scala_sc.getPersistentRDDs().iterator()
    n = 0
    while it.hasNext():
        it.next()._2().unpersist(False)
        n += 1
    return n


def cluster_conf(
    total_cores: int = 4000,
    executor_mem_gb: int = 32,
    target_partition_mb: int = 192,
    input_tb: float = 100.0,
) -> dict[str, str]:
    """Recommended conf for running this engine on a real cluster at
    ~``input_tb`` TB — the scale posture of the local builder
    (:func:`get_spark`) made explicit and sized.

    Rationale per key (all are plain Spark confs — nothing proprietary):

    - shuffle partitions ≈ max(2×cores, input/target_partition_size):
      every wide edge in this engine keys on a real join/agg key, so
      partition count is the only sizing lever; 100 TB / 192 MB ≈ 550k
      is capped by AQE coalescing to what the stage actually needs.
    - AQE on (+coalesce/skew): the engine's no-hint joins rely on the
      runtime broadcast/shuffle decision and skew split (PLANS_AQE.md
      demonstrates both); initialPartitionNum gives AQE headroom.
    - maxPartitionBytes = target_partition_mb: scan tasks sized so a
      row-group batch plus shuffle write buffers fit executor memory.
    - Arrow batch cap: bounds the pandas-UDF (multimodal/ANN) batch
      memory — the engine's only Python crossings are Arrow-batched.
    - checkpoint compression + RocksDB state store with changelog
      checkpointing: the streaming state (gather, windows, dedup)
      commits incrementally instead of full-snapshot per batch.
    """
    est_input_mb = int(input_tb * 1024 * 1024)
    shuffle_parts = max(2 * total_cores, est_input_mb // target_partition_mb)
    return {
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": str(shuffle_parts),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": f"{target_partition_mb}m",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.files.maxPartitionBytes": f"{target_partition_mb}m",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.checkpoint.compress": "true",
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }

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
        .config("spark.sql.shuffle.spill.compress", "true")
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

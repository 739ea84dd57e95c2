"""SparkSession factory.

Centralizes the engine's session configuration so every entry point (tests,
bench, driver contract) runs with the same semantics:

- ANSI mode OFF: the reference standardizes polymorphic values with
  ``pd.to_numeric(errors="coerce")`` (reference utils/data_mapper.py:41),
  i.e. failed casts become NULL, never errors. Spark 4 defaults ANSI on, so
  we switch it off and additionally use ``try_cast``/``try_*`` where the
  permissive behavior is semantic rather than incidental.
- AQE ON: runtime coalescing + skew-join handling — at the 100 TB design
  point, static shuffle-partition counts are always wrong for somebody.
- UTC session timezone: all testdata timestamps are naive; pinning the zone
  keeps date_trunc/window results engine-portable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "ir_analyses_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    In local mode one JVM hosts everything, so ``spark.driver.memory`` is the
    only memory knob; on a real cluster the same config object would carry
    executor sizing instead. Shuffle partitions default to the core count —
    appropriate for local testing; a 1000-executor deployment would raise it
    (AQE coalesces back down when partitions run small).
    """
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.parquet stores ts as INT64 TIMESTAMP(NANOS) which
        # Spark cannot map to TimestampType; read as long + convert (sources.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # wide aggregates (64-column MinHash signature min-agg) must stay
        # inside whole-stage codegen; the 100-field default kicks them out
        .config("spark.sql.codegen.maxFields", "256")
        # Spark 4 locks the CSV charset list to a UTF/latin subset; EDINET
        # filings arrive in CP932 (Shift-JIS), so allow full JVM charsets
        .config("spark.sql.legacy.javaCharsets", "true")
        # partition dirs must read back with their declared type: fiscal_year
        # is a *string* per the reference schema (utils/db_models.py:77) and
        # inference would silently flip fiscal_year=2023 to int
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        # RocksDB state store: required by transformWithState(InPandas) and
        # the right provider for large keyed state generally (off-heap,
        # incremental checkpoints) — HDFS-backed in-memory maps don't scale
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

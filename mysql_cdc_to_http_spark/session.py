"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM with N threads; on a real cluster the same
configs hold (AQE, adaptive shuffle partitioning, Arrow for the pandas-UDF
paths). Shuffle partitions default to the local core count — AQE coalesces
at runtime, so on a 1000-executor cluster the same code path re-plans to
the data volume instead of a hardcoded constant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mysql_cdc_to_http_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    Env knobs (driver contract): ``SPARK_GRAFT_CPUS`` sets local parallelism.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalesce + skew-join splitting — the scale path.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # UTC so timestamps compare cleanly against the DuckDB oracle
        # (duckdb timestamps are UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas UDF / toPandas boundaries.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Keep the UI off in headless runs.
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # ANSI off: we want permissive casts (reference semantics are
        # fail-soft, e.g. bad date -> passthrough, main.go:150-153).
        .config("spark.sql.ansi.enabled", "false")
        # Parquet TIMESTAMP(NANOS) (events.ts) is unreadable by Spark 4
        # natively; read as long and convert in the catalog loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""JDBC (MySQL) batch source — the engine's path to the reference's
upstream database for backfills/snapshots (the reference explicitly
disables snapshots, main.go:465-466; the engine makes them available).

The MySQL JDBC driver jar is not present in this environment, so
``load()`` fails at class-load time — the *plumbing* (partitioned reads,
pushdown options) is what this module contributes and what tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrameReader, SparkSession


def mysql_reader(
    spark: SparkSession,
    host: str,
    database: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
) -> DataFrameReader:
    """Configured JDBC reader. With a numeric ``partition_column`` and
    bounds, Spark issues ``num_partitions`` range-predicated queries in
    parallel — a snapshot of a 1 TB table becomes N concurrent streams
    instead of one cursor (the scale requirement the reference sidesteps
    by never snapshotting)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", f"jdbc:mysql://{host}/{database}")
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", "com.mysql.cj.jdbc.Driver")
        .option("fetchsize", str(fetch_size))
        # pushdown: filters and column pruning reach the database query
        .option("pushDownPredicate", "true")
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader

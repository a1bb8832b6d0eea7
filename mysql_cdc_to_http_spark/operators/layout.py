"""Table-layout operators: partitioned + sorted parquet writes and
small-file compaction.

At 100 TB the scan plan is decided at WRITE time: hive-partitioning by a
low-cardinality predicate column turns matching filters into partition
pruning (directories never listed), sorting within files tightens
parquet row-group min/max so filters on the sort key skip pages, and
file sizing (one shuffle partition per partition value, bounded records
per file) prevents both the small-files problem and unsplittable
monsters. None of this changes query results — tests assert layout
properties on the plan (`PartitionFilters`) and on disk, and that a
round-trip preserves the data exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write hive-partitioned parquet with clustered files.

    ``repartition(partition_by)`` routes each partition value to one
    shuffle task so each directory gets one file per task instead of one
    per upstream partition (the classic small-files fan-out:
    n_input_partitions × n_values files). ``sort_by`` then orders rows
    WITHIN each file so parquet row-group min/max statistics prune reads
    on the sort key. Skewed partition values are the one caveat — a hot
    value lands in one task; AQE rebalance or adding a salt column to
    ``partition_by`` splits it when that matters."""
    staged = df.repartition(*[F.col(c) for c in partition_by])
    if sort_by:
        staged = staged.sortWithinPartitions(*partition_by, *sort_by)
    writer = staged.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_by).parquet(path)


def compact_small_files(
    spark,
    path: str,
    target_files: int,
    out_path: str,
) -> None:
    """Rewrite a fragmented dataset into ``target_files`` files —
    the maintenance pass after many incremental appends. Coalesce (no
    shuffle) is correct here because we only ever REDUCE file count."""
    spark.read.parquet(path).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(out_path)


def stream_to_partitioned_layout(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str],
):
    """Continuous ingestion into the partitioned layout: append-mode
    parquet sink with hive partitioning. The checkpoint gives
    exactly-once file-level delivery across restarts (Spark's file sink
    commits via the _spark_metadata transaction log — readers see only
    committed files, and a replayed micro-batch is not re-committed).
    Each micro-batch writes one file per in-flight partition value, so
    periodic ``compact_small_files`` per partition directory is the
    expected companion job at scale."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*partition_by)
        .outputMode("append")
        .start()
    )

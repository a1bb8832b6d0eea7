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


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Attach a Z-order (Morton) key interleaving ``cols``' bits —
    multi-column data clustering so parquet min/max statistics prune
    files/row-groups for predicates on ANY prefix-free subset of the
    columns (a single-column sort only prunes its own leading column;
    Z-order trades a little per-column locality on each dimension for
    locality on all of them — the same layout Delta/Iceberg OPTIMIZE
    ZORDER computes).

    Each column is min-max scaled to ``bits``-wide integers from ONE
    driver-sized (min, max) aggregate — no per-row window. Min-max
    ranks poorly under heavy skew (a hot value collapses many rows onto
    one z-prefix); for skewed columns pre-bucket with a rank/ntile pass
    and z-order the bucket ids instead. Returns (df + key, key column
    name)."""
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError(
            f"bits*len(cols) must fit a signed long, got {bits}*{len(cols)}"
        )
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                ((F.col(c).cast("double") - F.lit(mn))
                 / F.lit(span) * top).cast("long"),
            )
        )
    # interleave: output bit (j*n_cols + k) = bit j of column k — a flat
    # sum of shift/mask terms, all inside whole-stage codegen
    n = len(cols)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for k, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(s, j).bitwiseAND(F.lit(1)),
                    j * n + k,
                )
            )
    return df.withColumn("__zorder", z), "__zorder"


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16
) -> None:
    """Z-order-clustered parquet: range-partition on the Morton key
    (contiguous z-ranges per file ⇒ tight per-file min/max boxes on
    EVERY z-ordered column), sort within files for row-group pruning,
    drop the key before writing."""
    keyed, zcol = zorder_value(df, cols)
    (
        keyed.repartitionByRange(n_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


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


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = 16,
    salt: str = "shard-v1",
) -> DataFrame:
    """Deterministic sharded export — the last step of a training-data
    pipeline: split the corpus into ``n_shards`` hive directories
    (shard=0..n-1) with EXACTLY one parquet file each, membership fixed
    by md5(id) so re-running the export on the same corpus reproduces
    identical shard membership regardless of cluster size, partitioning,
    or input order (a seeded-random split has none of those properties —
    same argument as operators/sampling.py:hash_split).

    One file per shard by construction: ``repartition(n, shard)`` routes
    every row of a shard value to one task (hash of the VALUE decides
    the task, so a shard never straddles tasks), and ``partitionBy``
    then writes one file per (task, value) pair. Collisions of two
    shard values onto one task cost balance of WORK, not of output.

    Returns the manifest DataFrame — one row per shard with ``n_rows``
    and an order-independent content checksum (XOR of 60-bit md5
    prefixes of the ids: commutative, overflow-free at any cardinality,
    and any single-row difference flips it) — driver-sized (n_shards
    rows), ready to write alongside the data.
    """
    from mysql_cdc_to_http_spark.operators.sampling import split_bucket

    sharded = df.withColumn(
        "shard", split_bucket(F.col(id_col), n_shards, salt)
    )
    (
        sharded.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return shard_manifest(df, id_col, n_shards, salt)


def shard_manifest(
    df: DataFrame,
    id_col: str,
    n_shards: int = 16,
    salt: str = "shard-v1",
) -> DataFrame:
    """The manifest alone (no write): per-shard row count + XOR
    checksum. Recomputable by any engine with md5 — an auditor verifies
    a delivered export by recomputing this from the shard files and
    comparing, without trusting the producer."""
    from mysql_cdc_to_http_spark.operators.sampling import split_bucket

    id60 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        df.select(
            split_bucket(F.col(id_col), n_shards, salt).alias("shard"),
            id60.alias("__id60"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("__id60").alias("content_xor"),
        )
        .orderBy("shard")
    )

"""Bucketed-table helpers — co-located joins without a shuffle.

For a join that repeats every run (fact ⋈ fact on a stable key), writing
both sides bucketed+sorted on the key makes the sort-merge join read
pre-partitioned, pre-sorted buckets: zero Exchange in the plan (verified
in tests: 0 vs 4 exchanges unbucketed). At 100 TB this converts the
largest recurring shuffle into a plain co-located scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    writer = df.write.bucketBy(n_buckets, key).mode("overwrite")
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with broadcast disabled the planner
    emits an exchange-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), key, how)

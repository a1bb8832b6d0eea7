"""Streaming incremental join-view maintenance: keep a materialized
fact⋈dim view current from a CDC changelog, one micro-batch at a time.

The streaming sibling of ``operators/diff.py:maintain_joined_view`` (the
batch/two-sided form) and of ``incremental_agg`` (the aggregate
consumer): each micro-batch of change events updates the enriched view
by KEY OVERWRITE — remove every touched fact key, re-enrich the batch's
surviving after-images against the dim, append. Unlike delta
aggregation, key overwrite is IDEMPOTENT, so at-least-once foreachBatch
replay needs no epoch guard: replaying a batch removes and re-adds the
same keys to the same values.

Scale shape: the touched-key set and the rebuild side are batch-sized,
so the view subtraction is a broadcast anti-join and the enrichment a
broadcast (dim) join — per micro-batch work is O(batch + view-scan),
never a full re-join; the view commit is the crash-safe write-then-swap
shared by every parquet state store in this engine (latest_state).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from mysql_cdc_to_http_spark.streaming.latest_state import (
    _offset_order_key,
    _recover_state_dir,
    _swap_into_state_dir,
)

_RN = "__ivm_rn"


def merge_changes_into_view(
    spark: SparkSession,
    batch: DataFrame,
    view_dir: str,
    dim: DataFrame,
    fact_key: str,
    join_key: str,
    offset_col: str = "offset",
    op_col: str = "op",
) -> None:
    """One ``foreachBatch`` maintenance step over a CDC envelope batch
    (op, offset, before/after images): collapse the batch per fact key
    (highest offset wins), drop keys whose final event is a delete,
    re-enrich the surviving after-images against ``dim`` (inner join —
    facts without a dim row vanish exactly as a full recompute would),
    and swap the updated view in crash-safely."""
    _recover_state_dir(view_dir)
    key = F.coalesce(
        F.col(f"after.{fact_key}"), F.col(f"before.{fact_key}")
    )
    w = W.partitionBy("__k").orderBy(
        _offset_order_key(batch, offset_col).desc()
    )
    ranked = (
        batch.withColumn("__k", key)
        .withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
    )
    touched = ranked.select(F.col("__k").alias(fact_key))
    upserts = ranked.filter(F.col(op_col) != "d").select("after.*")
    rebuilt = upserts.join(F.broadcast(dim), join_key)
    cols = rebuilt.columns
    if os.path.exists(view_dir):
        view_old = spark.read.parquet(view_dir).select(*cols)
        # using-column joins reorder the key column first — pin the
        # view's column order so every fold writes an identical schema
        new_view = (
            view_old.join(F.broadcast(touched), fact_key, "left_anti")
            .select(*cols)
            .unionByName(rebuilt)
        )
    else:
        new_view = rebuilt
    _swap_into_state_dir(new_view, view_dir)


def stream_changes_to_view(
    changes: DataFrame,
    spark: SparkSession,
    view_dir: str,
    checkpoint_dir: str,
    dim: DataFrame,
    fact_key: str,
    join_key: str,
):
    """Wire a streaming changelog into the maintained joined view."""

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        merge_changes_into_view(
            spark, batch_df, view_dir, dim, fact_key, join_key
        )

    return (
        changes.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


# Executors must not need this repo on their PYTHONPATH (driver contract
# imports by path).
import sys as _sys
from pyspark import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

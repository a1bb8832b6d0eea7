"""File-directory queue — the engine's analog of the reference's Redis
list ``cdc_events`` (``main.go:38, 94-103, 383-419``).

The reference RPUSHes serialized envelopes and a worker BLPOPs them back
off for re-delivery; pop-before-POST loses events on failure. Here the
queue is an append-only directory of JSON-line files written by one
streaming query and consumed by a second (``readStream``) — consumption
is tracked in the consumer's checkpoint, so nothing is destructively
popped and delivery can be retried (at-least-once instead of the
reference's at-most-once-after-pop).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

QUEUE_SCHEMA = T.StructType([T.StructField("value", T.StringType())])


def enqueue_stream(
    payloads: DataFrame, queue_dir: str, checkpoint_dir: str
):
    """R11: writeStream append of serialized payloads (column ``value``)
    into the queue directory."""
    return (
        payloads.writeStream.format("text")
        .option("path", os.path.join(queue_dir, "data"))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def enqueue_batch(payloads: DataFrame, queue_dir: str) -> None:
    """Batch append into the same queue layout (used by tests/fixtures)."""
    payloads.write.mode("append").text(os.path.join(queue_dir, "data"))


def dequeue_stream(
    spark: SparkSession, queue_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """R13 source side: a second streaming query tailing the queue
    directory; the checkpoint is the consumer offset."""
    return (
        spark.readStream.schema(QUEUE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .text(os.path.join(queue_dir, "data"))
    )


def dequeue_batch(spark: SparkSession, queue_dir: str) -> DataFrame:
    return spark.read.schema(QUEUE_SCHEMA).text(os.path.join(queue_dir, "data"))

"""Kafka CDC source — the production transport for the envelope stream
(the file source in sources/cdc.py is its test twin; both yield the same
ENVELOPE_SCHEMA DataFrame, so every downstream operator is transport-
agnostic).

The kafka-sql connector jars are not in this environment, so ``load()``
raises at data-source resolution — construction and the value-parsing
plan are what tests cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mysql_cdc_to_http_spark.sources.cdc import ENVELOPE_SCHEMA


def kafka_change_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
):
    """Streaming reader over a Debezium-style envelope topic.

    ``startingOffsets`` is the binlog-position analog (R15's resume
    chain); ``maxOffsetsPerTrigger`` is the backpressure the reference
    gets implicitly from its synchronous POST loop (main.go:105-113)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    return reader


def parse_envelope(raw: DataFrame) -> DataFrame:
    """kafka value bytes → typed envelope columns (shared schema with the
    file source, so this is the only transport-specific line)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), ENVELOPE_SCHEMA).alias("e")
    ).select("e.*")

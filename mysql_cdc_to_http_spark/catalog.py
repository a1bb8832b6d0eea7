"""Catalog: loaders for the driver-generated parquet testdata tables.

The analog of the reference's dynamic table metadata (``e.Table.Columns``,
main.go:249-255) — here schemas come from parquet footers, resolved once at
analysis time, and Catalyst prunes columns/partitions from there.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables — always broadcast-join these (at 100 TB the fact
#: tables scale; these stay tiny, so the broadcast hint removes a shuffle).
DIM_TABLES = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan with pushdown/pruning handled by the parquet source.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which plain TimestampType
    cannot hold. How it arrives depends on the Spark version:

    - Spark ≤ 4.0 with ``spark.sql.legacy.parquet.nanosAsLong``: a
      nanos-since-epoch LongType, converted here (integer ``div`` — a
      double division would lose precision at 1e18 nanos).
    - Spark 4.1+: read natively as TIMESTAMP_NTZ (micros truncation; the
      legacy flag is ignored). Event-time streaming (``withWatermark``)
      requires TIMESTAMP (LTZ), so normalize to the same value the long
      path produced: instant = the naive wall clock read as UTC. The
      conversion is pure integer arithmetic on the NTZ value
      (micros-since-epoch → ``timestamp_micros``), never a session-tz
      round trip: a wall-clock detour through ``convert_timezone`` is
      ambiguous during DST fall-back folds (the repeated local hour
      resolves to the earlier offset, shifting fold-hour events by the
      DST gap). This form is byte-identical to the legacy nanos→long
      path in ANY session timezone, folds included.
    """
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestamp_micros(timestampdiff("
                    "MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"
                ),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every testdata table as a temp view for the SQL surface."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

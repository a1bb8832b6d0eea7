"""Query registry: the contract surface consumed by ``__spark_entry__.py``.

Each implemented operator from SURVEY.md §2 registers a named query
callable ``(spark, sf_dir) -> DataFrame`` and, when batch-SQL-expressible,
a DuckDB oracle SQL string producing identical (column-name-aligned) rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query (and optionally its DuckDB oracle).

    Queries without an oracle get the driver's weaker rows-only check
    (streaming / approximate / iterative ops).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The harness may hand us a session with different semantics
            # than the engine default (Spark 4 ships ANSI on, arbitrary
            # timezone). Pin the two that change RESULTS: fail-soft casts
            # (reference coercion is fail-soft, main.go:150-153) and UTC
            # timestamps (the DuckDB oracle is UTC-naive).
            spark.conf.set("spark.sql.ansi.enabled", "false")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            # events.parquet carries TIMESTAMP(NANOS) — unreadable by
            # Spark 4 without this (runtime-settable) legacy conf; the
            # catalog loader converts the resulting long to a timestamp.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # introspection (source-scan lints)
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2, keyed by the
query names declared there.
``oracle_sql()`` — matching DuckDB ANSI SQL per batch-expressible query
(column names aligned with the Spark side; streaming/approximate ops are
rows-only and have no entry).
"""

from __future__ import annotations

import os
import sys

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from mysql_cdc_to_http_spark.queries import all_queries, all_oracles  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Goes through the registry so the session-hardening wrapper (ANSI off,
    UTC, nanos legacy conf) applies here too."""
    return all_queries()["q_agg_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return all_oracles()

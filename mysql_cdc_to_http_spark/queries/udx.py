"""UDF / UDAF / UDTF surface (SURVEY X34-X36).

Demonstrates the sanctioned slow-path tiers: Arrow-vectorized pandas UDF
(scalar), grouped applyInPandas (per-group pandas frame), and a Python
UDTF (row → many). Each has a pure-SQL oracle so even the Python paths
are value-checked against DuckDB.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.queries.registry import query


# --------------------------------------------------------------------------
# X34 — scalar pandas UDF
# --------------------------------------------------------------------------
@pandas_udf(DoubleType())
def _doc_weight(n_chars: pd.Series, n_tokens: pd.Series) -> pd.Series:
    """(chars + 2·tokens)/1000 — integer inputs, exact double output."""
    return (n_chars + 2 * n_tokens) / 1000.0


@query(
    "q_udf_scalar",
    oracle="""
    SELECT doc_id,
           (n_chars + 2 * len(string_split(lower(text), ' '))) / 1000.0
             AS doc_weight
    FROM documents ORDER BY doc_id
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower("text"), r"\s+"))
    return docs.select(
        "doc_id",
        _doc_weight(F.col("n_chars"), n_tokens).alias("doc_weight"),
    )


# --------------------------------------------------------------------------
# X35 — grouped applyInPandas (per-group normalization)
# --------------------------------------------------------------------------
def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    mean = pdf["n_chars"].mean()
    std = pdf["n_chars"].std(ddof=0)
    pdf["z"] = ((pdf["n_chars"] - mean) / std).round(4)
    return pdf[["doc_id", "lang", "z"]]


@query(
    "q_udf_grouped",
    oracle="""
    SELECT doc_id, lang,
           round((n_chars - avg(n_chars) OVER w)
                 / stddev_pop(n_chars) OVER w, 4) AS z
    FROM documents
    WINDOW w AS (PARTITION BY lang)
    ORDER BY doc_id
    """,
)
def q_udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length: one pandas frame per
    group in, one out (Arrow both ways). Rounded to 4dp — pandas and
    DuckDB accumulate mean/std in different orders."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    out = docs.groupBy("lang").applyInPandas(
        _zscore, schema="doc_id long, lang string, z double"
    )
    return out


# --------------------------------------------------------------------------
# X36 — UDTF (one row → many)
# --------------------------------------------------------------------------
@query(
    "q_udtf",
    oracle="""
    WITH s AS (SELECT p_partkey, string_split(p_name, ' ') AS parts FROM part)
    SELECT p_partkey, CAST(u.i AS INT) AS pos, parts[u.i + 1] AS word
    FROM s, UNNEST(range(len(parts))) AS u(i)
    ORDER BY p_partkey, pos
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF splitting part names into (pos, word) rows via LATERAL
    — the row-to-many surface (Spark ≥3.5)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="p_partkey bigint, pos int, word string")
    class WordSplit:
        def eval(self, key, name):
            for i, w in enumerate(name.split(" ")):
                yield key, i, w

    spark.udtf.register("word_split", WordSplit)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT s.p_partkey, s.pos, s.word
        FROM part_v, LATERAL word_split(p_partkey, p_name) s
        """
    )

# Executors must not need this repo on their PYTHONPATH: register this
# module for pickle-by-value so UDFs/closures ship inside the task
# (the driver contract imports __spark_entry__.py by path, not site-packages).
import sys as _sys
from pyspark import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])


# --------------------------------------------------------------------------
# X95 — grouped-agg pandas UDF (a true UDAF): geometric mean per group.
# Completes the UDX ladder: scalar (X34), per-group frame transform
# (X35), table function (X36) — and now a custom AGGREGATE running as
# one Arrow batch per group, usable in groupBy and over windows.
# --------------------------------------------------------------------------
@pandas_udf(DoubleType())
def _geo_mean(v: pd.Series) -> float:
    """exp(mean(ln v)) — defined for the all-positive o_totalprice."""
    import numpy as np

    return float(np.exp(np.log(v.to_numpy()).mean()))


@query(
    "q_udaf",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(exp(avg(ln(o_totalprice))), 4) AS geo_mean_price
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (grouped-agg pandas UDF): per-priority geometric
    mean of order value. The Python path is value-checked against the
    pure-SQL identity exp(avg(ln x)); the 4-dp round absorbs the
    summation-order/libm ulp differences between numpy's mean and the
    engines' avg. Scale note: GROUPED_AGG ships each group's column to
    Python as ONE Arrow batch — fine for bounded groups (5 priorities);
    for high-cardinality keys prefer the algebraic identity inline
    (exp(avg(ln))) which partial-aggregates map-side, exactly like the
    oracle's form."""
    orders = load_table(spark, sf_dir, "orders")
    # a GROUPED_AGG pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — run it alone and join the counts
    geo = orders.groupBy("o_orderpriority").agg(
        F.round(_geo_mean(F.col("o_totalprice")), 4).alias("geo_mean_price")
    )
    counts = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        counts.join(geo, "o_orderpriority")
        .select("o_orderpriority", "n", "geo_mean_price")
        .orderBy("o_orderpriority")
    )

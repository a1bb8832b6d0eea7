"""Batch relational core: scans, projection, predicates, aggregation,
sort/limit, set ops, exact dedup (SURVEY.md §2.3 X1-X2, X5-X6, X13-X16,
X20-X22).

All queries are declarative DataFrame plans — Catalyst provides predicate
pushdown, column pruning, partial (map-side) aggregation, and
TakeOrderedAndProject for top-k. Aggregate doubles are rounded identically
on the Spark and oracle sides so the driver's value-hash compares cleanly
across engines (FP sums differ in the last ulp between any two engines).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.queries.registry import query


# --------------------------------------------------------------------------
# X1 + X2 — parquet / CSV / JSON scans, folded into one query so every
# SURVEY §2 operator fits the driver's 50-entry CORRECTNESS window.
# --------------------------------------------------------------------------
_NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

_REGION_SCHEMA = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)


def _text_format_cache(spark: SparkSession, sf_dir: str) -> str:
    """Materialize nation as CSV and region as JSON once per sf_dir.

    Derived data lives under the system temp dir (testdata is read-only).
    """
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(tempfile.gettempdir(), "spark_graft_textfmt", tag)
    csv_dir = os.path.join(out, "nation_csv")
    json_dir = os.path.join(out, "region_json")
    if not os.path.exists(os.path.join(out, "_done")):
        load_table(spark, sf_dir, "nation").coalesce(1).write.mode(
            "overwrite"
        ).option("header", True).csv(csv_dir)
        load_table(spark, sf_dir, "region").coalesce(1).write.mode(
            "overwrite"
        ).json(json_dir)
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "_done"), "w") as fh:
            fh.write("ok")
    return out


@query(
    "q_scan_sources",
    oracle="""
    SELECT 'parquet' AS src, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
           CAST(SUM(l_linenumber) AS BIGINT) AS chk
    FROM lineitem
    UNION ALL
    SELECT 'csv', CAST(COUNT(*) AS BIGINT),
           CAST(MIN(n_nationkey) AS BIGINT),
           CAST(SUM(n_regionkey) AS BIGINT)
    FROM nation
    UNION ALL
    SELECT 'json', CAST(COUNT(*) AS BIGINT),
           CAST(MIN(r_regionkey) AS BIGINT),
           CAST(SUM(r_regionkey) AS BIGINT)
    FROM region
    ORDER BY src
    """,
)
def q_scan_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+X2: columnar parquet scan (2 columns survive pruning — check
    ReadSchema) unioned with CSV + JSON sources read back with explicit
    schemas (no runtime inference) — text formats round-trip losslessly."""
    out = _text_format_cache(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    nation = (
        spark.read.schema(_NATION_SCHEMA)
        .option("header", True)
        .csv(os.path.join(out, "nation_csv"))
    )
    region = spark.read.schema(_REGION_SCHEMA).json(os.path.join(out, "region_json"))

    def summary(df: DataFrame, src: str, key: str, chk: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(key).cast("long").alias("min_key"),
            F.sum(chk).cast("long").alias("chk"),
        ).select(F.lit(src).alias("src"), "n_rows", "min_key", "chk")

    return (
        summary(li, "parquet", "l_orderkey", "l_linenumber")
        .unionAll(summary(nation, "csv", "n_nationkey", "n_regionkey"))
        .unionAll(summary(region, "json", "r_regionkey", "r_regionkey"))
        .orderBy("src")
    )


# --------------------------------------------------------------------------
# X5 — projection / aliasing / computed columns
# --------------------------------------------------------------------------
@query(
    "q_projection",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           c_acctbal,
           c_acctbal * CAST(1.1 AS DOUBLE) AS acctbal_up,
           c_nationkey % 5 AS nk_mod
    FROM customer
    """,
)
def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NB: no round() on the computed column — a 2-decimal price times 1.1
    lands exactly on the .xx5 rounding boundary where Spark (BigDecimal
    HALF_UP) and DuckDB (FP-slop rounding) disagree; the raw double product
    is bitwise identical across engines instead."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        "c_acctbal",
        (F.col("c_acctbal") * 1.1).alias("acctbal_up"),
        (F.col("c_nationkey") % 5).alias("nk_mod"),
    )


# --------------------------------------------------------------------------
# X6 — predicate zoo: comparison, BETWEEN, IN, LIKE, null-safe eq, boolean
# --------------------------------------------------------------------------
@query(
    "q_predicates",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 50000
      AND o_orderstatus IN ('O', 'F')
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND o_orderstatus IS NOT DISTINCT FROM o_orderstatus
      AND NOT (o_custkey IS NULL)
    """,
)
def q_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderstatus").isin("O", "F")
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & F.col("o_orderstatus").eqNullSafe(F.col("o_orderstatus"))
        & ~F.col("o_custkey").isNull()
    ).select("o_orderkey", "o_totalprice", "o_orderstatus")


# --------------------------------------------------------------------------
# X13 — TPC-H Q1-shape hash aggregate (the flagship query)
# --------------------------------------------------------------------------
@query(
    "q_agg_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                      AS sum_qty,
           round(sum(l_extendedprice), 2)                                 AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))))
             AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
               * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           round(avg(l_quantity), 4)                                      AS avg_qty,
           round(avg(l_extendedprice), 4)                                 AS avg_price,
           round(avg(l_discount), 4)                                      AS avg_disc,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)                     AS n_orders,
           CAST(COUNT(*) AS BIGINT)                                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with partial (map-side) agg — Catalyst does the
    two-phase plan; AQE coalesces post-shuffle partitions at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    # Multi-product sums run in exact decimal arithmetic: a double sum's
    # accumulated ulp error (~1e-6 at 1e8 magnitude) reaches the rounding
    # grid of the products' 4/6-decimal width, so no double rounding is
    # cross-engine safe — decimal is exact on both engines instead.
    price_dec = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_price = price_dec * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    charge = disc_price * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # 2-decimal/integral summands: FP error ≪ the 0.005 grid, so
            # round-at-own-width recovers the exact decimal sum (identity).
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # Arithmetic stays exact DECIMAL; the OUTPUT surfaces as double
            # (a DECIMAL column hash-fails the driver gate even when every
            # value is equal — Decimal('…0') vs float64 repr).
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# X14 — rollup / grouping sets
# --------------------------------------------------------------------------
@query(
    "q_agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# X15 — approximate distinct (HLL)
# --------------------------------------------------------------------------
@query(
    "q_agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS exact_parts,
           TRUE AS orders_within_10pct,
           TRUE AS parts_within_10pct
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB path where exact COUNT(DISTINCT)
    would shuffle every key. rsd=0.02 keeps the sketch small & mergeable
    (rsd 0.01 quadruples the register file for precision the 10% bound
    never needs — measured 8x slower per-row update).

    Oracle-checkable despite the approximation: HLL++ is deterministic
    (pure function of the value set), so the error-bound booleans are
    stable; the exact NDVs anchor the comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    within = lambda approx, exact: (  # noqa: E731
        F.abs(approx.cast("double") / exact.cast("double") - 1.0) < 0.10
    )
    # Two COUNT(DISTINCT x) in one aggregate plan an Expand (row
    # duplication per distinct column) before the shuffle — at changelog
    # scale that doubles the shuffled rows. Pre-dedup each (flag, key)
    # projection instead (partial-aggregates map-side) and join the two
    # 3-row results; the HLL sketches ride the first pass.
    def ndv(key: str, exact_alias: str) -> DataFrame:
        return (
            li.select("l_returnflag", key)
            .distinct()
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias(exact_alias))
        )

    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
    )
    agg = (
        approx.join(ndv("l_orderkey", "exact_orders"), "l_returnflag")
        .join(ndv("l_partkey", "exact_parts"), "l_returnflag")
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        within(F.col("approx_orders"), F.col("exact_orders")).alias(
            "orders_within_10pct"
        ),
        within(F.col("approx_parts"), F.col("exact_parts")).alias(
            "parts_within_10pct"
        ),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# X16 — filtered / conditional aggregation
# --------------------------------------------------------------------------
@query(
    "q_agg_conditional",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT) AS n_high_disc,
           round(sum(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END), 2) AS taxed_revenue,
           round(avg(CASE WHEN l_quantity < 25 THEN l_extendedprice END), 4) AS avg_small_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_high_disc"),
            F.round(
                F.sum(
                    F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(
                        0.0
                    )
                ),
                2,
            ).alias("taxed_revenue"),
            F.round(
                F.avg(F.when(F.col("l_quantity") < 25, F.col("l_extendedprice"))), 4
            ).alias("avg_small_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# X75 — multi-join analytic composition, TPC-H Q3 shape: 3-way join
# (customer ⋈ orders ⋈ lineitem) + grouped revenue + ordered top-k.
# Exercises Catalyst join reordering + AQE + TakeOrderedAndProject
# together — every other join query in the suite is a single pair.
# --------------------------------------------------------------------------
@query(
    "q_agg_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_agg_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 on the testdata schema (o_orderpriority standing in for
    o_shippriority). Scale shape: both filters reach the parquet scans
    (pushdown), lineitem — the fact — shuffles once on l_orderkey for
    the orders join, the customer join rides on AQE's strategy choice
    (shuffle at equal scale, broadcast when the segment filter makes the
    build side small), and the final top-10 is TakeOrderedAndProject
    over the 3-key partial agg — no global sort materializes. Revenue is
    exact DECIMAL per q_agg_q1's cross-engine rule, surfaced as double.
    Ties on revenue are broken by (o_orderdate, l_orderkey) so the
    LIMIT frontier is deterministic cross-engine."""
    cutoff = F.lit("1998-07-01 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey")
        )
        .limit(10)
    )


# --------------------------------------------------------------------------
# X75 — TPC-H Q5 shape: 6-way join with two broadcast dims, a
# star-constraint (customer and supplier share a nation), and a grouped
# revenue rollup. The multi-way broadcast-selection exercise.
# --------------------------------------------------------------------------
@query(
    "q_agg_q5",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_agg_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local-supplier revenue by nation. Scale shape: region
    filters FIRST and the region⋈nation⋈supplier prune chain broadcasts
    into the fact stream (explicit ``F.broadcast`` — all three are
    DIM_TABLES, tiny at any SF), so the dims contribute ZERO fact-side
    shuffles. The fact data re-keys exactly twice — the minimum for
    this query's join graph: once on the orderkey (lineitem ⋈ orders)
    and once on the custkey (⋈ customer, which at 100 TB scales with
    the fact and cannot broadcast); the c_nationkey = s_nationkey star
    constraint rides the broadcast join as a predicate, adding no key.
    The 25-group agg is two-phase (map-side partial). The plan test
    (tests/test_plans.py) pins the dims to BroadcastHashJoin and
    asserts no exchange ever partitions on a dim column."""
    cutoff_lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    cutoff_hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    li = load_table(spark, sf_dir, "lineitem")
    # dim prune chain stays driver-tiny: region(1) ⋈ nation ⋈ supplier
    asian_suppliers = (
        supplier.join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(asian_suppliers),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --------------------------------------------------------------------------
# X20 — global sort + limit (TakeOrderedAndProject)
# --------------------------------------------------------------------------
@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject: per-partition heap + driver
    merge of k rows, never a global sort — the only top-k that scales."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# X21 — set operations
# --------------------------------------------------------------------------
@query(
    "q_set_ops",
    oracle="""
    WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
         b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'union' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT * FROM a UNION SELECT * FROM b)
    UNION ALL
    SELECT 'union_all', CAST(COUNT(*) AS BIGINT)
      FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    UNION ALL
    SELECT 'intersect', CAST(COUNT(*) AS BIGINT)
      FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
    UNION ALL
    SELECT 'except', CAST(COUNT(*) AS BIGINT)
      FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    ORDER BY op
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")

    def counted(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        counted("union", a.unionByName(b).distinct())
        .unionByName(counted("union_all", a.unionByName(b)))
        .unionByName(counted("intersect", a.intersect(b)))
        .unionByName(counted("except", a.subtract(b)))
        .orderBy("op")
    )


# --------------------------------------------------------------------------
# X22 — exact deduplication (hash groupBy; min-id keeper policy)
# --------------------------------------------------------------------------
@query(
    "q_dedup_exact",
    oracle="""
    WITH dup AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
    )
    SELECT MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM dup
    GROUP BY text
    ORDER BY keep_id
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup as hash-aggregate (one shuffle on the dedup key, partial
    agg map-side). The input synthesizes duplicates deterministically since
    the documents table has none. At 100 TB, group on a hash of the text
    (q_multimodal_hash) instead of the full payload to shrink shuffle width.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return (
        dup.groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("keep_id", "dup_count")
        
    )


# --------------------------------------------------------------------------
# X89 — TPC-H Q18 shape: HAVING over a fact aggregate, semi-joined back
# into the detail join. Exercises agg-as-filter (the IN-subquery over
# GROUP BY/HAVING), which neither Q3 (plain multi-join) nor q_subquery
# (scalar/EXISTS decorrelation) covers.
# --------------------------------------------------------------------------
@query(
    "q_agg_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q_agg_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders (quantity sum > 300) with their
    customers. Scale shape: the HAVING aggregate runs as a two-phase
    partial agg over lineitem and reduces to a KEY LIST (l_orderkey
    only), which then semi-joins the fact stream — at any scale the
    qualifying-order set is tail-sized (p99 of order quantity is ~260),
    so AQE broadcasts it and the detail join never reshuffles on it.
    l_quantity is an integer-valued double, so sums are exact and the
    HAVING comparison is engine-stable; the top-100 frontier is made
    deterministic by the (o_totalprice, o_orderdate, o_orderkey)
    tiebreak. Measured plan: the key list broadcasts into a LeftSemi on
    the fact stream (no fact reshuffle for the filter), and the final
    detail shuffle is post-semi-join — already cut to the tail-sized
    qualifying rows — with map-side partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate"),
            F.col("o_orderkey"),
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# X119 — TPC-H Q13 shape: outer-join aggregation with the predicate in
# the ON clause (NOT the WHERE — moving it would drop zero-order
# customers), then a second aggregation over the first's output. The
# double-aggregation / count-distribution shape nothing else covers.
# --------------------------------------------------------------------------
@query(
    "q_agg_q13",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM per_cust
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def q_agg_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count (urgent
    orders excluded IN THE JOIN CONDITION, so customers with only
    urgent orders still appear with n_orders = 0 — the Q13 semantic
    trap). Scale shape: both sides shuffle once on the customer key —
    the per-customer COUNT reuses the join's hash partitioning (one
    exchange for join + first agg); the second aggregation's domain is
    the distinct order-count values (tail-bounded, ~max orders per
    customer), so it reduces to a handful of rows with map-side
    partials. ``count(o_orderkey)`` counts non-null matches only, which
    is exactly the outer-join zero-orders encoding."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )


# --------------------------------------------------------------------------
# X120 — TPC-H Q17 shape: correlated scalar AVG subquery, decorrelated
# into a per-key aggregate joined back onto the same stream. The
# below-average filter is rewritten to integer-exact decimal arithmetic
# (5 * qty * cnt < sum_qty  ⇔  qty < 0.2 * avg) so the comparison can
# never flip on a float ulp between engines.
# --------------------------------------------------------------------------
@query(
    "q_agg_q17",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_small_lots,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
                     AS DOUBLE) / 7.0 AS DECIMAL(18,4)) + 0.0
             AS avg_yearly
    FROM lineitem
    JOIN pq   USING (l_partkey)
    JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sum_qty
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q_agg_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 generalized to every brand: revenue locked up in
    small-lot line items (quantity below 20% of the part's average).
    Scale shape: the decorrelated per-part aggregate and the join-back
    both key on l_partkey, so Catalyst reuses ONE fact exchange for
    agg + self-join (no second fact shuffle); part joins on its own
    key after that (at 100 TB part scales with the fact — a shuffle
    join, NOT a broadcast; at test SF AQE may still pick broadcast,
    both are correct). The below-average predicate multiplies through
    by the count instead of dividing (5*qty*cnt < sum) — pure DECIMAL
    integer arithmetic, bit-identical in any engine and any partition
    order. avg_yearly rounds through DECIMAL(18,4) (+0.0 restores
    DOUBLE for the driver's canonicalizer)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(12,2)").alias("__qty"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("__price"),
    )
    pq = li.groupBy("l_partkey").agg(
        F.sum("__qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(pq, "l_partkey")
        .filter(F.col("__qty") * 5 * F.col("cnt") < F.col("sum_qty"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lots"),
            (
                (F.sum("__price").cast("double") / F.lit(7.0))
                .cast("decimal(18,4)")
                .cast("double")
            ).alias("avg_yearly"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# X121 — TPC-H Q22 shape: global scalar aggregate broadcast as a filter
# + NOT EXISTS anti join. Neither q_subquery (EXISTS) nor q_agg_q18
# (IN-list semi) covers the scalar-broadcast + anti-join combination.
# --------------------------------------------------------------------------
@query(
    "q_agg_q22",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS cutoff
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > cutoff
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_agg_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (dormancy variant): wealthy customers with no orders
    since 2000, by nation. Scale shape: the positive-balance average
    reduces to ONE row (DECIMAL-exact sum, so the cutoff is the same
    double in any engine/partitioning) and broadcasts into the filter —
    no shuffle. The NOT EXISTS is a left_anti join on the customer key;
    the orders side is date-filtered AT THE SCAN (pushdown) and
    projected to o_custkey only before the shuffle, so the anti join
    moves keys, not rows. The final per-nation rollup is ~25 groups,
    two-phase. (The date predicate replaces TPC-H's never-ordered
    test so the result is non-empty at every test SF — the plan shape
    is identical.)"""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("__bal"),
    )
    cutoff = (
        cust.filter(F.col("__bal") > 0.0)
        .agg(
            (F.sum("__bal").cast("double") / F.count(F.lit(1))).alias(
                "cutoff"
            )
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(cutoff))
        .filter(F.col("__bal") > F.col("cutoff"))
        .join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("__bal").cast("double").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# X162 — TPC-H Q7 shape: the SAME dimension in two different join
# roles (customer nation vs supplier nation), pair-inequality
# constraint, year rollup. Q5 constrains the nations EQUAL; Q7 wants
# the cross-border pairs — the role-aliasing shape nothing else covers.
# --------------------------------------------------------------------------
@query(
    "q_agg_q7",
    oracle="""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
      AND n1.n_regionkey = 1 AND n2.n_regionkey = 2
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    ORDER BY cust_nation, supp_nation, ship_year
    """,
)
def q_agg_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: cross-border trade volume between nation pairs
    (customer nation in region 1, supplier nation in region 2), by
    ship year.

    Scale shape: the SAME nation dimension joins twice in different
    ROLES — both broadcast (tiny at any SF), so the two role joins add
    ZERO fact shuffles; the fact stream re-keys exactly twice (the
    orderkey and custkey joins, q_agg_q5's minimum for this join
    graph), with the supplier join riding broadcast too. The
    pair-inequality and region predicates prune INSIDE the broadcast
    dimensions before they ever meet the stream. Revenue is exact
    DECIMAL per the q_agg_q1 rule."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        "l_extendedprice",
        "l_discount",
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.filter(F.col("n_regionkey") == 1).select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.filter(F.col("n_regionkey") == 2).select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .filter(F.col("nk1") != F.col("nk2"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


# --------------------------------------------------------------------------
# X184 — TPC-H Q21 shape: DOUBLE correlated quantifier — EXISTS plus
# NOT EXISTS against the SAME fact on the SAME key. The hardest
# decorrelation pattern in the TPC-H suite ("suppliers who kept orders
# waiting"): a row qualifies only relative to the full set of sibling
# rows in its order. q_subquery covers one EXISTS, q_agg_q22 one NOT
# EXISTS against a different table; Q21 needs both quantifiers over the
# same correlated domain at once.
# --------------------------------------------------------------------------
@query(
    "q_agg_q21",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL '90 days') AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    waiters AS (
      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM lo l1
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM lo l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lo l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.late)
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM waiters JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q_agg_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (waiting-orders variant): suppliers who were the SOLE
    late shipper on a multi-supplier order, ranked by how many orders
    they alone delayed. "Late" = shipped more than 90 days after the
    order date (this schema carries l_shipdate/o_orderdate, not
    receipt/commit — same predicate algebra).

    Decorrelation: the textbook plan runs the fact THREE times (outer
    + EXISTS semi + NOT-EXISTS anti, each a correlated scan). Here both
    quantifiers collapse into ONE per-order aggregate over the already
    order-keyed stream —

        n_supp      = count(DISTINCT supplier)          (EXISTS ⇔ ≥2)
        n_late_supp = count(DISTINCT supplier | late)   (NOT EXISTS ⇔ =1)

    — and because ``n_late_supp = 1`` pins the late supplier uniquely,
    ``min(supplier | late)`` RECOVERS the qualifying pair without ever
    joining back to the fact: the whole double-quantifier evaluates in
    a single exchange on l_orderkey (the same partitioning the
    orders-join already established, so Catalyst reuses it), followed
    by a ~supplier-sized rollup and a broadcast name join. The oracle
    states the literal correlated EXISTS / NOT EXISTS — a different
    formulation whose exact agreement certifies the decorrelation.
    Ties: (numwait DESC, s_name) is a total order (names unique), so
    LIMIT 10 is deterministic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
        F.min(F.when(F.col("late"), F.col("l_suppkey"))).alias("waiter"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.filter(
            (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(supp), F.col("waiter") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# --------------------------------------------------------------------------
# X185 — TPC-H Q20 shape: nested IN chain whose innermost predicate is
# a CORRELATED SCALAR AGGREGATE over the same fact with a different
# filter (supplier IN (... GROUP BY ... HAVING agg > f(correlated
# scalar agg))). q_agg_q17 decorrelates one scalar-avg; Q20 nests the
# scalar agg inside a grouped HAVING inside an IN — two quantifier
# layers deep.
# --------------------------------------------------------------------------
@query(
    "q_agg_q20",
    oracle="""
    WITH qual AS (
      SELECT l_suppkey,
             CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '2001-01-01'
                           THEN CAST(floor(l_quantity) AS BIGINT) END)
                  AS BIGINT) AS recent_qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 's%')
        AND l_shipdate >= TIMESTAMP '2001-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING 2 * sum(CAST(floor(l_quantity) AS BIGINT)) > (
        SELECT sum(CAST(floor(l2.l_quantity) AS BIGINT))
        FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
          AND l2.l_suppkey = lineitem.l_suppkey)
    )
    SELECT s_name,
           CAST(count(*) AS BIGINT) AS n_excess_parts,
           CAST(sum(recent_qty) AS BIGINT) AS total_recent_qty
    FROM qual JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY s_name
    """,
)
def q_agg_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (excess-stock variant): per supplier, the 's'-named
    parts for which MORE THAN HALF of that supplier's all-time shipped
    quantity moved in the final year — the "promotion candidate"
    surplus screen, restated for a schema without partsupp (the
    (l_partkey, l_suppkey) pair plays ps_*; availqty's role is played
    by the all-time quantity).

    Decorrelation: the correlated scalar aggregate (all-time quantity
    for the outer group's exact (part, supplier)) correlates on the
    SAME keys the outer GROUP BY uses — so both collapse into ONE
    conditional aggregate per (l_suppkey, l_partkey):

        recent = sum(qty | shipdate ≥ D)      (the outer HAVING sum)
        total  = sum(qty)                      (the correlated scalar)

    and the HAVING becomes the integer filter ``2·recent > total``
    (cross-multiplied — no 0.5, no float). A pair with no recent rows
    has recent = 0 and can never pass, which is exactly the IN
    semantics (the outer group wouldn't exist). One exchange on the
    pair key; the part name filter broadcast-semi-joins BEFORE the
    exchange so only candidate parts shuffle; supplier is a broadcast
    name join after. Quantities ride ``floor() → BIGINT`` on BOTH
    engines (DuckDB CAST rounds, Spark truncates — floor first, the
    q_mutual_info rule)."""
    part_s = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("s%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        "l_shipdate",
        F.floor(F.col("l_quantity")).cast("bigint").alias("qty"),
    )
    cutoff = F.lit("2001-01-01 00:00:00").cast("timestamp")
    pairs = (
        li.join(
            F.broadcast(part_s),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(F.col("l_shipdate") >= cutoff, F.col("qty"))).alias(
                "recent_qty"
            ),
            F.sum("qty").alias("total_qty"),
        )
        .filter(
            F.col("recent_qty").isNotNull()
            & (2 * F.col("recent_qty") > F.col("total_qty"))
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        pairs.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_excess_parts"),
            F.sum("recent_qty").alias("total_recent_qty"),
        )
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# X186 — TPC-H Q2 shape: correlated MIN over a MULTI-JOIN subquery
# (min-cost supplier within a region, the subquery itself a
# supplier⋈nation⋈region chain) + argmin recovery join-back. The
# deepest correlated-subquery join graph in TPC-H; q_agg_q17's scalar
# avg correlates over one table, Q2's scalar min correlates over four.
# --------------------------------------------------------------------------
@query(
    "q_agg_q2",
    oracle="""
    WITH eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    cost AS (
      SELECT l_partkey, l_suppkey,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cost_cents
      FROM lineitem
    )
    SELECT DISTINCT
           CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents,
           s_name, n_name, p_partkey, p_name, cost_cents
    FROM part
    JOIN cost ON p_partkey = l_partkey
    JOIN eu   ON l_suppkey = s_suppkey
    WHERE p_size <= 10
      AND cost_cents = (
        SELECT min(c2.cost_cents)
        FROM cost c2 JOIN eu e2 ON c2.l_suppkey = e2.s_suppkey
        WHERE c2.l_partkey = part.p_partkey)
    ORDER BY acctbal_cents DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def q_agg_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (min-cost-supplier variant): for every small part
    (p_size ≤ 10), the EUROPE supplier(s) who shipped it at the lowest
    price, wealthiest suppliers first. partsupp's role is played by
    per-line (l_partkey, l_suppkey, price); ps_supplycost by the line's
    price in exact integer cents.

    Decorrelation: the correlated scalar MIN ranges over a FOUR-table
    join (cost ⋈ supplier ⋈ nation ⋈ region) re-correlated per part.
    The region-restricted supplier set is computed ONCE (two broadcast
    dim joins — tiny at any SF) and reused for both the outer join and
    the min: the subquery then decorrelates into one groupBy(partkey).
    min(cost) over the region-filtered cost stream, and the argmin rows
    are RECOVERED by the (partkey, cost) equality join-back — agg and
    join-back share the l_partkey exchange (the q_agg_q17 reuse
    pattern), so the whole correlated-min costs ONE fact shuffle.
    Money crosses engines as integer cents (round(x·100) — prices have
    exactly 2 decimals, so the product sits next to an integer, never
    a .5 boundary). (acctbal_cents DESC, s_name, p_partkey) totally
    orders the ties Q2 famously returns, making LIMIT 100
    deterministic."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    eu = (
        supp.join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cost_cents"),
        )
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    min_cost = cost.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("cost_cents").alias("min_cents")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 10)
        .select("p_partkey", "p_name")
    )
    return (
        cost.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("cost_cents") == F.col("min_cents")),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.round(F.col("s_acctbal") * 100)
            .cast("bigint")
            .alias("acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "cost_cents",
        )
        .distinct()
        .orderBy(F.col("acctbal_cents").desc(), "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# X188 — TPC-H Q6 shape: the pure scan-predicate-aggregate (no join at
# all) — the query that measures nothing but pushdown + codegen + a
# 1-row global DECIMAL aggregate; the "speed of light" baseline every
# TPC-H run calibrates against.
# --------------------------------------------------------------------------
@query(
    "q_agg_q6",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_agg_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that would be gained by eliminating mid-band
    discounts on small lots in 1996.

    Scale shape: the entire query is scan → pushed predicates →
    map-side partial agg → 1-row final agg: every filter reaches
    PushedFilters (plan-tested), the scan reads 4 columns, and NOTHING
    shuffles except one scalar per partition. Forecast-revenue is the
    exact DECIMAL product sum (discounts are exact hundredths;
    extendedprice exact cents), so the double is bit-identical in any
    engine and partition order."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# X189 — TPC-H Q4 shape: EXISTS with a CORRELATED INEQUALITY (the semi
# join's condition references BOTH sides: l_shipdate > o_orderdate +
# 60d). q_join_semi_anti's semi join is pure-equality; Q4's correlated
# predicate must ride INTO the semi join itself.
# --------------------------------------------------------------------------
@query(
    "q_agg_q4",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL '60 days')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: 1997 orders with at least one slow line (shipped >60
    days after ordering), counted by priority — the order-priority
    checking query.

    Decorrelation: the EXISTS becomes one LEFT SEMI join whose
    condition carries BOTH the equi-key and the correlated inequality
    (Spark evaluates the inequality as the semi join's residual —
    one exchange per side on the order key, no second pass, no
    distinct needed since semi emits each order at most once).
    Both scans prune to 2 columns; the rollup is 5 groups,
    two-phase. The oracle states the literal correlated EXISTS."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# X190 — TPC-H Q12 shape: join + BINARY conditional counts (the
# urgent/non-urgent split of slow shipments) — the two-branch
# CASE-pivot inside one aggregate pass, nothing else.
# --------------------------------------------------------------------------
@query(
    "q_agg_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL '30 days'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-lateness variant): among lines shipped more
    than 30 days after ordering, how many belonged to urgent/high
    orders vs the rest — by return flag (this schema's stand-in for
    l_shipmode, which it does not carry).

    Scale shape: ONE fact⋈fact equi-join on the order key (the
    lateness inequality rides as the join residual — filtered before
    the aggregate ever sees a row), then a 3-group two-phase agg whose
    two branches are complementary CASE counts computed in the same
    pass — the canonical conditional-pivot; no second scan, no second
    shuffle. Counts are integers: nothing to round anywhere."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# X191 — TPC-H Q14 shape: join + RATIO-of-conditional-aggregates (promo
# revenue share) — the percent-of-total computed INSIDE one aggregate,
# kept in pure integers end to end.
# --------------------------------------------------------------------------
@query(
    "q_agg_q14",
    oracle="""
    WITH r AS (
      SELECT date_trunc('month', l_shipdate) AS mon,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_tt,
             (p_type = 'PROMO') AS promo
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT CAST(mon AS TIMESTAMP) AS mon,
           CAST(sum(CASE WHEN promo THEN rev_tt ELSE 0 END) AS BIGINT)
             AS promo_rev_tt,
           CAST(sum(rev_tt) AS BIGINT) AS total_rev_tt,
           CAST(sum(CASE WHEN promo THEN rev_tt ELSE 0 END) * 100000
                // sum(rev_tt) AS BIGINT) AS promo_share_hm
    FROM r GROUP BY mon ORDER BY mon
    """,
)
def q_agg_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: monthly share of revenue from PROMO-type parts in
    1997 — the promotion-effect monitor.

    Determinism: revenue rides in integer TEN-THOUSANDTHS of a dollar
    — cents × (100 − discount-hundredths), both factors exact integers
    (prices have 2 decimals, discounts are exact hundredths) — so the
    share is the INTEGER division promo·10⁵ div total
    (hundred-thousandths of the ratio ≈ thousandths of a percent): no
    float division, no 100·x/y rounding, no engine disagreement
    possible. The 10⁵ scale (not 10⁶) keeps the product comfortably
    inside int64 headroom at sf ≥ 1 monthly volumes. Scale shape: one
    fact shuffle for the part join (broadcast at test SF; at 100 TB
    part scales with the fact and the join keys co-partition), then a
    12-group two-phase conditional agg."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_tt = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    promo = F.col("p_type") == "PROMO"
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.date_trunc("month", "l_shipdate").alias("mon"),
            rev_tt.alias("rev_tt"),
            promo.alias("promo"),
        )
        .groupBy("mon")
        .agg(
            F.sum(F.when(F.col("promo"), F.col("rev_tt")).otherwise(0)).alias(
                "promo_rev_tt"
            ),
            F.sum("rev_tt").alias("total_rev_tt"),
        )
        .select(
            "mon",
            "promo_rev_tt",
            "total_rev_tt",
            F.expr("promo_rev_tt * 100000 div total_rev_tt").alias(
                "promo_share_hm"
            ),
        )
        .orderBy("mon")
    )


# --------------------------------------------------------------------------
# X192 — TPC-H Q10 shape: 4-table join + grouped revenue + TOP-N on the
# AGGREGATE (not a raw column) — returned-items customer ranking, the
# "who should we call about returns" query.
# --------------------------------------------------------------------------
@query(
    "q_agg_q10",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_agg_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in
    1997-H1.

    Scale shape: the fact stream re-keys twice (orderkey join, custkey
    join — the Q3/Q5 minimum for this join graph), nation broadcasts,
    and the top-20 runs as TakeOrderedAndProject over the grouped
    aggregate — per-partition heaps, never a global sort of the
    customer rollup. Revenue is the exact DECIMAL sum, so its double
    is partition-order-invariant and the DESC ranking cannot flip on
    an ulp; c_custkey breaks hypothetical ties to keep LIMIT 20 a
    total order."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# X193 — TPC-H Q15 shape: grouped aggregate → GLOBAL MAX over the
# aggregate → equality join-back (the top-supplier "view + where =
# (select max)" pattern) — argmax over an aggregate, ties kept.
# --------------------------------------------------------------------------
@query(
    "q_agg_q15",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS total_tt
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    ),
    m AS (SELECT max(total_tt) AS mx FROM rev)
    SELECT s_suppkey, s_name, total_tt
    FROM rev JOIN supplier ON l_suppkey = s_suppkey, m
    WHERE total_tt = mx
    ORDER BY s_suppkey
    """,
)
def q_agg_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the top supplier(s) by 1997-Q1 revenue — the
    CREATE VIEW + WHERE total = (SELECT max(total) FROM view) shape,
    which returns ALL maximal suppliers on a tie (unlike LIMIT 1).

    Decorrelation/scale shape: revenue per supplier is ONE two-phase
    agg in integer ten-thousandths (exact — see q_agg_q14); the
    supplier-sized rollup is PERSISTED so the scalar max and the
    equality filter read one materialization — without the cache each
    branch rescans the fact (Spark plans the two consumers
    independently; measured 2 lineitem scans), which at 100 TB doubles
    the dominant cost. The 1-row max then BROADCASTS back into the
    filter (q_agg_q22 cutoff pattern); supplier names join broadcast.
    Integer equality means tie membership is exact — no epsilon, no
    float max. Cache released via release_all_cached (bench/harness
    contract, operators/caching.py)."""
    from mysql_cdc_to_http_spark.operators.caching import register_cached

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev_tt = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    rev = (
        li.groupBy("l_suppkey").agg(F.sum(rev_tt).alias("total_tt")).persist()
    )
    mx = rev.agg(F.max("total_tt").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    out = (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_tt") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_tt")
        .orderBy("s_suppkey")
    )
    return register_cached(out, [rev])


# --------------------------------------------------------------------------
# X194 — TPC-H Q16 shape: NOT IN subquery (anti join on a filtered id
# list) + COUNT(DISTINCT) per group + ORDER BY the count — the
# supplier-diversity report.
# --------------------------------------------------------------------------
@query(
    "q_agg_q16",
    oracle="""
    SELECT p_brand, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO'
      AND p_size IN (1, 4, 7)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q_agg_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (supplier-diversity variant): how many distinct
    suppliers ship each (brand, size) of non-promo small parts,
    excluding suppliers in arrears (negative balance — this schema's
    stand-in for the complaints LIKE filter).

    Decorrelation: NOT IN over a non-nullable key list is a LEFT ANTI
    join against the (tiny, broadcast) excluded-supplier ids —
    evaluated BEFORE the aggregate so excluded suppliers never shuffle.
    (With a nullable subquery column NOT IN would need the three-valued
    null check — s_suppkey is a key, so anti join is exact.) The part
    predicate broadcast-joins and prunes at the scan; count(DISTINCT)
    is Spark's two-phase expand — keyed on (brand, size, suppkey),
    skew-free. Ordering by the count puts the aggregate itself in the
    sort key (Q16's signature), with (brand, size) completing the
    total order."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 4, 7)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


# --------------------------------------------------------------------------
# X195 — TPC-H Q19 shape: DISJUNCTIVE multi-band join predicate (three
# OR'd conjunction bands over part attrs × line quantity) — the shape
# that stresses predicate normalization: the join key must still be
# extracted from under the OR.
# --------------------------------------------------------------------------
@query(
    "q_agg_q19",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_agg_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: discounted revenue from three disjunctive
    brand/size/quantity bands — the OR-of-ANDs predicate that only
    qualifies a (part, line) PAIR, never either side alone.

    Scale shape: the equi-key (partkey) is conjunctive ABOVE the OR,
    so the join still plans as a hash join (broadcast at test SF) with
    the three bands as a residual filter — the catastrophic plan
    (nested-loop over the cross space because the OR hid the key) is
    what this shape exists to rule out; plan-tested. Part-side
    prefilter: p_size ≤ 15 covers every band, pushed to the part scan.
    Revenue is the exact DECIMAL sum (q_agg_q1 discipline)."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size").between(1, 15))
        .select("p_partkey", "p_brand", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# X196 — TPC-H Q8 shape: NATIONAL MARKET SHARE — a ratio of conditional
# aggregates over the LARGEST join graph in the suite (fact + orders +
# customer + two nation roles + supplier), numerator condition on a
# DIFFERENT dimension than the group key.
# --------------------------------------------------------------------------
@query(
    "q_agg_q8",
    oracle="""
    WITH t AS (
      SELECT year(o_orderdate) AS yr,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_tt,
             (s_nationkey = 7) AS is_target
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE cn.n_regionkey = 2
    )
    SELECT CAST(yr AS BIGINT) AS yr,
           CAST(sum(CASE WHEN is_target THEN rev_tt ELSE 0 END) AS BIGINT)
             AS target_rev_tt,
           CAST(sum(rev_tt) AS BIGINT) AS total_rev_tt,
           CAST(sum(CASE WHEN is_target THEN rev_tt ELSE 0 END) * 100000
                // sum(rev_tt) AS BIGINT) AS share_hm
    FROM t GROUP BY yr ORDER BY yr
    """,
)
def q_agg_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_7's market share — the fraction of revenue from
    purchases by region-2 customers that NATION_7's suppliers captured,
    per year.

    The Q8 signature: the GROUP key (year) comes from orders, the
    DENOMINATOR population from the customer-side region filter, and
    the NUMERATOR condition from the supplier side — three different
    tables feeding one conditional ratio. Scale shape: the fact
    re-keys twice (orderkey, custkey — the proven Q5/Q7 minimum);
    customer-nation and supplier both broadcast with their predicates
    pruned inside the build side; share rides the integer
    ten-thousandths + ·10⁵ div discipline of q_agg_q14 — the
    year-level ratio is exact integer arithmetic, never a float
    percent."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    cn = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 2)
        .select(F.col("n_nationkey").alias("cnk"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    rev_tt = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            rev_tt.alias("rev_tt"),
            (F.col("s_nationkey") == 7).alias("is_target"),
        )
        .groupBy("yr")
        .agg(
            F.sum(
                F.when(F.col("is_target"), F.col("rev_tt")).otherwise(0)
            ).alias("target_rev_tt"),
            F.sum("rev_tt").alias("total_rev_tt"),
        )
        .select(
            "yr",
            "target_rev_tt",
            "total_rev_tt",
            F.expr("target_rev_tt * 100000 div total_rev_tt").alias(
                "share_hm"
            ),
        )
        .orderBy("yr")
    )


# --------------------------------------------------------------------------
# X197 — TPC-H Q9 shape: PROFIT decomposition — revenue MINUS cost in
# one pass, grouped by a dimension attribute × year, with the cost side
# derived from a second fact-joined table; all-integer money.
# --------------------------------------------------------------------------
@query(
    "q_agg_q9",
    oracle="""
    WITH t AS (
      SELECT n_name AS nation, year(o_orderdate) AS yr,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
             - ((CAST(round(p_retailprice * 100) AS BIGINT) * 3) // 5)
               * CAST(floor(l_quantity) AS BIGINT) * 100 AS profit_tt
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN part     ON l_partkey = p_partkey
      WHERE p_name LIKE '%ar%'
    )
    SELECT nation, CAST(yr AS BIGINT) AS yr,
           CAST(sum(profit_tt) AS BIGINT) AS profit_tt,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM t GROUP BY nation, yr ORDER BY nation, yr
    """,
)
def q_agg_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-profit variant): per supplier nation × year,
    the profit on parts whose name contains 'ar' — discounted revenue
    minus unit cost × quantity. partsupp's ps_supplycost is played by
    60% of retail price, computed as the INTEGER (retail_cents·3) div 5
    so "60%" is an exact deterministic integer, not a float multiply.

    Scale shape: the fact re-keys once on orderkey (year source) —
    supplier, nation, and the name-filtered part all broadcast; profit
    is assembled per ROW in ten-thousandths (revenue exact per
    q_agg_q14; cost = unit-cents × integer qty × 100) and summed in
    one two-phase agg over ~25 nations × 7 years. The LIKE filter
    prunes part INSIDE the broadcast build side."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%ar%"))
        .select("p_partkey", "p_retailprice")
    )
    rev_tt = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    unit_cost_cents = F.expr(
        "(cast(round(p_retailprice * 100) as bigint) * 3) div 5"
    )
    cost_tt = (
        unit_cost_cents
        * F.floor(F.col("l_quantity")).cast("bigint")
        * F.lit(100)
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
            (rev_tt - cost_tt).alias("profit_tt"),
        )
        .groupBy("nation", "yr")
        .agg(
            F.sum("profit_tt").alias("profit_tt"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("nation", "yr")
    )


# --------------------------------------------------------------------------
# X198 — TPC-H Q11 shape: grouped value vs a FRACTION-OF-GLOBAL-TOTAL
# threshold (HAVING sum(...) > 1/2000 × (SELECT sum(...))) — the
# "important stock" screen; scalar-broadcast + integer cross-multiply.
# --------------------------------------------------------------------------
@query(
    "q_agg_q11",
    oracle="""
    WITH stock AS (
      SELECT l_partkey,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT)
                      * CAST(round(p_retailprice * 100) AS BIGINT))
                  AS BIGINT) AS val_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(sum(val_cents) AS BIGINT) AS total FROM stock)
    SELECT l_partkey AS partkey, val_cents
    FROM stock, tot
    WHERE val_cents * 2000 > total
    ORDER BY val_cents DESC, partkey
    """,
)
def q_agg_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important-stock variant): parts whose shipped value
    (quantity × retail cents — the partsupp availqty×supplycost analog)
    exceeds 1/2000 of the whole corpus's shipped value.

    Decorrelation: the correlated-looking threshold is a GLOBAL scalar
    — computed once over the same grouped rollup (PERSISTED, so the
    total reads the cached part-sized rollup instead of rescanning the
    fact — the q_agg_q15 double-scan fix), reduced to one row,
    broadcast into the filter (q_agg_q22's cutoff pattern); the
    fraction comparison cross-multiplies to the integer
    ``val·2000 > total`` — no 0.0005, no float threshold. Scale shape:
    one fact exchange on partkey for the rollup (part broadcasts its
    price in); the threshold pass and final sort run over the
    part-sized rollup only. Ordering by (val_cents DESC, partkey)
    totally orders ties."""
    from mysql_cdc_to_http_spark.operators.caching import register_cached

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    )
    val = (
        F.floor(F.col("l_quantity")).cast("bigint")
        * F.round(F.col("p_retailprice") * 100).cast("bigint")
    )
    stock = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("val_cents"))
        .persist()
    )
    tot = stock.agg(F.sum("val_cents").alias("total"))
    out = (
        stock.crossJoin(F.broadcast(tot))
        .filter(F.col("val_cents") * 2000 > F.col("total"))
        .select(F.col("l_partkey").alias("partkey"), "val_cents")
        .orderBy(F.col("val_cents").desc(), "partkey")
    )
    return register_cached(out, [stock])


def _schema_evolution_cache(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a two-epoch parquet dataset once per sf_dir: epoch 1
    (even orderkeys) was written BEFORE the o_orderpriority column
    existed; epoch 2 (odd orderkeys) carries it. The on-disk shape a
    long-lived ingestion layout actually develops as producers add
    columns."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(tempfile.gettempdir(), "spark_graft_schemaevo", tag)
    data = os.path.join(out, "data")
    # ADVICE r8: build-then-atomic-publish. The old check-_done-then-
    # write-in-place form let a concurrent session (parallel pytest /
    # bench) read epoch dirs mid-overwrite. Now each builder stages into
    # its own mkdtemp and os.replace()s the COMPLETE tree into place —
    # readers only ever see a fully-written dataset; the losing builder
    # of a race just discards its staging copy.
    done = os.path.join(data, "epoch=2", "_SUCCESS")
    if not os.path.exists(done):
        orders = load_table(spark, sf_dir, "orders")
        os.makedirs(out, exist_ok=True)
        stage = tempfile.mkdtemp(prefix="_stage_", dir=out)
        orders.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        ).write.mode("overwrite").parquet(os.path.join(stage, "epoch=1"))
        orders.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ).write.mode("overwrite").parquet(os.path.join(stage, "epoch=2"))
        try:
            os.rename(stage, data)  # atomic publish; fails if we lost a race
        except OSError:
            # Trust the winner only if its tree is COMPLETE (last epoch's
            # _SUCCESS present — round-9 advice); else evict the partial
            # and retry the swap once.
            if os.path.exists(done):
                shutil.rmtree(stage, ignore_errors=True)
            else:
                try:
                    old = tempfile.mkdtemp(prefix="_old_", dir=out)
                    os.rename(data, os.path.join(old, "x"))
                    shutil.rmtree(old, ignore_errors=True)
                    os.rename(stage, data)
                except OSError:
                    shutil.rmtree(stage, ignore_errors=True)
                    # Retry can fail for a non-race reason (EXDEV, perms)
                    # AFTER the partial tree was renamed away — verify the
                    # publish landed; re-raise instead of returning a path
                    # that may no longer exist (round-10 advice).
                    if not os.path.exists(done):
                        raise
    return data


# --------------------------------------------------------------------------
# X204 — schema evolution across file epochs: mergeSchema read of a
# dataset whose later files added a column. Without an explicit merged
# read, parquet's footer-of-first-file schema silently DROPS the new
# column — the classic long-lived-ingestion failure mode (pinned
# negatively in tests/test_catalog.py).
# --------------------------------------------------------------------------
@query(
    "q_schema_evolution",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS pri,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY 1
    ORDER BY pri NULLS FIRST
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the two-epoch dataset with ``mergeSchema=true`` and
    aggregate by the LATE-ADDED column: epoch-1 rows (written before
    o_orderpriority existed) surface as NULL priority — present,
    grouped, never dropped — while epoch-2 rows group normally. The
    oracle reconstructs the same logical result from the source table
    (epoch membership is orderkey parity), so the hash certifies the
    merged read end-to-end: schema union, NULL back-fill, and exact
    integer-cents totals.

    Scale shape: mergeSchema costs one footer read PER FILE at planning
    (fine for epoch-partitioned layouts; for 10⁶-file datasets pin the
    unified schema explicitly via ``schema(...)`` — same result, no
    footer sweep, and that exact contrast plus the silent-drop default
    is pinned in tests/test_catalog.py). The aggregate itself is the
    ordinary two-phase hash shape."""
    data_dir = _schema_evolution_cache(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(data_dir)
    return (
        merged.groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("total_cents"),
        )
        .orderBy(F.asc_nulls_first("pri"))
    )


# --------------------------------------------------------------------------
# X252 — ORC source round-trip (completes the batch-format matrix:
# parquet X1, CSV/JSON X2, ORC here — Spark's native ORC reader is
# the other columnar production format, with the same
# pushdown/pruning contract as parquet). lineitem is materialized to
# ORC once per sf_dir (staged _done-marker write, the
# _text_format_cache discipline), then a Q6-shaped filter+aggregate
# runs AGAINST THE ORC COPY while the oracle reads the parquet
# source of truth — parity certifies the round-trip is lossless
# (timestamps, decimals-as-doubles, every predicate cell included),
# not just that ORC parses. Predicate pushdown into the ORC scan is
# pinned in tests/test_plans.py.
# --------------------------------------------------------------------------
def _orc_cache(spark: SparkSession, sf_dir: str) -> str:
    # Stage-then-atomic-rename (r11 ADVICE): the r11 form wrote the ORC
    # copy straight into the final dir, so two concurrent sessions (or a
    # crash between write and _done with a concurrent reader) raced on
    # the same path. Same discipline as _schema_evolution_cache: build
    # into a private mkdtemp, publish with one os.rename, verify on a
    # lost race via the write's own _SUCCESS marker.
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(tempfile.gettempdir(), "spark_graft_orcfmt", tag)
    orc_dir = os.path.join(out, "lineitem_orc")
    done = os.path.join(orc_dir, "_SUCCESS")
    if not os.path.exists(done):
        os.makedirs(out, exist_ok=True)
        stage = tempfile.mkdtemp(prefix="_stage_", dir=out)
        staged = os.path.join(stage, "lineitem_orc")
        load_table(spark, sf_dir, "lineitem").write.mode(
            "overwrite"
        ).orc(staged)
        try:
            os.rename(staged, orc_dir)
            shutil.rmtree(stage, ignore_errors=True)
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)
            if not os.path.exists(done):
                # Lost the race to an INCOMPLETE tree (or rename failed
                # outright) — surface it rather than return a path a
                # reader may see half-written.
                raise
    return orc_dir


@query(
    "q_scan_orc",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(l_linenumber) AS BIGINT) AS chk
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X252 — Q6 over the ORC copy of lineitem: the oracle reads the
    parquet source of truth, so hash parity certifies a lossless
    parquet→ORC→engine round-trip of every cell the query touches.

    Scale shape: identical to q_agg_q6 — scan with pushed predicates
    (ORC supports the same PushedFilters/ReadSchema contract,
    plan-pinned), 4 columns read, map-side partial agg, one scalar
    per partition shuffled. The revenue sum is the exact DECIMAL
    product (bit-identical in any engine/partition order — Q6's
    argument). Reference analog: none (main.go reads only its binlog
    feed; no batch formats).
    """
    orc_dir = _orc_cache(spark, sf_dir)
    li = spark.read.orc(orc_dir)
    return (
        li.filter(
            (
                F.col("l_shipdate")
                >= F.lit("1996-01-01 00:00:00").cast("timestamp")
            )
            & (
                F.col("l_shipdate")
                < F.lit("1997-01-01 00:00:00").cast("timestamp")
            )
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("l_linenumber").cast("long").alias("chk"),
        )
    )

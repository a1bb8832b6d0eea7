"""Join family: inner/outer/semi/anti/range/as-of/cross (SURVEY.md §2.3
X7-X12).

Scale strategy per join:
- fact ⋈ fact (orders⋈lineitem): sort-merge with AQE skew splitting.
- fact ⋈ dim (anything ⋈ region/nation/supplier/part): explicit
  ``F.broadcast`` — removes the shuffle entirely.
- range join against a tiny band table: broadcast nested-loop — the band
  side is O(10) rows, so BNLJ is the *right* physical plan, not a fallback.
- as-of join: union + window (single shuffle on the partition key), never
  a theta join — a theta-join as-of is quadratic per key at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.operators.asof import asof_join
from mysql_cdc_to_http_spark.queries.registry import query


# --------------------------------------------------------------------------
# X7 — inner equi-join
# --------------------------------------------------------------------------
@query(
    "q_join_inner",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# X8 — outer joins (left + full in one plan)
# --------------------------------------------------------------------------
@query(
    "q_join_outer",
    oracle="""
    SELECT n_nationkey, n_name,
           CAST(COALESCE(cn.n_cust, 0) AS BIGINT) AS n_cust,
           CAST(COALESCE(sn.n_supp, 0) AS BIGINT) AS n_supp
    FROM nation
    LEFT JOIN (SELECT c_nationkey, COUNT(*) AS n_cust
               FROM customer GROUP BY c_nationkey) cn
      ON n_nationkey = cn.c_nationkey
    FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp
               FROM supplier GROUP BY s_nationkey) sn
      ON n_nationkey = sn.s_nationkey
    ORDER BY n_nationkey
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust_per_nation = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp_per_nation = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        nation.join(cust_per_nation, nation.n_nationkey == cust_per_nation.c_nationkey, "left")
        .join(supp_per_nation, nation.n_nationkey == supp_per_nation.s_nationkey, "full")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        )
        .orderBy("n_nationkey")
    )


# --------------------------------------------------------------------------
# X9 — semi / anti joins
# --------------------------------------------------------------------------
@query(
    "q_join_semi_anti",
    oracle="""
    SELECT 'no_orders' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'with_orders', CAST(COUNT(*) AS BIGINT)
      FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    ORDER BY bucket
    """,
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    semi = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    anti = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")

    def counted(bucket: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(bucket).alias("bucket"), "n"
        )

    return counted("no_orders", anti).unionByName(counted("with_orders", semi)).orderBy(
        "bucket"
    )


# --------------------------------------------------------------------------
# X10 — range (theta) join against a tiny derived band table
# --------------------------------------------------------------------------
@query(
    "q_join_range",
    oracle="""
    WITH bands AS (
      SELECT r_regionkey AS band_id,
             r_regionkey * 100.0 AS lo,
             (r_regionkey + 1) * 100.0 AS hi
      FROM region
    )
    SELECT band_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band_id
    ORDER BY band_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join: the band side is O(#regions) rows, so broadcast
    nested-loop is the correct physical plan at any scale."""
    events = load_table(spark, sf_dir, "events")
    bands = (
        load_table(spark, sf_dir, "region")
        .select(
            F.col("r_regionkey").alias("band_id"),
            (F.col("r_regionkey") * 100.0).alias("lo"),
            ((F.col("r_regionkey") + 1) * 100.0).alias("hi"),
        )
    )
    cond = (events.value >= bands.lo) & (events.value < bands.hi)
    return (
        events.join(F.broadcast(bands), cond, "inner")
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("band_id")
    )


# --------------------------------------------------------------------------
# X11 — as-of join (latest prior click per purchase, same user)
# --------------------------------------------------------------------------
@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id, MAX(c.ts) AS last_click_ts
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of via union+window (operators/asof.py) — one shuffle on user_id,
    linear per key; the oracle's theta-join form is quadratic per key and
    exists only to define the semantics."""
    events = load_table(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts"), F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_ts"],
    )
    return joined.select(
        "event_id", F.col("click_ts").alias("last_click_ts")
    )


# --------------------------------------------------------------------------
# X12 — cross join (small dims)
# --------------------------------------------------------------------------
@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(nation).orderBy("r_name", "n_name")


# --------------------------------------------------------------------------
# X90 — as-of join with tolerance (pandas merge_asof parity)
# --------------------------------------------------------------------------
@query(
    "q_join_asof_tolerance",
    oracle="""
    SELECT p.event_id, MAX(c.ts) AS last_click_ts
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 6 HOUR
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with staleness bound: last click BEFORE each purchase, but
    only if within 6 hours — older matches null out (pandas merge_asof
    ``tolerance`` semantics; the latest-prior row either qualifies or
    nothing does, since earlier rows are staler still — which is why the
    oracle's interval-bounded MAX is equivalent). Tolerance is applied
    to the carried match inside the same single window pass as plain
    as-of: zero additional shuffles (operators/asof.py)."""
    events = load_table(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts"), F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_ts"],
        tolerance="6 hours",
    )
    return joined.select(
        "event_id", F.col("click_ts").alias("last_click_ts")
    )


# --------------------------------------------------------------------------
# Bloom-prefiltered join (explicit runtime-filter pattern)
# --------------------------------------------------------------------------
@query(
    "q_join_bloom",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1 ORDER BY 1
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-bitmap-prefiltered dimension join (operators/sketches.py:
    bloom_bitmap / bloom_prefilter): the BUILDING-segment customer keys
    reduce to a ≤16 KiB word/mask bitmap (two-phase bit_or aggregate),
    which broadcasts onto the orders scan and drops non-member rows
    BEFORE the exact customer join sees them. False positives survive
    the bitmap but die in the exact join, and false negatives are
    impossible — so the composed result EQUALS the plain join and the
    oracle is the plain SQL (the explicit form of Spark's runtime
    bloom-filter injection, for plans the optimizer can't see through
    or filters reused across queries).

    Scale: at 100 TB the orders stream reaches the join shuffle already
    cut to ~the segment's selectivity; the bitmap is O(m_bits) bytes
    independent of dimension cardinality, so it broadcasts at any
    scale where a key-list broadcast would not. Price sums ride DECIMAL
    (q_agg_q1 discipline); counts are integers — parity is exact."""
    from mysql_cdc_to_http_spark.operators.sketches import (
        bloom_bitmap,
        bloom_prefilter,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    bitmap = bloom_bitmap(cust.select("c_custkey"), "c_custkey")
    pruned = bloom_prefilter(orders, "o_custkey", bitmap)
    return (
        pruned.join(cust, pruned.o_custkey == cust.c_custkey)
        .groupBy(
            F.date_trunc("MONTH", F.col("o_orderdate"))
            .cast("date")
            .alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("order_month")
    )


# --------------------------------------------------------------------------
# X122 — binned interval-overlap join: both sides LARGE, so the
# broadcast-nested-loop of q_join_range is not available. The bin trick
# (operators/intervals.py) converts overlap into a shuffled equi-join.
# Fixture: user sessions × ±5-minute windows around error events —
# "which users were active near an error burst".
# --------------------------------------------------------------------------
@query(
    "q_join_interval_bin",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM marked
    ),
    ivl AS (
      SELECT user_id, sess_id,
             epoch_us(MIN(ts)) AS ls, epoch_us(MAX(ts)) AS le
      FROM sess GROUP BY user_id, sess_id
    ),
    err AS (
      SELECT epoch_us(ts) - 300000000 AS rs,
             epoch_us(ts) + 300000000 AS re
      FROM events WHERE event_type = 'error'
    ),
    pairs AS (
      SELECT user_id,
             least(le, re) - greatest(ls, rs) AS ov
      FROM ivl JOIN err ON ls <= re AND rs <= le
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(sum(ov) AS BIGINT) AS overlap_us
    FROM pairs GROUP BY user_id ORDER BY user_id
    """,
)
def q_join_interval_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users active near error bursts: session intervals overlap-joined
    against ±5-min windows around every error event, per-user overlap
    count and total overlapped time.

    Scale shape: NEITHER side is broadcast-able at 100 TB (sessions
    scale with users×activity, error windows with traffic), so the
    overlap join runs as the binned equi-join of
    ``operators/intervals.py:overlap_bin_join`` — 10-minute bins,
    explode-replication bounded by span/width+1 (~2 bins for a 10-min
    error window; sessions are typically shorter), one hash shuffle on
    the bin id, exact predicate re-check, and the first-bin emission
    rule instead of a dedup pass. The DuckDB oracle runs the plain
    O(n·m) overlap join (its IEJoin handles oracle scale), proving the
    binned composition EXACTLY equals the naive semantics. All interval
    math is integer epoch-micros. The session CTE is q_sessionize's
    oracle verbatim, so session boundaries carry that query's parity."""
    from mysql_cdc_to_http_spark.operators.intervals import overlap_bin_join
    from mysql_cdc_to_http_spark.streaming.windows import sessionize_batch

    events = load_table(spark, sf_dir, "events")
    sess = sessionize_batch(events, gap_minutes=30).select(
        "user_id",
        F.unix_micros("sess_start").alias("ls"),
        F.unix_micros("sess_end").alias("le"),
    )
    err = (
        events.filter(F.col("event_type") == "error")
        .select(
            (F.unix_micros("ts") - 300_000_000).alias("rs"),
            (F.unix_micros("ts") + 300_000_000).alias("re"),
        )
    )
    pairs = overlap_bin_join(
        sess, err, "ls", "le", "rs", "re", bin_width=600_000_000
    )
    ov = F.least("le", "re") - F.greatest("ls", "rs")
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.sum(ov).cast("bigint").alias("overlap_us"),
        )
        
    )

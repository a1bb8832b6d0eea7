"""Window functions: ranking, analytic (lag/lead/first/last), frames
(SURVEY.md §2.3 X17-X19).

A window = one shuffle on the partition key + per-partition sort. All
orderings below include a unique tiebreak column so results are
deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.queries.registry import query


# --------------------------------------------------------------------------
# X17 — ranking functions, top-3 per group
# --------------------------------------------------------------------------
@query(
    "q_window_rank",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rn, rnk, drnk, nt
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(ROW_NUMBER() OVER w AS INT) AS rn,
             CAST(RANK()       OVER w AS INT) AS rnk,
             CAST(DENSE_RANK() OVER w AS INT) AS drnk,
             CAST(NTILE(4)     OVER w AS INT) AS nt
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    )
    WHERE rn <= 3
    ORDER BY c_nationkey, rn
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("nt"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    )


# --------------------------------------------------------------------------
# X18 + X19 — analytic functions (lag / lead / first) + window frames
# (running sum, moving average). One query (same window key over
# ``events``) so every §2 operator fits the driver's 50-entry window —
# and one WindowExec instead of two.
# --------------------------------------------------------------------------
@query(
    "q_window_lag_frames",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER w AS first_value_u,
           round(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum,
           round(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS frame_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
    """,
)
def q_window_lag_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = W.partitionBy("user_id").orderBy("ts", "event_id")
    running = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    moving = base.rowsBetween(-2, W.currentRow)
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(base).alias("prev_value"),
        F.lead("value").over(base).alias("next_value"),
        F.first("value").over(base).alias("first_value_u"),
        F.round(F.sum("value").over(running), 2).alias("running_sum"),
        F.round(F.avg("value").over(moving), 4).alias("moving_avg"),
        F.count(F.lit(1)).over(moving).alias("frame_n"),
    )


# --------------------------------------------------------------------------
# X91 — event-time RANGE frame: rolling 7-day per-user aggregates.
# The one frame kind X18/X19 (rows frames) don't cover: the frame edge
# is an INTERVAL in event time, so peers at equal ts share a frame and
# gaps wider than the interval empty it — semantics rows-frames can't
# express.
# --------------------------------------------------------------------------
@query(
    "q_window_rolling_time",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_7d,
           round(sum(value) OVER w, 6) AS sum_7d
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def q_window_rolling_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day purchase count/value per user via an event-time
    RANGE frame. Scale shape: one shuffle on user_id, then a per-key
    linear two-pointer pass over the sorted partition (Spark's range
    frame is O(n) per key, not O(n·frame)); output is purchase-sized.
    RANGE peers (equal ts) share a frame on both engines, so no
    tiebreak is needed for determinism; 6-dp round absorbs the
    engines' differing in-frame summation orders."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    ev.createOrReplaceTempView("__rolling_ev")
    return spark.sql(
        """
        SELECT event_id, user_id,
               CAST(count(*) OVER w AS BIGINT) AS n_7d,
               round(sum(value) OVER w, 6) AS sum_7d
        FROM __rolling_ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                               AND CURRENT ROW)
        """
    )

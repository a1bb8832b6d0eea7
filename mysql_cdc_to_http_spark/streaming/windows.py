"""Event-time windowed aggregations (SURVEY X28-X32).

Pure plan builders — they accept either a batch or streaming DataFrame
(same Catalyst plan; streaming adds state management). Watermarks bound
state size: at 100 TB/day of events the unbounded-state variant of any of
these would OOM; every streaming query in the engine therefore takes a
``watermark`` argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "5 minutes",
    group_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    """X28: non-overlapping fixed windows; one state entry per
    (window, group)."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        df.groupBy(F.window(ts_col, width).alias("win"), group_col)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            group_col,
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    group_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    """X29: overlapping windows — each event lands in width/slide windows."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("win"), group_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            group_col,
            "n",
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """X30: gap-based sessions per key (session_window merges adjacent
    state — streaming requires a watermark to close sessions)."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("sess_start"),
            F.col("win.end").alias("sess_end"),
            key_col,
            "n_events",
        )
    )


def sessionize_batch(
    events: DataFrame,
    ts_col: str = "ts",
    gap_minutes: int = 30,
    key_col: str = "user_id",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization via lag + cumulative gap count — the
    oracle-expressible twin of ``session_counts`` (same session
    boundaries), one window shuffle on the key."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(ts_col).over(w)
    new_sess = (
        F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_s
    ).cast("int")
    sess_id = F.sum(F.coalesce(new_sess, F.lit(1))).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        events.withColumn("sess_id", sess_id)
        .groupBy(key_col, "sess_id")
        .agg(
            F.min(ts_col).alias("sess_start"),
            F.max(ts_col).alias("sess_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )

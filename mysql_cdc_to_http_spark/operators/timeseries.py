"""Time-series operators: resample to fixed buckets, dense spine
generation, gap filling with forward fill.

The hypertable-rollup shape: raw events aggregate to (key, bucket) —
a two-phase hash agg whose shuffle is bucket-table-sized, not
event-sized — and downstream consumers need a DENSE series (one row per
bucket even where nothing happened) with carried-forward values. The
spine is generated per key from its own [min, max] bucket range
(sequence+explode — rows = keys × buckets, tiny next to the raw data),
the observed aggregate joins back on (key, bucket), and the forward
fill is a bounded window per key ordered by bucket.

At 100 TB the only event-scale stage is the first aggregate; everything
after operates on the rollup. For unbounded streams the same bucket agg
runs under a watermark (streaming/windows.py) and the fill runs on the
materialized rollup table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window as W


def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    aggs: dict[str, Column],
    unit: str = "hour",
) -> DataFrame:
    """Fixed-bucket rollup: (key, date_trunc(unit, ts)) → aggregates.
    ``aggs`` maps output name → aggregate Column."""
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket_ts")
    return (
        df.groupBy(F.col(key_col), bucket)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )


def dense_spine(
    resampled: DataFrame, key_col: str, step: str = "interval 1 hour"
) -> DataFrame:
    """One row per (key, bucket) over each key's own observed range —
    keys × buckets rows, generated without touching raw data."""
    return (
        resampled.groupBy(key_col)
        .agg(
            F.min("bucket_ts").alias("__lo"), F.max("bucket_ts").alias("__hi")
        )
        .select(
            key_col,
            F.explode(
                F.expr(f"sequence(__lo, __hi, {step})")
            ).alias("bucket_ts"),
        )
    )


def fill_gaps(
    resampled: DataFrame,
    key_col: str,
    count_cols: list[str],
    ffill_cols: list[str],
    lerp_cols: list[str] | None = None,
    step: str = "interval 1 hour",
) -> DataFrame:
    """Densify a rollup: join it onto its spine, zero-fill counts,
    forward-fill carried values (last non-null earlier bucket per key),
    linearly interpolate ``lerp_cols`` between the surrounding observed
    buckets (edges fall back to the nearest observed value), and flag
    synthesized rows with ``is_gap``. Every fill window is per-key
    ordered by bucket — bounded by buckets-per-key, never event-scale.

    Interpolation is deterministic cross-engine: the fraction is a
    ratio of exact epoch-second integers and both neighbors are values
    both engines already agree on, so ``prev + (next-prev)·frac`` is
    the identical IEEE expression on identical inputs."""
    overlap = set(ffill_cols) & set(lerp_cols or [])
    if overlap:  # ffill mutates in place; lerp would then see filled rows
        raise ValueError(f"columns in both ffill and lerp: {sorted(overlap)}")
    spine = dense_spine(resampled, key_col, step)
    joined = spine.join(
        resampled.withColumn("__observed", F.lit(1)),
        [key_col, "bucket_ts"],
        "left",
    )
    back = (
        W.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    out = joined
    for c in count_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    for c in ffill_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(back))
    for c in lerp_cols or []:
        # Anchor timestamps come from the SAME rows as the anchor values:
        # buckets where THIS column is non-null. An observed bucket
        # carrying a NULL in the lerp column must not move the anchor, or
        # the fraction desynchronizes from the value endpoints.
        obs_ts = F.when(F.col(c).isNotNull(), F.col("bucket_ts"))
        prev_v = F.last(F.col(c), ignorenulls=True).over(back)
        next_v = F.first(F.col(c), ignorenulls=True).over(fwd)
        prev_t = F.unix_timestamp(F.last(obs_ts, ignorenulls=True).over(back))
        next_t = F.unix_timestamp(F.first(obs_ts, ignorenulls=True).over(fwd))
        frac = (F.unix_timestamp("bucket_ts") - prev_t) / (next_t - prev_t)
        out = out.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(next_v.isNull(), prev_v)
            .when(prev_v.isNull(), next_v)
            .otherwise(prev_v + (next_v - prev_v) * frac),
        )
    return out.withColumn(
        "is_gap", F.col("__observed").isNull()
    ).drop("__observed")


def ohlc_bars(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bucket_expr,
    group_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Downsample a tick stream to OHLC bars — one row per (group,
    bucket) with open/high/low/close/n/volume. The financial-data
    counterpart of resample_locf: a single two-phase hash aggregate
    (map-side partials carry 6 scalars per bar), no window, no sort —
    the only plan that survives a 100 TB tick table.

    open/close use ``min_by``/``max_by`` with a (ts, tiebreak)
    STRUCT ordering key, so they are deterministic even if two ticks
    share a timestamp; high/low are plain min/max. ``volume`` sums
    through DECIMAL(18,2) and casts back to double — exact for
    2-decimal tick values at any cardinality/partitioning (the
    q_agg_q1 discipline), where a double sum would drift by
    partitioning."""
    group_cols = group_cols or []
    order_key = (
        F.struct(F.col(ts_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.col(ts_col)
    )
    v = F.col(value_col)
    return (
        df.groupBy(*group_cols, bucket_expr.alias("bar_ts"))
        .agg(
            F.min_by(v, order_key).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order_key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(v.cast("decimal(18,2)")).cast("double").alias("volume"),
        )
        .orderBy(*group_cols, "bar_ts")
    )


def time_decay_agg(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    half_life_s: float,
) -> DataFrame:
    """Half-life-decayed per-group aggregate — the feature-store
    recency feature: sum of value * 0.5^((t_last - t)/half_life),
    anchored at each group's OWN last event (so the feature is a pure
    function of the group's history, reproducible at training time).

    Plan shape: one window max over the group key, then a group-by on
    the SAME key — Catalyst reuses the window's hash partitioning, so
    the fact stream shuffles ONCE; per-row decay weights are a codegen
    projection. (The naive two-pass — agg maxes, join back — shuffles
    the stream twice.)

    Output: (group, n_events, last_ts, decayed_sum 6dp). The 6-dp round
    absorbs libm pow ulps (decay weights are the only transcendental;
    their arguments are identical IEEE doubles in any engine: timestamp
    → double seconds, one subtraction, one division)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col)
    t = F.col(ts_col).cast("double")
    t_last = F.max(t).over(w)
    decayed = F.col(value_col) * F.pow(
        F.lit(0.5), (t_last - t) / F.lit(float(half_life_s))
    )
    return (
        df.withColumn("__dv", decayed)
        .withColumn("__tl", t_last)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("last_ts"),
            F.round(F.sum("__dv"), 6).alias("decayed_sum"),
        )
    )

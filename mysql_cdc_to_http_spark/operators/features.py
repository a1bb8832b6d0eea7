"""Feature-engineering operators for training pipelines: per-group
feature normalization (z-score / min-max), fixed-edge distribution
binning, and PSI drift detection between two corpus slices.

Scale design
------------
All three operators follow the same two-phase shape: a map-combinable
aggregate produces a MODEL-SIZED stats table (one row per group / per
bin — bounded by the group or bin domain, never by the fact row count),
which joins back onto the fact stream as a BROADCAST. The fact side
shuffles at most once (for the stats aggregate's hash partials — and
the normalize join itself is broadcast, so the row stream is never
re-shuffled). At 100 TB the stats tables are still kilobytes.

Determinism: means/stddevs are floating-point sums whose order varies
with partitioning; callers round outputs (the registered queries round
to 6 dp, the repo-wide parity discipline — see q_time_decay).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Column, functions as F


def feature_stats(
    df: DataFrame,
    cols: Sequence[str],
    group_cols: Sequence[str] = (),
    exact_decimal_scale: int | None = None,
) -> DataFrame:
    """Per-group (or global) mean/stddev/min/max for each feature column.

    One two-phase hash aggregate: all four scalars per column are
    map-side combinable, so the shuffle carries one partial row per
    (task, group). Output is group-domain-sized.

    ``exact_decimal_scale``: for fixed-point inputs (prices with 2
    decimals, integer counts), sum x and x² through DECIMAL at that
    scale instead of float — the sums are then EXACT, so mean and
    stddev (sqrt((Σx² − (Σx)²/n)/(n−1)) evaluated in double from exact
    sums) are bit-identical under ANY partitioning and on any engine.
    This is the q_agg_q1 DECIMAL-volume discipline applied to second
    moments: float stats drift with summation order; these don't.
    """
    aggs: list[Column] = []
    for c in cols:
        if exact_decimal_scale is not None:
            dec = F.col(c).cast(f"decimal(18,{exact_decimal_scale})")
            n = F.count(c)
            s1 = F.sum(dec).cast("double")
            s2 = F.sum(dec * dec).cast("double")
            mean = s1 / n
            var = (s2 - s1 * s1 / n) / (n - F.lit(1))
            aggs += [
                mean.alias(f"{c}__mean"),
                F.sqrt(var).alias(f"{c}__std"),
                F.min(c).alias(f"{c}__min"),
                F.max(c).alias(f"{c}__max"),
            ]
            continue
        aggs += [
            F.avg(c).alias(f"{c}__mean"),
            F.stddev_samp(c).alias(f"{c}__std"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def normalize_features(
    df: DataFrame,
    cols: Sequence[str],
    group_cols: Sequence[str] = (),
    methods: Sequence[str] = ("zscore", "minmax"),
    round_dp: int = 6,
    stats_round_dp: int | None = None,
    exact_decimal_scale: int | None = None,
) -> DataFrame:
    """Append normalized feature columns: ``{c}_z`` (z-score) and/or
    ``{c}_mm`` (min-max to [0,1]) per input column, computed against
    per-``group_cols`` statistics (global when no groups).

    The stats table is broadcast back onto the row stream — the fact
    side is NOT re-shuffled for the join (plan-tested). Degenerate
    groups (stddev 0 / constant column) yield NULL z / NULL mm rather
    than inf, matching SQL division semantics.

    ``stats_round_dp`` rounds the mean/std/min/max BEFORE the per-row
    arithmetic: with rounded stats, both engines of a parity check
    compute z from bit-identical inputs, so the only cross-engine
    rounding risk is the handful of stats values, not every row
    (the oracle discipline used by the registered query).
    """
    stats = feature_stats(df, cols, group_cols, exact_decimal_scale)
    if stats_round_dp is not None:
        for c in cols:
            for s in ("mean", "std", "min", "max"):
                stats = stats.withColumn(
                    f"{c}__{s}", F.round(F.col(f"{c}__{s}"), stats_round_dp)
                )
    if group_cols:
        joined = df.join(F.broadcast(stats), on=list(group_cols), how="left")
    else:
        joined = df.crossJoin(F.broadcast(stats))
    out = joined
    for c in cols:
        if "zscore" in methods:
            z = (F.col(c) - F.col(f"{c}__mean")) / F.col(f"{c}__std")
            out = out.withColumn(f"{c}_z", F.round(z, round_dp))
        if "minmax" in methods:
            rng = F.col(f"{c}__max") - F.col(f"{c}__min")
            mm = F.when(
                rng != 0, (F.col(c) - F.col(f"{c}__min")) / rng
            )
            out = out.withColumn(f"{c}_mm", F.round(mm, round_dp))
    drop = [f"{c}__{s}" for c in cols for s in ("mean", "std", "min", "max")]
    return out.drop(*drop)


def fixed_bin(col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Fixed-edge bin index in [0, n_bins-1]; values outside [lo, hi)
    clamp into the edge bins. Pure integer-producing projection —
    engine-invariant (no float equality at bin edges is relied on by
    callers; the synthetic feeds have no values exactly on an edge)."""
    width = (hi - lo) / n_bins
    raw = F.floor((col - F.lit(lo)) / F.lit(width)).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    smooth: float = 0.5,
) -> DataFrame:
    """Population Stability Index between two slices of the same feed —
    the standard train/serve (or early/late) drift gate.

    Each side aggregates to an n_bins-sized histogram (two-phase, fixed
    edges so the result is partitioning-invariant), the two tiny
    histograms full-outer join on bin, and PSI contributions use
    Laplace-smoothed shares (``smooth`` pseudo-counts) so empty bins
    contribute finitely. Output: one row per bin with both shares, the
    per-bin contribution, and the total PSI repeated (window sum over
    the n_bins-row frame — bounded by construction; the pmod partition
    key keeps the deliberate single partition out of WindowExec's
    no-partition warning, the global_prefix_sum discipline).
    """
    from pyspark.sql.window import Window as W

    def hist(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(fixed_bin(F.col(value_col), lo, hi, n_bins).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    h = (
        hist(df_a, "cnt_a")
        .join(hist(df_b, "cnt_b"), on="bin", how="full_outer")
        .select(
            "bin",
            F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
        )
    )
    w_all = W.partitionBy(F.pmod(F.col("bin"), F.lit(1)))
    tot_a = F.sum("cnt_a").over(w_all)
    tot_b = F.sum("cnt_b").over(w_all)
    p = (F.col("cnt_a") + F.lit(smooth)) / (tot_a + F.lit(smooth * n_bins))
    q = (F.col("cnt_b") + F.lit(smooth)) / (tot_b + F.lit(smooth * n_bins))
    contrib = (p - q) * F.log(p / q)
    h = h.withColumn("p_a", F.round(p, 6)).withColumn("p_b", F.round(q, 6))
    h = h.withColumn("psi_bin", F.round(contrib, 6))
    h = h.withColumn(
        "psi_total", F.round(F.sum(contrib).over(w_all), 6)
    )
    return h.select(
        "bin", "cnt_a", "cnt_b", "p_a", "p_b", "psi_bin", "psi_total"
    )


def equi_depth_bins(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: Sequence[str],
    k: int = 10,
) -> DataFrame:
    """Assign each row an equi-depth (equal-count) bin in [0, k-1] by
    global rank over (value, tiebreaks) — quantile bucketizing for
    feature discretization.

    Rank comes from operators/sampling.py:ranked_prefix_sums (two-level
    prefix sum over range-contiguous partitions), so there is NO global
    row_number window and no single-task sort of the fact table — the
    shape that survives 100 TB where ``ntile()`` over an unpartitioned
    window serializes. bin = ⌊(rank-1)·k/total⌋ with integer arithmetic
    (exact; ntile's remainder-spreading differs, which is why the
    contract is the formula, not ntile). Ties are broken by the caller's
    tiebreak columns, making the assignment total and engine-invariant.
    """
    from pyspark.sql.window import Window as W  # noqa: F401  (doc parity)

    from mysql_cdc_to_http_spark.operators.sampling import ranked_prefix_sums

    order = [F.col(value_col).asc()] + [F.asc(c) for c in tiebreak_cols]
    with_one = df.withColumn("__one", F.lit(1))
    ranked = ranked_prefix_sums(with_one, order, ["__one"])
    total = with_one.groupBy().agg(F.count(F.lit(1)).alias("__tot"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            "bin",
            (
                (F.col("__one__cum") - 1) * k / F.col("__tot")
            ).cast("long").cast("int"),
        )
        .drop("__one", "__one__cum", "__tot")
    )

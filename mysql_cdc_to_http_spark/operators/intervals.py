"""Binned interval-overlap join — the scale path for interval × interval.

The naive overlap join (``l.start <= r.end AND r.start <= l.end``) has no
equi-key, so Spark plans it as a broadcast-nested-loop (fine only when one
side is tiny — q_join_range's case) or a cartesian product (never fine).
The 100 TB technique — the same bin optimization Databricks applies to
RANGE_JOIN hints and time-series stores apply via interval indexes —
converts it to an equi-join:

1. Chop the time axis into fixed-width bins.
2. Replicate each interval into every bin it overlaps
   (``explode(sequence(s div w, e div w))`` — pure JVM codegen).
3. Hash-join on the bin id (+ any partition keys) — a standard shuffled
   equi-join that AQE can re-plan and skew-split.
4. Re-check the exact overlap predicate on the matched pairs.
5. Emit each pair in ONE bin only — the bin containing
   ``greatest(l.start, r.start)`` — so no dedup pass is needed: when a
   pair truly overlaps, that instant lies inside BOTH intervals, hence
   both replicated into its bin, and it is unique per pair.

Replication factor is ``span/width + 1`` per interval, so width should be
chosen near the typical interval length: too small multiplies the shuffle,
too large degrades the join to few giant bins (skew — which AQE's skew
join then splits, but at shuffle cost). All bin math is ``div`` integer
arithmetic on non-negative epoch microseconds — no float division whose
last-ulp rounding could disagree between engines near a bin edge.

No counterpart in the reference (main.go has no joins at all); this
generalizes q_join_range (X10) to the both-sides-large case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def overlap_bin_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Join rows whose CLOSED intervals ``[l_start, l_end]`` and
    ``[r_start, r_end]`` overlap, as a binned equi-join.

    Interval bounds must be NON-NEGATIVE integer columns in a shared
    unit (epoch micros here) with ``start <= end`` — a reversed
    interval would silently bin through sequence()'s DESCENDING mode
    instead of erroring, so callers validate order upstream;
    ``bin_width`` is in the same unit.
    ``extra_keys`` are equality keys required in addition to time
    overlap (they ride the same shuffle). Column names must be disjoint
    between the two inputs apart from ``extra_keys``.

    Fail-fast guards (ADVICE r6): ``bin_width <= 0`` and a span wider
    than ``max_bins_per_interval`` bins raise AT CALL TIME / as a
    typed per-row error instead of surfacing as an opaque
    sequence/divide-by-zero failure deep inside the job — one interval
    spanning ~spark.sql.maxArrayLength bins would otherwise kill the
    stage after minutes of work. The cap bounds the replication factor
    (shuffle amplification): an interval needing more than
    ``max_bins_per_interval`` replicas means ``bin_width`` is
    mis-sized for the data — widen it — not that the job should emit
    millions of copies of one row.
    """
    keys = list(extra_keys or [])
    w = int(bin_width)
    if w <= 0:
        raise ValueError(
            f"bin_width must be a positive interval-unit width, got {w}"
        )
    max_bins_per_interval = 100_000

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        n_bins = F.expr(f"`{e}` div {w} - `{s}` div {w} + 1")
        # assert_true carries the offending row's replication factor —
        # a typed, immediate diagnosis instead of Catalyst's generic
        # sequence-too-long error minutes into the stage. Folded into
        # the sequence START expression (assert_true yields NULL when
        # the predicate holds) so column pruning can never elide it.
        # NULL start/end makes n_bins NULL; assert_true raises on
        # non-true predicates (NULL included), so gate the guard on
        # non-null bounds — null-bounded rows keep their historical
        # behavior (dropped by exploding the null sequence) instead of
        # failing the stage with a misleading message. (ADVICE r7)
        check = F.assert_true(
            n_bins.isNull() | (n_bins <= max_bins_per_interval),
            F.format_string(
                "overlap_bin_join: interval spans %s bins (> cap "
                f"{max_bins_per_interval}) — bin_width={w} is "
                "mis-sized for this data; widen it",
                n_bins.cast("string"),
            ),
        )
        start = F.when(check.isNull(), F.expr(f"`{s}` div {w}"))
        return df.withColumn(
            "__bin",
            F.explode(F.sequence(start, F.expr(f"`{e}` div {w}"))),
        )

    lb = binned(left, l_start, l_end)
    rb = binned(right, r_start, r_end)
    exact: Column = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    # the pair's unique emission bin: the one holding max(l_start, r_start)
    first_bin = F.col("__bin") == F.expr(
        f"greatest(`{l_start}`, `{r_start}`) div {w}"
    )
    return (
        lb.join(rb, keys + ["__bin"], "inner")
        .filter(exact & first_bin)
        .drop("__bin")
    )

"""Salted two-phase aggregation — the skew pattern for hot keys.

A groupBy on a low-cardinality / skewed key routes every row of a hot key
through one reducer. Salting splits each key into ``n_salts`` synthetic
sub-keys for the partial phase, then combines partials in a second (tiny)
aggregation — reducer parallelism becomes n_salts per hot key. AQE's
skew-join splitting handles *joins*; aggregation skew needs this.

Works for any algebraic aggregate (sum/count/min/max and avg via
sum+count); the helper takes the decomposed form explicitly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: alias → aggregate over raw rows (phase 1, grouped by
    key+salt). ``final_aggs``: alias → aggregate over the partial columns
    (phase 2, grouped by key). Example::

        salted_agg(events, ["event_type"],
                   {"n": F.count(F.lit(1)), "s": F.sum("value")},
                   {"n": F.sum("n"), "s": F.sum("s")})
    """
    salted = df.withColumn(
        _SALT, (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*key_cols, _SALT).agg(
        *[c.alias(a) for a, c in partial_aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[c.alias(a) for a, c in final_aggs.items()]
    )

"""Salted two-phase aggregation — the skew pattern for hot keys.

A groupBy on a low-cardinality / skewed key routes every row of a hot key
through one reducer. Salting splits each key into ``n_salts`` synthetic
sub-keys for the partial phase, then combines partials in a second (tiny)
aggregation — reducer parallelism becomes n_salts per hot key. AQE's
skew-join splitting handles most *joins*; aggregation skew needs this,
and ``salted_join`` below covers the join cases AQE cannot re-plan
(stream-static joins, hot keys beyond what partition splitting fixes).

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


def salt_column(n_salts: int) -> Column:
    """Arbitrary-but-cheap row spread. monotonically_increasing_id is
    partitioning-dependent, which is fine HERE (and only here): any salt
    assignment yields the same join result, so determinism is not part
    of the contract — unlike hash_split, where membership must be
    stable."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")


# Join types whose result is row-for-row identical to the unsalted join:
# every output row is driven by a row of the SKEWED side (which carries
# exactly one salt), so replicating the other side cannot duplicate
# anything. right/full/outer would emit each unmatched replicated row
# once PER SALT — n_salts phantom copies — so they are rejected.
_SALT_SAFE_JOINS = frozenset(
    {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
     "left_anti", "leftanti", "semi", "anti"}
)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (hot-keyed side) with ``other``, spreading each hot
    key over ``n_salts`` reducers: the skewed side gets a salt appended to
    its join key, the other side is REPLICATED n_salts times so every
    (key, salt) pair still meets its match. For the supported join types
    (inner / left / left_semi / left_anti — where every output row is
    driven by a skewed-side row) the result is identical to
    ``skewed.join(other, on, how)``; right/full joins would surface each
    unmatched replicated row n_salts times and raise ValueError (put the
    skewed side on the preserved side, or fall back to a plain join).
    Replication multiplies the other side's shuffle volume by n_salts:
    use it on the smaller input and keep n_salts at the skew factor to
    flatten, not higher."""
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALT_SAFE_JOINS
    }:
        raise ValueError(
            f"salted_join does not preserve '{how}' semantics: unmatched "
            f"rows of the replicated side would appear n_salts times. "
            f"Supported: inner, left, left_semi, left_anti."
        )
    salted = skewed.withColumn(_SALT, salt_column(n_salts))
    replicated = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, on + [_SALT], how).drop(_SALT)

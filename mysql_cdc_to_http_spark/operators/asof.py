"""As-of join — Spark has no native primitive (SURVEY.md X11).

Implemented as union + window ``last(ignorenulls)``: one shuffle on the
partition key, linear work per key. The naive theta-join formulation
(``r.key = l.key AND r.ts <= l.ts`` + max) is quadratic per key and would
not survive 100 TB; this form would.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

_TS = "__asof_ts"
_SIDE = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the latest right row
    with ``right.ts <= left.ts`` (or ``<`` when not ``allow_exact_matches``)
    sharing the join key. Left rows with no prior right row get nulls.

    Both inputs are unioned into one frame ordered by (ts, side) per key;
    a running ``last(value, ignorenulls=True)`` carries the most recent
    right-side values forward onto left rows.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    payload = [c for c in left.columns if c not in on_cols]
    right_types = {f.name: f.dataType for f in right.schema.fields}
    left_types = {f.name: f.dataType for f in left.schema.fields}

    # Right rows sort before left rows at equal ts iff exact matches count.
    left_side, right_side = (1, 0) if allow_exact_matches else (0, 1)

    l = left.select(
        *on_cols,
        *payload,
        F.col(left_ts).alias(_TS),
        F.lit(left_side).alias(_SIDE),
        *[F.lit(None).cast(right_types[c]).alias(c) for c in value_cols],
    )
    r = right.select(
        *on_cols,
        *[F.lit(None).cast(left_types[c]).alias(c) for c in payload],
        F.col(right_ts).alias(_TS),
        F.lit(right_side).alias(_SIDE),
        *value_cols,
    )
    w = (
        W.partitionBy(*on_cols)
        .orderBy(_TS, _SIDE)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l.unionByName(r).select(
        *on_cols,
        *payload,
        F.col(_SIDE),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col(_SIDE) == left_side).drop(_SIDE)

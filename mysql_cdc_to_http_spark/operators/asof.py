"""As-of join — Spark has no native primitive (SURVEY.md X11).

Implemented as union + window ``last(ignorenulls)``: one shuffle on the
partition key, linear work per key. The naive theta-join formulation
(``r.key = l.key AND r.ts <= l.ts`` + max) is quadratic per key and would
not survive 100 TB; this form would.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.window import Window as W

_TS = "__asof_ts"
_SIDE = "__asof_is_left"
_RV = "__asof_rv"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    allow_exact_matches: bool = True,
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the latest right row
    with ``right.ts <= left.ts`` (or ``<`` when not ``allow_exact_matches``)
    sharing the join key. Left rows with no prior right row get nulls.

    ``tolerance`` (an INTERVAL literal body, e.g. ``"24 hours"``) bounds
    how stale the match may be — pandas ``merge_asof(tolerance=...)``
    semantics: the matched row is still the LATEST prior right row, but
    if it is older than ``left.ts - tolerance`` the left row gets nulls
    (it does NOT fall back to an even older row; those are staler
    still). Implemented by carrying the matched right timestamp inside
    the value struct and nulling the payload on the way out — the window
    pass is unchanged, so tolerance adds zero shuffles.

    Both inputs are unioned into one frame ordered by (ts, side) per key;
    a running ``last(ignorenulls=True)`` carries the most recent
    right-side values forward onto left rows.

    The carried values are ONE STRUCT of all ``value_cols``, not per-column
    fills: per-column ``last(ignorenulls)`` would stitch values from
    DIFFERENT right rows whenever the latest right row holds a NULL in one
    column (pandas ``merge_asof`` carries whole rows — a NULL in the
    matched row stays NULL). The struct also serves as the deterministic
    tiebreak for equal right timestamps (max struct wins; pandas takes
    "last in input order", which is nondeterministic under distribution).
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    payload = [c for c in left.columns if c not in on_cols]
    right_types = {f.name: f.dataType for f in right.schema.fields}
    # matched right ts rides first in the struct: needed for the
    # tolerance check, and as leading tiebreak field it compares equal
    # exactly when the old (values-only) struct comparison applied
    rv_type = T.StructType(
        [T.StructField("__rts", right_types[right_ts])]
        + [T.StructField(c, right_types[c]) for c in value_cols]
    )

    # Right rows sort before left rows at equal ts iff exact matches count.
    left_side, right_side = (1, 0) if allow_exact_matches else (0, 1)

    l = left.select(
        *on_cols,
        *payload,
        F.col(left_ts).alias(_TS),
        F.lit(left_side).alias(_SIDE),
        F.lit(None).cast(rv_type).alias(_RV),
    )
    r = right.select(
        *on_cols,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in payload],
        F.col(right_ts).alias(_TS),
        F.lit(right_side).alias(_SIDE),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in value_cols]
        ).alias(_RV),
    )
    w = (
        W.partitionBy(*on_cols)
        .orderBy(_TS, _SIDE, _RV)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l.unionByName(r).select(
        *on_cols,
        *payload,
        F.col(_SIDE),
        F.last(_RV, ignorenulls=True).over(w).alias(_RV),
    )
    if tolerance is None:
        extract = [F.col(f"{_RV}.{c}").alias(c) for c in value_cols]
    else:
        fresh = F.col(f"{_RV}.__rts") >= F.col(left_ts) - F.expr(
            f"INTERVAL {tolerance}"
        )
        extract = [
            F.when(fresh, F.col(f"{_RV}.{c}")).alias(c) for c in value_cols
        ]
    return (
        filled.filter(F.col(_SIDE) == left_side)
        .select(*on_cols, *payload, *extract)
    )

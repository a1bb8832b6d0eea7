"""Update before/after pairing — the reference consumes binlog update
events as two consecutive rows (before-image, after-image) and pairs them
into one envelope, silently dropping a dangling trailing row
(``main.go:64-78``).

Spark form: a window ``lag`` over (stream key, sequence) — one shuffle on
the key, linear per key. Rows are tagged with an image index (0=before,
1=after); an after-row pairs with the immediately preceding before-row of
the same key; unpaired before-rows are dropped (the reference's ``break``
on the odd trailing row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W


def pair_updates(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    img_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Pair (before, after) image rows into one row per update.

    ``df`` holds raw update images: ``key_cols`` identify the logical row
    (table + pk), ``seq_col`` orders images within a key, ``img_col`` is
    0 for the before-image and 1 for the after-image. Output carries
    ``before_<v>`` / ``after_<v>`` for each value column; dangling
    before-images (no following after-image) are dropped.
    """
    w = W.partitionBy(*key_cols).orderBy(seq_col)
    prev_img = F.lag(img_col).over(w)
    paired = df.select(
        *key_cols,
        F.col(seq_col),
        F.col(img_col),
        prev_img.alias("__prev_img"),
        *[F.lag(v).over(w).alias(f"before_{v}") for v in value_cols],
        *[F.col(v).alias(f"after_{v}") for v in value_cols],
    )
    return paired.filter(
        (F.col(img_col) == 1) & (F.col("__prev_img") == 0)
    ).drop("__prev_img", img_col)

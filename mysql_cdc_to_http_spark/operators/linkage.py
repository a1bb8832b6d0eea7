"""Record linkage / entity resolution: blocked fuzzy matching.

The 100 TB shape: fuzzy-matching a corpus against itself is O(n²) in
string comparisons unless candidates are BLOCKED first — the same
candidate-generation discipline as MinHash-LSH (operators/dedup.py),
applied to typo-distance instead of Jaccard. A blocking key routes each
record to a small bucket (equi-join = one hash shuffle on the key);
only within-bucket pairs pay the edit-distance compute, all of it
JVM-side ``levenshtein`` inside whole-stage codegen. Recall is governed
by the blocking key the caller picks (a typo OUTSIDE the key's columns
is found; one inside is not — the standard multi-pass answer is to
union pairs from several independent blocking keys, which stays cheap
because each pass is candidate-sized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def blocked_pairs(
    df: DataFrame,
    id_col: str,
    block_key: Column,
    payload_cols: list[str],
) -> DataFrame:
    """Within-block candidate pairs (id_a < id_b): one equi-join shuffle
    on the blocking key; output carries only ids + the payload columns
    needed for scoring (suffixes _a/_b)."""
    side = df.select(
        F.col(id_col).alias("__id"),
        block_key.alias("__block"),
        *[F.col(c) for c in payload_cols],
    )
    a = side.select(
        F.col("__id").alias("id_a"),
        "__block",
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
    )
    b = side.select(
        F.col("__id").alias("id_b"),
        "__block",
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
    )
    return a.join(b, "__block").filter(F.col("id_a") < F.col("id_b"))


def fuzzy_match(
    pairs: DataFrame,
    col_a: str,
    col_b: str,
    max_dist: int,
    out_col: str = "dist",
) -> DataFrame:
    """Keep candidate pairs within ``max_dist`` edits. levenshtein's
    optional threshold form short-circuits the DP once the running
    minimum exceeds max_dist — O(max_dist·len) instead of O(len²) per
    pair, which is what makes wide blocks survivable."""
    d = F.levenshtein(F.col(col_a), F.col(col_b), max_dist)
    return (
        pairs.withColumn(out_col, d)
        .filter((F.col(out_col) >= 0) & (F.col(out_col) <= max_dist))
    )

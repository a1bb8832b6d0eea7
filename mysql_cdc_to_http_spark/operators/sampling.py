"""Sampling & dataset-split operators for training-data pipelines.

- ``stratified_sample``: per-stratum fractions via ``sampleBy`` (seeded,
  deterministic per Spark version/partitioning).
- ``hash_split``: assignment by hash of a stable id — fully deterministic
  across runs, partitionings, and cluster sizes; the correct way to cut
  train/val/test at 100 TB (a seeded random split changes membership when
  the partitioning changes; a hash split never does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    return df.sampleBy(stratum_col, fractions, seed=seed)


def split_bucket(id_col: Column, n_buckets: int = 100, salt: str = "split-v1") -> Column:
    """Stable bucket in [0, n_buckets) from a record id. Salted so
    independent splits of the same ids decorrelate."""
    return F.pmod(
        F.xxhash64(F.concat_ws("|", F.lit(salt), id_col.cast("string"))),
        F.lit(n_buckets),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split-v1",
) -> DataFrame:
    """Attach a deterministic ``split`` column: train / val / test."""
    b = split_bucket(F.col(id_col), 100, salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


# Executors must not need this repo on their PYTHONPATH.
import sys as _sys
from pyspark import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

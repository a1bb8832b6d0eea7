"""Mergeable HLL sketch operators: partial → union rollup semantics,
partitioning invariance, and exactness in the sparse regime."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_cdc_to_http_spark.operators.sketches import hll_partials, hll_rollup


def _toy(spark, n_parts):
    # 60 rows, 30 distinct users split across 3 segments, 2 groups
    rows = [(("a" if i % 2 else "b"), i % 3, f"u{i % 30}") for i in range(60)]
    return spark.createDataFrame(
        rows, "grp string, day int, user string"
    ).repartition(n_parts)


def test_hll_rollup_exact_in_sparse_regime(spark):
    df = _toy(spark, 4)
    partials = hll_partials(df, ["grp"], "day", "user", lgk=12)
    got = {r["grp"]: r["ndv_est"] for r in hll_rollup(partials, ["grp"]).collect()}
    # below the sparse→dense transition HLL counts exactly: 15 odd /
    # 15 even user ids per group
    assert got == {"a": 15, "b": 15}


def test_hll_rollup_partition_invariant(spark):
    est = []
    for n_parts in (1, 7):
        partials = hll_partials(_toy(spark, n_parts), ["grp"], "day", "user")
        est.append(sorted(hll_rollup(partials, ["grp"]).collect()))
    assert est[0] == est[1]  # estimate is a pure function of the value set


def test_hll_partials_one_row_per_group_segment(spark):
    partials = hll_partials(_toy(spark, 4), ["grp"], "day", "user")
    assert partials.count() == 6  # 2 groups × 3 days
    assert partials.columns == ["grp", "segment", "sketch"]

"""Edge semantics for the as-of join and word shingles."""

from __future__ import annotations

from mysql_cdc_to_http_spark.operators.asof import asof_join
from mysql_cdc_to_http_spark.operators.dedup import word_shingles

from pyspark.sql import functions as F


def _mk(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 10, "c")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 30, 300.0)],
        "k long, ts long, px double",
    )
    return left, right


def test_asof_exact_match_included(spark):
    left, right = _mk(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["px"])
    got = {(r.k, r.tag): r.px for r in out.collect()}
    # (1, ts=10) matches the right row AT ts=10; (2, ts=10) has no prior
    assert got == {(1, "a"): 100.0, (1, "b"): 150.0, (2, "c"): None}


def test_asof_exact_match_excluded(spark):
    left, right = _mk(spark)
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["px"], allow_exact_matches=False,
    )
    got = {(r.k, r.tag): r.px for r in out.collect()}
    # strict <: the ts=10 right row no longer matches left ts=10
    assert got == {(1, "a"): None, (1, "b"): 150.0, (2, "c"): None}


def test_word_shingles(spark):
    df = spark.createDataFrame([("one two three four",)], "t string")
    rows = df.select(
        word_shingles(F.col("t"), 3).alias("s")
    ).collect()
    assert rows[0].s == ["one two three", "two three four"]


def test_asof_carries_whole_row_not_stitched(spark):
    """A NULL in the matched right row must stay NULL — per-column fills
    would resurrect the older row's value (round-2 advice item)."""
    from mysql_cdc_to_http_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 30, "x")], "k int, ts int, tag string")
    right = spark.createDataFrame(
        [(1, 10, 1.0, 100.0), (1, 20, 2.0, None)],
        "k int, ts int, a double, b double",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["a", "b"],
    ).collect()
    assert len(out) == 1
    assert out[0]["a"] == 2.0
    assert out[0]["b"] is None  # NOT 100.0 from the older row


def test_asof_tolerance_no_fallback(spark):
    """pandas merge_asof tolerance semantics: a stale latest-match nulls
    out; the join must NOT fall back to an even older in-window row
    (there is none by construction: older == staler)."""
    from mysql_cdc_to_http_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-10 12:00:00"), (2, "2024-01-10 12:00:00")],
        ["k", "ts"],
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-10 11:00:00", 100.0),  # 1h old -> within 2h
            (2, "2024-01-10 08:00:00", 200.0),  # 4h old -> stale
        ],
        ["k", "ts", "v"],
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tolerance="2 hours",
    )
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: 100.0, 2: None}
    # same join without tolerance keeps the stale match
    out2 = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"]
    )
    assert {r.k: r.v for r in out2.collect()} == {1: 100.0, 2: 200.0}


def test_asof_tolerance_boundary_inclusive(spark):
    """A match exactly tolerance-old still qualifies (>= comparison,
    mirroring the oracle's interval-bounded >=)."""
    from mysql_cdc_to_http_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-10 12:00:00")], ["k", "ts"]
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-10 10:00:00", 7.0)], ["k", "ts", "v"]
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tolerance="2 hours",
    )
    assert out.collect()[0].v == 7.0

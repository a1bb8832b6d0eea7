"""Catalyst extension (SURVEY §4.2): the rank-1-window → max_by/min_by
aggregate rewrite. The session fixture loads the extension jar (built by
extension/build.sh), so these tests assert the rewrite fires on the
latest-state pattern, does NOT fire on shapes it cannot preserve, and
agrees with the unrewritten semantics (the full oracle-parity suite runs
through the same extension-loaded session, which is the broader no-change
guarantee)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.streaming.latest_state import latest_state

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR = os.path.join(REPO, "extension", "spark-graft-extension.jar")

pytestmark = pytest.mark.skipif(
    not os.path.exists(JAR), reason="extension jar not built"
)


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


# Parquet-sourced columns are declared nullable, and the rule must bail
# on nullable order keys (max_by skips NULL keys, row_number ranks them),
# so the positive tests order by the engine's non-nullable offset key —
# coalesce with an unreachable sentinel, exactly what latest_state builds.
def _nonnull(c):
    return F.coalesce(F.col(c), F.lit(-(2**63)))


def test_latest_state_rewrites_to_max_by(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    w = W.partitionBy("user_id").orderBy(_nonnull("event_id").desc())
    df = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    plan = _optimized(df)
    assert "Window" not in plan, plan
    assert "max_by" in plan, plan


def test_ascending_order_rewrites_to_min_by(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    w = W.partitionBy("user_id").orderBy(_nonnull("event_id").asc())
    df = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    plan = _optimized(df)
    assert "Window" not in plan, plan
    assert "min_by" in plan, plan


def test_nullable_order_key_not_rewritten(spark, sf_dir):
    """A NULLABLE order key must keep its Window: row_number ranks NULL
    keys (default ASC = NULLS FIRST would even pick one) while max_by
    skips them, and an all-NULL group survives the window but would
    collapse to a NULL struct under the aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    assert ev.schema["event_id"].nullable  # parquet: nullable by default
    w = W.partitionBy("user_id").orderBy(F.col("event_id").desc())
    df = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    assert "Window" in _optimized(df)


def test_null_offsets_semantics_with_extension(spark):
    """With the extension loaded, a frame containing NULL and all-NULL
    order keys returns exactly the window semantics (the rule bailed)."""
    rows = [
        ("a", 1, "x"), ("a", None, "y"),       # null loses under NULLS LAST? ranked by window rules
        ("b", None, "only-null"),               # all-NULL group must survive
    ]
    df = spark.createDataFrame(rows, "k string, off int, v string")
    w = W.partitionBy("k").orderBy(F.col("off").desc())
    got = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    assert "Window" in _optimized(got)
    out = {r["k"]: (r["off"], r["v"]) for r in got.collect()}
    # DESC default = NULLS LAST → the non-null offset wins for "a";
    # the all-NULL group "b" keeps its (only) row.
    assert out["a"] == (1, "x")
    assert out["b"] == (None, "only-null")


def test_residual_predicates_survive(spark, sf_dir):
    """Extra filter conjuncts (the latest_state delete-drop) stay applied
    AFTER the pick — and the rewrite still fires."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", "event_type"
    )
    got = latest_state(ev, ["user_id"], offset_col="event_id", op_col="event_type")
    plan = _optimized(got)
    assert "Window" not in plan, plan
    assert "max_by" in plan, plan
    # semantics: equals the explicit groupBy max_by formulation
    expected = (
        ev.groupBy("user_id")
        .agg(F.max_by(F.struct("event_id", "value", "event_type"), "event_id").alias("r"))
        .select("user_id", "r.event_id", "r.value", "r.event_type")
        .filter(F.col("event_type") != "d")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_rank_k_windows_not_rewritten(spark, sf_dir):
    """rank<=k (k>1) and rank() shapes must keep their Window."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    top3 = (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
    assert "Window" in _optimized(top3)
    kept_rn = cust.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    # rn kept in the output → no rewrite
    assert "Window" in _optimized(kept_rn)


def test_without_extension_window_remains():
    """Control in a clean process: the same plan keeps its Window when the
    extension is not loaded."""
    script = r"""
import sys
sys.path.insert(0, %r)
import os
os.environ["SPARK_GRAFT_EXTENSION"] = "0"
from mysql_cdc_to_http_spark.session import get_spark
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W
spark = get_spark(app_name="ext-control", shuffle_partitions=4)
df = spark.range(100).withColumn("k", F.col("id") %% 5)
w = W.partitionBy("k").orderBy(F.col("id").desc())
out = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
plan = out._jdf.queryExecution().optimizedPlan().toString()
assert "Window" in plan, plan
print("OK")
""" % (REPO,)
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=240,
    )
    assert "OK" in res.stdout, res.stderr[-2000:]

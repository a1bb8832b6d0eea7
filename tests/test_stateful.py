"""applyInPandasWithState semantics: running totals accumulate across
micro-batches and converge to the batch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.queries import all_queries


def test_stateful_totals_match_batch(spark, sf_dir):
    out = all_queries()["q_stream_stateful"](spark, sf_dir)
    # last emission per user (highest n_events) == batch per-user aggregate
    final = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in final.collect()}
    ev = load_table(spark, sf_dir, "events")
    want_df = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv")
    )
    want = {r.user_id: (r.n, round(r.tv, 6)) for r in want_df.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-6, k


def test_stateful_tws_totals_match_batch(spark, sf_dir):
    """transformWithStateInPandas twin (env-gated: the TWS python runner
    speaks protobuf to its state server; skip where the dependency is
    absent — this sandbox)."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from mysql_cdc_to_http_spark.queries.streaming import (
        q_stream_stateful_tws,
    )

    out = q_stream_stateful_tws(spark, sf_dir)
    final = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
    )
    got = {r.user_id: r.n_events for r in final.collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {
        r.user_id: r.n
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want

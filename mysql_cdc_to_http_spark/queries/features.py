"""Feature-engineering & corpus-statistics queries (round-6 fourth
wave): per-group feature normalization, PSI drift detection, PMI
collocation mining, and tokenizer-vocabulary coverage.

These are the passes that sit between curation and training: normalize
numeric features for the model, gate on distribution drift between two
corpus slices, mine collocations for tokenizer/phrase decisions, and
size the vocabulary against corpus coverage. All oracle-checked; each
docstring carries the determinism argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.queries.registry import query


@query(
    "q_feature_scale",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qs1,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qs2,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ps1,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ps2,
        MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax,
        MIN(l_extendedprice) AS pmin, MAX(l_extendedprice) AS pmax,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag
    ), st AS (
      SELECT l_returnflag,
             qs1 / n AS qmean, sqrt((qs2 - qs1*qs1/n) / (n-1)) AS qstd,
             ps1 / n AS pmean, sqrt((ps2 - ps1*ps1/n) / (n-1)) AS pstd,
             qmin, qmax, pmin, pmax
      FROM s
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           round((l_quantity - qmean) / qstd, 6) AS l_quantity_z,
           round(CASE WHEN qmax - qmin <> 0
                 THEN (l_quantity - qmin) / (qmax - qmin) END, 6)
             AS l_quantity_mm,
           round((l_extendedprice - pmean) / pstd, 6) AS l_extendedprice_z,
           round(CASE WHEN pmax - pmin <> 0
                 THEN (l_extendedprice - pmin) / (pmax - pmin) END, 6)
             AS l_extendedprice_mm
    FROM lineitem l JOIN st USING (l_returnflag)
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature normalization (operators/features.py:
    normalize_features): z-score + min-max for two lineitem measures,
    statistics per l_returnflag. The stats table (3 rows) broadcasts
    back onto the fact stream — one fact shuffle total (the stats
    aggregate's partials; the join itself is broadcast, plan-tested).

    Parity is EXACT, not tolerance-based: the 2-decimal inputs sum
    through DECIMAL for both the first and second moment, so mean and
    std are bit-identical under any partitioning and on both engines
    (exact_decimal_scale=2 — the q_agg_q1 discipline extended to
    variance); z and min-max then divide identical doubles, and the
    6-dp round merely fixes the output width."""
    from mysql_cdc_to_http_spark.operators.features import normalize_features

    li = load_table(spark, sf_dir, "lineitem")
    return (
        normalize_features(
            li,
            ["l_quantity", "l_extendedprice"],
            group_cols=["l_returnflag"],
            exact_decimal_scale=2,
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_quantity_z",
            "l_quantity_mm",
            "l_extendedprice_z",
            "l_extendedprice_mm",
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_psi_drift",
    oracle="""
    WITH a AS (
      SELECT LEAST(GREATEST(CAST(FLOOR(value / 5.0) AS INT), 0), 19) AS bin,
             COUNT(*) AS cnt_a
      FROM events WHERE event_id % 2 = 0 GROUP BY 1
    ), b AS (
      SELECT LEAST(GREATEST(CAST(FLOOR(value / 5.0) AS INT), 0), 19) AS bin,
             COUNT(*) AS cnt_b
      FROM events WHERE event_id % 2 = 1 GROUP BY 1
    ), h AS (
      SELECT COALESCE(a.bin, b.bin) AS bin,
             COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
      FROM a FULL OUTER JOIN b ON a.bin = b.bin
    ), t AS (
      SELECT bin, cnt_a, cnt_b,
             SUM(cnt_a) OVER () AS ta, SUM(cnt_b) OVER () AS tb
      FROM h
    ), c AS (
      SELECT bin, cnt_a, cnt_b,
             (cnt_a + 0.5) / (ta + 10.0) AS p,
             (cnt_b + 0.5) / (tb + 10.0) AS q
      FROM t
    )
    SELECT bin, CAST(cnt_a AS BIGINT) AS cnt_a, CAST(cnt_b AS BIGINT) AS cnt_b,
           round(p, 6) AS p_a, round(q, 6) AS p_b,
           round((p - q) * ln(p / q), 6) AS psi_bin,
           round(SUM((p - q) * ln(p / q)) OVER (), 6) AS psi_total
    FROM c ORDER BY bin
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift gate (operators/features.py:
    psi_drift) between two deterministic slices of the events feed
    (event_id parity — a stand-in for train vs serve windows): 20
    fixed-edge bins over value∈[0,100) (outliers clamp into the edge
    bins), Laplace-smoothed shares, per-bin contribution + total.

    Scale: each side reduces to a 20-row histogram via a two-phase
    hash agg before anything joins — the fact stream shuffles 20
    partial rows per task and the PSI arithmetic runs on a
    bin-count-sized frame. Parity: bin indexes floor identical IEEE
    ratios; counts are integers; shares and contributions are then
    identical-input double ops, with ln's ulps absorbed by the 6-dp
    round (q_char_entropy argument)."""
    from mysql_cdc_to_http_spark.operators.features import psi_drift

    ev = load_table(spark, sf_dir, "events")
    side_a = ev.filter(F.col("event_id") % 2 == 0)
    side_b = ev.filter(F.col("event_id") % 2 == 1)
    return psi_drift(
        side_a, side_b, "value", lo=0.0, hi=100.0, n_bins=20, smooth=0.5
    ).orderBy("bin")

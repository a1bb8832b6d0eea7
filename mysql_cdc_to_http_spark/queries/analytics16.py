"""Round-16 additions (X391-X399): the nonparametric-omnibus /
variance-diagnostics tier the X292/X312/X351 test family escalates
into, plus the corpus-diversity and watermark screens of the LLM
curation ladder.

House rules throughout (see analytics15.py): every count/moment/rank
is an exact DECIMAL(38,0)/HUGEINT integer; doubles appear only in
final statistics BUILT from those integers with the same expression
on both engines (sqrt/ln are IEEE-correctly-rounded on identical
inputs); display ratios of integers use integer micro-units
(`x * 1000000 div y`), never float division; significance gates use
shared published critical-value literals (the X341 rule).

Reference scope note: mul14/mysql-cdc-to-http (main.go, 530 LoC) has
no analytics surface — these operators extend SURVEY.md §2.3's
"beyond the reference" ladder, re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.queries.registry import query

# χ²(4) upper 0.05 — shared literal (5 event types → df = 4)
_CHI2_4_05 = 9.487729036781154


# --------------------------------------------------------------------------
# X391 — Kruskal–Wallis H across ALL event types: the k-group
# extension of X292's two-sample Mann–Whitney (same double-rank
# integer idiom), tie-corrected.
# --------------------------------------------------------------------------
@query(
    "q_kruskal_wallis",
    oracle=f"""
    WITH vc AS (
      SELECT value, CAST(count(*) AS HUGEINT) AS c
      FROM events GROUP BY value
    ),
    cum AS (
      SELECT value, c,
             COALESCE(SUM(c) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS f_prev
      FROM vc
    ),
    tc AS (
      SELECT event_type, value, CAST(count(*) AS HUGEINT) AS tcnt
      FROM events GROUP BY 1, 2
    ),
    pg AS (
      SELECT tc.event_type,
             CAST(SUM(tc.tcnt) AS HUGEINT) AS nt,
             CAST(SUM(tc.tcnt * (2 * cum.f_prev + cum.c + 1))
                  AS HUGEINT) AS r2t
      FROM tc JOIN cum USING (value) GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(c) AS HUGEINT) AS n,
             CAST(SUM(c * c * c - c) AS HUGEINT) AS tie_t
      FROM vc
    ),
    hh AS (
      SELECT (SELECT count(*) FROM pg) AS k, n, tie_t,
             (12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
              * (SELECT SUM(CAST(r2t AS DOUBLE) * CAST(r2t AS DOUBLE)
                            / (4.0 * CAST(nt AS DOUBLE))) FROM pg)
              - 3.0 * CAST(n + 1 AS DOUBLE))
             / (1.0 - CAST(tie_t AS DOUBLE)
                      / CAST(n * n * n - n AS DOUBLE)) AS h
      FROM tot
    )
    SELECT CAST(n AS BIGINT) AS n_events,
           CAST(k AS BIGINT) AS k_groups,
           CAST(tie_t AS BIGINT) AS tie_t,
           CAST(round(h * 1000) AS BIGINT) AS h_milli,
           CASE WHEN k = 5 THEN h > {_CHI2_4_05} END AS non_uniform
    FROM hh
    """,
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X391 — tie-corrected Kruskal–Wallis H over event values by
    type: H = [12/(N(N+1)) Σ R_t²/n_t − 3(N+1)] / (1 − ΣT/(N³−N)).

    Exactness: the double-rank idiom of X292 — per-value counts, a
    cumulative window over DISTINCT values (quantization-bounded,
    allowlist class a), and 2×rank-sums per group as exact integers
    R2_t = Σ c_t(2f_prev + c + 1); H combines those integers in one
    identical double expression behind a milli round. The tie term
    Σ(c³−c) stays inside DECIMAL(38) for c up to ~2e12. Significance
    gates on the shared χ²(4) literal, emitted only for the 5-group
    corpus shape (NULL otherwise — mirrored). Scale shape: two
    fact-sized aggregates (map-side combined), a distinct-value
    window, a #types join → 1 row."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    vc = ev.groupBy("value").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    w = W.orderBy("value").rowsBetween(W.unboundedPreceding, -1)
    cum = vc.select(
        "value",
        "c",
        F.coalesce(
            F.sum("c").over(w), F.lit(0).cast("decimal(38,0)")
        ).alias("f_prev"),
    )
    tc = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("tcnt")
    )
    pg = (
        tc.join(cum, "value")
        .groupBy("event_type")
        .agg(
            F.sum("tcnt").cast("decimal(38,0)").alias("nt"),
            F.sum(
                F.col("tcnt")
                * (F.lit(2) * F.col("f_prev") + F.col("c") + 1)
            )
            .cast("decimal(38,0)")
            .alias("r2t"),
        )
    )
    tot = vc.agg(
        F.sum("c").cast("decimal(38,0)").alias("n"),
        F.sum(F.expr("c * c * c - c"))
        .cast("decimal(38,0)")
        .alias("tie_t"),
    )
    sums = pg.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("k"),
        F.sum(
            F.expr(
                "CAST(r2t AS DOUBLE) * CAST(r2t AS DOUBLE)"
                " / (4.0 * CAST(nt AS DOUBLE))"
            )
        ).alias("sr"),
    )
    hh = tot.crossJoin(F.broadcast(sums)).select(
        "n",
        "k",
        "tie_t",
        F.expr(
            "(12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * sr"
            " - 3.0 * CAST(n + 1 AS DOUBLE))"
            " / (1.0 - CAST(tie_t AS DOUBLE)"
            "          / CAST(n * n * n - n AS DOUBLE))"
        ).alias("h"),
    )
    return hh.select(
        F.col("n").cast("long").alias("n_events"),
        F.col("k").cast("long").alias("k_groups"),
        F.col("tie_t").cast("long").alias("tie_t"),
        F.expr("CAST(round(h * 1000) AS BIGINT)").alias("h_milli"),
        F.expr(
            f"CASE WHEN k = 5 THEN h > {_CHI2_4_05} END"
        ).alias("non_uniform"),
    )


# --------------------------------------------------------------------------
# X392 — Welch's unequal-variance t per event type between the md5
# split-hash cohorts (the A/B frame of X334/X374), with
# Welch–Satterthwaite degrees of freedom.
# --------------------------------------------------------------------------
@query(
    "q_welch_t",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS HUGEINT) AS cents,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 2 AS cohort
      FROM events
    ),
    g AS (
      SELECT event_type, cohort,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS s1,
             CAST(sum(cents * cents) AS HUGEINT) AS s2
      FROM base GROUP BY 1, 2
    ),
    wide AS (
      SELECT a.event_type,
             a.n AS n0, a.s1 AS a1, a.s2 AS a2,
             b.n AS n1, b.s1 AS b1, b.s2 AS b2
      FROM g a JOIN g b
        ON a.event_type = b.event_type
       AND a.cohort = 0 AND b.cohort = 1
      WHERE a.n >= 2 AND b.n >= 2
    ),
    st AS (
      SELECT event_type, n0, n1,
             CAST(b1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(a1 AS DOUBLE) / CAST(n0 AS DOUBLE) AS gap,
             (CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE)
                * CAST(a1 AS DOUBLE) / CAST(n0 AS DOUBLE))
               / (CAST(n0 AS DOUBLE) - 1.0)
               / CAST(n0 AS DOUBLE) AS va,
             (CAST(b2 AS DOUBLE) - CAST(b1 AS DOUBLE)
                * CAST(b1 AS DOUBLE) / CAST(n1 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) - 1.0)
               / CAST(n1 AS DOUBLE) AS vb
      FROM wide
    )
    SELECT event_type,
           CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
           CAST(CASE WHEN va + vb > 0 THEN
             round(gap / sqrt(va + vb) * 1000000) END AS BIGINT)
             AS t_micro,
           CAST(CASE WHEN va > 0 AND vb > 0 THEN
             round((va + vb) * (va + vb)
                   / (va * va / (CAST(n0 AS DOUBLE) - 1.0)
                      + vb * vb / (CAST(n1 AS DOUBLE) - 1.0)) * 1000)
             END AS BIGINT) AS df_milli,
           CASE WHEN va + vb > 0 THEN
             abs(gap / sqrt(va + vb)) > 1.959963984540054 END
             AS significant
    FROM st ORDER BY event_type
    """,
)
def q_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X392 — Welch's t (unequal variances) on cohort mean cents per
    type, with Welch–Satterthwaite df: the correct default A/B test
    when cohort variances differ (X351's pooled-t assumption-free
    sibling). Exactness: cohort moments are exact integers; gap,
    va = s²_a/n_a, vb and the t/df formulas are identical-input
    double expressions behind micro/milli rounds; zero-variance
    degenerate cases emit NULL via mirrored guards. Gate literal
    z_0.975 = 1.959963984540054 (X341 rule). Scale shape: one
    fact-sized (type, cohort) aggregate → #types arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS DECIMAL(38,0))").alias(
            "cents"
        ),
        F.expr(
            "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT) % 2"
        ).alias("cohort"),
    )
    g = base.groupBy("event_type", "cohort").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s1"),
        F.sum(F.expr("cents * cents"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    a = g.filter("cohort = 0 AND n >= 2").select(
        "event_type",
        F.col("n").alias("n0"),
        F.col("s1").alias("a1"),
        F.col("s2").alias("a2"),
    )
    b = g.filter("cohort = 1 AND n >= 2").select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s1").alias("b1"),
        F.col("s2").alias("b2"),
    )
    st = a.join(b, "event_type").select(
        "event_type",
        "n0",
        "n1",
        F.expr(
            "CAST(b1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
            " - CAST(a1 AS DOUBLE) / CAST(n0 AS DOUBLE)"
        ).alias("gap"),
        F.expr(
            "(CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE)"
            "   * CAST(a1 AS DOUBLE) / CAST(n0 AS DOUBLE))"
            " / (CAST(n0 AS DOUBLE) - CAST(1.0 AS DOUBLE))"
            " / CAST(n0 AS DOUBLE)"
        ).alias("va"),
        F.expr(
            "(CAST(b2 AS DOUBLE) - CAST(b1 AS DOUBLE)"
            "   * CAST(b1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
            " / (CAST(n1 AS DOUBLE) - CAST(1.0 AS DOUBLE))"
            " / CAST(n1 AS DOUBLE)"
        ).alias("vb"),
    )
    return st.select(
        "event_type",
        F.col("n0").cast("long").alias("n_a"),
        F.col("n1").cast("long").alias("n_b"),
        F.expr(
            "CAST(CASE WHEN va + vb > CAST(0.0 AS DOUBLE) THEN"
            " round(gap / sqrt(va + vb) * 1000000) END AS BIGINT)"
        ).alias("t_micro"),
        F.expr(
            "CAST(CASE WHEN va > CAST(0.0 AS DOUBLE)"
            " AND vb > CAST(0.0 AS DOUBLE) THEN"
            " round((va + vb) * (va + vb)"
            "       / (va * va / (CAST(n0 AS DOUBLE)"
            "                     - CAST(1.0 AS DOUBLE))"
            "          + vb * vb / (CAST(n1 AS DOUBLE)"
            "                       - CAST(1.0 AS DOUBLE))) * 1000)"
            " END AS BIGINT)"
        ).alias("df_milli"),
        F.expr(
            "CASE WHEN va + vb > CAST(0.0 AS DOUBLE) THEN"
            " abs(gap / sqrt(va + vb)) > 1.959963984540054 END"
        ).alias("significant"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# X393 — Bartlett's test of equal variances across event types: the
# formal gate behind X353's Levene/Brown–Forsythe screen (Bartlett is
# the more powerful test when X385's normality check passes).
# --------------------------------------------------------------------------
@query(
    "q_bartlett",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(round(value * 100, 0) AS HUGEINT))
                  AS HUGEINT) AS s1,
             CAST(sum(CAST(round(value * 100, 0) AS HUGEINT)
                      * CAST(round(value * 100, 0) AS HUGEINT))
                  AS HUGEINT) AS s2
      FROM events GROUP BY 1 HAVING count(*) >= 2
    ),
    v AS (
      SELECT event_type, n,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0) AS var
      FROM g
    ),
    agg AS (
      SELECT CAST(count(*) AS HUGEINT) AS k,
             CAST(SUM(n) AS HUGEINT) AS nn,
             SUM((CAST(n AS DOUBLE) - 1.0) * var) AS sv,
             SUM((CAST(n AS DOUBLE) - 1.0) * ln(var)) AS slnv,
             SUM(1.0 / (CAST(n AS DOUBLE) - 1.0)) AS sinv
      FROM v WHERE var > 0
    ),
    st AS (
      SELECT k, nn,
             ((CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))
                * ln(sv / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
              - slnv)
             / (1.0 + (sinv - 1.0 / (CAST(nn AS DOUBLE)
                                     - CAST(k AS DOUBLE)))
                      / (3.0 * (CAST(k AS DOUBLE) - 1.0))) AS x2
      FROM agg WHERE k >= 2
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(nn AS BIGINT) AS n_events,
           CAST(round(x2 * 1000) AS BIGINT) AS bartlett_milli,
           CASE WHEN k = 5 THEN x2 > {_CHI2_4_05} END AS heteroscedastic
    FROM st
    """,
)
def q_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X393 — Bartlett's χ² for variance homogeneity:
    X² = [(N−k)·ln(s²_p) − Σ(n_i−1)ln(s²_i)] / C with the standard
    correction C = 1 + (Σ1/(n_i−1) − 1/(N−k)) / (3(k−1)).

    Exactness: per-type moments are exact integers; each variance and
    each ln() is one identical-input double (ln is correctly-rounded
    on identical doubles — the milli-quantized-ln family's argument,
    applied at the statistic level since the ln inputs here are
    ratios of the SAME integer-built doubles on both engines);
    zero-variance groups drop via the mirrored var > 0 guard. Gate on
    the shared χ²(4) literal for the 5-group shape. Scale shape: one
    fact-sized aggregate → #types arithmetic → 1 row."""
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(
                F.expr("CAST(round(value * 100, 0) AS DECIMAL(38,0))")
            )
            .cast("decimal(38,0)")
            .alias("s1"),
            F.sum(
                F.expr(
                    "CAST(round(value * 100, 0) AS DECIMAL(38,0))"
                    " * CAST(round(value * 100, 0) AS DECIMAL(38,0))"
                )
            )
            .cast("decimal(38,0)")
            .alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    v = g.select(
        "event_type",
        "n",
        F.expr(
            "(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)"
            "   * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
            " / (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE))"
        ).alias("var"),
    )
    agg = v.filter(F.col("var") > 0).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("k"),
        F.sum("n").cast("decimal(38,0)").alias("nn"),
        F.sum(
            F.expr("(CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE)) * var")
        ).alias("sv"),
        F.sum(
            F.expr(
                "(CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE)) * ln(var)"
            )
        ).alias("slnv"),
        F.sum(
            F.expr(
                "CAST(1.0 AS DOUBLE)"
                " / (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE))"
            )
        ).alias("sinv"),
    )
    st = agg.filter(F.col("k") >= 2).select(
        "k",
        "nn",
        F.expr(
            "((CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))"
            "   * ln(sv / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))"
            " - slnv)"
            " / (CAST(1.0 AS DOUBLE)"
            "    + (sinv - CAST(1.0 AS DOUBLE)"
            "              / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))"
            "      / (CAST(3.0 AS DOUBLE)"
            "         * (CAST(k AS DOUBLE) - CAST(1.0 AS DOUBLE))))"
        ).alias("x2"),
    )
    return st.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n_events"),
        F.expr("CAST(round(x2 * 1000) AS BIGINT)").alias(
            "bartlett_milli"
        ),
        F.expr(
            f"CASE WHEN k = 5 THEN x2 > {_CHI2_4_05} END"
        ).alias("heteroscedastic"),
    )


# --------------------------------------------------------------------------
# X394 — Mood's median test: counts above the grand median per type +
# the 2×k χ² — the crudest-but-assumption-free centrality omnibus
# (X391's H uses full ranks; Mood's survives arbitrary outliers).
# --------------------------------------------------------------------------
@query(
    "q_moods_median",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS HUGEINT) AS cents
      FROM events
    ),
    vc AS (
      SELECT cents, CAST(count(*) AS HUGEINT) AS c
      FROM base GROUP BY 1
    ),
    cum AS (
      SELECT cents, c,
             CAST(SUM(c) OVER (ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS HUGEINT) AS f,
             CAST(SUM(c) OVER () AS HUGEINT) AS n
      FROM vc
    ),
    med AS (
      SELECT CAST(min(CASE WHEN 2 * f >= n THEN cents END) AS HUGEINT)
               AS m,
             CAST(max(n) AS HUGEINT) AS n
      FROM cum
    ),
    ct AS (
      SELECT base.event_type,
             CAST(count(*) AS HUGEINT) AS nt,
             CAST(count(*) FILTER (cents > m) AS HUGEINT) AS abv
      FROM base, med GROUP BY 1
    ),
    marg AS (
      SELECT CAST(SUM(nt) AS HUGEINT) AS n,
             CAST(SUM(abv) AS HUGEINT) AS aa,
             CAST(count(*) AS HUGEINT) AS k
      FROM ct
    ),
    chi AS (
      SELECT k, n, aa,
             SUM(
               (CAST(abv AS DOUBLE) - CAST(aa AS DOUBLE)
                  * CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(abv AS DOUBLE) - CAST(aa AS DOUBLE)
                  * CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(aa AS DOUBLE) * CAST(nt AS DOUBLE)
                  / CAST(n AS DOUBLE))
               + (CAST(nt - abv AS DOUBLE) - CAST(n - aa AS DOUBLE)
                    * CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(nt - abv AS DOUBLE) - CAST(n - aa AS DOUBLE)
                    * CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n - aa AS DOUBLE) * CAST(nt AS DOUBLE)
                    / CAST(n AS DOUBLE))
             ) AS x2
      FROM ct, marg GROUP BY k, n, aa
    )
    SELECT CAST(n AS BIGINT) AS n_events,
           CAST((SELECT m FROM med) AS BIGINT) AS median_cents,
           CAST(aa AS BIGINT) AS n_above,
           CAST(round(x2 * 1000) AS BIGINT) AS chi2_milli,
           CASE WHEN k = 5 THEN x2 > {_CHI2_4_05} END AS location_shift
    FROM chi
    """,
)
def q_moods_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X394 — Mood's median test: grand median from the exact
    cents-count cumulative (the X374 winsorize-bound idiom: smallest
    cents with 2F(c) ≥ N), per-type above/not-above counts, and the
    2×k Pearson χ² from exact integer margins in one identical
    double expression. Gate on the shared χ²(4) literal for the
    5-group shape. Scale shape: value-domain cumulative window
    (quantization-bounded, class a) + two fact-sized aggregates →
    1 row."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS DECIMAL(38,0))").alias(
            "cents"
        ),
    )
    vc = base.groupBy("cents").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    wf = W.orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
    cum = vc.select(
        "cents",
        F.sum("c").over(wf).cast("decimal(38,0)").alias("f"),
    ).crossJoin(
        F.broadcast(
            vc.agg(F.sum("c").cast("decimal(38,0)").alias("n"))
        )
    )
    med = cum.agg(
        F.min(
            F.when(F.expr("2 * f >= n"), F.col("cents"))
        ).alias("m"),
        F.max("n").alias("n"),
    )
    ct = base.crossJoin(F.broadcast(med.select("m"))).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nt"),
        F.sum(F.expr("CASE WHEN cents > m THEN 1 ELSE 0 END"))
        .cast("decimal(38,0)")
        .alias("abv"),
    )
    marg = ct.agg(
        F.sum("nt").cast("decimal(38,0)").alias("n"),
        F.sum("abv").cast("decimal(38,0)").alias("aa"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("k"),
    )
    chi = (
        ct.crossJoin(F.broadcast(marg))
        .groupBy("k", "n", "aa")
        .agg(
            F.sum(
                F.expr(
                    "(CAST(abv AS DOUBLE) - CAST(aa AS DOUBLE)"
                    "   * CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))"
                    " * (CAST(abv AS DOUBLE) - CAST(aa AS DOUBLE)"
                    "   * CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))"
                    " / (CAST(aa AS DOUBLE) * CAST(nt AS DOUBLE)"
                    "    / CAST(n AS DOUBLE))"
                    " + (CAST(nt - abv AS DOUBLE)"
                    "    - CAST(n - aa AS DOUBLE)"
                    "      * CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))"
                    "   * (CAST(nt - abv AS DOUBLE)"
                    "      - CAST(n - aa AS DOUBLE)"
                    "        * CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))"
                    "   / (CAST(n - aa AS DOUBLE) * CAST(nt AS DOUBLE)"
                    "      / CAST(n AS DOUBLE))"
                )
            ).alias("x2")
        )
    )
    return chi.crossJoin(F.broadcast(med.select("m"))).select(
        F.col("n").cast("long").alias("n_events"),
        F.col("m").cast("long").alias("median_cents"),
        F.col("aa").cast("long").alias("n_above"),
        F.expr("CAST(round(x2 * 1000) AS BIGINT)").alias("chi2_milli"),
        F.expr(
            f"CASE WHEN k = 5 THEN x2 > {_CHI2_4_05} END"
        ).alias("location_shift"),
    )


# --------------------------------------------------------------------------
# X395 — Bray–Curtis dissimilarity between source token mixes: the
# ecology-standard abundance-overlap distance, pairwise over sources —
# the corpus-mixing audit that X303's per-source JS divergence gives
# against the POOLED mix, here source-vs-source.
# --------------------------------------------------------------------------
@query(
    "q_bray_curtis",
    oracle="""
    WITH terms AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    tc AS (
      SELECT source, term, CAST(count(*) AS HUGEINT) AS c
      FROM terms GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, CAST(SUM(c) AS HUGEINT) AS s FROM tc GROUP BY 1
    ),
    pair AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(SUM(least(a.c, b.c)) AS HUGEINT) AS m,
             CAST(count(*) AS HUGEINT) AS shared_terms
      FROM tc a JOIN tc b
        ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b,
           CAST(shared_terms AS BIGINT) AS shared_terms,
           CAST((ta.s + tb.s - 2 * m) * 1000000 // (ta.s + tb.s)
                AS BIGINT) AS bc_micro
    FROM pair
    JOIN tot ta ON ta.source = pair.src_a
    JOIN tot tb ON tb.source = pair.src_b
    ORDER BY src_a, src_b
    """,
)
def q_bray_curtis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X395 — pairwise Bray–Curtis BC = 1 − 2Σmin(c_a,c_b)/(S_a+S_b)
    over per-source token counts, ZERO floats end to end: counts and
    Σmin are exact integers and the display value is the
    cross-multiplied integer micro-unit (S_a+S_b−2m)·1e6 div
    (S_a+S_b). Scale shape: one token-keyed aggregate (map-side
    combined), a term-keyed self-join whose fan-out is bounded by
    #sources per term (≤ 20² pairs per term — the blocking key is the
    term), #source²-sized output. Output 190 rows."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "source",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    )
    tc = terms.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    tot = tc.groupBy("source").agg(
        F.sum("c").cast("decimal(38,0)").alias("s")
    )
    a = tc.select(
        F.col("source").alias("src_a"),
        "term",
        F.col("c").alias("ca"),
    )
    b = tc.select(
        F.col("source").alias("src_b"),
        "term",
        F.col("c").alias("cb"),
    )
    pair = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.least("ca", "cb"))
            .cast("decimal(38,0)")
            .alias("m"),
            F.count(F.lit(1)).cast("decimal(38,0)").alias(
                "shared_terms"
            ),
        )
    )
    ta = tot.select(
        F.col("source").alias("src_a"), F.col("s").alias("sa")
    )
    tb = tot.select(
        F.col("source").alias("src_b"), F.col("s").alias("sb")
    )
    return (
        pair.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("shared_terms").cast("long").alias("shared_terms"),
            F.expr(
                "CAST((sa + sb - 2 * m) * 1000000 div (sa + sb)"
                " AS BIGINT)"
            ).alias("bc_micro"),
        )
        .orderBy("src_a", "src_b")
    )


# --------------------------------------------------------------------------
# X396 — Theil's U2 forecast-skill coefficient of the naive
# lag-1 forecast on the zero-filled daily purchase-revenue series:
# U2 < 1 means yesterday's value beats a random walk — the
# one-number "is this series forecastable" screen behind X121's
# backtest and X284's Holt–Winters.
# --------------------------------------------------------------------------
@query(
    "q_theil_u",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100, 0) AS HUGEINT)
                  ELSE 0 END) AS HUGEINT) AS y
      FROM events GROUP BY 1
    ),
    span AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
    grid AS (
      SELECT unnest(range(0, datediff('day', d0, d1) + 1)) AS i
      FROM span
    ),
    obs AS (
      SELECT datediff('day', s.d0, d) AS i, y
      FROM daily CROSS JOIN span s
    ),
    dense AS (
      SELECT g.i, COALESCE(o.y, 0::HUGEINT) AS y
      FROM grid g LEFT JOIN obs o USING (i)
    ),
    lagd AS (
      SELECT a.i, a.y, b.y AS yprev
      FROM dense a JOIN dense b ON b.i = a.i - 1
    ),
    st AS (
      SELECT CAST(count(*) AS HUGEINT) AS n1,
             CAST(SUM((y - yprev) * (y - yprev)) AS HUGEINT) AS num,
             CAST(SUM(yprev * yprev) AS HUGEINT) AS den
      FROM lagd
    )
    SELECT CAST(n1 + 1 AS BIGINT) AS n_days,
           CAST(num AS BIGINT) AS sum_sq_diff,
           CAST(den AS BIGINT) AS sum_sq_prev,
           CAST(CASE WHEN den > 0 THEN
             round(sqrt(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                   * 1000000) END AS BIGINT) AS u2_micro,
           CASE WHEN den > 0 THEN
             CAST(num AS DOUBLE) < CAST(den AS DOUBLE) END
             AS naive_beats_walk
    FROM st
    """,
)
def q_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X396 — Theil's U2 = sqrt(Σ(y_t−y_{t−1})² / Σy_{t−1}²) on the
    zero-filled daily purchase-cents series (X303 rule: the calendar
    grid, not observed days, so gaps count as zero revenue).

    Exactness: the grid and both sums of squares are exact integers
    (cents² × days stays far inside DECIMAL(38) at any SF); the lone
    sqrt is one identical-input double behind a micro round; the
    skill flag compares the INTEGER sums cross-multiplied (num < den)
    — no float in the boolean. Scale shape: fact → daily rollup →
    calendar-sized self-join (never fact-sized) → 1 row."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100, 0) AS DECIMAL(38,0))"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        )
        .cast("decimal(38,0)")
        .alias("y")
    )
    span = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = F.broadcast(span).select(
        F.explode(
            F.sequence(F.lit(0), F.datediff("d1", "d0"))
        ).alias("i")
    )
    obs = daily.crossJoin(F.broadcast(span)).select(
        F.datediff("d", "d0").alias("i"), "y"
    )
    dense = grid.join(obs, "i", "left").select(
        "i",
        F.coalesce(F.col("y"), F.lit(0).cast("decimal(38,0)")).alias(
            "y"
        ),
    )
    bside = dense.select(
        (F.col("i") + 1).alias("i"), F.col("y").alias("yprev")
    )
    lagd = dense.join(bside, "i")
    st = lagd.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n1"),
        F.sum(F.expr("(y - yprev) * (y - yprev)"))
        .cast("decimal(38,0)")
        .alias("num"),
        F.sum(F.expr("yprev * yprev"))
        .cast("decimal(38,0)")
        .alias("den"),
    )
    return st.select(
        F.expr("CAST(n1 + 1 AS BIGINT)").alias("n_days"),
        F.col("num").cast("long").alias("sum_sq_diff"),
        F.col("den").cast("long").alias("sum_sq_prev"),
        F.expr(
            "CAST(CASE WHEN den > 0 THEN"
            " round(sqrt(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
            "       * 1000000) END AS BIGINT)"
        ).alias("u2_micro"),
        F.expr(
            "CASE WHEN den > 0 THEN"
            " CAST(num AS DOUBLE) < CAST(den AS DOUBLE) END"
        ).alias("naive_beats_walk"),
    )


# --------------------------------------------------------------------------
# X397 — distinct-n diversity (the self-BLEU complement): corpus-level
# distinct 1/2/3-gram ratios per source — the generation-diversity
# screen (low distinct-n = mode collapse / template spam) that
# complements X226's repetition gate, which is per-document.
# --------------------------------------------------------------------------
@query(
    "q_distinct_ngrams",
    oracle="""
    WITH toks AS (
      SELECT source, string_split(lower(text), ' ') AS t
      FROM documents
    ),
    g1 AS (
      SELECT source, unnest(t) AS g FROM toks
    ),
    g2 AS (
      SELECT source, array_to_string(t[s:s+1], ' ') AS g
      FROM (SELECT source, t, unnest(range(1, len(t))) AS s
            FROM toks WHERE len(t) >= 2)
    ),
    g3 AS (
      SELECT source, array_to_string(t[s:s+2], ' ') AS g
      FROM (SELECT source, t, unnest(range(1, len(t) - 1)) AS s
            FROM toks WHERE len(t) >= 3)
    ),
    s1 AS (SELECT source, CAST(count(*) AS HUGEINT) AS t1,
                  CAST(count(DISTINCT g) AS HUGEINT) AS d1
           FROM g1 GROUP BY 1),
    s2 AS (SELECT source, CAST(count(*) AS HUGEINT) AS t2,
                  CAST(count(DISTINCT g) AS HUGEINT) AS d2
           FROM g2 GROUP BY 1),
    s3 AS (SELECT source, CAST(count(*) AS HUGEINT) AS t3,
                  CAST(count(DISTINCT g) AS HUGEINT) AS d3
           FROM g3 GROUP BY 1)
    SELECT s1.source AS source,
           CAST(t1 AS BIGINT) AS n_tokens,
           CAST(d1 * 1000000 // t1 AS BIGINT) AS distinct1_micro,
           CAST(d2 * 1000000 // t2 AS BIGINT) AS distinct2_micro,
           CAST(d3 * 1000000 // t3 AS BIGINT) AS distinct3_micro
    FROM s1 JOIN s2 USING (source) JOIN s3 USING (source)
    ORDER BY source
    """,
)
def q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X397 — corpus-level distinct-1/2/3-gram ratios per source
    (distinct-n, Li et al.'s diversity metric; 1 − distinct-n is the
    self-BLEU-style redundancy). ZERO floats: gram totals and
    distincts are exact integers, ratios are integer micro-units via
    div. Scale shape: three gram explosions (gram volume ≤ 3× token
    volume) → per-source count-distinct aggregates (map-side partial
    on the gram key) → #sources join. Output ≤ #sources rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.split(F.lower("text"), " ").alias("t")
    )

    def grams(n: int, out: str) -> DataFrame:
        if n == 1:
            g = toks.select(
                "source", F.explode("t").alias("g")
            )
        else:
            g = toks.filter(F.size("t") >= n).select(
                "source",
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(t) - {n - 1}),"
                        f" i -> concat_ws(' ', slice(t, i, {n})))"
                    )
                ).alias("g"),
            )
        return g.groupBy("source").agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias(f"t{n}"),
            F.countDistinct("g").cast("decimal(38,0)").alias(f"d{n}"),
        )

    s1, s2, s3 = grams(1, "d1"), grams(2, "d2"), grams(3, "d3")
    return (
        s1.join(s2, "source")
        .join(s3, "source")
        .select(
            "source",
            F.col("t1").cast("long").alias("n_tokens"),
            F.expr("CAST(d1 * 1000000 div t1 AS BIGINT)").alias(
                "distinct1_micro"
            ),
            F.expr("CAST(d2 * 1000000 div t2 AS BIGINT)").alias(
                "distinct2_micro"
            ),
            F.expr("CAST(d3 * 1000000 div t3 AS BIGINT)").alias(
                "distinct3_micro"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# X398 — OOV rate of a held-out split against the training split's
# vocabulary: the tokenizer/vocab-coverage check run before committing
# a vocab (X258's fertility tells you tokens-per-word; THIS tells you
# what the vocab simply cannot express).
# --------------------------------------------------------------------------
@query(
    "q_oov_rate",
    oracle="""
    WITH tagged AS (
      SELECT source, text,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
               ::BIGINT % 10 AS bucket
      FROM documents
    ),
    train_vocab AS (
      SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS term
      FROM tagged WHERE bucket < 8
    ),
    held AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS term
      FROM tagged WHERE bucket >= 8
    ),
    st AS (
      SELECT h.source,
             CAST(count(*) AS HUGEINT) AS total,
             CAST(count(*) FILTER (v.term IS NULL) AS HUGEINT) AS oov
      FROM held h LEFT JOIN train_vocab v ON h.term = v.term
      GROUP BY 1
    )
    SELECT source, CAST(total AS BIGINT) AS n_tokens,
           CAST(oov AS BIGINT) AS n_oov,
           CAST(oov * 1000000 // total AS BIGINT) AS oov_micro
    FROM st ORDER BY source
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X398 — held-out OOV rate per source: docs split 80/20 by the
    shared 15-hex md5(doc_id) bucket (the deterministic-membership
    idiom — no RNG state), train-split distinct tokens form the
    vocabulary, held-out tokens left-join it. ZERO floats (integer
    micro-unit rate). Scale shape: vocab is a distinct on the token
    key (map-side partial); the membership probe is a broadcast-able
    vocab join (vocab ≪ corpus by Heaps' law); one per-source
    aggregate. Output ≤ #sources rows."""
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        "source",
        "text",
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT) % 10"
        ).alias("bucket"),
    )
    vocab = (
        tagged.filter(F.col("bucket") < 8)
        .select(
            F.explode(F.split(F.lower("text"), " ")).alias("term")
        )
        .distinct()
        .withColumn("__in_vocab", F.lit(1))
    )
    held = tagged.filter(F.col("bucket") >= 8).select(
        "source",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    )
    st = (
        held.join(F.broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("total"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            )
            .cast("decimal(38,0)")
            .alias("oov"),
        )
    )
    return st.select(
        "source",
        F.col("total").cast("long").alias("n_tokens"),
        F.col("oov").cast("long").alias("n_oov"),
        F.expr("CAST(oov * 1000000 div total AS BIGINT)").alias(
            "oov_micro"
        ),
    ).orderBy("source")


# --------------------------------------------------------------------------
# X399 — greenlist watermark detection (Kirchenbauer et al.): z-score
# of green-token frequency per document under a γ=1/4 md5-derived
# greenlist — the screen a curation pipeline runs to keep
# synthetically-watermarked model output OUT of training data.
# --------------------------------------------------------------------------
_WM_SALT = "wm16"


@query(
    "q_watermark_detect",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    hits AS (
      SELECT doc_id, source,
             CAST(count(*) AS HUGEINT) AS t,
             CAST(count(*) FILTER (
               ('0x' || substr(md5(term || '|{_WM_SALT}'), 1, 15))
                 ::BIGINT % 4 = 0) AS HUGEINT) AS g
      FROM toks GROUP BY 1, 2
    ),
    z AS (
      SELECT doc_id, source, t, g,
             CAST(round((4.0 * CAST(g AS DOUBLE) - CAST(t AS DOUBLE))
                  / (2.0 * sqrt(3.0 * CAST(t AS DOUBLE))) * 1000000)
                  AS BIGINT) AS z_micro
      FROM hits WHERE t > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (z_micro > 4000000) AS BIGINT)
             AS n_flagged,
           CAST(max(z_micro) AS BIGINT) AS max_z_micro,
           CAST(SUM(g) * 1000000 // SUM(t) AS BIGINT)
             AS green_rate_micro
    FROM z GROUP BY source ORDER BY source
    """,
)
def q_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X399 — Kirchenbauer-style watermark screen: greenlist = tokens
    whose shared 15-hex md5(term|salt) integer ≡ 0 mod 4 (γ = 1/4,
    context-free variant — detectable without the generator's key
    schedule), per-doc z = (g − γT)/√(Tγ(1−γ)) = (4g − T)/(2√(3T)).

    Exactness: hits and totals are exact integers; z is one
    identical-input double (single sqrt) behind a micro round;
    per-source green rate is the integer micro-unit Σg·1e6 div ΣT;
    the 4σ flag compares micro INTEGERS. On clean human text the
    flag rate is ~0 by construction — the screen's value is the
    z distribution itself (a watermarked subset shifts it hard
    right). Scale shape: one token explosion → per-doc aggregate
    (map-side combined) → per-source rollup. Output ≤ #sources."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    )
    hits = toks.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("t"),
        F.sum(
            F.expr(
                f"CASE WHEN CAST(conv(substr(md5(term || '|{_WM_SALT}'),"
                " 1, 15), 16, 10) AS BIGINT) % 4 = 0 THEN 1 ELSE 0 END"
            )
        )
        .cast("decimal(38,0)")
        .alias("g"),
    )
    z = hits.filter(F.col("t") > 0).select(
        "source",
        "t",
        "g",
        F.expr(
            "CAST(round((4.0 * CAST(g AS DOUBLE) - CAST(t AS DOUBLE))"
            " / (2.0 * sqrt(3.0 * CAST(t AS DOUBLE))) * 1000000)"
            " AS BIGINT)"
        ).alias("z_micro"),
    )
    return (
        z.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("z_micro") > 4000000, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_flagged"),
            F.max("z_micro").cast("long").alias("max_z_micro"),
            F.expr(
                "CAST(SUM(g) * 1000000 div SUM(t) AS BIGINT)"
            ).alias("green_rate_micro"),
        )
        .orderBy("source")
    )

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


def test_hll_overlap_exact_in_sparse_regime(spark):
    """X212: inclusion–exclusion intersection from per-set sketches.
    Sparse regime → estimates are exact, so the derived overlap is
    too: A = u0..u99, B = u50..u149 ⇒ |A∩B| = 50, |A∪B| = 150."""
    from mysql_cdc_to_http_spark.operators.sketches import hll_overlap

    rows = [("a", f"u{i:03d}") for i in range(100)] + [
        ("b", f"u{i:03d}") for i in range(50, 150)
    ]
    df = spark.createDataFrame(
        [("g", lbl, u) for lbl, u in rows], "grp string, lbl string, user string"
    ).repartition(5)
    partials = hll_partials(df, ["grp"], "lbl", "user", lgk=12)
    got = hll_overlap(
        partials, ["grp"], ("a", "b"), set_col="segment"
    ).collect()[0]
    assert (got["est_a"], got["est_b"]) == (100, 100)
    assert got["est_union"] == 150
    assert got["est_intersection"] == 50


def test_hll_overlap_disjoint_clamps_at_zero(spark):
    """Disjoint sets: est∩ = max(0, a + b − union) must clamp — sketch
    noise can push a + b below the union estimate, and a negative
    cardinality must never escape the operator."""
    from mysql_cdc_to_http_spark.operators.sketches import hll_overlap

    rows = [("a", f"x{i}") for i in range(200)] + [
        ("b", f"y{i}") for i in range(200)
    ]
    df = spark.createDataFrame(
        [("g", lbl, u) for lbl, u in rows], "grp string, lbl string, user string"
    )
    partials = hll_partials(df, ["grp"], "lbl", "user", lgk=12)
    got = hll_overlap(
        partials, ["grp"], ("a", "b"), set_col="segment"
    ).collect()[0]
    assert got["est_intersection"] >= 0
    assert got["est_intersection"] <= 4  # ≈0 up to sketch noise


def test_hll_overlap_missing_label_is_null_not_zero(spark):
    """A label with NO partial in a group must surface as NULL est_b /
    NULL est_intersection — not a plausible-looking 0 overlap (round-9
    advice: ``greatest`` skips NULLs, so the unguarded form reported
    est∩ = 0 for a set that was never sketched). A missing set stays
    distinguishable from an empty one."""
    from mysql_cdc_to_http_spark.operators.sketches import hll_overlap

    df = spark.createDataFrame(
        [("g", "a", f"u{i}") for i in range(20)],
        "grp string, lbl string, user string",
    )
    partials = hll_partials(df, ["grp"], "lbl", "user", lgk=12)
    got = hll_overlap(
        partials, ["grp"], ("a", "b"), set_col="segment"
    ).collect()[0]
    assert got["est_a"] == 20
    assert got["est_b"] is None
    assert got["est_intersection"] is None


def test_hll_overlap_single_exchange_plan(spark):
    """The three estimates (A, B, union) come from ONE hash aggregate
    over the partials — conditional union-aggs share the shuffle; a
    second exchange would mean the overlap re-shuffles per set."""
    from mysql_cdc_to_http_spark.operators.sketches import hll_overlap

    df = spark.createDataFrame(
        [("g", "a", "u1"), ("g", "b", "u2")],
        "grp string, lbl string, user string",
    )
    partials = hll_partials(df, ["grp"], "lbl", "user")
    plan = (
        hll_overlap(partials, ["grp"], ("a", "b"), set_col="segment")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one exchange builds the partials, one rolls them up — never more
    assert plan.count("Exchange") <= 2


# --- count-min sketch -------------------------------------------------------

from mysql_cdc_to_http_spark.operators.sketches import (  # noqa: E402
    cms_estimate,
    cms_merge,
    cms_partials,
)


def _cms_toy(spark, n_parts=4):
    # skewed frequencies: value v{i} appears (i+1)*3 times, 3 segments
    rows = [
        (j % 3, f"v{i}") for i in range(12) for j in range((i + 1) * 3)
    ]
    return spark.createDataFrame(rows, "day int, v string").repartition(n_parts)


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    df = _cms_toy(spark)
    merged = cms_merge(cms_partials(df, "day", "v", depth=4, width=512))
    probes = df.select("v").distinct()
    est = {
        r["v"]: r["freq_est"]
        for r in cms_estimate(merged, probes, "v", depth=4, width=512).collect()
    }
    truth = {f"v{i}": (i + 1) * 3 for i in range(12)}
    for v, t in truth.items():
        assert est[v] >= t, f"{v}: CMS underestimated {est[v]} < {t}"
    # 12 keys x 4 rows into width 512: collisions are possible but the
    # min over 4 independent rows makes an inflated estimate require a
    # collision in EVERY row — assert exactness, which also pins the
    # bucket function (md5 prefix, salt, modulus) against drift.
    assert est == truth


def test_cms_merge_equals_direct_build(spark):
    df = _cms_toy(spark, n_parts=7)
    merged = cms_merge(cms_partials(df, "day", "v", depth=4, width=64))
    direct = cms_merge(cms_partials(df, F.lit(0), "v", depth=4, width=64))
    assert sorted(merged.collect()) == sorted(direct.collect())


def test_cms_partition_invariant(spark):
    outs = []
    for n_parts in (1, 7):
        df = _cms_toy(spark, n_parts)
        merged = cms_merge(cms_partials(df, "day", "v", depth=2, width=64))
        outs.append(sorted(merged.collect()))
    assert outs[0] == outs[1]


def test_cms_absent_key_estimates_from_collisions_only(spark):
    df = _cms_toy(spark)
    merged = cms_merge(cms_partials(df, "day", "v", depth=4, width=512))
    ghost = spark.createDataFrame([("never-seen",)], "v string")
    [row] = cms_estimate(merged, ghost, "v", depth=4, width=512).collect()
    # left-join coalesce path: an unseen key reads 0 unless all 4 of its
    # buckets collide with real keys (impossible here: 12 keys, 512 wide)
    assert row["freq_est"] == 0


def test_cms_join_size_tightens_with_width(spark, sf_dir):
    """Wider sketches collide less: est(width=4096) <= est(width=256),
    and both over-estimate the true join size."""
    import pyspark.sql.functions as F

    from mysql_cdc_to_http_spark.operators.sketches import (
        cms_join_size,
        cms_merge,
        cms_partials,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    true_sz = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    ests = {}
    for width in (256, 4096):
        a = cms_merge(cms_partials(orders, F.lit(0), "o_custkey", width=width))
        b = cms_merge(cms_partials(cust, F.lit(0), "c_custkey", width=width))
        ests[width] = cms_join_size(a, b).collect()[0]["est_join_size"]
    assert ests[4096] <= ests[256]
    assert ests[256] >= true_sz and ests[4096] >= true_sz


def test_rolling_distinct_equals_bruteforce(spark, sf_dir_oracle):
    """X158: the bitmap rolling-window distinct must equal the
    brute-force day-range COUNT(DISTINCT) — independent formulation, so
    a shared bitmap bug can't hide (the oracle uses the same words)."""
    import duckdb

    from mysql_cdc_to_http_spark.queries import all_queries

    got = {
        str(r["d"]): r["distinct_users_7d"]
        for r in all_queries()["q_rolling_distinct"](
            spark, sf_dir_oracle
        ).collect()
    }
    con = duckdb.connect()
    ref = dict(
        con.execute(
            f"""
            WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d
                          FROM '{sf_dir_oracle}/events.parquet'),
            brute AS (
              SELECT days.d, count(DISTINCT e.user_id) AS n
              FROM days JOIN '{sf_dir_oracle}/events.parquet' e
                ON CAST(e.ts AS DATE)
                   BETWEEN days.d - INTERVAL 6 DAY AND days.d
              GROUP BY days.d
            )
            SELECT CAST(d AS VARCHAR), n FROM brute
            """
        ).fetchall()
    )
    assert got == ref

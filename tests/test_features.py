"""Feature-engineering operator semantics + plan shape
(operators/features.py): normalization, fixed-edge binning, PSI."""

from __future__ import annotations

import pyspark.sql.functions as F

from mysql_cdc_to_http_spark.operators.features import (
    feature_stats,
    fixed_bin,
    normalize_features,
    psi_drift,
)


def test_normalize_zscore_and_minmax_values(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 20.0)],
        "g string, x double",
    )
    out = {
        (r["g"], r["x"]): r
        for r in normalize_features(df, ["x"], ["g"]).collect()
    }
    # group a: mean 2, std 1 → z = -1, 0, 1; minmax over [1,3]
    assert out[("a", 1.0)]["x_z"] == -1.0
    assert out[("a", 3.0)]["x_z"] == 1.0
    assert out[("a", 2.0)]["x_mm"] == 0.5
    # group b: minmax endpoints
    assert out[("b", 10.0)]["x_mm"] == 0.0
    assert out[("b", 20.0)]["x_mm"] == 1.0


def test_normalize_constant_group_yields_null_not_inf(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0)], "g string, x double"
    )
    row = normalize_features(df, ["x"], ["g"]).collect()[0]
    assert row["x_z"] is None  # std = 0 → NULL, never inf
    assert row["x_mm"] is None  # range = 0 → NULL


def test_exact_decimal_stats_partitioning_invariant(spark):
    """The exact_decimal_scale mode's whole point: identical stats from
    any partitioning. Compare 1-partition vs 16-partition layouts."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") * 0.01 + 3.25).alias("x"),
    )
    one = feature_stats(
        df.coalesce(1), ["x"], ["g"], exact_decimal_scale=2
    ).collect()
    many = feature_stats(
        df.repartition(16), ["x"], ["g"], exact_decimal_scale=2
    ).collect()
    a = {r["g"]: (r["x__mean"], r["x__std"]) for r in one}
    b = {r["g"]: (r["x__mean"], r["x__std"]) for r in many}
    assert a == b  # bit-identical, not approximately equal


def test_normalize_stats_join_is_broadcast(spark, sf_dir):
    """The stats side must broadcast — the fact stream is never
    re-shuffled for the normalize join."""
    from mysql_cdc_to_http_spark.queries import all_queries

    df = all_queries()["q_feature_scale"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fixed_bin_clamps_edges(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (4.9,), (99.9,), (250.0,)], "v double"
    )
    bins = [
        r[0]
        for r in df.select(
            fixed_bin(F.col("v"), 0.0, 100.0, 20).alias("b")
        ).collect()
    ]
    assert bins == [0, 0, 0, 19, 19]


def test_psi_identical_slices_is_zero_and_nonnegative(spark):
    df = spark.range(0, 500).select((F.col("id") % 97).cast("double").alias("v"))
    same = psi_drift(df, df, "v", 0.0, 100.0, n_bins=10).collect()
    assert all(r["psi_total"] == 0.0 for r in same)
    # shifted slice: every (p-q)·ln(p/q) term is ≥ 0 ⇒ total ≥ 0
    shifted = df.select((F.col("v") + 30.0).alias("v"))
    drift = psi_drift(df, shifted, "v", 0.0, 100.0, n_bins=10).collect()
    assert all(r["psi_bin"] >= 0.0 for r in drift)
    assert drift[0]["psi_total"] > 0.1  # a 30-unit shift is real drift


def test_psi_empty_bins_finite(spark):
    """Bins present on one side only must contribute finitely (Laplace
    smoothing), not NaN/inf."""
    import math

    a = spark.createDataFrame([(1.0,)] * 10, "v double")
    b = spark.createDataFrame([(99.0,)] * 10, "v double")
    rows = psi_drift(a, b, "v", 0.0, 100.0, n_bins=10).collect()
    assert all(math.isfinite(r["psi_bin"]) for r in rows)


def test_bigrams_short_arrays_empty(spark):
    from mysql_cdc_to_http_spark.operators.text import bigrams

    df = spark.createDataFrame(
        [("a b c",), ("solo",), ("",)], "text string"
    )
    rows = df.select(
        bigrams(F.split(F.lower("text"), r"\s+")).alias("b")
    ).collect()
    assert [len(r["b"]) for r in rows] == [2, 0, 0]
    assert rows[0]["b"][0].asDict() == {"w1": "a", "w2": "b"}


def test_ranked_prefix_sums_matches_global_window(spark):
    from pyspark.sql.window import Window as W

    from mysql_cdc_to_http_spark.operators.sampling import ranked_prefix_sums

    df = spark.range(0, 500).select(
        F.concat(F.lit("t"), F.col("id")).alias("k"),
        (F.col("id") % 37 + 1).alias("v"),
    )
    order = [F.col("v").desc(), F.col("k")]
    got = {
        r["k"]: r["v__cum"]
        for r in ranked_prefix_sums(df, order, ["v"], n_ranges=16).collect()
    }
    ref = {
        r["k"]: r["ref"]
        for r in df.withColumn(
            "ref",
            F.sum("v").over(
                W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
            ),
        ).collect()
    }
    assert got == ref


def test_ranked_prefix_sums_range_count_invariant(spark):
    from mysql_cdc_to_http_spark.operators.sampling import ranked_prefix_sums

    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("v")
    )
    order = [F.col("v").desc(), F.col("k")]
    a = sorted(
        (r["k"], r["v__cum"])
        for r in ranked_prefix_sums(df, order, ["v"], n_ranges=4).collect()
    )
    b = sorted(
        (r["k"], r["v__cum"])
        for r in ranked_prefix_sums(df, order, ["v"], n_ranges=64).collect()
    )
    assert a == b


def test_collocations_topk_no_global_sort(spark, sf_dir):
    """Top-100 must be TakeOrderedAndProject; the unigram joins must be
    broadcast (no SortMergeJoin anywhere in the plan)."""
    from mysql_cdc_to_http_spark.queries import all_queries

    df = all_queries()["q_collocations"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_vocab_coverage_no_global_rownumber_window(spark, sf_dir):
    """The ranked cumsum must NOT contain a row_number/global window over
    the full vocab — the plan's only single-partition frame is the
    range-totals cumsum (pmod key)."""
    from mysql_cdc_to_http_spark.queries import all_queries

    df = all_queries()["q_vocab_coverage"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan
    # monotone non-decreasing share reaching 1.0 at the vocab tail (the
    # sf corpus vocab is < 1000 types, so the last row closes the curve)
    rows = df.collect()
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-9


def test_bloom_prefilter_no_false_negatives_and_prunes(spark):
    from mysql_cdc_to_http_spark.operators.sketches import (
        bloom_bitmap,
        bloom_prefilter,
    )

    dim = spark.range(0, 100).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 10_000).select(F.col("id").alias("k"))
    bitmap = bloom_bitmap(dim, "k", m_bits=1 << 16)
    kept = bloom_prefilter(probe, "k", bitmap, m_bits=1 << 16)
    kept_keys = {r["k"] for r in kept.collect()}
    dim_keys = {r["k"] for r in dim.collect()}
    # every true member survives (no false negatives)
    assert dim_keys <= kept_keys
    # the filter actually prunes: with 100 keys in 2^16 bits the FP rate
    # is ~0.15%, so ~10k probes keep ≈ 100 members + a tiny FP tail
    assert len(kept_keys) < 300
    # bitmap is word-bounded regardless of build rows
    assert bitmap.count() <= (1 << 16) // 64


def test_bloom_bitmap_is_two_phase_and_broadcast(spark, sf_dir):
    from mysql_cdc_to_http_spark.queries import all_queries

    df = all_queries()["q_join_bloom"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the bitmap reaches the probe side as a broadcast, never a shuffle
    # join; the exact customer join is also hash-based here
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_equi_depth_bins_equal_counts_and_order(spark):
    from mysql_cdc_to_http_spark.operators.features import equi_depth_bins

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 1000).cast("double").alias("v")
    )
    out = equi_depth_bins(df, "v", ["k"], k=10)
    counts = {
        r["bin"]: r["c"]
        for r in out.groupBy("bin").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert counts == {i: 100 for i in range(10)}  # exactly equal depth
    # bins respect value order: max of bin i < min of bin i+1
    bounds = {
        r["bin"]: (r["lo"], r["hi"])
        for r in out.groupBy("bin")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    for i in range(9):
        assert bounds[i][1] <= bounds[i + 1][0]


def test_pca_power_converges_on_anisotropic_data(spark):
    """On data WITH a dominant direction (planted lambda1 >> lambda2),
    3 power iterations must recover it: |cos| > 0.99. (The shipped
    corpus is near-isotropic — top eigenvalue ratio ~0.99, measured —
    so convergence there is impossible by construction for ANY
    power-iteration count that matters; the operator contract is the
    exact 3-iteration trajectory, and quality is asserted here on a
    spectrum where the method applies.)"""
    import numpy as np

    from mysql_cdc_to_http_spark.operators.clustering import pca_power_scores

    rng = np.random.RandomState(7)
    direction = rng.randn(64)
    direction /= np.linalg.norm(direction)
    X = rng.randn(400, 64) * 0.05 + np.outer(rng.randn(400) * 3.0, direction)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["pc1"] for r in pca_power_scores(df, iters=3).collect()}
    Xc = X - X.mean(axis=0)
    ref = Xc @ direction
    ours = np.array([got[i] for i in range(len(X))])
    cos = abs(float(ours @ ref) / (np.linalg.norm(ours) * np.linalg.norm(ref)))
    assert cos > 0.99, f"pc1 direction off: |cos|={cos:.4f}"


def test_pca_power_trajectory_matches_numpy_replica(spark, sf_dir_oracle):
    """Implementation parity: the engine's 3-iteration trajectory equals
    a numpy replica of the SAME algorithm (same 6-dp rounds, same
    HALF_UP quantization) on the real corpus — pinning the operator
    semantics independently of the DuckDB oracle."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.clustering import pca_power_scores

    q6 = Decimal("0.000001")

    def r6(arr):
        return np.array(
            [float(Decimal(float(x)).quantize(q6, ROUND_HALF_UP)) for x in arr]
        )

    emb = load_table(spark, sf_dir_oracle, "embeddings")
    rows = sorted((r["vec_id"], r["embedding"]) for r in emb.collect())
    X = np.array([v for _, v in rows], dtype=np.float64)
    n = len(X)
    mu = r6(X.mean(axis=0))
    Xc = X - mu
    w = np.full(64, 0.125)
    for _ in range(3):
        s = Xc @ w
        t = r6(Xc.T @ s / n)
        lam2 = sum(Decimal(float(x)).quantize(q6, ROUND_HALF_UP) ** 2 for x in t)
        w = r6(t / math.sqrt(float(lam2)))
    ref = {vid: float(Decimal(float(sc)).quantize(q6, ROUND_HALF_UP))
           for (vid, _), sc in zip(rows, Xc @ w)}
    got = {r["vec_id"]: r["pc1"] for r in pca_power_scores(emb, iters=3).collect()}
    diffs = [abs(got[k] - ref[k]) for k in ref]
    assert max(diffs) <= 2e-6, f"max diff {max(diffs)}"


def test_pareto_frontier_helper_known_points(spark):
    """Level-reduction + exclusive cummax must reproduce the strict-
    dominance skyline on hand-checked points (incl. equal-price and
    equal-point ties)."""
    from mysql_cdc_to_http_spark.operators.sampling import (
        ranked_exclusive_cummax,
    )
    from pyspark.sql import functions as F

    pts = [
        (1, 100, 5), (2, 100, 9), (3, 100, 9),   # level 100: max 9 (2,3 tie)
        (4, 200, 9),                              # dominated (pricier, same)
        (5, 200, 12),                             # frontier
        (6, 300, 11),                             # dominated by 5
        (7, 300, 15),                             # frontier
    ]
    df = spark.createDataFrame(pts, "id long, price long, size long")
    levels = df.groupBy("price").agg(F.max("size").alias("m"))
    scanned = ranked_exclusive_cummax(levels, [F.col("price").asc()], "m")
    keep = scanned.filter(
        F.col("m__premax").isNull() | (F.col("m") > F.col("m__premax"))
    ).select("price", F.col("m").alias("size"))
    got = sorted(
        r["id"] for r in df.join(keep, ["price", "size"]).collect()
    )
    assert got == [2, 3, 5, 7]


def test_grouped_ranks_matches_plain_window(spark):
    """Two-level grouped rank must equal Window.partitionBy row_number
    on every row, across range-boundary placements."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from mysql_cdc_to_http_spark.operators.sampling import grouped_ranks

    rng = random.Random(3)
    rows = [
        (rng.choice(["a", "b", "c"]), rng.randint(0, 50), i)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = grouped_ranks(df, ["g"], [F.col("v"), F.col("id")], n_ranges=7)
    ref = df.withColumn(
        "rk", F.row_number().over(W.partitionBy("g").orderBy("v", "id"))
    ).withColumn("n", F.count(F.lit(1)).over(W.partitionBy("g")))
    j = got.join(ref, ["g", "v", "id"])
    bad = j.filter(
        (F.col("__grank") != F.col("rk")) | (F.col("__gn") != F.col("n"))
    ).count()
    assert bad == 0


def test_grouped_prefix_sums_matches_plain_window(spark):
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from mysql_cdc_to_http_spark.operators.sampling import (
        grouped_prefix_sums,
    )

    rng = random.Random(11)
    rows = [
        (rng.choice(["a", "b"]), rng.randint(0, 30), rng.randint(1, 9), i)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, v long, w long, id long")
    got = grouped_prefix_sums(
        df, ["g"], [F.col("v"), F.col("id")], ["w"], n_ranges=5
    )
    ref = df.withColumn(
        "c",
        F.sum("w").over(
            W.partitionBy("g")
            .orderBy("v", "id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    ).withColumn("t", F.sum("w").over(W.partitionBy("g")))
    j = got.join(ref, ["g", "v", "id", "w"])
    bad = j.filter(
        (F.col("w__cum") != F.col("c")) | (F.col("w__tot") != F.col("t"))
    ).count()
    assert bad == 0


def test_quantile_sketch_error_bound_and_merge_shape(spark, sf_dir):
    """X208: (a) every estimate is within one bin WIDTH of the exact
    rank-k value (the equi-width histogram's deterministic error
    bound); (b) the binning aggregate combines map-side (partial hash
    aggregate below the exchange) — the mergeability that makes it a
    sketch, same gate as the HLL/CMS partials."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.queries import all_queries

    out = {
        (r.q_num, r.q_den): (r.k, r.est)
        for r in all_queries()["q_quantile_sketch"](spark, sf_dir).collect()
    }
    v = (
        load_table(spark, sf_dir, "orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"))
    )
    vals = sorted(r.v for r in v.collect())
    n = len(vals)
    width = (vals[-1] - vals[0]) // 64 + 1
    for (qn, qd), (k, est) in out.items():
        assert k == (qn * n + qd - 1) // qd
        exact = vals[k - 1]  # k is a 1-based rank
        assert abs(est - exact) <= width, (qn, qd, est, exact, width)

    plan = (
        all_queries()["q_quantile_sketch"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # the bin-count aggregate must have a partial phase below its
    # exchange: HashAggregate(keys=[bin...], functions=[partial_count...)
    assert re.search(r"partial_count", plan), plan[:1500]


def test_sample_quantiles_dkw_bound_holds(spark, sf_dir):
    """X215: every group's p50/p90 estimate from the 256-row md5 spine
    must land within the DKW band of the full-group CDF, and the
    estimator must degrade to the exact quantile when the sample IS
    the group (m == n at sf0.001 for small groups)."""
    from mysql_cdc_to_http_spark.queries.features import q_sample_quantiles

    rows = q_sample_quantiles(spark, sf_dir).collect()
    assert rows, "no groups"
    for r in rows:
        assert r.p50_within_dkw and r.p90_within_dkw, r
        assert r.m <= 256 and r.m <= r.n
        assert r.est_p50_cents <= r.est_p90_cents
        if r.m == r.n:  # sample == population → estimate is exact
            assert abs(r.cnt_le_p50 * 2 - r.n) <= 2 * 1  # ceil rank slack


def test_ols_trend_matches_numpy_lstsq(spark, sf_dir):
    """X216: the integer-moment closed form must agree with an
    independent float OLS (numpy lstsq) on the same daily series to
    within one output quantum (1 micro-unit slope / 1 dollar
    intercept / 1 bp R²) — certifying the algebra, not just parity."""
    import numpy as np

    from mysql_cdc_to_http_spark.queries.features import q_ols_trend

    got = {r.o_orderpriority: r for r in q_ols_trend(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = (
        orders.groupBy(
            "o_orderpriority",
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
            ).alias("x"),
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
                " AS BIGINT) div 100"
            ).alias("y")
        )
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.o_orderpriority, []).append((r.x, r.y))
    for prio, pts in series.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        A = np.vstack([xs, np.ones_like(xs)]).T
        (slope, intercept), res, _, _ = np.linalg.lstsq(A, ys, rcond=None)
        r = got[prio]
        assert abs(r.slope_micro_per_day - slope * 1e6) <= 2, (prio, slope)
        assert abs(r.intercept_dollars - intercept) <= 2, (prio, intercept)
        ss_tot = float(((ys - ys.mean()) ** 2).sum())
        if ss_tot > 0:
            r2 = 1.0 - float(res[0]) / ss_tot if len(res) else 1.0
            assert abs(r.r2_bp - r2 * 10000) <= 2, (prio, r2)


def test_conformal_ols_pooled_coverage_and_quantile_rank(spark, sf_dir):
    """X220: pooled coverage must clear the 85% gate, each group's q̂
    must be a positive width, and the pooled figure must equal the
    recomputed ratio of the emitted counts."""
    from mysql_cdc_to_http_spark.queries.features import q_conformal_ols

    rows = q_conformal_ols(spark, sf_dir).collect()
    assert len(rows) == 5
    tot_cov = sum(r.n_covered for r in rows)
    tot_test = sum(r.n_test for r in rows)
    pooled = (tot_cov * 1000000) // tot_test
    for r in rows:
        assert r.pooled_coverage_micro == pooled
        assert r.pooled_coverage_ok
        assert r.q_dollars is not None and r.q_dollars > 0
        assert 0 < r.n_covered <= r.n_test


def test_rbo_identical_and_disjoint_lists(spark):
    """X222 weight algebra on constructed rankings: identical top-10
    lists give RBO_min@10 = 1 − 0.9^10 (651321 micro, the truncated
    form's ceiling); disjoint lists give 0."""
    from mysql_cdc_to_http_spark.queries.features import (
        _RBO_DEN,
        _RBO_WEIGHTS,
    )

    # identical lists: o_d = d
    num = sum(w * d for d, w in _RBO_WEIGHTS.items())
    assert (num * 1000000) // _RBO_DEN == 651321
    # monotone: overlaps can only accumulate
    assert all(
        _RBO_WEIGHTS[d] > _RBO_WEIGHTS[d + 1] for d in range(1, 10)
    ), "top-weightedness must hold"


def test_rbo_overlap_profile_is_monotone(spark, sf_dir):
    """X222 on real data: o_d is non-decreasing in depth, bounded by d,
    and rbo_micro equals the integer recomputation from the profile."""
    from mysql_cdc_to_http_spark.queries.features import (
        _RBO_DEN,
        _RBO_WEIGHTS,
        q_rbo,
    )

    rows = sorted(q_rbo(spark, sf_dir).collect(), key=lambda r: r.depth)
    assert [r.depth for r in rows] == list(range(1, 11))
    ovs = [r.overlap for r in rows]
    assert all(0 <= o <= d for d, o in zip(range(1, 11), ovs))
    assert all(a <= b for a, b in zip(ovs, ovs[1:]))
    num = sum(_RBO_WEIGHTS[d] * o for d, o in zip(range(1, 11), ovs))
    assert rows[0].rbo_micro == (num * 1000000) // _RBO_DEN

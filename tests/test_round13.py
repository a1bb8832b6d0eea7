"""Round-13: ADVICE fixes pinned by tests.

The headline fix is q_krippendorff's alpha denominator: alpha =
1 - Do/De with Do = A/(6N) and De = 2*nT*(3N-nT)/(3N(3N-1)) gives
alpha = 1 - A(3N-1)/(4*nT*(3N-nT)) — the round-12 code (and its
mirrored oracle, which is why hash parity never caught it) divided by
2*nT*(3N-nT). The round-12 test only covered A=0 (perfect agreement),
where the factor cancels. These tests pin partial disagreement with a
hand-computed expected value AND the internal-consistency identity
alpha ~= 1 - Do/De that the buggy version violated.
"""

from __future__ import annotations

from mysql_cdc_to_http_spark.queries import QUERIES


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, lang, "src", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


# Docs engineered to hit exact per-unit true-rating counts n1 against
# the three gates (R1: >=50 tokens AND >=2 distinct stopwords;
# R2: TTR >= 0.45; R3: >=60 tokens):
_N3 = " ".join(["the", "a", "data", "spark"] + [f"tok{i}" for i in range(80)])
_N2 = " ".join(["the", "a"] + [f"tok{i}" for i in range(53)])  # 55 toks
_N1 = " ".join(["x"] * 65)  # length gate only
_N0 = "doc doc doc"


def test_krippendorff_partial_disagreement(spark, tmp_path):
    """X262: alpha on a mixed panel matches the hand-derived nominal
    formula alpha = 1 - A(3N-1)/(4*nT*(3N-nT))."""
    rows = []
    for i, txt in enumerate([_N3, _N3, _N0, _N0, _N2, _N2, _N1, _N1]):
        rows.append((i + 1, txt, "en"))
    sf = _write_docs(spark, tmp_path, rows)
    r = QUERIES["q_krippendorff"](spark, sf).collect()[0]

    n1s = [3, 3, 0, 0, 2, 2, 1, 1]
    n = len(n1s)
    nt = sum(n1s)
    a = 2 * sum(v * (3 - v) for v in n1s)
    assert r["n_units"] == n
    assert r["n_true_ratings"] == nt
    assert r["disagreement_pairs"] == a
    expected = 1_000_000 - (a * (3 * n - 1) * 1_000_000) // (
        4 * nt * (3 * n - nt)
    )
    assert r["alpha_micro"] == expected
    # regression guard against the r12 denominator (2*nT*(3N-nT)):
    wrong = 1_000_000 - (a * (3 * n - 1) * 1_000_000) // (
        2 * nt * (3 * n - nt)
    )
    assert r["alpha_micro"] != wrong


def test_krippendorff_internally_consistent(spark, tmp_path):
    """X262: alpha_micro ~= 1e6 - do_micro*1e6/de_micro (the identity
    the buggy denominator violated by ~2x). Tolerance covers integer
    truncation of the three separate divisions."""
    rows = []
    for i, txt in enumerate([_N3, _N0, _N2, _N2, _N1]):
        rows.append((i + 1, txt, "en"))
    sf = _write_docs(spark, tmp_path, rows)
    r = QUERIES["q_krippendorff"](spark, sf).collect()[0]
    assert r["de_micro"] > 0
    recomputed = 1_000_000 - r["do_micro"] * 1_000_000 // r["de_micro"]
    assert abs(r["alpha_micro"] - recomputed) <= 5, (
        r["alpha_micro"],
        recomputed,
    )


def test_krippendorff_advisor_example(spark, tmp_path):
    """X262: the 2-unit panel {1,0,0},{1,1,0} has true nominal alpha
    -1/9 (N=2, T=6, nT=3, A=8: 1 - 8*5/(4*3*3) = -1/9)."""
    sf = _write_docs(
        spark, tmp_path, [(1, _N1, "en"), (2, _N2, "en")]
    )
    r = QUERIES["q_krippendorff"](spark, sf).collect()[0]
    assert r["n_true_ratings"] == 3
    assert r["disagreement_pairs"] == 8
    # -1/9 in micro-units, truncated division: 1e6 - 40e6//36
    assert r["alpha_micro"] == 1_000_000 - (8 * 5 * 1_000_000) // 36


# ---------------------------------------------------------------------------
# Round-13 operator semantics (X281-X288): planted fixtures pin the
# claims the DuckDB oracles can't state (the oracle mirrors the
# formula; these pin that the formula measures what it says).
# ---------------------------------------------------------------------------


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, ts, u, et, v in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", __import__("pyspark").sql.functions.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_zipf_slope_separates_power_law_from_uniform(spark, tmp_path):
    """X281: a corpus with freq(word_i) ~ 1/i fits slope near -1 (in
    micro-units) with high R2; a perfectly uniform corpus fits slope
    ~0. The slope column is the power-law detector it claims to be."""
    zipf_words = []
    for i in range(1, 21):
        zipf_words += [f"w{i:02d}"] * (240 // i)
    uni_words = [f"u{i:02d}" for i in range(1, 21)] * 12
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, " ".join(zipf_words), "zz"), (2, " ".join(uni_words), "uu")],
    )
    rows = {
        r["lang"]: r for r in QUERIES["q_zipf_fit"](spark, sf).collect()
    }
    z, u = rows["zz"], rows["uu"]
    assert -1_300_000 < z["slope_micro"] < -700_000, z
    assert z["r2_bp"] > 9500, z
    assert u["slope_micro"] == 0, u


def test_dp_histogram_noise_matches_mechanism(spark, tmp_path):
    """X282: the per-cell noise equals the inverse-CDF Laplace draw
    recomputed independently in Python from the same salted md5 —
    the release is the published mechanism, derandomized."""
    import hashlib
    import math

    sf = _write_docs(
        spark, tmp_path, [(i, "hello world", "en") for i in range(10)]
    )
    rows = QUERIES["q_dp_histogram"](spark, sf).collect()
    assert {r["eps_milli"] for r in rows} == {500, 1000, 2000}
    for r in rows:
        assert r["true_count"] == 10
        h = int(
            hashlib.md5(
                f"en|{r['eps_milli']}|dp-v1".encode()
            ).hexdigest()[:15],
            16,
        )
        uh = float(h) / 1152921504606846976.0 - 0.5
        lap = (
            -(1000.0 / r["eps_milli"])
            * (1.0 if uh >= 0 else -1.0)
            * math.log(1.0 - 2.0 * abs(uh))
        )
        assert r["noisy_micro"] == 10 * 1_000_000 + round(lap * 1_000_000)


def test_mattr_is_length_invariant(spark, tmp_path):
    """X283: a 10-word cycle has exactly 10 distinct types in every
    25-token window, so MATTR = 0.4 at ANY length — while plain TTR
    would shrink from 10/50 to 10/200. The length confound is gone."""
    cycle = [f"c{i}" for i in range(10)]
    short = " ".join(cycle * 5)  # 50 tokens
    long = " ".join(cycle * 20)  # 200 tokens
    sf = _write_docs(
        spark, tmp_path, [(1, short, "en"), (2, long, "en")]
    )
    rows = {
        r["doc_id"]: r for r in QUERIES["q_mattr"](spark, sf).collect()
    }
    assert rows[1]["mattr_micro"] == 400_000
    assert rows[2]["mattr_micro"] == 400_000
    assert rows[2]["n_windows"] == 176


def test_holt_winters_matches_fraction_fold(spark, tmp_path):
    """X284: the engine's dyadic integer recurrence equals an
    independent exact Fraction fold of the textbook Holt equations."""
    from fractions import Fraction

    vals = [100.00, 180.00, 290.00, 370.00, 520.00]
    rows = [
        (i, f"2024-01-0{i + 1} 12:00:00", 1, "click", vals[i])
        for i in range(5)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = QUERIES["q_holt_winters"](spark, sf).collect()
    assert len(r) == 1 and r[0]["n_days"] == 5
    cents = [round(v * 100) for v in vals]
    l, b = Fraction(cents[0]), Fraction(0)
    for y in cents[1:]:
        l_new = (y + l + b) / 2
        b = (l_new - l + b) / 2
        l = l_new
    def trunc(fr):
        return int(fr) if fr >= 0 else -int(-fr)
    assert r[0]["level_cents"] == trunc(l)
    assert r[0]["trend_cents"] == trunc(b)
    assert r[0]["forecast7_cents"] == trunc(l + 7 * b)


def test_stratified_kfold_exact_balance(spark, tmp_path):
    """X287: lang with 7 docs splits 2/2/1/1/1 across 5 folds; lang
    with 5 docs splits 1/1/1/1/1 — and the audit column says so."""
    docs = [(i, f"text {i}", "aa") for i in range(7)]
    docs += [(100 + i, f"text {i}", "bb") for i in range(5)]
    sf = _write_docs(spark, tmp_path, docs)
    rows = QUERIES["q_stratified_kfold"](spark, sf).collect()
    aa = sorted(r["n_docs"] for r in rows if r["lang"] == "aa")
    bb = sorted(r["n_docs"] for r in rows if r["lang"] == "bb")
    assert aa == [1, 1, 1, 2, 2]
    assert bb == [1, 1, 1, 1, 1]
    assert all(r["balanced"] for r in rows)


def test_toxicity_lexicon_gates_on_rate_not_count(spark, tmp_path):
    """X286: one 'dup' in 10 tokens (10%) flags; one 'dup' in 100
    tokens (1%) does not — the gate is a rate, so long docs are not
    over-flagged."""
    short = "dup " + " ".join(f"x{i}" for i in range(9))
    long = "dup " + " ".join(f"y{i}" for i in range(99))
    sf = _write_docs(
        spark, tmp_path, [(1, short, "en"), (2, long, "en")]
    )
    rows = {
        r["category"]: r
        for r in QUERIES["q_toxicity_lexicon"](spark, sf).collect()
    }
    dup = rows["duplication"]
    assert dup["total_hits"] == 2
    assert dup["n_flagged"] == 1
    assert dup["flagged_share_micro"] == 500_000


def test_ivf_probe_sweep_monotone_and_exhaustive_floor(spark):
    """X285: recall and scanned rows are nondecreasing in nprobe, and
    every sweep point scans at most the whole corpus (the brute-force
    ceiling the curve is measured against)."""
    rows = QUERIES["q_ivf_probe_sweep"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_np = {r["nprobe"]: r for r in rows}
    assert list(by_np) == [1, 2, 4]
    corpus_n = 500 - 10
    prev_recall, prev_scanned = -1, -1
    for np_ in (1, 2, 4):
        r = by_np[np_]
        assert r["recall_micro"] >= prev_recall
        assert r["scanned_rows"] >= prev_scanned
        assert r["scanned_rows"] <= r["n_queries"] * corpus_n
        prev_recall, prev_scanned = r["recall_micro"], r["scanned_rows"]


def test_stream_histogram_equals_batch(spark):
    """X288: complete-mode streaming histogram == the same batch
    aggregate (stream==batch, asserted Spark-vs-Spark locally on top
    of the DuckDB oracle parity)."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r["win_start"], r["bin"], r["bin_lo"], r["n"])
        for r in QUERIES["q_stream_histogram"](spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    want = {
        (r["win_start"], r["bin"], r["bin_lo"], r["n"])
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("win"),
            F.floor(F.col("value") / F.lit(50.0))
            .cast("long")
            .alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            "bin",
            (F.col("bin") * 50).cast("long").alias("bin_lo"),
            "n",
        )
        .collect()
    }
    assert got == want


def test_ndcg_perfect_vs_degraded_ranking(spark, tmp_path):
    """X289: a query whose label dominates the corpus top ranks gets
    ndcg 1.0; nDCG decreases as relevant docs sit lower. Pinned with
    a constructed embedding space where cosine order is forced."""
    import math

    # query 0 = axis e0, label 7. Corpus: 3 docs near e0 with label 7
    # (ranks 1-3, all relevant -> dcg == idcg), plus 20 orthogonal-ish
    # fillers with label 1.
    rows = [(0, [1.0] + [0.0] * 63, 7)]
    for j in range(3):
        v = [1.0] + [0.0] * 63
        v[1 + j] = 0.1 * (j + 1)  # slightly different, still closest
        rows.append((10 + j, v, 7))
    for j in range(20):
        v = [0.0] * 64
        v[10 + (j % 50)] = 1.0
        v[0] = 0.001
        rows.append((40 + j, v, 1))
    sf = _write_embeddings(spark, tmp_path, rows)
    r = {x["query_id"]: x for x in QUERIES["q_ndcg_eval"](spark, sf).collect()}
    row = r[0]
    assert row["n_rel"] == 3
    # all 3 relevant docs rank 1-3 => DCG == IDCG exactly
    assert row["dcg_micro"] == row["idcg_micro"]
    assert row["ndcg_micro"] == 1_000_000
    g = lambda i: round(1_000_000 / math.log2(i + 1))
    assert row["idcg_micro"] == g(1) + g(2) + g(3)


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, v, lab in rows],
        "vec_id long, embedding array<float>, label int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def test_hill_recovers_known_pareto_exponent(spark, tmp_path):
    """X290: on an exact Pareto(alpha=2) quantile grid x_i = u^(-1/2),
    the Hill estimate lands within 10% of alpha = 2."""
    rows = []
    for i in range(500):
        u = (i + 1) / 501.0
        x = round(u ** (-1.0 / 2.0), 2)
        rows.append((i, "2024-01-01 00:00:00", 1, "click", x))
    sf = _write_events(spark, tmp_path, rows)
    r = QUERIES["q_hill_tail"](spark, sf).collect()
    assert len(r) == 1
    alpha = r[0]["alpha_micro"] / 1e6
    assert 1.8 < alpha < 2.2, alpha


def test_ks_detects_shift_and_accepts_identical(spark, tmp_path):
    """X291: identical samples give D = 0 (not rejected); a hard
    location shift gives D = 1 (rejected at 95%)."""
    rows = []
    for i in range(200):
        rows.append((i, "2024-01-01 00:00:00", 1, "click", 10.0 + i % 7))
        rows.append(
            (1000 + i, "2024-01-01 00:00:00", 1, "error", 10.0 + i % 7)
        )
    sf = _write_events(spark, tmp_path, rows)
    r = QUERIES["q_ks_test"](spark, sf).collect()[0]
    assert r["d_num"] == 0 and not r["reject_95"]

    rows2 = []
    for i in range(200):
        rows2.append((i, "2024-01-01 00:00:00", 1, "click", 10.0 + i % 7))
        rows2.append(
            (1000 + i, "2024-01-01 00:00:00", 1, "error", 900.0 + i % 7)
        )
    sf2 = _write_events(spark, tmp_path / "b", rows2)
    r2 = QUERIES["q_ks_test"](spark, sf2).collect()[0]
    assert r2["ks_micro"] == 1_000_000 and r2["reject_95"]


def test_mannwhitney_matches_scipy_formula(spark, tmp_path):
    """X292: U and tie-corrected z equal an independent pure-Python
    computation on a small tied sample."""
    import math

    a = [10.0, 12.0, 12.0, 15.0, 18.0]
    b = [11.0, 12.0, 19.0, 20.0, 22.0]
    rows = [(i, "2024-01-01 00:00:00", 1, "click", v) for i, v in enumerate(a)]
    rows += [
        (100 + i, "2024-01-01 00:00:00", 1, "error", v)
        for i, v in enumerate(b)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = QUERIES["q_mannwhitney"](spark, sf).collect()[0]
    pooled = sorted(a + b)
    # average ranks with ties
    ranks = {}
    i = 0
    t_term = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        c = j - i
        ranks[pooled[i]] = (i + 1 + j) / 2.0
        t_term += c**3 - c
        i = j
    r1 = sum(ranks[v] for v in a)
    n1, n2 = len(a), len(b)
    n = n1 + n2
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert r["u1_double"] == int(2 * u1)
    assert r["tie_correction"] == t_term
    sigma = math.sqrt(n1 * n2 * (n**3 - n - t_term) / (12.0 * n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / sigma
    assert abs(r["z_micro"] - round(z * 1e6)) <= 2


def test_threshold_sweep_best_is_argmax(spark, tmp_path):
    """X293: the flagged row carries the max F1, and ties flag the
    LOWEST threshold."""
    docs = [(i, " ".join(f"w{j}" for j in range(20)), "en") for i in range(6)]
    docs += [(10 + i, "x x x x x", "de") for i in range(4)]
    sf = _write_docs(spark, tmp_path, docs)
    rows = QUERIES["q_threshold_sweep"](spark, sf).collect()
    best = [r for r in rows if r["is_best"]]
    assert len(best) == 1
    mx = max(r["f1_micro"] for r in rows if r["f1_micro"] is not None)
    assert best[0]["f1_micro"] == mx
    ties = [
        r["threshold_micro"] for r in rows if r["f1_micro"] == mx
    ]
    assert best[0]["threshold_micro"] == min(ties)


def test_lift_table_top_decile_concentrates(spark, tmp_path):
    """X294: when all positives score highest, decile 1 captures
    them all (lift = 10x at 10% depth), and the last decile's
    cumulative lift is exactly 1.0."""
    docs = [
        (i, " ".join(f"w{j}" for j in range(30)), "en") for i in range(5)
    ]  # distinct-heavy -> TTR 1.0, positives
    docs += [
        (100 + i, "x x x x x x", "de") for i in range(45)
    ]  # low TTR negatives
    sf = _write_docs(spark, tmp_path, docs)
    rows = {r["decile"]: r for r in QUERIES["q_lift_table"](spark, sf).collect()}
    assert rows[1]["n_pos"] == 5 and rows[1]["cum_pos"] == 5
    assert rows[1]["capture_micro"] == 1_000_000
    assert rows[1]["lift_micro"] == 10_000_000
    assert rows[10]["lift_micro"] == 1_000_000


def test_auc_separable_and_random(spark, tmp_path):
    """X295: a perfectly separating score gives AUC 1.0; identical
    score distributions give exactly 0.5 (tie handling: every
    pos-neg pair contributes exactly 1/2)."""
    docs = [(i, " ".join(f"w{j}" for j in range(20)), "en") for i in range(5)]
    docs += [(10 + i, "x x x x", "de") for i in range(5)]
    sf = _write_docs(spark, tmp_path, docs)
    r = QUERIES["q_auc_roc"](spark, sf).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (5, 5)
    assert r["auc_micro"] == 1_000_000

    same = [(i, "a b c d", "en") for i in range(5)]
    same += [(10 + i, "p q r s", "de") for i in range(5)]
    sf2 = _write_docs(spark, tmp_path / "b", same)
    r2 = QUERIES["q_auc_roc"](spark, sf2).collect()[0]
    assert r2["auc_micro"] == 500_000


def test_fairness_four_fifths_gate(spark, tmp_path):
    """X296: a group selected at half the reference rate fails the
    four-fifths rule; the reference group passes at ratio 1.0."""
    # en: 4/4 selected (TTR 1.0). de: 2 selected, 2 rejected.
    docs = [(i, " ".join(f"w{j}" for j in range(10)), "en") for i in range(4)]
    docs += [(10 + i, " ".join(f"v{j}" for j in range(10)), "de") for i in range(2)]
    docs += [(20 + i, "x x x x x x x x", "de") for i in range(2)]
    sf = _write_docs(spark, tmp_path, docs)
    rows = {r["lang"]: r for r in QUERIES["q_fairness_audit"](spark, sf).collect()}
    assert rows["en"]["impact_ratio_micro"] == 1_000_000
    assert rows["en"]["passes_four_fifths"]
    assert rows["de"]["impact_ratio_micro"] == 500_000
    assert not rows["de"]["passes_four_fifths"]


def test_stream_rate_alert_fires_on_spike(spark, tmp_path):
    """X297: a 10x spike hour alerts; steady hours do not; the first
    3 hours never alert (insufficient trailing history)."""
    rows = []
    eid = 0
    for h in range(6):
        n = 40 if h == 4 else 4
        for i in range(n):
            rows.append(
                (eid, f"2024-01-01 {h:02d}:{i % 60:02d}:00", 1, "click", 1.0)
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = QUERIES["q_stream_rate_alert"](spark, sf).collect()
    alerts = [r for r in out if r["alert"]]
    assert len(alerts) == 1
    assert alerts[0]["n"] == 40
    assert all(not r["alert"] for r in out[:3])


def test_silhouette_separated_vs_mixed(spark, tmp_path):
    """X298: two tight, well-separated blobs score near +1; the same
    points all assigned sensible clusters never score negative means
    on this geometry."""
    rows = []
    for i in range(20):
        v = [0.0] * 64
        v[0] = 1.0 + 0.001 * i  # blob A on e0
        rows.append((i, v, 0))
    for i in range(20):
        v = [0.0] * 64
        v[1] = 1.0 + 0.001 * i  # blob B on e1
        rows.append((100 + i, v, 1))
    sf = _write_embeddings(spark, tmp_path, rows)
    out = QUERIES["q_silhouette"](spark, sf).collect()
    # k=4 on two blobs: clusters covering a blob core score high;
    # no cluster mean should be strongly negative, and the two
    # dominant clusters (init ids 0 and, after Lloyd, the e1 blob)
    # must be > 0.9.
    means = sorted(
        (r["mean_silhouette_micro"] for r in out), reverse=True
    )
    assert means[0] > 900_000
    total = sum(r["n_points"] for r in out)
    assert total == 40


def test_elbow_inertia_monotone_in_k(spark, tmp_path):
    """X299: inertia is non-increasing as k grows (more centroids
    never fit worse on this fixture), and every point is assigned at
    every k."""
    import random

    rng = random.Random(3)
    rows = []
    for i in range(60):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((i, v, i % 10))
    sf = _write_embeddings(spark, tmp_path, rows)
    out = {r["k"]: r for r in QUERIES["q_elbow_curve"](spark, sf).collect()}
    assert [out[k]["n_points"] for k in (2, 4, 8)] == [60, 60, 60]
    assert out[2]["inertia_micro"] >= out[4]["inertia_micro"] >= out[8]["inertia_micro"]

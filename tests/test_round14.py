"""Round-14 additions (X327-X336): planted fixtures with hand-computed
expectations — corpora engineered so the right answer is derivable by
hand, pinning the algebra independently of the mirrored oracles (the
krippendorff lesson, applied at birth instead of five rounds later)."""

from __future__ import annotations

import datetime
import math

from mysql_cdc_to_http_spark.queries import QUERIES

from tests.test_planted_stats import (
    _kappa_docs,
    _write_docs,
    _write_events,
    _write_orders,
)


def _write_customers(spark, tmp_path, rows):
    """rows: list of (c_custkey, c_mktsegment)."""
    df = spark.createDataFrame(
        [(ck, f"cust{ck}", 1, 0.0, seg) for ck, seg in rows],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )


# ---------------------------------------------------------------------------
# X327 McNemar — discordant cells from the shared kappa fixture
# ---------------------------------------------------------------------------
def test_mcnemar_planted(spark, tmp_path):
    """Kappa fixture: n10=3, n01=2 → (3−2)²·1e6/5 = 200000; far below
    the 3.841 gate."""
    sf = _write_docs(spark, tmp_path, _kappa_docs())
    [r] = QUERIES["q_mcnemar"](spark, sf).collect()
    assert (r["n10"], r["n01"]) == (3, 2)
    assert r["n_discordant"] == 5
    assert r["mcnemar_micro"] == 200_000
    assert not r["marginals_differ"]


def test_mcnemar_zero_discordant_null(spark, tmp_path):
    """Only concordant cells (raters always agree): statistic NULL,
    verdict FALSE — the degenerate-denominator contract."""
    docs = _kappa_docs()
    sf = _write_docs(spark, tmp_path, [docs[0]] * 3 + ["x x x x"] * 3)
    [r] = QUERIES["q_mcnemar"](spark, sf).collect()
    assert r["n_discordant"] == 0
    assert r["mcnemar_micro"] is None and not r["marginals_differ"]


def test_mcnemar_asymmetric_flags(spark, tmp_path):
    """b=20, c=0 → statistic = 20·1e6 = 2e7 > 3.841e6 → flags."""
    docs = _kappa_docs()
    # ra_only docs give (ra=T, rb=F) = n10
    sf = _write_docs(spark, tmp_path, [docs[4]] * 20)
    [r] = QUERIES["q_mcnemar"](spark, sf).collect()
    assert r["n10"] == 20 and r["n01"] == 0
    assert r["mcnemar_micro"] == 20_000_000
    assert r["marginals_differ"]


# ---------------------------------------------------------------------------
# X328 Cramér's V — 2×2 perfect association → V = 1
# ---------------------------------------------------------------------------
def test_cramers_v_perfect_association(spark, tmp_path):
    """en all-short, de all-long (2×2): χ² = N exactly (the X301
    planted identity), min_dim = 1 → V² = 1 → v_milli = 1000."""
    rows = [("x" * 100, "en")] * 10 + [("x" * 500, "de")] * 10
    docs = [(t, lang) for t, lang in rows]
    df = spark.createDataFrame(
        [
            (i + 1, t, lang, "src", len(t))
            for i, (t, lang) in enumerate(docs)
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    [r] = QUERIES["q_cramers_v"](spark, str(tmp_path)).collect()
    assert r["n"] == 20 and r["min_dim"] == 1
    assert r["chi2_micro"] == 20_000_000  # chi2 == N for 2x2 perfect
    assert r["v2_micro"] == 1_000_000
    assert r["v_milli"] == 1000


def test_cramers_v_independent_is_zero(spark, tmp_path):
    """Identical length mix in both languages → χ² = 0 → V = 0."""
    rows = []
    for lang in ("en", "de"):
        for length in (100, 300, 500):
            rows += [("x" * length, lang)] * 4
    df = spark.createDataFrame(
        [
            (i + 1, t, lang, "src", len(t))
            for i, (t, lang) in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    [r] = QUERIES["q_cramers_v"](spark, str(tmp_path)).collect()
    assert r["chi2_micro"] == 0 and r["v2_micro"] == 0 and r["v_milli"] == 0


# ---------------------------------------------------------------------------
# X329 Cochran's Q — hand ledger on engineered gate patterns
# ---------------------------------------------------------------------------
def test_cochran_q_planted(spark, tmp_path):
    """4 'both+long' docs (rows 1,1,1), 3 'rule-only long' docs
    (1,0,1), 3 'neither short' docs (0,0,0):
    G = (7, 4, 7), T = 18, ΣR² = 4·9 + 3·4 + 0 = 48.
    num = 2·(3·(49+16+49) − 324) = 2·(342−324) = 36; den = 54−48 = 6
    → Q = 6 → q_micro = 6_000_000 > 5_991_000 → gates differ."""
    # both_long: 60 distinct 5-char tokens + 2 stopwords -> ra=T
    # (>=50 tok, 2 stopwords), rb=T (TTR=1), >=300 chars -> g3=T
    both_long = "the data " + " ".join(f"wa{i:03d}" for i in range(58))
    assert len(both_long) >= 300
    # rule_long: 2 stopwords + 150 repeats of 'x' -> ra=T (152 tok,
    # 2 stopwords), rb=F (TTR=3/152), >=300 chars -> g3=T
    rule_long = "the data " + " ".join(["x"] * 150)
    assert len(rule_long) >= 300
    neither_short = "x x x x"  # all gates F
    sf = _write_docs(
        spark,
        tmp_path,
        [both_long] * 4 + [rule_long] * 3 + [neither_short] * 3,
    )
    out = {r["gate"]: r for r in QUERIES["q_cochran_q"](spark, sf).collect()}
    assert out["rule"]["successes"] == 7
    assert out["ttr"]["successes"] == 4
    assert out["length"]["successes"] == 7
    r = out["rule"]
    assert r["q_micro"] == 6_000_000
    assert r["gates_differ"]


def test_cochran_q_identical_gates_degenerate(spark, tmp_path):
    """All docs pass all gates or none: den = k·T − ΣR² = 0 → NULL
    statistic, FALSE verdict."""
    both_long = "the data " + " ".join(f"wa{i:03d}" for i in range(58))
    assert len(both_long) >= 300
    sf = _write_docs(spark, tmp_path, [both_long] * 5 + ["x x x"] * 5)
    out = QUERIES["q_cochran_q"](spark, sf).collect()
    assert all(r["q_micro"] is None for r in out)
    assert not any(r["gates_differ"] for r in out)


# ---------------------------------------------------------------------------
# X330 odds ratio — kappa fixture ledger
# ---------------------------------------------------------------------------
def test_odds_ratio_planted(spark, tmp_path):
    """n11=4, n10=3, n01=2, n00=1: OR = 4·1/(3·2) = 2/3 → 666666
    micro; ln OR and the Woolf half-width from python math."""
    sf = _write_docs(spark, tmp_path, _kappa_docs())
    [r] = QUERIES["q_odds_ratio"](spark, sf).collect()
    assert r["or_micro"] == 666_666
    lor = math.log((4 * 1) / (3 * 2))
    hw = 2 * math.sqrt(1 / 4 + 1 / 3 + 1 / 2 + 1 / 1)
    assert r["log_or"] == round(lor, 6)
    assert r["ci_lo"] == round(lor - hw, 6)
    assert r["ci_hi"] == round(lor + hw, 6)
    assert not r["excludes_one"]  # |ln 2/3| = 0.405 << hw = 2.87


def test_odds_ratio_zero_cell_null(spark, tmp_path):
    """A zero cell → NULL estimate and FALSE verdict (explicit-NULL
    policy, no Haldane shift)."""
    docs = _kappa_docs()
    sf = _write_docs(spark, tmp_path, [docs[0]] * 3 + [docs[4]] * 3)
    [r] = QUERIES["q_odds_ratio"](spark, sf).collect()
    assert r["or_micro"] is None and r["log_or"] is None
    assert not r["excludes_one"]


# ---------------------------------------------------------------------------
# X331 HHI — monopoly vs perfect split
# ---------------------------------------------------------------------------
def test_hhi_monopoly_and_equal(spark, tmp_path):
    """Segment MONO: one customer → HHI = 1e6, effective N = 1.0.
    Segment QUAD: 4 equal customers → HHI = 250000, effective 4.0."""
    _write_customers(
        spark,
        tmp_path,
        [(1, "MONO"), (2, "QUAD"), (3, "QUAD"), (4, "QUAD"), (5, "QUAD")],
    )
    _write_orders(
        spark,
        tmp_path,
        [(1, 10.0), (2, 5.0), (3, 5.0), (4, 5.0), (5, 5.0)],
    )
    out = {
        r["segment"]: r
        for r in QUERIES["q_hhi_concentration"](spark, str(tmp_path)).collect()
    }
    assert out["MONO"]["hhi_micro"] == 1_000_000
    assert out["MONO"]["effective_n_micro"] == 1_000_000
    assert out["QUAD"]["hhi_micro"] == 250_000
    assert out["QUAD"]["effective_n_micro"] == 4_000_000
    assert out["QUAD"]["n_customers"] == 4


# ---------------------------------------------------------------------------
# X332 CUSUM — the identity S = P − min(P⁻,0) equals max(0, S+dev)
# ---------------------------------------------------------------------------
def test_cusum_planted_burst(spark, tmp_path):
    """Daily cents (10,10,10,100,10)·100: T=14000, n=5, dev = 5x−T:
    (−9000,−9000,−9000,36000,−9000); P: (−9000,−18000,−27000,9000,0);
    S = P − min(P⁻,0): (0,0,0,36000,27000). Alarm (S > 2T = 28000)
    fires on day 4 only — the sequential recurrence, hand-unrolled."""
    rows = [
        (i, 1, "click", v)
        for i, v in enumerate([10.0, 10.0, 10.0, 100.0, 10.0])
    ]
    # distinct days: encode via ts — _write_events pins same day, so
    # write events manually with day-spaced timestamps
    df = spark.createDataFrame(
        [
            (
                eid,
                datetime.datetime(2024, 1, 1 + eid),
                uid,
                et,
                float(v),
                "{}",
            )
            for eid, uid, et, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = QUERIES["q_cusum_alarm"](spark, str(tmp_path)).collect()
    assert [r["cents"] for r in out] == [1000, 1000, 1000, 10000, 1000]
    assert [r["dev_scaled"] for r in out] == [
        -9000, -9000, -9000, 36000, -9000,
    ]
    assert [r["cusum_scaled"] for r in out] == [0, 0, 0, 36000, 27000]
    assert [r["alarm"] for r in out] == [False, False, False, True, False]
    # independent sequential reference: S = max(0, S + dev)
    s, ref = 0, []
    for d in [-9000, -9000, -9000, 36000, -9000]:
        s = max(0, s + d)
        ref.append(s)
    assert [r["cusum_scaled"] for r in out] == ref


# ---------------------------------------------------------------------------
# X333 Poisson bootstrap — constant values collapse the CI
# ---------------------------------------------------------------------------
def test_poisson_bootstrap_constant_collapses(spark, tmp_path):
    """All orders cost 3.00: every replicate mean is exactly 3e6
    micro-dollars·1e-2 (30000 micro of cents·1e4 → 3000000), so
    point == ci_lo == ci_hi."""
    sf = _write_orders(spark, tmp_path, [(c, 3.0) for c in range(1, 41)])
    [r] = QUERIES["q_poisson_bootstrap"](spark, sf).collect()
    assert r["point_micro"] == 3_000_000
    assert r["ci_lo_micro"] == 3_000_000
    assert r["ci_hi_micro"] == 3_000_000
    assert r["n_orders"] == 40


def test_poisson_bootstrap_ci_brackets_point(spark, tmp_path):
    """Spread values: the order-statistic CI must bracket the point
    estimate and be non-degenerate."""
    sf = _write_orders(
        spark, tmp_path, [(c, float(c)) for c in range(1, 101)]
    )
    [r] = QUERIES["q_poisson_bootstrap"](spark, sf).collect()
    assert r["ci_lo_micro"] < r["point_micro"] < r["ci_hi_micro"]


# ---------------------------------------------------------------------------
# X334 Anderson–Darling — tiny-n hand ledger + point-mass rejection
# ---------------------------------------------------------------------------
def test_anderson_darling_tiny_ledger(spark, tmp_path):
    """n=2, values 100 and 400 → u = (v+0.5)/501: the full A²
    computed independently in python for the exact two-term sum."""
    sf = _write_events(
        spark, tmp_path, [(0, 1, "click", 100.0), (1, 1, "click", 400.0)]
    )
    [r] = QUERIES["q_anderson_darling"](spark, sf).collect()
    u = sorted([(100.0 + 0.5) / 501.0, (400.0 + 0.5) / 501.0])
    n = 2
    s = sum(
        (2 * (i + 1) - 1) * math.log(u[i])
        + (2 * (n - (i + 1)) + 1) * math.log(1 - u[i])
        for i in range(n)
    )
    assert r["n"] == 2
    assert r["a2"] == round(-n - s / n, 6)


def test_anderson_darling_point_mass_rejects(spark, tmp_path):
    """50 events all at value 3.0 — a point mass is maximally
    non-uniform, A² far above 2.492 → reject."""
    sf = _write_events(
        spark, tmp_path, [(i, 1, "click", 3.0) for i in range(50)]
    )
    [r] = QUERIES["q_anderson_darling"](spark, sf).collect()
    assert r["reject_uniform"] and r["a2"] > 2.492


# ---------------------------------------------------------------------------
# X335 tail dependence — comonotone vs anti-comonotone plants
# ---------------------------------------------------------------------------
def test_tail_dependence_comonotone(spark, tmp_path):
    """10 users, click spend = purchase spend = rank: the top-q sets
    coincide → λ_U = 1e6 at both q."""
    rows = []
    eid = 0
    for u in range(1, 11):
        rows.append((eid, u, "click", float(u))); eid += 1
        rows.append((eid, u, "purchase", float(u))); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r["q_pct"]: r for r in QUERIES["q_tail_dependence"](spark, sf).collect()}
    assert out[80]["n_x_tail"] == 2 and out[80]["n_joint"] == 2
    assert out[80]["lambda_u_micro"] == 1_000_000
    assert out[90]["n_x_tail"] == 1 and out[90]["lambda_u_micro"] == 1_000_000


def test_tail_dependence_antithetic_zero(spark, tmp_path):
    """Click spend ascending, purchase spend descending: the top
    quintiles are disjoint → λ_U = 0."""
    rows = []
    eid = 0
    for u in range(1, 11):
        rows.append((eid, u, "click", float(u))); eid += 1
        rows.append((eid, u, "purchase", float(11 - u))); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r["q_pct"]: r for r in QUERIES["q_tail_dependence"](spark, sf).collect()}
    assert out[80]["n_joint"] == 0 and out[80]["lambda_u_micro"] == 0
    assert out[90]["n_joint"] == 0 and out[90]["lambda_u_micro"] == 0


# ---------------------------------------------------------------------------
# X336 info gain — perfect predictor vs pure noise
# ---------------------------------------------------------------------------
def test_info_gain_perfect_and_noise(spark, tmp_path):
    """Balanced label (10 purchase / 10 click). value ≥ 50 ⇔ purchase
    → IG = H(Y) = ln 2. user parity orthogonal to the label → IG = 0.
    hour fixed at 0 for every event → single branch → IG = 0."""
    rows = []
    eid = 0
    for i in range(10):
        rows.append((eid, i, "purchase", 60.0)); eid += 1
        rows.append((eid, i + 100, "click", 10.0)); eid += 1
    # parity: purchases got users 0..9 (5 even/5 odd), clicks 100..109
    sf = _write_events(spark, tmp_path, rows)
    out = {r["feature"]: r for r in QUERIES["q_info_gain"](spark, sf).collect()}
    ln2 = round(math.log(2.0), 6)
    assert out["value_ge_50"]["h_y"] == ln2
    assert out["value_ge_50"]["info_gain"] == ln2
    assert out["user_parity"]["info_gain"] == 0.0
    assert out["hour_ge_12"]["info_gain"] == 0.0


# ---------------------------------------------------------------------------
# X337 Cronbach's alpha — 2-doc exact ledger + degenerate NULL
# ---------------------------------------------------------------------------
def test_cronbach_two_doc_ledger(spark, tmp_path):
    """n=2: each item's n-scaled variance is (a−b)²; v_t = (Σdᵢ)².
    Docs 'aa bb cc' (s=(8, 1e6, 3)) and 'aa aa aa aa' (s=(11, 250000,
    4)): d = (−3, 750000, −1), Σd² = 562500000010, (Σd)² =
    562494000016 → alpha = 1.5·(1 − Σd²/(Σd)²) → −16 micro
    (hand-derived; negative alpha = items anti-correlate)."""
    sf = _write_docs(spark, tmp_path, ["aa bb cc", "aa aa aa aa"])
    [r] = QUERIES["q_cronbach_alpha"](spark, sf).collect()
    d = [-3, 750_000, -1]
    vi = sum(x * x for x in d)
    vt = sum(d) ** 2
    assert r["var_items_scaled"] == vi == 562_500_000_010
    assert r["var_total_scaled"] == vt == 562_494_000_016
    assert r["alpha_micro"] == -((-(3 * (vt - vi)) * 1_000_000) // (2 * vt))
    assert r["alpha_micro"] == -16


def test_cronbach_identical_docs_null(spark, tmp_path):
    """All docs identical → zero total variance → NULL alpha."""
    sf = _write_docs(spark, tmp_path, ["aa bb cc"] * 4)
    [r] = QUERIES["q_cronbach_alpha"](spark, sf).collect()
    assert r["var_total_scaled"] == 0 and r["alpha_micro"] is None


# ---------------------------------------------------------------------------
# X338 weighted kappa — perfect agreement and maximal disagreement
# ---------------------------------------------------------------------------
def test_weighted_kappa_perfect(spark, tmp_path):
    """Docs only in cells (0,0) and (2,2): Σw·O = 0 → κw = 1."""
    short_short = "x x x"  # 5 chars (<250), 3 tokens (<40)
    long_long = " ".join(f"wa{i:03d}" for i in range(80))  # 479c, 80t
    assert len(long_long) >= 400
    sf = _write_docs(spark, tmp_path, [short_short] * 5 + [long_long] * 5)
    [r] = QUERIES["q_weighted_kappa"](spark, sf).collect()
    assert r["sum_w_obs"] == 0
    assert r["kappa_w_micro"] == 1_000_000


def test_weighted_kappa_maximal_disagreement(spark, tmp_path):
    """Docs only in (0,2) and (2,0) — every observation is a 2-step
    miss: ΣwO = 20, n·ΣwO = 200, Σw·r·c = 100 → κw = −1."""
    # i=0 (n_chars<250), j=2 (tokens>=60): 60 one-char tokens = 119 ch
    short_many = " ".join(["x"] * 60)
    assert len(short_many) < 250
    # i=2 (n_chars>=400), j=0 (tokens<40): 30 tokens of 15 chars
    long_few = " ".join("w" * 15 for _ in range(30))
    assert len(long_few) >= 400
    sf = _write_docs(spark, tmp_path, [short_many] * 5 + [long_few] * 5)
    [r] = QUERIES["q_weighted_kappa"](spark, sf).collect()
    assert r["sum_w_obs"] == 20
    assert r["sum_w_exp_scaled"] == 100
    assert r["kappa_w_micro"] == -1_000_000


# ---------------------------------------------------------------------------
# X339 Gopher repetition — engineered spam vs clean docs
# ---------------------------------------------------------------------------
def test_repetition_gopher_planted(spark, tmp_path):
    """'a a a a a a': 4 3-grams, 1 distinct → dup frac 750000 (> the
    0.18 gate) and top-token share 1e6 (> 0.20) — both flags fire.
    A 6-distinct-token doc: dup 0, top share 1/6 — no flags.
    mean_dup3 over the source = (3+0)·1e6 // 8 = 375000."""
    rows = ["a a a a a a", "q w e r t y"]
    sf = _write_docs(spark, tmp_path, rows)
    [r] = QUERIES["q_repetition_gopher"](spark, sf).collect()
    assert r["source"] == "src" and r["n_docs"] == 2
    assert r["n_flag_dup3"] == 1
    assert r["n_flag_toptok"] == 1
    assert r["mean_dup3_micro"] == (3 * 1_000_000) // 8


# ---------------------------------------------------------------------------
# X340 rank-biserial — dominance and symmetry plants
# ---------------------------------------------------------------------------
def test_rank_biserial_dominance(spark, tmp_path):
    """Type 'hi' values all above type 'lo': U(hi) = n₁n₂ →
    r = 1 − 2·U/(n₁n₂) = −1 (with this formula's orientation,
    dominance of the focal group gives −1e6; its mirror +1e6)."""
    rows = [(i, 1, "hi", 100.0 + i) for i in range(5)] + [
        (10 + i, 1, "lo", float(i)) for i in range(5)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in QUERIES["q_rank_biserial"](spark, sf).collect()}
    assert out["hi"]["u_doubled"] == 2 * 25
    assert out["hi"]["rank_biserial_micro"] == -1_000_000
    assert out["lo"]["u_doubled"] == 0
    assert out["lo"]["rank_biserial_micro"] == 1_000_000


def test_rank_biserial_identical_is_zero(spark, tmp_path):
    """Both types share one identical value — all ties: 2U = n₁n₂
    → r = 0 exactly."""
    rows = [(i, 1, "a", 7.0) for i in range(4)] + [
        (10 + i, 1, "b", 7.0) for i in range(4)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in QUERIES["q_rank_biserial"](spark, sf).collect()}
    assert out["a"]["u_doubled"] == 16  # n1*n2 = 16 (half-ties doubled)
    assert out["a"]["rank_biserial_micro"] == 0


# ---------------------------------------------------------------------------
# X341 Gumbel — independent python-math ledger over planted weeks
# ---------------------------------------------------------------------------
def test_gumbel_planted_ledger(spark, tmp_path):
    """Three weeks with known weekly maxima of daily cents: MoM fit
    recomputed independently in python."""
    # week 0 (Jan 1-7): days with values 10, 20 → daily maxima 1000,2000
    # week 1 (Jan 8-14): 30 → 3000 ; week 2: 50 → 5000
    rows = [
        (0, 1, "click", 10.0, datetime.datetime(2024, 1, 1)),
        (1, 1, "click", 20.0, datetime.datetime(2024, 1, 2)),
        (2, 1, "click", 30.0, datetime.datetime(2024, 1, 9)),
        (3, 1, "click", 50.0, datetime.datetime(2024, 1, 16)),
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, et, v, "{}") for eid, uid, et, v, ts in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    [r] = QUERIES["q_gumbel_maxima"](spark, str(tmp_path)).collect()
    maxima = [2000.0, 3000.0, 5000.0]
    n = len(maxima)
    m = sum(maxima) / n
    var = (sum(x * x for x in maxima) - sum(maxima) ** 2 / n) / (n - 1)
    beta = math.sqrt(var) * math.sqrt(6.0) / math.pi
    mu = m - 0.5772156649015329 * beta
    rl = mu + beta * 3.9415503865226063
    assert r["n_blocks"] == 3
    assert r["mean_max"] == round(m, 6)
    assert r["beta"] == round(beta, 6)
    assert r["mu"] == round(mu, 6)
    assert r["return_level_52"] == round(rl, 6)


# ---------------------------------------------------------------------------
# X342 capture–recapture — engineered catcher overlap
# ---------------------------------------------------------------------------
def test_capture_recapture_planted(spark, tmp_path):
    """4 identical docs (caught by BOTH half-hashes), 2 docs sharing
    only the first half, 4 unique docs: nA=6, nB=4, nAB=4 →
    Chapman = 7·5//5 − 1 = 6; observed union = 6 → coverage 1e6."""
    dup_full = "d d e e"
    half_a = "p p q1 r1"
    half_b = "p p q2 r2"
    uniq = [f"u{i} v{i} w{i} z{i}" for i in range(4)]
    sf = _write_docs(
        spark, tmp_path, [dup_full] * 4 + [half_a, half_b] + uniq
    )
    [r] = QUERIES["q_capture_recapture"](spark, sf).collect()
    assert (r["n_catch_a"], r["n_catch_b"], r["n_both"]) == (6, 4, 4)
    assert r["observed_union"] == 6
    assert r["chapman_est"] == 6
    assert r["coverage_micro"] == 1_000_000


def test_capture_recapture_misses_estimated(spark, tmp_path):
    """Catchers with PARTIAL overlap: nA=4, nB=4, nAB=2 → Chapman =
    5·5//3 − 1 = 7 > observed 6 — the estimator sizes the unseen
    tail (coverage 857142 micro)."""
    # 2 docs identical -> both catchers (nAB += 2)
    dup_full = "d d e e"
    # 2 docs share first half only -> A-only
    a1, a2 = "p p q1 r1", "p p q2 r2"
    # 2 docs share second half only -> B-only
    b1, b2 = "s1 t1 m m", "s2 t2 m m"
    sf = _write_docs(
        spark, tmp_path, [dup_full] * 2 + [a1, a2, b1, b2]
    )
    [r] = QUERIES["q_capture_recapture"](spark, sf).collect()
    assert (r["n_catch_a"], r["n_catch_b"], r["n_both"]) == (4, 4, 2)
    assert r["chapman_est"] == (5 * 5) // 3 - 1 == 7
    assert r["observed_union"] == 6
    assert r["coverage_micro"] == 6_000_000 // 7


# ---------------------------------------------------------------------------
# X343 BM25F — title weighting decides the ranking
# ---------------------------------------------------------------------------
def test_bm25f_title_outranks_body(spark, tmp_path):
    """Doc 1 has 'spark' inside the 8-token title (wtf=2), doc 2 has
    it only in the body (wtf=1); identical weighted lengths → same
    idf and norm, higher wtf wins. Full score recomputed in python."""
    d1 = "spark a1 a2 a3 a4 a5 a6 a7 b1 b2 b3 b4"  # spark in title
    d2 = "c1 c2 c3 c4 c5 c6 c7 c8 spark b2 b3 b4"  # spark in body
    sf = _write_docs(spark, tmp_path, [d1, d2])
    out = {r["doc_id"]: r["bm25f"] for r in QUERIES["q_bm25f"](spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[1] > out[2]
    # independent ledger: N=2, df(spark)=2, wdl = 2*8 + 4 = 20 both
    n, df = 2.0, 2.0
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    k1, b = 1.2, 0.75
    avgwdl = 20.0

    def score(wtf):
        return round(
            idf * wtf * (k1 + 1) / (wtf + k1 * (1 - b + b * 20.0 / avgwdl)),
            6,
        )

    assert out[1] == score(2) and out[2] == score(1)


# ---------------------------------------------------------------------------
# X344 Youden J — a perfectly separating threshold
# ---------------------------------------------------------------------------
def test_youden_j_perfect_separator(spark, tmp_path):
    """en docs TTR=1.0, de docs TTR=0.25: at thresholds in (0.25, 1.0]
    the gate is perfect (J = 1e6); is_best lands on the SMALLEST such
    threshold (300000, just above 250000)."""
    en = "q w e r"          # TTR 1.0 -> score 1000000
    de = "x x x x"          # TTR 0.25 -> score 250000
    rows = [(en, "en")] * 5 + [(de, "de")] * 5
    df = spark.createDataFrame(
        [(i + 1, t, lang, "src", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r["threshold_micro"]: r for r in QUERIES["q_youden_j"](spark, str(tmp_path)).collect()}
    assert out[300000]["j_micro"] == 1_000_000
    assert out[300000]["is_best"]
    assert out[0]["j_micro"] == 0  # everything passes -> TPR=FPR=1
    assert not out[0]["is_best"]
    assert sum(1 for r in out.values() if r["is_best"]) == 1


# ---------------------------------------------------------------------------
# X345 Simpson audit — the classic engineered reversal
# ---------------------------------------------------------------------------
def test_simpson_audit_engineered_reversal(spark, tmp_path):
    """Cohort a (even users) beats b INSIDE both strata, but the mix
    (a concentrated where values are small) flips the aggregate —
    both strata must flag reversed=True, OVERALL reversed=False."""
    rows = []
    eid = 0
    # stratum 'click': a mean 2.00 (n=10), b mean 1.00 (n=1)
    for _ in range(10):
        rows.append((eid, 2, "click", 2.0)); eid += 1
    rows.append((eid, 1, "click", 1.0)); eid += 1
    # stratum 'view': a mean 20.00 (n=1), b mean 10.00 (n=10)
    rows.append((eid, 2, "view", 20.0)); eid += 1
    for _ in range(10):
        rows.append((eid, 1, "view", 10.0)); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r["stratum"]: r for r in QUERIES["q_simpson_audit"](spark, sf).collect()}
    # per-stratum: a wins both
    assert out["click"]["a_gt_b"] and out["view"]["a_gt_b"]
    # overall: a = 40.00 over 11 events, b = 101.00 over 11 -> b wins
    assert not out["OVERALL"]["a_gt_b"]
    assert out["click"]["reversed"] and out["view"]["reversed"]
    assert not out["OVERALL"]["reversed"]


# ---------------------------------------------------------------------------
# X346 SPRT — hand-unrolled crossings
# ---------------------------------------------------------------------------
def test_sprt_accepts_h1_on_purchase_burst(spark, tmp_path):
    """Day 1: 8 purchases → LLR = 8·ln1.5 = 3.243721 ≥ ln19 →
    accept_h1 on day one."""
    rows = [(i, 1, "purchase", 1.0) for i in range(8)]
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_sprt_sequential"](spark, sf).collect()
    assert r["s_cum"] == 8 and r["n_cum"] == 8
    assert r["llr"] == round(8 * 0.4054651081081644, 6)
    assert r["decision"] == "accept_h1"


def test_sprt_accepts_h0_on_click_run(spark, tmp_path):
    """23 clicks, no purchases → LLR = 23·ln(0.875) = −3.071222 ≤
    −ln19 → accept_h0; at 22 it is still 'continue'."""
    rows = [(i, 1, "click", 1.0) for i in range(23)]
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_sprt_sequential"](spark, sf).collect()
    assert r["llr"] == round(23 * -0.13353139262452263, 6)
    assert r["decision"] == "accept_h0"
    rows22 = [(i, 1, "click", 1.0) for i in range(22)]
    sf2 = _write_events(spark, tmp_path, rows22)
    [r2] = QUERIES["q_sprt_sequential"](spark, sf2).collect()
    assert r2["decision"] == "continue"


# ---------------------------------------------------------------------------
# X347 quantile normalization — two sources converge on the pooled
# ---------------------------------------------------------------------------
def test_quantile_normalize_converges_sources(spark, tmp_path):
    """Source A lengths {1,2,3}, source B {101,102,103}: pooled order
    [1,2,3,101,102,103]; rank r of 3 maps to pos (6r+2)//3 = {2,4,6}
    → both sources map to values {2,101,103} (sum 206) — after
    normalization the sources are DISTRIBUTIONALLY IDENTICAL, which
    is the operator's contract."""
    texts_a = ["x" * k for k in (1, 2, 3)]
    texts_b = ["x" * k for k in (101, 102, 103)]
    df = spark.createDataFrame(
        [(i + 1, t, "en", "A", len(t)) for i, t in enumerate(texts_a)]
        + [(10 + i, t, "en", "B", len(t)) for i, t in enumerate(texts_b)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r["source"]: r for r in QUERIES["q_quantile_normalize"](spark, str(tmp_path)).collect()}
    assert out["A"]["sum_before"] == 6 and out["B"]["sum_before"] == 306
    assert out["A"]["sum_after"] == 206 and out["B"]["sum_after"] == 206
    assert out["A"]["mean_after_milli"] == out["B"]["mean_after_milli"]


# ---------------------------------------------------------------------------
# X348 Bloom FPR — no-collision and forced-collision plants
# ---------------------------------------------------------------------------
def test_bloom_fpr_small_member_set(spark, tmp_path):
    """One member word, many probe words: with 3 of 16384 bits set,
    false positives require a 3-bit collision — measured FPR is 0 on
    this plant and the theory/load columns match the python formula."""
    df = spark.createDataFrame(
        [(1, "member", "en", "src_00", 6)]
        + [
            (10 + i, f"probe{i:03d}", "en", "src_01", 8)
            for i in range(50)
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    [r] = QUERIES["q_bloom_fpr"](spark, str(tmp_path)).collect()
    assert r["n_members"] == 1 and r["n_probes"] == 50
    assert r["bits_set"] <= 3
    assert r["n_fp"] == 0 and r["measured_fpr_micro"] == 0
    assert r["theory_fpr"] == round(
        (1.0 - math.exp(-3.0 * 1 / 16384.0)) ** 3.0, 6
    )
    assert r["load_fpr"] == round((r["bits_set"] / 16384.0) ** 3.0, 6)


def test_bloom_fpr_member_words_never_probed(spark, tmp_path):
    """Probe words that ALSO appear in src_00 are excluded (a Bloom
    filter has no false negatives — only unseen words measure FPR)."""
    df = spark.createDataFrame(
        [(1, "shared alpha", "en", "src_00", 12),
         (2, "shared beta", "en", "src_01", 11)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    [r] = QUERIES["q_bloom_fpr"](spark, str(tmp_path)).collect()
    assert r["n_members"] == 2  # shared, alpha
    assert r["n_probes"] == 1   # only beta ('shared' is a member)


# ---------------------------------------------------------------------------
# X349 propensity overlap — identical and disjoint cohorts
# ---------------------------------------------------------------------------
def test_propensity_overlap_identical_cohorts(spark, tmp_path):
    """Both cohorts see the same histogram → OVL = 1e6 (up to the
    per-bin floor; one bin per value here so exactly 1e6)."""
    rows = []
    eid = 0
    for u in (2, 3):  # user 2 even -> a, 3 odd -> b
        for v in (10.0, 10.0, 60.0, 60.0):
            rows.append((eid, u, "click", v)); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = QUERIES["q_propensity_overlap"](spark, sf).collect()
    assert out[0]["ovl_micro"] == 1_000_000
    assert all(r["min_share_micro"] > 0 for r in out)


def test_propensity_overlap_disjoint_is_zero(spark, tmp_path):
    """Cohort a only in bin 0, cohort b only in bin 19 → OVL = 0 (no
    common support — the causal comparison must be refused)."""
    rows = [(0, 2, "click", 5.0), (1, 2, "click", 5.0),
            (2, 1, "click", 490.0), (3, 1, "click", 490.0)]
    sf = _write_events(spark, tmp_path, rows)
    out = QUERIES["q_propensity_overlap"](spark, sf).collect()
    assert [r["bin"] for r in out] == [0, 19]
    assert all(r["min_share_micro"] == 0 for r in out)
    assert out[0]["ovl_micro"] == 0


# ---------------------------------------------------------------------------
# X350 ICC — perfect clustering and zero-between plants
# ---------------------------------------------------------------------------
def _write_docs_lang(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            (i + 1, "x" * k, lang, "src", k)
            for i, (k, lang) in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_icc_perfect_clustering(spark, tmp_path):
    """Zero within-group variance (en all 100 chars, de all 200):
    MSW = 0 → ICC = 1 exactly."""
    sf = _write_docs_lang(
        spark, tmp_path, [(100, "en")] * 3 + [(200, "de")] * 3
    )
    [r] = QUERIES["q_icc"](spark, sf).collect()
    assert r["ms_within"] == 0.0
    assert r["icc"] == 1.0


def test_icc_zero_between(spark, tmp_path):
    """Equal group means, within-only variance ({100,200} in both
    langs): MSB = 0, n₀ = 2 → ICC = −1/(n₀−1) = −1."""
    sf = _write_docs_lang(
        spark, tmp_path,
        [(100, "en"), (200, "en"), (100, "de"), (200, "de")],
    )
    [r] = QUERIES["q_icc"](spark, sf).collect()
    assert r["ms_between"] == 0.0
    assert r["n0"] == 2.0
    assert r["icc"] == -1.0


# ---------------------------------------------------------------------------
# X351 Mann–Kendall — strictly monotone ledger
# ---------------------------------------------------------------------------
def test_mann_kendall_monotone(spark, tmp_path):
    """5 strictly increasing days: S = 10, no ties → Var·18 = 300,
    z = (10−1)/√(300/18) = 2.204541 > 1.959964 → trending."""
    rows = []
    for day in range(5):
        rows.append((day, 1, "click", float(10 * (day + 1))))
    df = spark.createDataFrame(
        [
            (eid, datetime.datetime(2024, 1, 1 + eid), uid, et, v, "{}")
            for eid, uid, et, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    [r] = QUERIES["q_mann_kendall"](spark, str(tmp_path)).collect()
    assert r["n"] == 5 and r["s_stat"] == 10
    assert r["var18_scaled"] == 5 * 4 * 15
    assert r["z"] == round(9 / math.sqrt(300 / 18.0), 6)
    assert r["trending"]


def test_mann_kendall_constant_no_trend(spark, tmp_path):
    """Identical daily totals: every pair ties → S = 0, tie term
    swallows the variance → NULL z, FALSE verdict."""
    rows = [(d, 1, "click", 5.0) for d in range(4)]
    df = spark.createDataFrame(
        [
            (eid, datetime.datetime(2024, 1, 1 + eid), uid, et, v, "{}")
            for eid, uid, et, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    [r] = QUERIES["q_mann_kendall"](spark, str(tmp_path)).collect()
    assert r["s_stat"] == 0 and r["var18_scaled"] == 0
    assert r["z"] is None and not r["trending"]


# ---------------------------------------------------------------------------
# X352 jackknife — 3-order hand ledger
# ---------------------------------------------------------------------------
def test_jackknife_three_order_ledger(spark, tmp_path):
    """Orders 1.00/2.00/3.00 in one priority: replicates
    (600−x)·1e4//2 = {2.5e6, 2e6, 1.5e6}; nr·qr − sr² = 1.5e12 →
    SE = floor(√(1.5e12·2/9)) = 577350; point = 2e6 micro."""
    sf = _write_orders(spark, tmp_path, [(1, 1.0), (2, 2.0), (3, 3.0)])
    [r] = QUERIES["q_jackknife_ratio"](spark, sf).collect()
    assert r["n_orders"] == 3
    assert r["point_micro"] == 2_000_000
    assert r["jack_se_micro"] == math.floor(
        math.sqrt(1.5e12 * 2 / 9)
    ) == 577_350


def test_jackknife_constant_zero_se(spark, tmp_path):
    """All orders equal: every replicate identical → SE = 0."""
    sf = _write_orders(spark, tmp_path, [(c, 4.0) for c in range(1, 6)])
    [r] = QUERIES["q_jackknife_ratio"](spark, sf).collect()
    assert r["jack_se_micro"] == 0


# ---------------------------------------------------------------------------
# X353 Fleiss — perfect-agreement and degenerate plants
# ---------------------------------------------------------------------------
def test_fleiss_perfect_agreement(spark, tmp_path):
    """Half the docs pass ALL three gates, half fail all: P̄ = 1,
    P̄e = 1/2 → κ = 1 exactly."""
    both_long = "the data " + " ".join(f"wa{i:03d}" for i in range(58))
    assert len(both_long) >= 300
    sf = _write_docs(spark, tmp_path, [both_long] * 5 + ["x x x"] * 5)
    [r] = QUERIES["q_fleiss_kappa"](spark, sf).collect()
    assert r["total_passes"] == 15
    assert r["p_bar_micro"] == 1_000_000
    assert r["p_e_micro"] == 500_000
    assert r["kappa_micro"] == 1_000_000


def test_fleiss_degenerate_null(spark, tmp_path):
    """Every doc fails every gate: P̄e = 1 → NULL kappa."""
    sf = _write_docs(spark, tmp_path, ["x x x"] * 6)
    [r] = QUERIES["q_fleiss_kappa"](spark, sf).collect()
    assert r["total_passes"] == 0 and r["p_e_micro"] == 1_000_000
    assert r["kappa_micro"] is None


# ---------------------------------------------------------------------------
# X354 Lorenz — the 1..10 revenue ladder
# ---------------------------------------------------------------------------
def test_lorenz_ladder(spark, tmp_path):
    """10 customers with revenue 1..10: cumulative share at decile d
    is d(d+1)/2 / 55 — exact micro at every point; gap positive
    below the diagonal everywhere except d=10."""
    sf = _write_orders(
        spark, tmp_path, [(c, float(c)) for c in range(1, 11)]
    )
    out = {r["decile"]: r for r in QUERIES["q_lorenz_curve"](spark, sf).collect()}
    for d in range(1, 11):
        expect = (d * (d + 1) // 2 * 100) * 1_000_000 // 5500
        assert out[d]["cum_share_micro"] == expect
        assert out[d]["gap_micro"] == d * 100_000 - expect
    assert out[10]["cum_share_micro"] == 1_000_000
    assert out[10]["gap_micro"] == 0

"""Round-14 (r13 verdict #6): planted known-answer fixtures for the
PRE-r13 statistical queries that until now relied only on mirrored
oracles — q_gini, q_mutual_info, q_psi_drift, q_benford,
q_wilson_leaderboard, q_rater_kappa. A mirrored oracle can hide a
wrong formula from hash-parity (the krippendorff lesson: the same
wrong algebra on both sides passes the driver gate for rounds); these
corpora are engineered so the right answer is derivable BY HAND, and
the expected constants below are hand ledgers, not re-runs of the
repo's SQL."""

from __future__ import annotations

import datetime
import math

from mysql_cdc_to_http_spark.queries import QUERIES


def _write_orders(spark, tmp_path, rows):
    """rows: list of (o_custkey, o_totalprice)."""
    df = spark.createDataFrame(
        [
            (i + 1, ck, "O", float(tp), datetime.datetime(2024, 1, 1), "1")
            for i, (ck, tp) in enumerate(rows)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    """rows: list of (event_id, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [
            (
                eid,
                datetime.datetime(2024, 1, 1, 0, 0, eid % 60),
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
    return str(tmp_path)


def _write_docs(spark, tmp_path, rows):
    """rows: list of text strings."""
    df = spark.createDataFrame(
        [(i + 1, t, "en", "src", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


# ---------------------------------------------------------------------------
# q_gini — G = (2·Σi·x − (n+1)·Σx) / (n·Σx), ascending-revenue ranks
# ---------------------------------------------------------------------------
def test_gini_planted_ladder(spark, tmp_path):
    """Revenues 1,2,3,4 (one order per customer): Σx=10, Σi·x=30,
    G = (60 − 50) / 40 = 0.25 exactly — the textbook 4-point ladder."""
    sf = _write_orders(spark, tmp_path, [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)])
    [r] = QUERIES["q_gini"](spark, sf).collect()
    assert r["n_customers"] == 4
    assert r["total_revenue"] == 10.0
    assert r["gini"] == 0.25


def test_gini_equal_revenue_is_zero(spark, tmp_path):
    """Four customers with identical revenue: perfect equality, G=0
    (internal consistency — Σi·x = x·n(n+1)/2 cancels the numerator)."""
    sf = _write_orders(spark, tmp_path, [(c, 5.0) for c in (1, 2, 3, 4)])
    [r] = QUERIES["q_gini"](spark, sf).collect()
    assert r["gini"] == 0.0 and r["total_revenue"] == 20.0


def test_gini_multi_order_customers(spark, tmp_path):
    """Revenue aggregates PER CUSTOMER before ranking: customer 1 has
    two 0.5 orders (=1.0 total), others 2,3,4 — same ladder as above,
    so the same G=0.25; a per-ORDER gini would see 5 rows and differ."""
    sf = _write_orders(
        spark, tmp_path, [(1, 0.5), (1, 0.5), (2, 2.0), (3, 3.0), (4, 4.0)]
    )
    [r] = QUERIES["q_gini"](spark, sf).collect()
    assert r["n_customers"] == 4 and r["gini"] == 0.25


# ---------------------------------------------------------------------------
# q_benford — first digit of the CENT integer vs Benford expectations
# ---------------------------------------------------------------------------
def test_benford_planted_digits(spark, tmp_path):
    """Prices 1.00 / 1.50 / 19.99 / 2.00 → cent strings 100, 150,
    1999, 200 → digit counts d1=3, d2=1 of 4. Shares are integer
    micro-floors: 750000 and 250000; deviations subtract the pinned
    Benford constants 301030 / 176091."""
    sf = _write_orders(
        spark, tmp_path, [(1, 1.0), (2, 1.5), (3, 19.99), (4, 2.0)]
    )
    out = {r["first_digit"]: r for r in QUERIES["q_benford"](spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[1]["cnt"] == 3 and out[2]["cnt"] == 1
    assert out[1]["share_micro"] == 750_000
    assert out[2]["share_micro"] == 250_000
    assert out[1]["benford_micro"] == 301_030
    assert out[2]["benford_micro"] == 176_091
    assert out[1]["dev_micro"] == 750_000 - 301_030
    assert out[2]["dev_micro"] == 250_000 - 176_091


def test_benford_cent_rounding_boundary(spark, tmp_path):
    """0.995 rounds to cent integer 100 (digit 1), not 99 (digit 9) —
    pins the round-then-stringify order (float formatting would give
    '0.995' → '0')."""
    sf = _write_orders(spark, tmp_path, [(1, 0.995)])
    out = {r["first_digit"]: r for r in QUERIES["q_benford"](spark, sf).collect()}
    assert set(out) == {1} and out[1]["cnt"] == 1


# ---------------------------------------------------------------------------
# q_psi_drift — 20 fixed bins on value∈[0,100), Laplace smooth 0.5
# ---------------------------------------------------------------------------
def test_psi_planted_disjoint_bins(spark, tmp_path):
    """Side A (even ids): 4 events at value 2.0 → bin 0. Side B (odd
    ids): 4 events at value 7.0 → bin 1. Smoothed shares p=(c+0.5)/
    (total+10): bin0 p=4.5/14, q=0.5/14 → psi_bin = (4/14)·ln(9) =
    0.627778 (6 dp), symmetric in bin 1; total = 1.255557."""
    rows = [(2 * i, 1, "click", 2.0) for i in range(4)] + [
        (2 * i + 1, 1, "click", 7.0) for i in range(4)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = QUERIES["q_psi_drift"](spark, sf).collect()
    assert [r["bin"] for r in out] == [0, 1]
    b0, b1 = out
    assert (b0["cnt_a"], b0["cnt_b"]) == (4, 0)
    assert (b1["cnt_a"], b1["cnt_b"]) == (0, 4)
    # hand ledger: 4.5/14 = 0.321429 (6 dp), 0.5/14 = 0.035714
    assert b0["p_a"] == 0.321429 and b0["p_b"] == 0.035714
    assert b1["p_a"] == 0.035714 and b1["p_b"] == 0.321429
    # (4/14)·ln(4.5/0.5) = 0.285714…·2.197225… = 0.627778 (6 dp)
    assert b0["psi_bin"] == 0.627778 and b1["psi_bin"] == 0.627778
    assert b0["psi_total"] == 1.255557 and b1["psi_total"] == 1.255557


def test_psi_identical_sides_is_zero(spark, tmp_path):
    """Identical histograms on both sides → p==q in every bin → PSI
    exactly 0 (smoothing cancels; ln(1)=0)."""
    rows = []
    for i in range(4):
        rows.append((2 * i, 1, "click", 12.0))  # even → side A, bin 2
        rows.append((2 * i + 1, 1, "click", 12.0))  # odd → side B, bin 2
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_psi_drift"](spark, sf).collect()
    assert r["bin"] == 2 and r["psi_bin"] == 0.0 and r["psi_total"] == 0.0


def test_psi_edge_clamp(spark, tmp_path):
    """Values outside [0,100) clamp into the edge bins: -3 → bin 0,
    250 → bin 19 (the outlier-clamp contract in the docstring)."""
    sf = _write_events(
        spark, tmp_path, [(0, 1, "click", -3.0), (1, 1, "click", 250.0)]
    )
    out = QUERIES["q_psi_drift"](spark, sf).collect()
    assert [r["bin"] for r in out] == [0, 19]


# ---------------------------------------------------------------------------
# q_mutual_info — I(X;Y) contributions, Y = spend bucket floor(v/50)⌃3
# ---------------------------------------------------------------------------
def test_mutual_info_perfect_dependence(spark, tmp_path):
    """Type 'a' always bucket 0, type 'b' always bucket 1 (5 events
    each): each type's contribution is (5/10)·ln(5·10/(5·5)) =
    0.5·ln 2 = 0.346574 (6 dp) — summing to the full MI ln 2 of a
    deterministic binary pair."""
    rows = [(i, 1, "a", 10.0) for i in range(5)] + [
        (5 + i, 1, "b", 60.0) for i in range(5)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in QUERIES["q_mutual_info"](spark, sf).collect()}
    assert out["a"]["n_events"] == 5 and out["b"]["n_events"] == 5
    expected = round(0.5 * math.log(2.0), 6)  # 0.346574
    assert out["a"]["mi_contrib"] == expected == 0.346574
    assert out["b"]["mi_contrib"] == expected


def test_mutual_info_independent_is_zero(spark, tmp_path):
    """Both types split 2/2 across buckets 0 and 1: every cell has
    cxy·n == cx·cy → ln(1) = 0 → zero contribution for both types."""
    rows = []
    eid = 0
    for et in ("a", "b"):
        for v in (10.0, 10.0, 60.0, 60.0):
            rows.append((eid, 1, et, v))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in QUERIES["q_mutual_info"](spark, sf).collect()}
    assert out["a"]["mi_contrib"] == 0.0 and out["b"]["mi_contrib"] == 0.0
    assert out["a"]["n_events"] == 4


# ---------------------------------------------------------------------------
# q_wilson_leaderboard — z=2 lower bound, integer isqrt discipline
# ---------------------------------------------------------------------------
def test_wilson_planted_leaderboard(spark, tmp_path):
    """User 1: 5/10 purchases; user 2: 2/10; user 3: 4 trials (below
    the min-5 gate, must not appear). Hand Wilson (z=2):
    lb = ((s+2)·1e5 − 2·isqrt(s·f·1e10 div n + 1e10)) div (n+4).
    u1: isqrt(3.5e10)=187082 → (700000−374164)//14 = 23274.
    u2: isqrt(2.6e10)=161245 → (400000−322490)//14 = 5536."""
    rows = []
    eid = 0
    for _ in range(5):
        rows.append((eid, 1, "purchase", 1.0)); eid += 1
        rows.append((eid, 1, "click", 1.0)); eid += 1
    for _ in range(2):
        rows.append((eid, 2, "purchase", 1.0)); eid += 1
    for _ in range(8):
        rows.append((eid, 2, "click", 1.0)); eid += 1
    for _ in range(4):
        rows.append((eid, 3, "click", 1.0)); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = QUERIES["q_wilson_leaderboard"](spark, sf).collect()
    assert [r["user_id"] for r in out] == [1, 2]  # user 3 gated out
    u1, u2 = out
    # independent isqrt ledger (python ints, no repo SQL)
    w1 = math.isqrt(5 * 5 * 10**10 // 10 + 10**10)
    w2 = math.isqrt(2 * 8 * 10**10 // 10 + 10**10)
    assert (w1, w2) == (187082, 161245)
    assert u1["trials"] == 10 and u1["successes"] == 5
    assert u1["rate_micro"] == 500_000
    assert u1["wilson_lb_e5"] == (7 * 100_000 - 2 * w1) // 14 == 23_274
    assert u2["wilson_lb_e5"] == (4 * 100_000 - 2 * w2) // 14 == 5_536
    assert (u1["rk"], u2["rk"]) == (1, 2)


def test_wilson_shrinks_small_samples(spark, tmp_path):
    """Same 50% rate at n=10 vs n=100: the larger sample's lower bound
    must be strictly higher (the reason to rank by Wilson, not rate)."""
    rows = []
    eid = 0
    for _ in range(5):
        rows.append((eid, 1, "purchase", 1.0)); eid += 1
        rows.append((eid, 1, "click", 1.0)); eid += 1
    for _ in range(50):
        rows.append((eid, 2, "purchase", 1.0)); eid += 1
        rows.append((eid, 2, "click", 1.0)); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r["user_id"]: r for r in QUERIES["q_wilson_leaderboard"](spark, sf).collect()}
    assert out[1]["rate_micro"] == out[2]["rate_micro"] == 500_000
    assert out[2]["wilson_lb_e5"] > out[1]["wilson_lb_e5"]
    assert out[2]["rk"] == 1


# ---------------------------------------------------------------------------
# q_rater_kappa — 2×2 Cohen's kappa between the rule gate and TTR gate
# ---------------------------------------------------------------------------
def _kappa_docs():
    stop2 = "the data "
    # ra=T needs ≥50 tokens AND ≥2 distinct stopwords;
    # rb=T needs distinct/size ≥ 0.45 (micro 450000)
    both = stop2 + " ".join(f"w{i}" for i in range(48))  # 50 tok, TTR=1
    ra_only = stop2 + " ".join(["x"] * 48)  # 50 tok, TTR=3/50=0.06
    rb_only = "a b"  # 2 tokens, TTR=1, too short for ra
    neither = "x x x x"  # TTR=0.25, short
    return (
        [both] * 4 + [ra_only] * 3 + [rb_only] * 2 + [neither] * 1
    )


def test_rater_kappa_planted_2x2(spark, tmp_path):
    """Planted 2×2: n11=4, n10=3, n01=2, n00=1 (n=10).
    po = 5/10 → 500000 micro; pe = (7·6 + 3·4)/100 = 0.54 → 540000;
    kappa = (50−54)/(100−54) = −4/46 → −86956 micro (sign-corrected
    truncation: −(4000000 // 46))."""
    sf = _write_docs(spark, tmp_path, _kappa_docs())
    [r] = QUERIES["q_rater_kappa"](spark, sf).collect()
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (4, 3, 2, 1)
    assert r["po_micro"] == 500_000
    assert r["pe_micro"] == 540_000
    assert r["kappa_micro"] == -(4_000_000 // 46) == -86_956


def test_rater_kappa_perfect_agreement(spark, tmp_path):
    """Raters always agree (only n11 and n00 cells): po=1, kappa=1
    (1000000 micro) — pe cancels in the exact rational."""
    docs = _kappa_docs()
    sf = _write_docs(spark, tmp_path, [docs[0]] * 6 + ["x x x x"] * 4)
    [r] = QUERIES["q_rater_kappa"](spark, sf).collect()
    assert (r["n11"], r["n00"], r["n10"], r["n01"]) == (6, 4, 0, 0)
    assert r["po_micro"] == 1_000_000
    assert r["kappa_micro"] == 1_000_000


def test_rater_kappa_degenerate_den_null(spark, tmp_path):
    """All docs identical (single cell, pe=1): den=0 → kappa NULL on
    the engine (mirrors the oracle's CASE)."""
    sf = _write_docs(spark, tmp_path, ["x x x x"] * 5)
    [r] = QUERIES["q_rater_kappa"](spark, sf).collect()
    assert r["n00"] == 5 and r["kappa_micro"] is None

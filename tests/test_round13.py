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

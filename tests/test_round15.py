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

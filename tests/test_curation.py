"""Curation operators: decontamination, repetition scoring, domain-mix
sampling — semantics on hand data + the plan shapes that matter at scale
(broadcast membership join, shuffle-free projections, deterministic
membership)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql_cdc_to_http_spark.operators.curation import (
    benchmark_ngram_set,
    decontaminate,
    domain_mix_sample,
    rate_to_hex8,
    repetition_score,
    tokenize,
    word_ngrams_from_tokens,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_word_ngrams_basic(spark):
    df = spark.createDataFrame([("a b c d",), ("x",)], "text string")
    got = df.select(tokenize(F.col("text")).alias("t")).select(
        word_ngrams_from_tokens(F.col("t"), 2).alias("g")
    ).collect()
    assert got[0]["g"] == ["a b", "b c", "c d"]
    assert got[1]["g"] == ["x"]  # shorter than n → one clamped gram


def test_decontaminate_flags_known_leak(spark):
    bench_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # full benchmark sentence embedded → heavy overlap
            (1, "prefix words the quick brown fox jumps over the lazy dog suffix"),
            # no shared 3-grams
            (2, "completely different content with no shared phrases at all"),
        ],
        "doc_id long, text string",
    )
    bench = benchmark_ngram_set(bench_docs, n=3)
    got = {
        r["doc_id"]: r
        for r in decontaminate(
            corpus, bench, n=3, max_overlap=0.3
        ).collect()
    }
    assert got[1]["is_contaminated"] and got[1]["ngrams_matched"] >= 6
    assert not got[2]["is_contaminated"] and got[2]["ngrams_matched"] == 0


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The membership join must be a broadcast hash join — shipping the
    corpus to a shuffle for a KB-sized benchmark set is the anti-shape."""
    from mysql_cdc_to_http_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = benchmark_ngram_set(docs.filter(F.col("source") == "src0"), n=5)
    plan = _plan(decontaminate(docs.filter(F.col("source") != "src0"), bench))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_repetition_score_hand_cases(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_score(df, n=2).collect()}
    # "a b a b…": 7 bigrams, only 2 distinct → repetition 5/7
    assert got[1]["ngrams_total"] == 7 and got[1]["ngrams_distinct"] == 2
    assert got[1]["repetition"] == pytest.approx(5 / 7)
    assert got[2]["repetition"] == 0.0


def test_repetition_is_shuffle_free(spark, sf_dir):
    from mysql_cdc_to_http_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(repetition_score(docs))
    assert "Exchange" not in plan, plan


def test_rate_to_hex8_thresholds():
    assert rate_to_hex8(1.0) == "g"
    assert rate_to_hex8(0.5) == "80000000"
    assert rate_to_hex8(0.25) == "40000000"
    assert rate_to_hex8(0.0) == "00000000"


def test_domain_mix_deterministic_and_ratioed(spark, sf_dir):
    """Membership is identical across partitionings; realized rates land
    near the targets; unlisted domains get the default rate."""
    from mysql_cdc_to_http_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 0.5}
    a = domain_mix_sample(docs, rates, default_rate=0.2)
    b = domain_mix_sample(docs.repartition(13, "lang"), rates, default_rate=0.2)
    ids_a = {r["doc_id"] for r in a.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # partitioning-invariant membership
    n_src0 = docs.filter(F.col("source") == "src0").count()
    kept_src0 = a.filter(F.col("source") == "src0").count()
    assert kept_src0 == n_src0  # rate 1.0 keeps everything
    others = docs.filter(~F.col("source").isin("src0", "src1"))
    kept_others = a.filter(~F.col("source").isin("src0", "src1")).count()
    # 0.2 target over ~450 docs: generous 3-sigma-ish band
    assert 0.1 <= kept_others / others.count() <= 0.32


def test_tokenize_trims_padding(spark):
    """Leading/trailing whitespace must not mint empty-string tokens
    (phantom n-grams would skew repetition/overlap ratios)."""
    df = spark.createDataFrame([("  a b \n",)], "text string")
    got = df.select(tokenize(F.col("text")).alias("t")).collect()[0]["t"]
    assert got == ["a", "b"]

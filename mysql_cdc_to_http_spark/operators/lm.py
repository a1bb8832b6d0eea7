"""N-gram language-model scoring: train-on-corpus bigram counts, score
documents by mean log-probability (KenLM-style perplexity proxy).

The pipeline stage this models: quality-filter candidate documents by
how "reference-like" their token transitions are — the classic CCNet /
GPT-3 LM-perplexity gate. At 100 TB the shape is:

- TRAIN: one explode → two hash aggregates (unigram + bigram counts).
  Both are map-side-combinable; the bigram table is the big artifact
  and stays DISTRIBUTED (never collected, never broadcast by default —
  vocab² can be billions of keys).
- SCORE: each document's bigrams join the count tables BY KEY — two
  hash-shuffle joins sized by (doc bigrams) + (model), then one
  per-doc aggregate. No driver-side model, no Python.

Add-one smoothing keeps every probability finite:
P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V). Scores are mean ln P over a
document's bigram transitions; higher = more typical. Engine-parity
discipline: ln is the one transcendental — final scores round to 6 dp
(absorbs libm ulps; same argument as operators/text.py char entropy);
everything before the ln is integer counts, so both engines feed ln
identical arguments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def doc_bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document bigram stream (doc_id, w1, w2) via the canonical
    tokenization (operators/curation.py:tokenize). Docs with fewer than
    two tokens contribute no rows."""
    from mysql_cdc_to_http_spark.operators.curation import tokenize

    staged = docs.select("doc_id", tokenize(F.col(text_col)).alias("__t"))
    idx = F.sequence(F.lit(1), F.size("__t") - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at("__t", i).alias("w1"),
            F.element_at("__t", i + 1).alias("w2"),
        ),
    )
    return (
        staged.filter(F.size("__t") >= 2)
        .select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count model: (unigram_counts(w1, c1), bigram_counts(w1, w2, c12),
    vocab_size(v) — 1 row). Two map-combinable hash aggregates over one
    bigram stream plus a distinct over tokens."""
    from mysql_cdc_to_http_spark.operators.curation import tokenize

    bg = doc_bigrams(docs, text_col)
    bigram = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # condition on w1 occurrences AS A PREFIX (sum over following words),
    # not raw token frequency — keeps sum_w2 P(w2|w1) = 1 under add-one
    unigram = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    return unigram, bigram, vocab


def score_perplexity(
    docs: DataFrame,
    unigram: DataFrame,
    bigram: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Mean ln P(w2|w1) per document under the add-one-smoothed count
    model. Output: (doc_id, n_bigrams, avg_logp 6dp). Unseen bigrams /
    prefixes survive via smoothing (coalesce to 0 counts)."""
    bg = doc_bigrams(docs, text_col)
    scored = (
        bg.join(bigram, ["w1", "w2"], "left")
        .join(unigram, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
            ).alias("__lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("__lp") / F.count(F.lit(1)), 6).alias("avg_logp"),
        )
    )

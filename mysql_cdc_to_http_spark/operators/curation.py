"""Corpus curation for training-data pipelines: benchmark
decontamination, intra-document repetition scoring, and domain-mixture
sampling (north-star text-analysis family — the reference has no query
surface at all, SURVEY §2.2; these are the standard curation passes a
100 TB pretraining corpus runs after dedup).

Scale shapes:

- Decontamination joins corpus n-grams against a BENCHMARK n-gram set.
  The benchmark side is tiny by definition (eval suites are KBs-MBs), so
  the membership test is a broadcast join against exploded corpus
  n-grams; per-doc hit counts come from a map-side-combined groupBy on
  doc id — the only shuffle ships (doc_id, partial count), never text.
  At 100 TB you join on xxhash64(ngram) (8 bytes vs the string); here
  the raw string keeps the DuckDB oracle trivially equivalent.
- Repetition scoring is a pure per-row projection (distinct vs total
  n-gram counts from built-in array functions) — no shuffle at all.
- Mixture sampling reuses the deterministic md5-threshold Bernoulli
  membership (operators/sampling.py): per-domain rates become a small
  broadcast map, so the pass is one broadcast join + filter, no shuffle,
  and membership is stable under repartitioning/engine (the property a
  reproducible data recipe needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tokenize(text_col):
    """Lowercased whitespace tokens; trimmed first — leading/trailing
    whitespace would otherwise split into empty-string tokens and mint
    phantom n-grams that skew every ratio. Materialize this as a REAL
    column before feeding ``word_ngrams_from_tokens`` — an expression
    nested in a transform() lambda re-evaluates per array element, so an
    inline regex+split here costs n_tokens× per row (measured 7 s →
    0.9 s at sf0.1 for repetition scoring)."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")), " "
    )


def word_ngrams_from_tokens(toks_col, n: int = 5):
    """Space-joined word n-grams (array<string>) over a pre-materialized
    token-array column. NOT deduplicated — repetition scoring needs the
    multiset; set consumers apply array_distinct themselves."""
    idx = F.sequence(
        F.lit(1), F.greatest(F.size(toks_col) - (n - 1), F.lit(1))
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks_col, i, n))
    )


def benchmark_ngram_set(
    benchmark: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct n-grams of the benchmark corpus — one column ``ngram``.
    Distinct-ness keeps the broadcast side minimal."""
    staged = benchmark.select(tokenize(F.col(text_col)).alias("__toks"))
    return (
        staged.select(
            F.explode(word_ngrams_from_tokens(F.col("__toks"), n)).alias(
                "ngram"
            )
        )
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark_ngrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    max_overlap: float = 0.1,
) -> DataFrame:
    """Flag training documents that leak benchmark content: a doc is
    contaminated when more than ``max_overlap`` of its distinct word
    n-grams appear in the benchmark set.

    Returns (id, ngrams_total, ngrams_matched, overlap, is_contaminated)
    for every corpus doc. The broadcast of the benchmark set makes the
    membership join shuffle-free; the per-doc count aggregates map-side
    before its one shuffle on doc id."""
    grams = corpus.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams_from_tokens(F.col("__toks"), n))
        ).alias("ngram"),
    )
    hits = (
        grams.join(
            F.broadcast(benchmark_ngrams.withColumn("__hit", F.lit(1))),
            "ngram",
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("ngrams_total"),
            F.count("__hit").alias("ngrams_matched"),
        )
    )
    # exact ints divided → bit-identical double on any engine; no rounding
    overlap = F.col("ngrams_matched") / F.col("ngrams_total")
    return hits.select(
        id_col,
        "ngrams_total",
        "ngrams_matched",
        overlap.alias("overlap"),
        (overlap > max_overlap).alias("is_contaminated"),
    )


def repetition_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Intra-document repetition: 1 − distinct/total over word n-grams
    (0 = no repeated n-gram, →1 = the same n-gram over and over). The
    standard cheap quality gate against looping/spammy generations —
    a pure projection, no shuffle."""
    staged = docs.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        word_ngrams_from_tokens(F.col("__toks"), n).alias("__grams"),
    )
    total = F.size(F.col("__grams"))
    distinct = F.size(F.array_distinct(F.col("__grams")))
    # no rounding: both engines divide the SAME exact ints, so the IEEE
    # quotient is bit-identical — rounding could only introduce
    # half-way-boundary divergence, never remove it
    return staged.select(
        F.col(id_col),
        total.alias("ngrams_total"),
        distinct.alias("ngrams_distinct"),
        (F.lit(1.0) - distinct.cast("double") / total.cast("double")).alias(
            "repetition"
        ),
    )


def rate_to_hex8(rate: float) -> str:
    """Keep-rate → 8-hex md5-prefix threshold: a doc is kept iff the
    first 8 hex chars of its md5 sort below this string. Hex strings
    order lexicographically as numbers, so P(keep) = rate to 16⁻⁸; 'g'
    sorts above every hex digit, so rate ≥ 1 keeps everything."""
    if rate >= 1.0:
        return "g"
    return format(max(int(rate * 16**8), 0), "08x")


def domain_mix_sample(
    docs: DataFrame,
    rates: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: str = "mix",
) -> DataFrame:
    """Deterministic per-domain Bernoulli sampling — reshape a corpus to
    a target domain mixture (e.g. upweight code, downweight web) with
    membership that is reproducible across runs, partitionings, and
    engines: keep iff the first 8 hex chars of md5(seed:id) sort below
    the domain's precomputed threshold (same mechanism as
    operators/sampling.py:md5_sample, extended to per-domain rates).
    ``rates`` maps domain → keep-rate in [0, 1]; unlisted domains get
    ``default_rate``. The rate table is a broadcast join (domains are
    few); the pass adds no shuffle."""
    rate_rows = [(k, rate_to_hex8(float(v))) for k, v in rates.items()]
    rate_df = docs.sparkSession.createDataFrame(
        rate_rows, f"{domain_col} string, __thr string"
    )
    prefix = F.substring(
        F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))),
        1,
        8,
    )
    keep = prefix < F.coalesce(F.col("__thr"), F.lit(rate_to_hex8(default_rate)))
    return (
        docs.join(F.broadcast(rate_df), domain_col, "left")
        .filter(keep)
        .drop("__thr")
    )


# Executors must not need this repo on their PYTHONPATH (driver contract
# imports by path).
import sys as _sys
from pyspark import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

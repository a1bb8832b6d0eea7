"""Corpus-curation queries: benchmark decontamination, repetition
scoring, domain-mixture sampling (operators/curation.py) — the standard
passes between dedup and tokenization in a pretraining-data pipeline.

All three are oracle-checked: counts are exact integers and every ratio
is the IEEE quotient of the same exact integers on both engines, so no
rounding is involved anywhere (see [[duckdb-spark-float-parity]] rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.queries.registry import query

# Shared oracle fragment: word n-gram list per document, mirroring
# operators/curation.py:word_ngrams (1-based inclusive slice == Spark's
# slice(toks, i, n); short docs yield one clamped partial n-gram).
_TOK_CTE = r"""
tok AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                      ' ') AS t
  FROM documents
)
"""


@query(
    "q_decontaminate",
    oracle=f"""
    WITH {_TOK_CTE},
    grams AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 4, 1) + 1),
               i -> array_to_string(t[i:i+4], ' '))) AS gs
      FROM tok
    ),
    bench AS (
      SELECT DISTINCT unnest(gs) AS ngram FROM grams WHERE source = 'src0'
    ),
    cg AS (
      SELECT doc_id, unnest(gs) AS ngram FROM grams WHERE source <> 'src0'
    ),
    hits AS (
      SELECT cg.doc_id,
             CAST(count(*) AS BIGINT)       AS ngrams_total,
             CAST(count(b.ngram) AS BIGINT) AS ngrams_matched
      FROM cg LEFT JOIN bench b USING (ngram)
      GROUP BY cg.doc_id
    )
    SELECT doc_id, ngrams_total, ngrams_matched,
           ngrams_matched / CAST(ngrams_total AS DOUBLE) AS overlap,
           (ngrams_matched / CAST(ngrams_total AS DOUBLE)) > 0.05
             AS is_contaminated
    FROM hits
    ORDER BY doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs whose 5-word-gram
    overlap with the benchmark set (stand-in: the 'src0' slice) exceeds
    5%. The benchmark n-gram set is broadcast — the membership join
    never shuffles the corpus; per-doc counts combine map-side."""
    from mysql_cdc_to_http_spark.operators.curation import (
        benchmark_ngram_set,
        decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = benchmark_ngram_set(docs.filter(F.col("source") == "src0"), n=5)
    flagged = decontaminate(
        docs.filter(F.col("source") != "src0"), bench, n=5, max_overlap=0.05
    )
    return flagged.select(
        "doc_id",
        F.col("ngrams_total").cast("long").alias("ngrams_total"),
        F.col("ngrams_matched").cast("long").alias("ngrams_matched"),
        "overlap",
        "is_contaminated",
    ).orderBy("doc_id")


@query(
    "q_repetition",
    oracle=f"""
    WITH {_TOK_CTE},
    g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                            i -> array_to_string(t[i:i+2], ' ')) AS gs
      FROM tok
    )
    SELECT doc_id,
           CAST(len(gs) AS BIGINT)                AS ngrams_total,
           CAST(len(list_distinct(gs)) AS BIGINT) AS ngrams_distinct,
           1.0 - len(list_distinct(gs)) / CAST(len(gs) AS DOUBLE)
             AS repetition
    FROM g
    ORDER BY doc_id
    """,
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition ratio over word 3-grams — the cheap
    quality gate against looping/spammy text. Pure projection (no
    shuffle); the oracle recomputes the same multiset arithmetic."""
    from mysql_cdc_to_http_spark.operators.curation import repetition_score

    docs = load_table(spark, sf_dir, "documents")
    scored = repetition_score(docs, n=3)
    return scored.select(
        "doc_id",
        F.col("ngrams_total").cast("long").alias("ngrams_total"),
        F.col("ngrams_distinct").cast("long").alias("ngrams_distinct"),
        "repetition",
    ).orderBy("doc_id")


@query(
    "q_domain_mix",
    oracle="""
    WITH thr AS (
      SELECT * FROM (VALUES
        ('src0', 'g'),
        ('src1', '80000000'),
        ('src2', '40000000'),
        ('src3', '20000000')
      ) AS v(source, thr)
    )
    SELECT d.doc_id, d.source
    FROM documents d LEFT JOIN thr USING (source)
    WHERE substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
          < coalesce(thr.thr, '19999999')
    ORDER BY d.doc_id
    """,
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: keep 100% of src0, 50% of src1, 25% of
    src2, 12.5% of src3, 10% of everything else — deterministic
    md5-threshold membership, identical on any engine/partitioning
    (operators/curation.py:domain_mix_sample). The oracle recomputes
    membership from scratch with the same thresholds."""
    from mysql_cdc_to_http_spark.operators.curation import domain_mix_sample

    docs = load_table(spark, sf_dir, "documents")
    mixed = domain_mix_sample(
        docs,
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.125},
        default_rate=0.1,
        seed="mix",
    )
    return mixed.select("doc_id", "source").orderBy("doc_id")

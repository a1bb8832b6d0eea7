"""Text-analysis operators for training-data pipelines: tokenization,
token counting, quality scoring, language ID, fingerprinting.

All hot-path pieces are built-in column expressions (JVM, codegen);
language ID is the one pandas-UDF (its char-n-gram profile scoring has no
built-in equivalent) and is Arrow-vectorized.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

#: BPE-ish token pattern: word pieces, digit runs, or single non-space
#: symbols — a cheap stand-in for a real tokenizer's pre-tokenization.
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

#: Tiny per-language marker profiles (char trigrams + stopwords). Real
#: lang-ID ships big profile tables; the mechanism (profile overlap
#:  scoring over n-grams) is the same.
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "ing", "ion", " th", "of "},
    "de": {"der", "und", "sch", "ein", "ich", "en "},
    "es": {"que", "los", "ión", "ado", "de ", "la "},
    "fr": {"les", "des", "ent", "que", "le ", "de "},
    "zh": set(),  # non-latin scripts detected by codepoint class instead
}


def tokenize(col: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(col), r"\s+")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(col))


def token_count_re(col: Column) -> Column:
    """Regex (BPE-ish pre-tokenizer) token count."""
    # group idx 0 (whole match) — the default of 1 requires a capture group
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), F.lit(0)))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Deterministic document quality score in [0,1]:
    0.4·length saturation + 0.3·lexical diversity + 0.3·alpha ratio.
    Pure column arithmetic — identical IEEE ops on any engine."""
    toks = tokenize(text)
    n_tok = F.size(toks)
    diversity = F.size(F.array_distinct(toks)) / n_tok
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / F.length(text)
    len_sat = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    return 0.4 * len_sat + 0.3 * diversity + 0.3 * alpha


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint of normalized text (lowercase, collapsed
    whitespace) — the dedup key for hash-based exact dedup at scale
    (group on 16 bytes, not the document payload)."""
    norm = F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
    return F.md5(norm)


def fingerprint_sha2(col: Column, bits: int = 256) -> Column:
    norm = F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
    return F.sha2(norm, bits)


@pandas_udf(StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    """Char-n-gram profile language ID (Arrow-vectorized pandas UDF).

    Scores each language by marker-trigram hits per 1k chars; CJK
    detection via codepoint class. Deterministic; ties break by language
    code order."""

    def score(text: str) -> str:
        if not text:
            return "und"
        sample = text[:2000].lower()
        if any("一" <= ch <= "鿿" for ch in sample):
            return "zh"
        best_lang, best = "und", 0.0
        for lang in sorted(_LANG_PROFILES):
            profile = _LANG_PROFILES[lang]
            if not profile:
                continue
            hits = sum(sample.count(g) for g in profile)
            s = hits / (len(sample) / 1000.0)
            if s > best:
                best_lang, best = lang, s
        return best_lang

    return texts.map(score)

# Executors must not need this repo on their PYTHONPATH: register this
# module for pickle-by-value so UDFs/closures ship inside the task
# (the driver contract imports __spark_entry__.py by path, not site-packages).
import sys as _sys
from pyspark import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

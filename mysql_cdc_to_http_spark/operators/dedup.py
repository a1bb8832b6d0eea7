"""Near-duplicate detection at scale: MinHash-LSH, SimHash, n-gram
Jaccard (SURVEY X37 + north-star dedup family).

Scale design: the quadratic all-pairs comparison is replaced by LSH
banding — candidates share a (band, band-hash) bucket, so the only
shuffle is a groupBy on band hashes and the pair set is bucket-local.
MinHash signatures are computed with built-in higher-order functions
(JVM-side fold over shingle hashes — no Python in the signature path);
SimHash uses an Arrow-vectorized pandas UDF (bit-vote loop has no HOF
equivalent). Exact-verification (Jaccard) runs only on candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

#: 31-bit Mersenne prime: a·h + b stays under 2^62, so the permutation
#: arithmetic never overflows a long even under ANSI mode.
_MERSENNE = (1 << 31) - 1


def _hash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, _MERSENNE - 1)), int(rng.randint(0, _MERSENNE - 1)))
        for _ in range(n_hashes)
    ]


def char_shingles(col, k: int = 5):
    """Distinct k-char shingles via sequence+transform (pure HOF)."""
    norm = F.regexp_replace(F.lower(col), r"\s+", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


def word_shingles(col, k: int = 3):
    """Distinct k-word shingles."""
    toks = F.split(F.regexp_replace(F.lower(col), r"\s+", " "), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def minhash_signature(shingles, n_hashes: int = 64, seed: int = 42):
    """MinHash signature as an array<long>: for each (a,b) permutation,
    min over shingle hashes of (a·h+b) mod p — a JVM-side fold via
    ``aggregate``; 64-bit xxhash64 supplies the base shingle hash."""
    params = _hash_params(n_hashes, seed)
    # pmod (not abs%): abs(Long.MIN_VALUE) overflows under ANSI mode
    hashes = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))

    def perm_min(a: int, b: int):
        # factory closure: pyspark introspects HOF lambda arity, so the
        # (a, b) constants must not appear as lambda defaults
        return F.aggregate(
            hashes,
            F.lit(_MERSENNE).cast("long"),
            lambda acc, h: F.least(acc, (h * F.lit(a) + F.lit(b)) % _MERSENNE),
        )

    return F.array(*[perm_min(a, b) for a, b in params])


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Band the signature, bucket by (band, hash(band slice)), and emit
    candidate pairs (a < b) per bucket. One shuffle on band hashes; pair
    blowup is bucket-local (collision groups), never corpus-global."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(sig_col, i * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for i in range(bands)
        ]
    )
    banded = df.select(
        F.col(id_col), F.explode(band_structs).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            "inner",
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard on candidate pairs only (array_intersect/union sizes
    — JVM-side). Emits pairs with jaccard ≥ threshold."""
    a = docs.select(
        F.col(id_col).alias("id_a"), F.col(shingle_col).alias("sh_a")
    )
    b = docs.select(
        F.col(id_col).alias("id_b"), F.col(shingle_col).alias("sh_b")
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.select(
            "id_a", "id_b", (inter / union).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pipeline:
    shingle → signature → LSH buckets → candidate pairs → exact verify."""
    rows_per_band = n_hashes // bands
    prepared = docs.select(
        id_col,
        char_shingles(F.col(text_col), shingle_k).alias("shingles"),
    ).withColumn("sig", minhash_signature(F.col("shingles"), n_hashes))
    cands = lsh_candidate_pairs(
        prepared, id_col, "sig", bands, rows_per_band
    )
    return jaccard_verify(cands, prepared, id_col, "shingles", threshold)


@pandas_udf(LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash (Arrow-vectorized): per-token 64-bit hashes vote
    per bit position; the sign of each vote total sets the bit."""

    def simhash(text: str) -> int:
        tokens = text.lower().split()
        if not tokens:
            return 0
        hashes = np.array([_stable64(t) for t in tokens], dtype=np.uint64)
        bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        # reinterpret as signed 64-bit for Spark LongType
        return out - (1 << 64) if out >= (1 << 63) else out

    return texts.map(simhash)


def _stable64(s: str) -> int:
    """FNV-1a 64-bit — process-stable token hash (Python's hash() is
    salted per process, which would break determinism across executors)."""
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup candidates: band the 64-bit hash into 4×16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal), bucket
    per chunk, verify hamming distance via bit_count(xor)."""
    sh = docs.select(
        F.col(id_col), simhash64_udf(F.col(text_col)).alias("sh")
    )
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned(F.col("sh"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("bucket"),
            )
            for i in range(4)
        ]
    )
    banded = sh.select(id_col, "sh", F.explode(chunks).alias("cc")).select(
        id_col, "sh", "cc.chunk", "cc.bucket"
    )
    l, r = banded.alias("l"), banded.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)

# Executors must not need this repo on their PYTHONPATH: register this
# module for pickle-by-value so UDFs/closures ship inside the task
# (the driver contract imports __spark_entry__.py by path, not site-packages).
import sys as _sys
from pyspark import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

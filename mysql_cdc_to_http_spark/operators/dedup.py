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
from pyspark.sql.types import ArrayType, LongType

#: 31-bit Mersenne prime: a·h + b stays under 2^62, so the permutation
#: arithmetic never overflows a long even under ANSI mode.
_MERSENNE = (1 << 31) - 1


def _hash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, _MERSENNE - 1)), int(rng.randint(0, _MERSENNE - 1)))
        for _ in range(n_hashes)
    ]


def normalize_text(col):
    """Lowercase + collapsed whitespace. Materialize this BEFORE shingling:
    an expression nested inside a transform() lambda is re-evaluated per
    array element (a regex here cost 14s/10k docs at sf0.1)."""
    return F.regexp_replace(F.lower(col), r"\s+", " ")


def char_shingles(col, k: int = 5, pre_normalized: bool = False):
    """k-char shingles via sequence+transform (pure HOF).

    Deliberately NOT deduplicated: array_distinct is O(n²) string-compares
    per row, MinHash over a multiset equals MinHash over its set, and
    array_intersect/array_union already treat arrays as sets in the
    Jaccard verify. Pass a pre-materialized normalized column (see
    ``normalize_text``) in hot paths."""
    norm = col if pre_normalized else normalize_text(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: norm.substr(i, F.lit(k)))


def word_shingles(col, k: int = 3):
    """Distinct k-word shingles."""
    toks = F.split(F.regexp_replace(F.lower(col), r"\s+", " "), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


#: small prime for rolling word-shingle combination; acc < 2^31 and
#: P < 2^21 keep every intermediate under 2^52 — no long overflow even
#: under ANSI mode.
_COMBO_P = 1_000_003


def word_shingle_hashes(token_hashes, k: int = 3):
    """k-word shingle hashes from PRE-HASHED tokens (array<long> in
    [0, p)): shingle_i = fold of k consecutive token hashes via
    ``acc·P + h (mod p)``. ~8× fewer elements than 5-char shingles on
    ordinary prose — the scale lever for MinHash over long documents.
    ``F.get`` (0-based) returns NULL past the end instead of throwing
    under ANSI; short docs yield one partial shingle."""

    def shingle(i):
        acc = F.coalesce(F.get(token_hashes, i), F.lit(0))
        for j in range(1, k):
            nxt = F.coalesce(F.get(token_hashes, i + j), F.lit(0))
            acc = F.pmod(acc * _COMBO_P + nxt, F.lit(_MERSENNE))
        return acc

    idx = F.sequence(
        F.lit(0), F.greatest(F.size(token_hashes) - k, F.lit(0))
    )
    return F.transform(idx, shingle)


def minhash_signature(shingles, n_hashes: int = 64, seed: int = 42):
    """MinHash signature as an array<long>: for each (a,b) permutation,
    min over shingle hashes of (a·h+b) mod p.

    Single-pass fold: the accumulator is the whole signature array and
    each shingle updates all 64 minima via ``zip_with`` against a literal
    (a,b) parameter array — one scan of the shingle list total. (The
    naive form — 64 separate ``aggregate`` expressions — re-evaluates the
    shingle-hash array per permutation: 64× the work, measured 80s+ at
    sf0.1 vs ~2s for this form.) xxhash64+pmod supplies the base hash
    (pmod, not abs%: abs(Long.MIN_VALUE) overflows under ANSI mode).
    """
    hashes = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    return minhash_signature_from_hashes(hashes, n_hashes, seed)


def minhash_signature_from_hashes(hashes, n_hashes: int = 64, seed: int = 42):
    """Signature fold over pre-hashed shingles (array<long> in [0, p))."""
    params = _hash_params(n_hashes, seed)
    ab = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in params
        ]
    )
    init = F.array_repeat(F.lit(_MERSENNE).cast("long"), n_hashes)
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc, ab, lambda m, p: F.least(m, (h * p["a"] + p["b"]) % _MERSENNE)
        ),
    )


def minhash_signature_udf(n_hashes: int = 64, seed: int = 42):
    """Arrow-vectorized signature over pre-hashed shingles: one numpy
    outer product + column-min per row. Measured ~4× faster than the
    pure-HOF fold (the fold allocates a signature array per shingle);
    this is the sanctioned pandas-UDF slow path earning its keep."""
    params = _hash_params(n_hashes, seed)
    a_vec = np.array([p[0] for p in params], dtype=np.int64)
    b_vec = np.array([p[1] for p in params], dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            hv = np.asarray(h, dtype=np.int64)
            if hv.size == 0:
                out.append([int(_MERSENNE)] * len(a_vec))
                continue
            m = ((hv[:, None] * a_vec[None, :] + b_vec[None, :]) % _MERSENNE).min(
                axis=0
            )
            out.append(m.tolist())
        return pd.Series(out)

    return _sig


def band_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """(``id_col``, band, bucket) rows — one per signature band, bucket =
    hash of the band slice. Only these three narrow columns ever ride the
    candidate shuffle. ``max_bucket_size`` drops oversized buckets (skew
    guard — see ``lsh_candidate_pairs``)."""
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
    if max_bucket_size is not None:
        from pyspark.sql.window import Window as W

        bucket_n = F.count(F.lit(1)).over(W.partitionBy("band", "bucket"))
        banded = banded.withColumn("__bn", bucket_n).filter(
            F.col("__bn") <= max_bucket_size
        ).drop("__bn")
    return banded


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Band the signature, bucket by (band, hash(band slice)), and emit
    candidate pairs (a < b) per bucket. One shuffle on band hashes; pair
    blowup is bucket-local (collision groups), never corpus-global.

    ``max_bucket_size`` is the skew guard: a bucket shared by k docs emits
    k²/2 pairs, so one hot bucket (a boilerplate band every doc shares) is
    quadratic death at corpus scale. Oversized buckets are dropped — a
    true near-dup pair shares MANY bands (its signatures mostly agree), so
    losing one common band costs ~nothing in recall (asserted ≥0.95 in
    tests), exactly like stop-words in text indexing."""
    banded = band_signatures(
        df, id_col, sig_col, bands, rows_per_band, max_bucket_size
    )
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


def prepare_minhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 5,
    shingle_mode: str = "char",
) -> DataFrame:
    """Shared MinHash prep: (``id_col``, shingles: array<long>,
    sig: array<long>). Staged so each expensive expression materializes
    once — norm (regex) → shingles → hashed shingles (ints) → sig; all
    downstream set ops run on int arrays, not strings. Unpersisted: the
    caller decides the cache/storage lifecycle (one-shot pipelines
    persist it; the incremental fold writes it to the signature store)."""
    normed = docs.select(
        id_col, normalize_text(F.col(text_col)).alias("__norm")
    )
    if shingle_mode == "word":
        tokh = normed.select(
            id_col,
            F.transform(
                F.split(F.col("__norm"), " "),
                lambda t: F.pmod(F.xxhash64(t), F.lit(_MERSENNE)),
            ).alias("__th"),
        )
        hashed = tokh.select(
            id_col,
            word_shingle_hashes(F.col("__th"), shingle_k).alias("shingles"),
        )
    else:
        shingled = normed.select(
            id_col,
            char_shingles(
                F.col("__norm"), shingle_k, pre_normalized=True
            ).alias("__sh"),
        )
        hashed = shingled.select(
            id_col,
            F.transform(
                "__sh", lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE))
            ).alias("shingles"),
        )
    return hashed.withColumn(
        "sig", minhash_signature_udf(n_hashes)(F.col("shingles"))
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    shingle_mode: str = "char",
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pipeline:
    shingle → signature → LSH buckets → candidate pairs → exact verify.

    ``shingle_mode='char'`` hashes every k-char substring (robust to
    whitespace/tokenization noise, ~len(text) shingles per doc);
    ``'word'`` rolls k-word shingles over pre-hashed tokens (~n_tokens
    shingles — ~8× fewer on prose, the right default for long-document
    corpora at scale)."""
    rows_per_band = n_hashes // bands
    prepared = (
        prepare_minhash(
            docs, id_col, text_col, n_hashes, shingle_k, shingle_mode
        )
        # consumed twice (banding + verify) — cache instead of recomputing
        # the signature fold; at cluster scale this is a checkpoint to
        # storage rather than executor memory. Registered so the caller
        # can release_all_cached() after materializing (see
        # operators/caching.py — repeated calls must not accumulate
        # cached blocks in a long-lived session).
        .persist()
    )
    cands = lsh_candidate_pairs(
        prepared, id_col, "sig", bands, rows_per_band
    )
    # Two-stage verify: (1) MinHash-estimated Jaccard from the 64-int
    # signatures prunes the candidate set cheaply (the LSH buckets admit
    # ~100× more pairs than survive the threshold — shipping full shingle
    # arrays for all of them dominated runtime); (2) exact Jaccard on the
    # survivors only. The estimate's band is wide (±0.2) so stage 2 sees
    # every true positive.
    sigs = prepared.select(F.col(id_col), F.col("sig"))
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.size("sig_a"),
        )
        .filter(F.col("est_jaccard") >= threshold - 0.2)
        .select("id_a", "id_b")
    )
    from mysql_cdc_to_http_spark.operators.caching import register_cached

    return register_cached(
        jaccard_verify(est, prepared, id_col, "shingles", threshold),
        [prepared],
    )


@pandas_udf(LongType())
def simhash_fold_udf(token_hashes: pd.Series) -> pd.Series:
    """64-bit SimHash bit-vote over PRE-HASHED tokens (Arrow-vectorized):
    each token's 64-bit hash votes per bit position; the majority of each
    vote total sets the bit. Token hashing itself happens JVM-side
    (``transform(tokens, xxhash64)``) — no per-token Python in the hot
    path (round-1 verdict: the FNV-1a loop here was the q_dedup_simhash
    floor).

    Vectorized ACROSS rows, not per row: all token hashes in the Arrow
    batch are flattened once, and each bit's votes are segment-summed by
    doc via ``bincount`` — a per-row numpy loop is overhead-bound at
    ~10k small docs/second; this form is ~10× that."""
    n = len(token_hashes)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return pd.Series(out.view(np.int64))
    arrs = [np.asarray(h, dtype=np.int64) for h in token_hashes]
    lens = np.array([a.size for a in arrs], dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return pd.Series(out.view(np.int64))
    flat = np.concatenate(arrs).view(np.uint64)
    seg = np.repeat(np.arange(n), lens)
    for j in range(64):
        bit = ((flat >> np.uint64(j)) & np.uint64(1)).astype(np.float64)
        ones = np.bincount(seg, weights=bit, minlength=n)
        # majority of ±1 votes > 0  ⇔  ones > len/2 (strict)
        out |= (2 * ones > lens).astype(np.uint64) << np.uint64(j)
    return pd.Series(out.view(np.int64))


def simhash64(text_col):
    """SimHash column expression: JVM tokenize+hash, Arrow bit-vote."""
    toks = F.split(normalize_text(text_col), " ")
    token_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return simhash_fold_udf(token_hashes)


#: Bits per fingerprint variant — xxhash64 uses the full 64; the md5
#: variant takes the hash's first 15 hex chars (60 bits), the widest
#: slice that fits a signed BIGINT on both engines.
SIMHASH_BITS = {"xxhash64": 64, "md5": 60}


def simhash60_md5(text_col):
    """60-bit SimHash over md5-derived token hashes — the CROSS-ENGINE
    fingerprint twin of ``simhash64``. Token hash = first 15 hex chars
    of md5(token) as a base-16 integer (the engine's md5 determinism
    primitive, same as ``split_bucket``), so any SQL engine reproduces
    the exact fingerprints and brute-force hamming ground truth — this
    is what makes q_dedup_simhash_md5 fully oracle-able where the
    xxhash64 form (no SQL mirror) stays rows-only. xxhash64 remains the
    fast default: one JVM hash call per token vs md5 + substring + conv,
    measured ~1.5× cheaper on the signature stage."""
    toks = F.split(normalize_text(text_col), " ")
    token_hashes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    return simhash_fold_udf(token_hashes)


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int = 500,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup candidates: band the fingerprint into 4 chunks
    (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal, so the banded
    candidate set is a SUPERSET of every qualifying pair), bucket per
    chunk, verify hamming distance via bit_count(xor).

    ``hash_fn`` picks the fingerprint: ``"xxhash64"`` (default, fastest,
    64-bit, no SQL mirror) or ``"md5"`` (60-bit, bit-for-bit
    reproducible in any md5-capable SQL engine — the oracle-able twin).

    Scale shape mirrors MinHash-LSH: only (id, chunk, bucket) rides the
    candidate shuffle (the fingerprint joins back by id AFTER pair
    generation), and ``max_bucket_size`` caps the per-bucket k²/2 pair
    blowup — one hot chunk bucket must not go quadratic at corpus
    scale. With ``max_bucket_size=None`` (exact mode) the result is
    PRECISELY all pairs at hamming ≤ ``max_hamming``; with a cap it is
    the documented approximate contract (~92% capture measured at the
    scale config, COVERAGE.md).
    """
    if hash_fn not in SIMHASH_BITS:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    n_bits = SIMHASH_BITS[hash_fn]
    fingerprint = simhash64 if hash_fn == "xxhash64" else simhash60_md5
    width = n_bits // 4
    mask = (1 << width) - 1
    sh = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("sh"))
    # consumed twice (banding + hamming verify) — compute the UDF once;
    # tagged on the result for release_cached() (operators/caching.py)
    sh = sh.persist()
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned(F.col("sh"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for i in range(4)
        ]
    )
    banded = sh.select(id_col, F.explode(chunks).alias("cc")).select(
        id_col, "cc.chunk", "cc.bucket"
    )
    if max_bucket_size is not None:
        from pyspark.sql.window import Window as W

        bucket_n = F.count(F.lit(1)).over(W.partitionBy("chunk", "bucket"))
        banded = (
            banded.withColumn("__bn", bucket_n)
            .filter(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    l, r = banded.alias("l"), banded.alias("r")
    cands = l.join(
        r,
        (F.col("l.chunk") == F.col("r.chunk"))
        & (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
    )
    # Verify BEFORE dedup: similar-fingerprint docs cluster, so chunk
    # buckets admit ~100× more candidates than survive the hamming cut —
    # distinct() on the raw pair set would shuffle all of them, while the
    # fingerprint join is map-side (the (id, sh) table is narrow; AQE
    # broadcasts it until the corpus outgrows the threshold). The
    # post-filter distinct dedups only true near-dup pairs (≤4 copies).
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    from mysql_cdc_to_http_spark.operators.caching import register_cached

    return register_cached(
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct(),
        [sh],
    )

# Executors must not need this repo on their PYTHONPATH: register this
def incremental_dedup(
    spark,
    new_docs: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.6,
    shingle_mode: str = "word",
    max_bucket_size: int = 500,
    state_handle: dict | None = None,
    prepared: DataFrame | None = None,
) -> DataFrame:
    """Fold one batch into a PERSISTENT dedup state — the continuous-
    ingestion form of MinHash-LSH dedup (a training pipeline never sees
    its corpus at once; each arriving batch must dedup against
    everything already kept without recomputing old signatures).

    A new doc is DROPPED when it verifies (exact Jaccard ≥ threshold)
    against any already-kept doc or any smaller-id doc in its own batch;
    survivors' (id, shingles, sig) rows are appended to the signature
    store. On clique-shaped duplicate clusters this greedy policy equals
    the canonical min-survivor of connected components, and a batched
    fold equals the one-shot dedup of the full corpus
    (tests/test_llm_ops.py asserts both).

    Scale shape: old signatures are READ, never recomputed (the store
    holds the prep output); candidate generation joins only the NEW
    batch's bands against (state ∪ batch) bands — the shuffle carries
    (id, band, bucket), payload arrays join back by id for the verify;
    the store append is the crash-safe write-then-swap from
    streaming/latest_state.py. Returns the surviving rows of
    ``new_docs`` (derived from the eagerly-checkpointed post-fold
    state, so it stays valid after later folds swap the store files;
    the state swap itself commits eagerly inside this call).

    ``state_handle`` (r8 verdict #4): an optional mutable dict carrying
    the post-fold state ACROSS folds of one driver loop. When the same
    dict is passed to consecutive folds, each fold reuses the previous
    fold's eagerly-checkpointed state instead of reading the store back
    from parquet, and the single full execution per fold is the
    checkpoint — the swap write and the returned survivors both derive
    from it without recomputation. Crash-safety is unchanged: the
    write-then-swap still commits every fold; the handle is a cache,
    not the source of truth (a fresh process starts from the store).

    ``prepared``: optional pre-computed ``prepare_minhash`` output for
    exactly the rows of ``new_docs`` (id, shingles, sig). Signature
    prep is content-addressed — a deterministic function of (text,
    params) — so a driver loop that signatures several pending epochs
    in ONE Arrow pass (or reuses a memoized prep) hands each fold its
    slice here and the fold skips the per-batch pandas-UDF pass. The
    caller owns the frame's persistence; it is not unpersisted here."""
    import os

    from mysql_cdc_to_http_spark.streaming.latest_state import (
        _recover_state_dir,
        _swap_into_state_dir,
    )

    rows_per_band = n_hashes // bands
    _recover_state_dir(state_dir)
    caller_prepared = prepared is not None
    prepared_new = (
        prepared
        if caller_prepared
        else prepare_minhash(
            new_docs, id_col, text_col, n_hashes, shingle_k, shingle_mode
        ).persist()
    )
    cached_state = (state_handle or {}).get("df")
    empty_state = False
    if cached_state is not None:
        state = cached_state
    elif os.path.exists(state_dir):
        state = spark.read.parquet(state_dir)
    else:
        state = spark.createDataFrame(
            [], f"{id_col} long, shingles array<long>, sig array<long>"
        )
        empty_state = True
    state = state.persist()
    banded_new = band_signatures(
        prepared_new, id_col, "sig", bands, rows_per_band, max_bucket_size
    )
    # kept docs compare against every new doc regardless of id; batch
    # docs only against LARGER batch ids (the greedy order)
    banded_old = band_signatures(
        state, id_col, "sig", bands, rows_per_band, max_bucket_size
    ).select(
        F.col(id_col).alias("id_a"),
        F.col("band").alias("__ob"),
        F.col("bucket").alias("__ok"),
    )
    n = banded_new.alias("n")
    cands_old = banded_old.join(
        n,
        (F.col("__ob") == F.col("n.band"))
        & (F.col("__ok") == F.col("n.bucket")),
    ).select("id_a", F.col(f"n.{id_col}").alias("id_b"))
    m = banded_new.alias("m")
    cands_new = m.join(
        n,
        (F.col("m.band") == F.col("n.band"))
        & (F.col("m.bucket") == F.col("n.bucket"))
        & (F.col(f"m.{id_col}") < F.col(f"n.{id_col}")),
    ).select(
        F.col(f"m.{id_col}").alias("id_a"),
        F.col(f"n.{id_col}").alias("id_b"),
    )
    # no distinct on the candidate pairs: a pair hit in several bands
    # verifies twice (a few duplicate tiny rows) but the result feeds a
    # DISTINCT on id_b anyway — dropping the pair-dedup shuffle removes
    # a whole stage from every fold's latency floor (r8 verdict #4).
    # The very first fold has no store yet: skip the old-vs-new branch
    # entirely instead of banding/joining a zero-row relation.
    cands = cands_new if empty_state else cands_old.unionByName(cands_new)
    shingle_src = (
        prepared_new.select(id_col, "shingles")
        if empty_state
        else state.unionByName(prepared_new).select(id_col, "shingles")
    )
    matched = jaccard_verify(
        cands, shingle_src, id_col, "shingles", threshold
    ).select(F.col("id_b").alias(id_col)).distinct()
    survivors = prepared_new.join(matched, id_col, "left_anti")
    # ONE full execution per fold: eagerly checkpoint the merged state
    # (also cuts any lazy reference to the pre-swap store files, which
    # the swap below replaces), then both the store write and the
    # returned survivors derive from the checkpoint without recompute.
    new_state = (
        survivors if empty_state else state.unionByName(survivors)
    ).localCheckpoint()
    _swap_into_state_dir(new_state, state_dir)
    if state_handle is not None:
        state_handle["df"] = new_state
    out = new_docs.join(new_state.select(id_col), id_col, "left_semi")
    if not caller_prepared:
        prepared_new.unpersist()
    state.unpersist()
    return out


# module for pickle-by-value so UDFs/closures ship inside the task
# (the driver contract imports __spark_entry__.py by path, not site-packages).
import sys as _sys
from pyspark import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])


def semantic_dedup(
    vectors: DataFrame,
    k: int = 4,
    iters: int = 2,
    tau: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means-cluster the
    embedding space, then drop any vector with a LOWER-id neighbor at
    cosine >= tau INSIDE its cluster. Composition of the engine's
    clustering + similarity primitives, and the reason both exist in a
    training-data pipeline: all-pairs cosine over a corpus is O(n²),
    but within-cluster pairs are O(n²/k) per cluster — the cluster id
    is the blocking key (same candidate-generation discipline as
    MinHash-LSH and operators/linkage.py), and the k-means model keeps
    blocks semantically coherent so the recall loss is exactly the
    cross-cluster tail (by design — the SemDeDup approximation).

    Returns (id, cluster, kept): full corpus with survivors flagged —
    callers filter kept for the deduplicated set. Deterministic end to
    end: lowest-id k-means init, 6-dp centroid rounds, lowest-id
    survivor rule."""
    from mysql_cdc_to_http_spark.operators.clustering import kmeans
    from mysql_cdc_to_http_spark.operators.similarity import as_double

    from mysql_cdc_to_http_spark.operators.caching import register_cached
    from mysql_cdc_to_http_spark.operators.similarity import dot, l2_norm

    assigned = kmeans(vectors, k, iters, id_col, vec_col).select(
        id_col, "cluster"
    )
    # persist the (id, vector, norm, cluster) side ONCE: both pair sides
    # and the survivor join consume it, and its lineage re-runs the full
    # kmeans assignment otherwise; per-row norms precomputed here cut the
    # pair stage from 3 folds/pair (dot + 2 norms) to 1 (dot) + 1 multiply
    side = (
        vectors.select(F.col(id_col), as_double(vec_col).alias("cv"))
        .withColumn("__n", l2_norm(F.col("cv")))
        .join(assigned, id_col)
        .persist()
    )
    a = side.select(
        F.col(id_col).alias("id_a"),
        F.col("cv").alias("va"),
        F.col("__n").alias("na"),
        "cluster",
    )
    b = side.select(
        F.col(id_col).alias("id_b"),
        F.col("cv").alias("vb"),
        F.col("__n").alias("nb"),
        "cluster",
    )
    dups = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= F.lit(tau)
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    result = (
        side.select(id_col, "cluster")
        .join(dups.withColumn("__dup", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("kept"),
        )
    )
    return register_cached(result, [side])


# --------------------------------------------------------------------------
# Exact-substring span dedup (Lee et al. 2021, "Deduplicating Training
# Data Makes Language Models Better" — the ExactSubstr pass, re-expressed
# relationally at token granularity instead of a suffix array)
# --------------------------------------------------------------------------
def exact_span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Remove every token covered by an n-token window whose exact text
    occurs more than once in the corpus (intra- or inter-document).

    The suffix-array formulation doesn't distribute; the relational one
    does, in three shuffles regardless of corpus size:

    1. window hashes — a pure JVM HOF projection (slice + concat_ws +
       md5 per start offset, exploded), then a count aggregate ON THE
       HASH: the shuffle carries (hash, count partials) only, never
       text.
    2. duplicated-window starts — the window stream joins the dup-hash
       set on the hash key (both sides hash-partitioned by the same
       key; the payload is (doc, start) pairs).
    3. coverage + rebuild — one shuffle by document: token positions
       left-join dup starts (co-partitioned), a per-doc ordered window
       marks each position covered if ANY duplicated window starts in
       (pos-n, pos] (``max(flag) over rows n-1 preceding``), and the
       survivors reassemble via sort_array(collect_list(struct(pos,
       tok))) — order-deterministic under any partitioning.

    Output: (id, n_tokens, n_dup_tokens, clean_text). Documents shorter
    than ``n`` tokens have no windows and survive whole; documents that
    are entirely duplicated spans come back with clean_text = ''.
    """
    t = F.split(F.lower(F.col(text_col)), r"\s+")
    toks = docs.select(F.col(id_col).alias("id"), t.alias("t"))

    starts = F.transform(
        F.sequence(F.lit(1), F.size("t") - F.lit(n - 1)),
        lambda i: F.struct(
            i.alias("start"),
            F.md5(F.concat_ws(" ", F.slice("t", i, n))).alias("h"),
        ),
    )
    wins = (
        toks.filter(F.size("t") >= n)
        .select("id", F.explode(starts).alias("w"))
        .select("id", "w.start", "w.h")
    )
    dup_h = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("h")
    )
    dup_starts = wins.join(dup_h, "h").select(
        "id", "start", F.lit(1).alias("flag")
    )

    pos = toks.select(
        "id", F.size("t").alias("n_tokens"), F.posexplode("t")
    ).select(
        "id", "n_tokens", (F.col("pos") + 1).alias("pos"), "col"
    )
    from pyspark.sql.window import Window as W

    marked = pos.join(
        dup_starts,
        (pos["id"] == dup_starts["id"]) & (pos["pos"] == dup_starts["start"]),
        "left",
    ).select(pos["id"], "n_tokens", "pos", "col", "flag")
    cover_w = (
        W.partitionBy("id").orderBy("pos").rowsBetween(-(n - 1), 0)
    )
    covered = marked.withColumn(
        "covered", F.max(F.coalesce("flag", F.lit(0))).over(cover_w) == 1
    )
    return (
        covered.groupBy("id", "n_tokens")
        .agg(
            F.sum(F.col("covered").cast("int")).alias("n_dup_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                ~F.col("covered"),
                                F.struct(F.col("pos"), F.col("col")),
                            )
                        )
                    ),
                    lambda s: s["col"],
                ),
            ).alias("clean_text"),
        )
        .select(
            F.col("id"),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("n_dup_tokens").cast("int").alias("n_dup_tokens"),
            "clean_text",
        )
    )


def prefix_filter_pairs(
    docs: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT-recall set-similarity self-join by prefix filtering
    (AllPairs/PPJoin family — Bayardo et al. "Scaling Up All Pairs
    Similarity Search", Vernica et al.'s MapReduce form): every pair
    with token-set Jaccard ≥ t is returned, NO false negatives — the
    property the MinHash/SimHash/embedding LSH arms of the dedup
    ladder trade away for speed.

    The filter: order each doc's distinct tokens by GLOBAL rarity
    (doc-frequency asc, token asc — rarest first). If two sets overlap
    enough for Jaccard ≥ t, they must share a token among each set's
    first ``n − ⌈t·n⌉ + 1`` tokens (a pigeonhole on the rarity-sorted
    order: sets agreeing only past their prefixes cannot reach the
    required intersection). So candidates = pairs sharing ≥1 PREFIX
    token — the posting lists of rare tokens — then exact verify.
    Threshold is a rational (num/den); verify cross-multiplies
    (den·|∩| ≥ num·|∪|) and prefix length uses the integer ceiling
    ((num·n + den − 1) div den) — no float anywhere, which is also
    what keeps the cross-engine oracle exact.

    Scale shape: the doc-frequency table is vocab-sized (sublinear in
    corpus by Heaps' law, the X200 budget); the per-doc rarity sort is
    a keyed window over (doc × tokens) rows; candidate volume is
    Σ over prefix tokens of C(|posting|, 2), concentrated in RARE
    tokens by construction (a stopword enters a prefix only for sets
    that are nearly all stopwords). Token payload arrays join back by
    id only for candidates. Production adds a posting-list cap for
    adversarial skew (the LSH bucket-cap discipline) at the cost of
    the exactness guarantee — left OFF here because exact recall is
    this operator's contract."""
    from pyspark.sql.window import Window as W

    from mysql_cdc_to_http_spark.operators.caching import register_cached

    # Persisted: the tokenized corpus feeds THREE consumers in one DAG
    # (the posting-list flatten, and both verify-side payload lookups);
    # without persist each re-reads and re-tokenizes the corpus. Sized
    # at one array row per doc — the same budget as the doc itself.
    toks = (
        docs.select(
            F.col(id_col),
            F.array_distinct(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("toks"),
        )
        .withColumn("n", F.size("toks"))
        .persist()
    )
    flat = toks.select(id_col, "n", F.explode("toks").alias("tok"))
    df_rank = flat.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = flat.join(df_rank, "tok")
    pos = F.row_number().over(W.partitionBy(id_col).orderBy("df", "tok"))
    plen = (
        F.col("n")
        - F.expr(
            f"({threshold_num} * n + {threshold_den - 1}) "
            f"div {threshold_den}"
        )
        + F.lit(1)
    )
    prefix = (
        ranked.withColumn("__pos", pos)
        .filter(F.col("__pos") <= plen)
        .select(id_col, "n", "tok")
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), F.col("n").alias("na"), "tok"
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), F.col("n").alias("nb"), "tok"
    )
    # PPJoin LENGTH filter (exactness-preserving): Jaccard >= t forces
    # t*max(|a|,|b|) <= min(|a|,|b|) -- cross-multiplied, so a prefix
    # token shared by docs of incompatible sizes never forms a
    # candidate. On template-dense corpora this is the difference
    # between posting-list-squared and the true near-dup neighborhood.
    cands = (
        a.join(b, "tok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.least("na", "nb") * F.lit(threshold_den)
                >= F.greatest("na", "nb") * F.lit(threshold_num)
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # Spread the exact verify: on a template-dense corpus the candidate
    # set is the operator's volume (posting-list pairs >> true pairs),
    # and AQE would coalesce the small-byte-size distinct output to one
    # partition — serializing every array_intersect. An explicit
    # repartition (not subject to AQE coalescing) keeps verify wide; the
    # token payloads broadcast when corpus-small (Catalyst's choice —
    # forcing it would break the corpus-sized payload case at scale).
    cands = cands.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b"
    )
    ta = toks.select(F.col(id_col).alias("id_a"), F.col("toks").alias("ta"))
    tb = toks.select(F.col(id_col).alias("id_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    verified = (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("inter"),
            (F.size("ta") + F.size("tb") - inter).alias("uni"),
        )
        .filter(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * F.col("uni")
        )
    )
    return register_cached(verified, [toks])

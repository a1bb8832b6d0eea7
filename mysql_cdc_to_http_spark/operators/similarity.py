"""Vector similarity search over embedding columns (SURVEY X38 +
north-star ANN family).

- Brute-force cosine top-k: exact baseline — broadcast the (small) query
  set against the corpus; dot products via zip_with+aggregate (JVM-side
  fold, no Python). Scales linearly in corpus size per query.
- IVF (inverted-file) top-k: the scale path — corpus is bucketed by
  nearest centroid once; a query probes only ``nprobe`` buckets, turning
  the scan into a partition-pruned fraction of the corpus. Centroids are
  sampled deterministically; at 100 TB you'd train them with k-means and
  write the corpus bucketed/partitioned by centroid id so bucket probes
  are partition-pruned parquet reads.
- Embedding near-dup: all-pairs cosine ≥ threshold via bucket-local LSH
  (random hyperplane signs) instead of a global cross join.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W


def as_double(vec):
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a, b):
    """Sequential fold — deterministic summation order (oracle-friendly)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b):
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast(queries) × corpus, cosine per pair, rank per
    query. The corpus side never shuffles — only the (tiny) per-query
    top-k heap does (TakeOrdered semantics via window + filter)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), as_double(vec_col).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "corpus_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sample_centroids(
    corpus: DataFrame, n_centroids: int, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid sample: the n lowest-id vectors (stand-in
    for trained k-means centers; mechanism identical downstream)."""
    return (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            # row_number (not monotonically_increasing_id): centroid ids
            # must be deterministic across partitionings
            (F.row_number().over(W.orderBy(id_col)) - 1).alias("centroid_id"),
            as_double(vec_col).alias("centroid"),
        )
    )


def assign_buckets(
    corpus: DataFrame, centroids: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF build: each corpus vector joins its nearest centroid (broadcast
    of the centroid table, argmax per row — no shuffle of the corpus)."""
    c = corpus.select(id_col, as_double(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(centroids)).select(
        id_col,
        "cv",
        "centroid_id",
        cosine(F.col("cv"), F.col("centroid")).alias("sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "cv", F.col("centroid_id").alias("bucket"))
    )


def ivf_topk(
    queries: DataFrame,
    bucketed_corpus: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: per query, rank centroids, keep top-``nprobe`` buckets,
    then exact cosine only within those buckets (equi-join on bucket id —
    at scale this is a partition-pruned scan, not a cross join)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id", "qv", "centroid_id",
        cosine(F.col("qv"), F.col("centroid")).alias("sim"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("centroid_id").alias("bucket"))
    )
    scored = probes.join(bucketed_corpus, "bucket").select(
        "query_id",
        F.col(id_col).alias("corpus_id"),
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_lsh_pairs(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup: random-hyperplane sign signature (SimHash for
    vectors), banded bucketing, exact cosine verify on candidates only."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    sign_bits = F.array(
        *[
            (
                F.aggregate(
                    F.zip_with(
                        as_double(vec_col),
                        F.array(*[F.lit(float(v)) for v in planes[p]]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0
            ).cast("int")
            for p in range(n_planes)
        ]
    )
    rows_per_band = n_planes // bands
    sig = corpus.select(id_col, as_double(vec_col).alias("cv"), sign_bits.alias("bits"))
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.concat_ws(
                    "",
                    *[
                        F.element_at("bits", i * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                ).alias("bucket"),
            )
            for i in range(bands)
        ]
    )
    banded = sig.select(id_col, "cv", F.explode(chunks).alias("bb")).select(
        id_col, "cv", "bb.band", "bb.bucket"
    )
    l, r = banded.alias("l"), banded.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.cv").alias("va"),
            F.col("r.cv").alias("vb"),
        )
        .distinct()
    )
    return cands.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)

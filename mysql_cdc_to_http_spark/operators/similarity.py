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
) -> list[list[float]]:
    """Deterministic centroid sample: the n lowest-id vectors (stand-in
    for trained k-means centers; mechanism identical downstream).

    Returns plain Python vectors (a bounded ``n_centroids``-row collect —
    the centroid table is driver-sized BY DEFINITION, like a k-means
    model). Downstream they're embedded as literal arrays, so bucket
    assignment is a pure per-row projection: no crossJoin row explosion,
    no window, zero shuffle of the corpus (round-1 verdict item #5)."""
    rows = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(as_double(vec_col).alias("v"))
        .collect()
    )
    return [list(r["v"]) for r in rows]


def _centroid_literals(centroids: list[list[float]], normalize: bool = False):
    """array<array<double>> literal of the centroid matrix (optionally
    unit-normalized so dot == cosine ranking). One array literal per
    centroid (not dim-many scalar literals — K·D Literal nodes blow up
    the codegen tree and its compile time)."""
    mats = []
    for vec in centroids:
        arr = np.asarray(vec, dtype=np.float64)
        if normalize:
            n = np.linalg.norm(arr)
            if n > 0:
                arr = arr / n
        mats.append(F.lit(arr))
    return F.array(*mats)


def assign_buckets(
    corpus: DataFrame, centroids: list[list[float]], id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF build: nearest-centroid argmax as ONE inline array expression —
    sims = per-centroid dot against unit-centroid literals (corpus-side
    norm is a positive per-row constant, so dot ranks identically to
    cosine), bucket = first position of the max (ties → lowest centroid
    id). The plan is a projection: no join, no explode, no shuffle."""
    cents = _centroid_literals(centroids, normalize=True)
    # materialize cv, then sims, as real columns: an expression nested in
    # a transform() lambda re-evaluates per array element
    c = corpus.select(F.col(id_col), as_double(vec_col).alias("cv"))
    scored = c.withColumn(
        "__sims", F.transform(cents, lambda cent: dot(F.col("cv"), cent))
    )
    bucket = (
        F.array_position(F.col("__sims"), F.array_max(F.col("__sims"))) - 1
    ).cast("int")
    return scored.select(F.col(id_col), "cv", bucket.alias("bucket"))


def ivf_topk(
    queries: DataFrame,
    bucketed_corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: per query, rank centroids INLINE (sims array over the
    centroid literals → sort (−sim, id) structs → slice nprobe → explode),
    then exact cosine only within the probed buckets (broadcast equi-join
    on bucket id — at scale this is a partition-pruned scan of the
    centroid-bucketed corpus, not a cross join; the corpus never
    shuffles)."""
    cents = _centroid_literals(centroids, normalize=True)
    n_cents = len(centroids)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    # probe ranking on 6-dp-ROUNDED cosine (dot-with-unit-centroid ÷
    # |q|), centroid-id tie-break: same ordering as the raw dot (the
    # per-query norm is a positive constant) but reproducible across
    # engines, which is what lets the DuckDB oracle replicate the probe
    # set exactly (round-11; previously rows-only).
    # |q| materialized as a real column FIRST — an expression nested in
    # the transform lambda re-evaluates per centroid (the tokenize rule)
    qs = q.withColumn("__qn", l2_norm(F.col("qv"))).withColumn(
        "__sims",
        F.transform(
            cents,
            lambda cent: F.round(
                dot(F.col("qv"), cent) / F.col("__qn"), 6
            ),
        ),
    )
    # rank centroids without a window: sort (−sim, centroid_id) pairs
    ranked = F.slice(
        F.array_sort(
            F.zip_with(
                F.col("__sims"),
                F.sequence(F.lit(0), F.lit(n_cents - 1)),
                lambda s, i: F.struct((-s).alias("neg"), i.alias("cid")),
            )
        ),
        1,
        nprobe,
    )
    probes = qs.select(
        "query_id", "qv", F.explode(ranked).alias("probe")
    ).select("query_id", "qv", F.col("probe.cid").alias("bucket"))
    scored = bucketed_corpus.join(F.broadcast(probes), "bucket").select(
        "query_id",
        F.col(id_col).alias("corpus_id"),
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


#: corpora at or below this many rows stay on the exact broadcast scan;
#: larger ones go through IVF bucketing. Overridable per session via
#: ``spark.conf.set("spark.graft.knn.bruteforceMaxRows", n)``.
_KNN_BRUTEFORCE_MAX_ROWS = 1_000_000


def knn_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    strategy: str = "auto",
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_rows: int | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Strategy-selecting KNN planner — the engine's query-facing entry.

    ``strategy``: ``"exact"`` pins the brute-force broadcast scan,
    ``"ivf"`` pins the bucketed approximate path, ``"auto"`` (default)
    picks by corpus size: exact while the corpus is small enough that a
    linear scan per query beats paying the bucketing pass, IVF beyond.
    The cutover (default 1e6 rows) comes from
    ``spark.graft.knn.bruteforceMaxRows`` so operators can tune it per
    cluster without code changes. Pass ``corpus_rows`` when the caller
    already knows the cardinality (a catalog row count — avoids the
    count job; at 100 TB you ALWAYS know this from table metadata).

    This selection lives deliberately at the plan-builder layer, not in
    a Catalyst rule: the exact→IVF rewrite CHANGES RESULTS (approximate
    recall), and a silent optimizer rule altering semantics is exactly
    the class of bug the LatestStateRewrite null-ordering review flagged
    — approximation must be an explicit, visible choice.
    """
    if strategy not in ("auto", "exact", "ivf"):
        raise ValueError(f"unknown knn strategy: {strategy!r}")
    if strategy == "auto":
        limit = int(
            queries.sparkSession.conf.get(
                "spark.graft.knn.bruteforceMaxRows",
                str(_KNN_BRUTEFORCE_MAX_ROWS),
            )
        )
        n = corpus_rows if corpus_rows is not None else corpus.count()
        strategy = "exact" if n <= limit else "ivf"
    if strategy == "exact":
        return cosine_topk_bruteforce(queries, corpus, k, id_col, vec_col)
    # pass kmeans-trained centroids (operators/clustering.py:
    # kmeans_centroids) when recall matters; the lowest-id sample is
    # the zero-cost default
    if centroids is None:
        centroids = sample_centroids(corpus, n_centroids, id_col, vec_col)
    bucketed = assign_buckets(corpus, centroids, id_col, vec_col)
    return ivf_topk(
        queries, bucketed, centroids, k, nprobe, id_col, vec_col
    )


def hyperplane_lsh_pairs(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 64,
    bands: int = 4,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Embedding near-dup: random-hyperplane sign signature (SimHash for
    vectors), banded bucketing, exact cosine verify on candidates only.

    Bucket width = n_planes/bands SIGN BITS; 64/4 → 16-bit buckets. Too
    few bits is quadratic death regardless of the size cap (16 planes / 4
    bands = 16 possible buckets per band — every ~N/16 vectors collide;
    measured 9.6s at sf0.1 vs ~1s with 16-bit buckets). For cos ≥ 0.99
    targets, P[all 16 signs agree] ≈ 0.955^16 ≈ 0.48 per band → ~93%
    recall over 4 bands, and ≈100% for the ≥0.999 near-identicals this
    detects."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    # materialize the double-cast vector once; each plane fold reads the
    # column, not a re-evaluated transform()
    sign_bits = F.array(
        *[
            (dot(F.col("cv"), F.lit(np.asarray(planes[p], dtype=np.float64))) > 0)
            .cast("int")
            for p in range(n_planes)
        ]
    )
    rows_per_band = n_planes // bands
    sig = (
        corpus.select(F.col(id_col), as_double(vec_col).alias("cv"))
        .withColumn("bits", sign_bits)
        # consumed twice: banding + cosine verify join-back; tagged on
        # the result for release_cached() (operators/caching.py)
        .persist()
    )
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
    # Only (id, band, bucket) rides the candidate shuffle — full vectors
    # join back by id AFTER pair generation (round-1 verdict: payloads in
    # the banding shuffle were the scale hole). Same skew guard as
    # MinHash: a hot bucket would emit k²/2 pairs.
    banded = sig.select(id_col, F.explode(chunks).alias("bb")).select(
        id_col, "bb.band", "bb.bucket"
    )
    if max_bucket_size is not None:
        bucket_n = F.count(F.lit(1)).over(W.partitionBy("band", "bucket"))
        banded = (
            banded.withColumn("__bn", bucket_n)
            .filter(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
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
        )
        .distinct()
    )
    a = sig.select(F.col(id_col).alias("id_a"), F.col("cv").alias("va"))
    b = sig.select(F.col(id_col).alias("id_b"), F.col("cv").alias("vb"))
    from mysql_cdc_to_http_spark.operators.caching import register_cached

    return register_cached(
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold),
        [sig],
    )


def pool_embeddings(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean pooling of embedding vectors per group — the
    centroid/prototype pass (class prototypes, IVF seeding, cluster
    summaries).

    Emitted LONG (group, pos, mean_val) so the output stays scalar-typed
    (the driver's canonicalizer rejects array columns); callers wanting
    array centroids re-collect with sort_array(collect_list(...)).

    Shape at scale: posexplode multiplies rows by dim, but the partial
    hash aggregate collapses each partition to (groups × dim) rows
    before the exchange — the shuffle ships pre-combined (group, pos,
    sum, count) tuples, never the exploded stream. Values accumulate in
    DOUBLE (each float32 is exactly representable); round(·, 6) absorbs
    cross-engine summation-order ulps (same contract as
    hyperplane_lsh_pairs' cos_sim)."""
    return (
        df.select(F.col(group_col), F.posexplode(as_double(vec_col)))
        .groupBy(group_col, "pos")
        .agg(
            F.round(F.sum("col") / F.count(F.lit(1)), 6).alias("mean_val"),
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
        )
    )


def grid_nearest_join(
    queries: DataFrame,
    points: DataFrame,
    cell: int,
    qid: str = "qid",
    pid: str = "pid",
) -> DataFrame:
    """EXACT 1-nearest-neighbor join in 2-D integer space by grid
    blocking with a certify-or-fallback residue — the spatial analog
    of the ANN ladder's coarse-quantize-then-verify discipline.

    Inputs carry integer coordinates ``x, y`` (micro-degree-style
    units; integer squared distances are exact, so the result is
    cross-engine oracle-able with zero FP anywhere). Phase 1 compares
    each query only against points in its grid cell and the 8
    neighbors (the candidate shuffle carries (cell, id, x, y) — never
    all pairs). The winner is CERTIFIED global iff its squared
    distance ≤ cell²: any point outside the 3×3 neighborhood is
    > cell away in some axis, so nothing outside can beat a winner
    inside that radius. Phase 2 routes ONLY the uncertified residue
    (sparse-neighborhood queries) through a brute-force pass — bounded
    work when the grid is sized to data density (residue is empty at
    the demonstration densities; the fallback is the correctness
    escape hatch, not the common path).

    Ties break on (dist², point id) — deterministic in both engines.
    At 100 TB: points partition by cell (co-locating the 9-cell probe
    is one shuffle on cell ids), the residue is a driver-visible
    cardinality worth monitoring, and cell size is the same
    density-vs-work knob IVF's nprobe turns."""
    p_cells = points.select(
        F.col(pid),
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        F.expr(f"x div {cell}").alias("cx"),
        F.expr(f"y div {cell}").alias("cy"),
    )
    probe = queries.select(
        F.col(qid),
        "x",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.expr(f"x div {cell}") + dx).alias("cx"),
                        (F.expr(f"y div {cell}") + dy).alias("cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("c"),
    ).select(qid, "x", "y", "c.cx", "c.cy")
    d2 = (F.col("x") - F.col("px")) * (F.col("x") - F.col("px")) + (
        F.col("y") - F.col("py")
    ) * (F.col("y") - F.col("py"))
    best_of = lambda cand: (  # noqa: E731 — local shape helper
        cand.groupBy(qid).agg(
            F.min(F.struct(d2.alias("d2"), F.col(pid).alias("nn"))).alias(
                "b"
            )
        )
    )
    phase1 = best_of(probe.join(p_cells, ["cx", "cy"]).select(qid, "x", "y", pid, "px", "py"))
    certified = phase1.filter(F.col("b.d2") <= cell * cell)
    # residue: no candidate at all, or winner beyond the certification
    # radius — re-scan against ALL points (broadcast the residue
    # queries; points stream by)
    residue_q = queries.join(certified.select(qid), qid, "left_anti")
    phase2 = best_of(
        F.broadcast(residue_q).crossJoin(
            points.select(
                F.col(pid), F.col("x").alias("px"), F.col("y").alias("py")
            )
        )
    )
    return (
        certified.unionByName(phase2)
        .select(
            qid,
            F.col("b.nn").alias("nn"),
            F.col("b.d2").cast("long").alias("dist2"),
        )
    )


def kcenter_coreset(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Gonzalez farthest-point k-center selection (X221): greedily pick
    the vector FARTHEST from the chosen set (minimum max-similarity,
    rounded 6 dp, id tie-break), k−1 times from a deterministic seed
    (lowest id). The classic 2-approximation for k-center, used as
    diversity/coreset selection over embedding corpora.

    Distributed shape: the model (selected centers) is driver-sized by
    definition, exactly like the k-means/IVF centroid pattern — each
    round is ONE full-scan projection (greatest of the running
    max-similarity and the similarity to the newest center, a literal
    array) plus ONE 1-row argmin collect. k rounds → k scans; nothing
    corpus-sized ever shuffles, and the running max-sim column carries
    all history so round i only scores against ONE new center.

    Returns (selections, scored): ``selections`` is a list of
    (rank, id, sel_maxsim — None for the seed), ``scored`` the corpus
    with the final per-vector max-similarity to the selected set
    (coverage = min over it).
    """
    c = corpus.select(
        F.col(id_col).alias("cid"), as_double(vec_col).alias("v")
    ).persist()
    try:
        seed = c.orderBy("cid").limit(1).collect()[0]
        selections = [(1, seed.cid, None)]
        newest_vec = seed.v
        cur = c.select(
            "cid", "v", F.lit(None).cast("double").alias("ms")
        )
        for rank in range(2, k + 1):
            lit_vec = F.array(*[F.lit(float(x)) for x in newest_vec])
            sim = F.round(cosine(F.col("v"), lit_vec), 6)
            cur = cur.select(
                "cid",
                "v",
                F.greatest(
                    F.coalesce("ms", F.lit(-2.0)), sim
                ).alias("ms"),
            )
            chosen = [cid for _, cid, _ in selections]
            pick = (
                cur.filter(~F.col("cid").isin(chosen))
                .orderBy(F.col("ms").asc(), F.col("cid").asc())
                .limit(1)
                .collect()[0]
            )
            selections.append((rank, pick.cid, float(pick.ms)))
            newest_vec = pick.v
        # fold in the last center so coverage reflects the full set
        lit_vec = F.array(*[F.lit(float(x)) for x in newest_vec])
        sim = F.round(cosine(F.col("v"), lit_vec), 6)
        scored = cur.select(
            "cid",
            F.greatest(F.coalesce("ms", F.lit(-2.0)), sim).alias("ms"),
        )
        return selections, scored
    finally:
        c.unpersist()


def maintain_ivf_index(
    old_index: DataFrame,
    upserts: DataFrame,
    delete_keys: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental IVF index maintenance under CDC churn (X228): update
    a materialized ``assign_buckets`` index to reflect vector
    upserts/deletes touching only delta-sized work — the X94
    ``maintain_joined_view`` discipline applied to the ANN ladder, which
    is what a 100 TB embedding store actually runs (re-bucketing the
    corpus per churn batch would be a full index rebuild each time).

    ``old_index``: (id, cv, bucket) as produced by ``assign_buckets``.
    ``upserts``: (id, vec) rows inserted or re-embedded. ``delete_keys``:
    one-column id frame of deletions.

    Derivation: an index row is stale iff its vector was deleted or
    re-embedded — drop those via ONE broadcast anti-join on the
    (change-sized) touched-key union, then append the upserts assigned
    by the SAME centroid projection that built the index. Centroids stay
    fixed between retrains, so incremental == full rebuild EXACTLY (the
    identity is this operator's contract, property-tested row-exactly
    and oracle-checked by q_knn_ivf_incremental); drift is watched by
    ``ivf_staleness`` and a retrain is an explicit, gated event — never
    an implicit per-batch cost.

    Scale shape: the anti-join broadcasts touched keys (delta-sized by
    definition); assignment of the delta is the usual zero-shuffle
    centroid-literal projection; the union appends without reshuffling
    the surviving index. State is the index itself — at production
    scale, a bucket-partitioned table maintained via MERGE INTO."""
    touched = (
        delete_keys.select(F.col(delete_keys.columns[0]).alias(id_col))
        .unionByName(upserts.select(id_col))
        .distinct()
    )
    kept = old_index.join(F.broadcast(touched), id_col, "left_anti")
    reassigned = assign_buckets(
        upserts, centroids, id_col=id_col, vec_col=vec_col
    )
    return kept.unionByName(reassigned.select(*kept.columns))


def ivf_staleness(
    old_index: DataFrame, new_index: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Centroid-staleness audit for the retrain gate: one row with the
    sizes of both index generations, how many surviving vectors CHANGED
    bucket (re-embedding drift — the signal that the fixed centroids no
    longer describe the data), arrivals/departures, and
    ``stale_micro`` = moved+in+out per million of the new index. The
    caller retrains (recompute centroids + one full re-bucketing) only
    when stale_micro crosses its threshold — the gate that keeps
    incremental maintenance from silently degrading recall. All counts
    integer; the ratio is a truncated micro-unit division, so the audit
    is engine-exact."""
    o = old_index.select(F.col(id_col).alias("id"), F.col("bucket").alias("ob"))
    n = new_index.select(F.col(id_col).alias("id"), F.col("bucket").alias("nb"))
    j = o.join(n, "id", "full_outer")
    return j.agg(
        F.count("ob").cast("long").alias("n_old"),
        F.count("nb").cast("long").alias("n_new"),
        F.sum(
            F.when(
                F.col("ob").isNotNull()
                & F.col("nb").isNotNull()
                & (F.col("ob") != F.col("nb")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_moved"),
        F.sum(F.when(F.col("ob").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_in"),
        F.sum(F.when(F.col("nb").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_out"),
        # Empty new index (all vectors deleted) → staleness is
        # undefined, surfaced as an explicit NULL rather than a silent
        # div-by-zero NULL (default mode) / exception (ANSI) —
        # r11 ADVICE.
        F.expr(
            "CAST(CASE WHEN count(nb) = 0 THEN NULL ELSE"
            " (sum(CASE WHEN ob IS NOT NULL AND nb IS NOT NULL"
            " AND ob != nb THEN 1 ELSE 0 END)"
            " + sum(CASE WHEN ob IS NULL THEN 1 ELSE 0 END)"
            " + sum(CASE WHEN nb IS NULL THEN 1 ELSE 0 END)) * 1000000"
            " div count(nb) END AS BIGINT)"
        ).alias("stale_micro"),
    )

"""Quality tests for the rows-only LLM operators: MinHash-LSH recall vs
exact Jaccard, SimHash self-consistency, IVF ANN recall vs brute force,
hyperplane LSH near-dup recovery, multimodal plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.operators.dedup import (
    char_shingles,
    minhash_dedup_pairs,
    simhash_pairs,
)
from mysql_cdc_to_http_spark.operators.multimodal import (
    attach_media,
    decode_media,
    extract_features,
    frame_sample_plan,
)
from mysql_cdc_to_http_spark.operators.similarity import (
    assign_buckets,
    cosine_topk_bruteforce,
    ivf_topk,
    sample_centroids,
)
from mysql_cdc_to_http_spark.queries.llm import _dup_corpus


@pytest.mark.parametrize(
    "cfg",
    [
        {},  # char-shingle default
        # the scale-tuned config (word shingles, 8 bands x 8 rows)
        {"bands": 8, "shingle_mode": "word", "shingle_k": 3},
        # the q_dedup_minhash driver-window config (16 bands x 4 rows —
        # recall 1.0 on this corpus, which the DuckDB oracle relies on)
        {"bands": 16, "shingle_mode": "word", "shingle_k": 3},
    ],
)
def test_minhash_lsh_recovers_planted_dups(spark, sf_dir, cfg):
    """Every planted near-dup (doc, doc+100000) must be found; jaccard of
    a doc with its first-word-dropped variant is high."""
    pairs = minhash_dedup_pairs(
        _dup_corpus(spark, sf_dir), threshold=0.6, **cfg
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    docs = load_table(spark, sf_dir, "documents")
    planted = {(r.doc_id, r.doc_id + 100000) for r in docs.collect()}
    recovered = got & planted
    recall = len(recovered) / len(planted)
    assert recall >= 0.95, f"LSH recall too low ({cfg}): {recall}"


def test_minhash_vs_exact_jaccard_agreement(spark, sf_dir):
    """On found pairs, LSH-verified jaccard equals directly-computed
    jaccard (verification is exact, not approximate)."""
    corpus = _dup_corpus(spark, sf_dir)
    pairs = minhash_dedup_pairs(corpus, threshold=0.6).limit(20)
    sh = corpus.select(
        "doc_id", char_shingles(F.col("text"), 5).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("xa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("xb"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    check = joined.select(
        "jaccard",
        (
            F.size(F.array_intersect("xa", "xb"))
            / F.size(F.array_union("xa", "xb"))
        ).alias("expected"),
    )
    for r in check.collect():
        assert abs(r.jaccard - r.expected) < 1e-12


def test_simhash_identical_and_near_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 5),
        (2, "the quick brown fox jumps over the lazy dog " * 5),  # identical
        (3, "completely different content about spark engines and shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_pairs(df, max_hamming=3).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert found.get((1, 2)) == 0  # identical docs → hamming 0
    assert (1, 3) not in found and (2, 3) not in found


def test_simhash_md5_exact_mode_equals_bruteforce(spark, sf_dir):
    """The md5 fingerprint in exact mode (no bucket cap) must return
    PRECISELY the brute-force hamming ≤ 3 pair set — the 4×15-bit
    pigeonhole admits a superset; the verify cuts it exactly. Also pins
    the fingerprint being 60-bit non-negative (SQL-mirrorable)."""
    from mysql_cdc_to_http_spark.operators.dedup import simhash60_md5
    from mysql_cdc_to_http_spark.queries.llm import _dup_corpus

    corpus = _dup_corpus(spark, sf_dir).limit(200)
    fp = corpus.select("doc_id", simhash60_md5(F.col("text")).alias("sh"))
    vals = {r.doc_id: r.sh for r in fp.collect()}
    assert all(0 <= v < (1 << 60) for v in vals.values())
    brute = {
        (a, b): bin(vals[a] ^ vals[b]).count("1")
        for a in vals
        for b in vals
        if a < b and bin(vals[a] ^ vals[b]).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(
            corpus, max_hamming=3, max_bucket_size=None, hash_fn="md5"
        ).collect()
    }
    assert got == brute
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown hash_fn"):
        simhash_pairs(corpus, hash_fn="sha1")


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    exact = cosine_topk_bruteforce(queries, corpus, k=3)
    centroids = sample_centroids(corpus, n_centroids=16)
    bucketed = assign_buckets(corpus, centroids)
    approx = ivf_topk(queries, bucketed, centroids, k=3, nprobe=8)
    e = {(r.query_id, r.corpus_id) for r in exact.collect()}
    a = {(r.query_id, r.corpus_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # sanity: every approx hit scores no better than the exact best
    assert len(a) == len(e)


def test_multimodal_stub_and_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    assets = attach_media(docs)
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image/png")
    feats = extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.features) == 32
        assert abs(sum(r.features) - 1.0) < 1e-3  # normalized histogram
    frames = frame_sample_plan(assets)
    if frames.count() > 0:
        assert frames.agg(F.min("frame_no")).collect()[0][0] == 0


def _encode_png(arr, filters=None):
    """Minimal stdlib PNG encoder for fixtures: 8-bit gray/graya/rgb/rgba,
    non-interlaced, one chosen filter type per scanline (the encoder is
    the spec's inverse of the decoder, so a round-trip proves both)."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if filters is None:
        filters = [0] * h
    raw = bytearray()
    prior = np.zeros(w * ch, dtype=np.int32)
    for y, ftype in zip(range(h), filters):
        line = arr[y].reshape(-1).astype(np.int32)
        raw.append(ftype)
        for x in range(w * ch):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prior[x])
            c = int(prior[x - ch]) if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((int(line[x]) - pred) & 0xFF)
        prior = line

    def chunk(ctype, data):
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_real_roundtrip_all_filters():
    """decode_png must recover exact pixels through every scanline filter
    type (None/Sub/Up/Average/Paeth) for gray, RGB, and RGBA images."""
    import numpy as np

    from mysql_cdc_to_http_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(5, 4, ch), dtype=np.uint8)
        png = _encode_png(img, filters=[0, 1, 2, 3, 4])
        got = decode_png(png)
        assert got.shape == (5, 4, ch)
        assert np.array_equal(got, img), f"channels={ch}"


def test_png_decode_rejects_unsupported_variants():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from mysql_cdc_to_http_spark.operators.multimodal import (
        decode_media,
        decode_png,
    )

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a....")
    # palette (color type 3) is outside the baseline subset
    def chunk(ctype, data):
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    pal = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(pal)
    # decode_media routes a non-baseline PNG to Pillow; without Pillow
    # installed the honest gate fires
    with _pytest.raises((NotImplementedError, ValueError)):
        decode_media(pal, "image/png")
    # RIFF payloads route to the REAL stdlib WAV decoder (round 7) —
    # corrupt ones fail as ValueError (the quarantine class), while
    # compressed audio without the RIFF magic stays honestly gated
    with _pytest.raises(ValueError):
        decode_media(b"RIFFxxxx", "audio/wav")
    with _pytest.raises(NotImplementedError):
        decode_media(b"\xffOggS-not-riff", "audio/ogg")
    # ... but a baseline PNG decodes for real regardless of media_type
    img = np.full((2, 3, 3), 128, dtype=np.uint8)
    assert decode_media(_encode_png(img), "image/png").shape == (2, 3, 3)


def test_image_stats_real_decode_over_mapinpandas(spark):
    """image_stats runs the REAL decode path distributed: a generated
    PNG yields exact width/height/channels/mean; an undecodable payload
    yields a decode_error row instead of failing the stage."""
    import numpy as np

    from mysql_cdc_to_http_spark.operators.multimodal import image_stats

    img = np.zeros((4, 6, 3), dtype=np.uint8)
    img[:, :, 0] = 30  # R plane constant → mean = 10.0 exactly
    png = _encode_png(img, filters=[0, 1, 2, 4])
    rows = spark.createDataFrame(
        [
            (1, "image/png", bytearray(png)),
            (2, "video/mp4", bytearray(b"not-an-image")),
        ],
        "asset_id long, media_type string, content binary",
    )
    got = {r.asset_id: r for r in image_stats(rows).collect()}
    ok = got[1]
    assert (ok.width, ok.height, ok.channels) == (6, 4, 3)
    assert abs(ok.mean_intensity - 10.0) < 1e-9
    assert ok.decode_error is None
    bad = got[2]
    assert bad.width is None and bad.decode_error is not None


def test_hyperplane_lsh_recovers_planted_near_identicals(spark, sf_dir):
    """Planted ≥0.999-cosine variants must be recovered by the banded
    sign-bucket path (the q_dedup_embedding production config)."""
    from mysql_cdc_to_http_spark.operators.similarity import (
        hyperplane_lsh_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    variants = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x * 1.001).otherwise(x)
        ).alias("embedding"),
    )
    corpus = emb.unionByName(variants)
    pairs = hyperplane_lsh_pairs(
        corpus, dim=64, n_planes=64, bands=4, threshold=0.99
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {
        (r.vec_id, r.vec_id + 100000)
        for r in emb.filter(F.col("vec_id") % 5 == 0).collect()
    }
    recall = len(got & planted) / len(planted)
    assert recall >= 0.95, f"hyperplane LSH recall too low: {recall}"


def test_connected_components_hand_graph(spark):
    """Label propagation on a known graph: chains collapse to min id,
    isolated nodes keep their own."""
    from mysql_cdc_to_http_spark.operators.graph import (
        canonicalize_clusters,
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 5), (8, 8)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 10)], "id long")
    comp = connected_components(edges, nodes, id_col="id")
    got = {r.id: r.cluster_id for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}
    canon = {r.id: r.is_canonical for r in canonicalize_clusters(comp).collect()}
    assert canon == {
        1: True, 2: False, 3: False, 4: False,
        5: True, 6: False, 7: True, 8: True, 9: True,
    }


def test_connected_components_nonconvergence_is_loud(spark):
    """A graph deeper than max_iter must NOT silently return partial
    labels: strict (default) raises, strict=False warns and returns the
    partial propagation."""
    import warnings as _warnings

    import pytest as _pytest

    from mysql_cdc_to_http_spark.operators.graph import connected_components

    # path graph 1-2-3-...-12: min-label needs ~diameter rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 13)], "id long")
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, nodes, id_col="id", max_iter=2)
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        comp = connected_components(
            edges, nodes, id_col="id", max_iter=2, strict=False
        )
        got = {r.id: r.cluster_id for r in comp.collect()}
    assert any("no fixpoint" in str(w.message) for w in caught)
    assert got[2] == 1 and len(got) == 12  # partial but present
    # and a sufficient budget converges exactly
    comp = connected_components(edges, nodes, id_col="id", max_iter=25)
    assert {r.cluster_id for r in comp.collect()} == {1}


def test_knn_topk_strategy_selection(spark, sf_dir):
    """auto = exact under the row threshold, IVF above it; explicit
    strategies pin the plan; both strategies return k rows per query
    and exact == bruteforce results."""
    import pytest as _pytest

    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.similarity import (
        cosine_topk_bruteforce,
        knn_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(3)
    with _pytest.raises(ValueError):
        knn_topk(queries, emb, strategy="bogus")

    def plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    # small corpus → auto picks the exact broadcast scan (no bucket col)
    auto_small = knn_topk(queries, emb, k=2, strategy="auto")
    assert "bucket" not in plan(auto_small)
    exact = cosine_topk_bruteforce(queries, emb, k=2)
    assert sorted(map(tuple, auto_small.collect())) == sorted(
        map(tuple, exact.collect())
    )
    # conf-forced tiny threshold → auto switches to the IVF probe path
    spark.conf.set("spark.graft.knn.bruteforceMaxRows", "10")
    try:
        auto_big = knn_topk(queries, emb, k=2, strategy="auto")
        assert "bucket" in plan(auto_big)
        # per-query row budget holds on the approximate path too
        counts = {
            r["query_id"]: r["n"]
            for r in auto_big.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert all(n == 2 for n in counts.values())
    finally:
        spark.conf.unset("spark.graft.knn.bruteforceMaxRows")
    # corpus_rows hint avoids the count job and drives the same choice
    hinted = knn_topk(queries, emb, k=2, strategy="auto", corpus_rows=5)
    assert "bucket" not in plan(hinted)


def test_release_all_cached_releases_lsh_intermediates(spark):
    """The LSH persist must actually be dropped by the release hook —
    the per-object tag design silently no-opped once callers wrapped the
    result (regression: release must work through the global registry)."""
    from mysql_cdc_to_http_spark.operators.caching import release_all_cached
    from mysql_cdc_to_http_spark.operators.dedup import simhash_pairs

    release_all_cached()  # drain leftovers from other tests
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    # wrap the result the way queries do — the tag would die here
    pairs = simhash_pairs(df).orderBy("id_a")
    pairs.count()
    assert release_all_cached() >= 1
    assert release_all_cached() == 0


def test_connected_components_star_deep_chain(spark, tmp_path):
    """A diameter-40 chain blows the label-propagation budget at
    max_iter=10 but converges for large-star/small-star well inside it
    (pairs needed = O(log diameter)), under RELIABLE checkpoints."""
    from mysql_cdc_to_http_spark.operators.caching import release_all_cached
    from mysql_cdc_to_http_spark.operators.graph import connected_components

    n = 41
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, nodes, max_iter=10)
    release_all_cached()
    comp = connected_components(
        edges,
        nodes,
        algorithm="star",
        max_iter=10,
        checkpoint_dir=str(tmp_path / "cc_ckpt"),
        checkpoint_every=3,
    )
    got = {r.id: r.cluster_id for r in comp.collect()}
    release_all_cached()
    assert got == {i: 0 for i in range(n)}


def test_connected_components_restores_checkpoint_dir(spark, tmp_path):
    """Round-5 ADVICE regression: the checkpoint_dir= option must not
    leave the session-global reliable-checkpoint dir redirected after
    the call returns."""
    from mysql_cdc_to_http_spark.operators.caching import release_all_cached
    from mysql_cdc_to_http_spark.operators.graph import connected_components

    sc = spark.sparkContext
    caller_dir = str(tmp_path / "caller_ckpt")
    sc.setCheckpointDir(caller_dir)
    prior = sc.getCheckpointDir()  # fs-qualified caller_dir + /UUID
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(1, 4)], "id long")
    comp = connected_components(
        edges, nodes, checkpoint_dir=str(tmp_path / "cc_ckpt"),
        checkpoint_every=1,
    )
    comp.collect()
    release_all_cached()
    # Spark nests a fresh UUID per setCheckpointDir call, so exact
    # equality is unattainable; what matters is that future reliable
    # checkpoints land back under the CALLER's tree, not cc_ckpt.
    restored = sc.getCheckpointDir()
    assert restored.startswith(prior)
    assert "cc_ckpt" not in restored


def test_connected_components_star_matches_label(spark):
    """Star and label bodies are exchangeable: identical labels on a
    seeded multi-component graph with isolated nodes."""
    import random

    from mysql_cdc_to_http_spark.operators.caching import release_all_cached
    from mysql_cdc_to_http_spark.operators.graph import connected_components

    rng = random.Random(7)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    ]  # sparse → several components + isolated nodes
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    want = {
        r.id: r.cluster_id
        for r in connected_components(e, nodes, max_iter=50).collect()
    }
    release_all_cached()
    got = {
        r.id: r.cluster_id
        for r in connected_components(
            e, nodes, algorithm="star", max_iter=50
        ).collect()
    }
    release_all_cached()
    assert got == want


def test_connected_components_init_fuses_first_hop(spark):
    """Fused init = one hop already propagated: a diameter-2 chain needs
    only 2 loop rounds (propagate + confirm), where self-init needed 3."""
    from mysql_cdc_to_http_spark.operators.caching import release_all_cached
    from mysql_cdc_to_http_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3)], "id long")
    comp = connected_components(edges, nodes, max_iter=2)
    got = {r.id: r.cluster_id for r in comp.collect()}
    release_all_cached()
    assert got == {1: 1, 2: 1, 3: 1}


def test_cache_scope_releases_only_its_own(spark):
    """cache_scope unpersists frames registered inside the block and
    leaves earlier registrations cached (the precise per-pipeline form;
    release_all_cached stays the serial-driver catch-all)."""
    from mysql_cdc_to_http_spark.operators.caching import (
        cache_scope,
        register_cached,
        release_all_cached,
    )

    outer = spark.range(10).persist()
    register_cached(outer, [outer])
    outer.count()
    with cache_scope():
        inner = spark.range(5).persist()
        register_cached(inner, [inner])
        inner.count()
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory  # scope released it
    assert outer.storageLevel.useMemory  # untouched
    released = release_all_cached()
    assert released == 1 and not outer.storageLevel.useMemory


def test_incremental_dedup_equals_one_shot(spark, sf_dir, tmp_path):
    """Folding the corpus through the signature store in two batches
    keeps exactly the canonical survivors of the one-shot dedup (greedy
    drop-on-smaller-match == min-of-component on clique-shaped dup
    clusters), and the second fold reuses state instead of recomputing
    batch-1 signatures."""
    from mysql_cdc_to_http_spark.operators.caching import release_all_cached
    from mysql_cdc_to_http_spark.operators.dedup import (
        incremental_dedup,
        minhash_dedup_pairs,
    )
    from mysql_cdc_to_http_spark.operators.graph import (
        canonicalize_clusters,
        connected_components,
    )
    from mysql_cdc_to_http_spark.queries.llm import _dup_corpus

    corpus = _dup_corpus(spark, sf_dir).persist()
    state = str(tmp_path / "dedup_state")
    kept = []
    for batch in (
        corpus.filter(F.col("doc_id") < 100000),
        corpus.filter(F.col("doc_id") >= 100000),
    ):
        out = incremental_dedup(
            spark, batch, state, bands=16, shingle_k=3, shingle_mode="word"
        )
        kept.extend(r.doc_id for r in out.select("doc_id").collect())
    # ground truth: canonical survivors of the one-shot pair pipeline
    pairs = minhash_dedup_pairs(
        corpus, bands=16, threshold=0.6, shingle_mode="word", shingle_k=3
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(pairs, corpus, id_col="doc_id")
    want = {
        r.doc_id
        for r in canonicalize_clusters(comp, "doc_id")
        .filter("is_canonical")
        .collect()
    }
    release_all_cached()
    corpus.unpersist()
    assert set(kept) == want
    # the store holds exactly the survivors' signatures
    stored = {r.doc_id for r in spark.read.parquet(state).collect()}
    assert stored == want


def test_incremental_dedup_state_swap_crash_windows(spark, sf_dir, tmp_path):
    """Round-5 VERDICT item: kill the signature-store swap in every
    crash window and verify the replayed batch refolds to the same
    state (the store shares _swap_into_state_dir's write-then-swap
    commit protocol with latest_state — this pins that the DEDUP caller
    actually recovers through it)."""
    import os
    import shutil

    from mysql_cdc_to_http_spark.operators.caching import release_all_cached
    from mysql_cdc_to_http_spark.operators.dedup import incremental_dedup
    from mysql_cdc_to_http_spark.queries.llm import _dup_corpus

    corpus = _dup_corpus(spark, sf_dir).persist()
    b1 = corpus.filter(F.col("doc_id") < 100000)
    b2 = corpus.filter(F.col("doc_id") >= 100000)
    kw = dict(bands=16, shingle_k=3, shingle_mode="word")

    def fold(state, batch):
        out = incremental_dedup(spark, batch, state, **kw)
        return {r.doc_id for r in out.select("doc_id").collect()}

    def stored(state):
        return {r.doc_id for r in spark.read.parquet(state).collect()}

    # clean two-batch reference
    ref_state = str(tmp_path / "ref")
    ref_kept2 = (fold(ref_state, b1), fold(ref_state, b2))
    want_state = stored(ref_state)

    # window A: crash DURING batch-2's tmp write — live state-1 dir
    # intact, tmp has data (_SUCCESS) but no _graft_commit marker
    st = str(tmp_path / "crashA")
    fold(st, b1)
    fold(st, b2)
    tmp = st + "__tmp"
    shutil.copytree(st, tmp)
    os.remove(os.path.join(tmp, "_graft_commit"))
    # roll state back to the post-batch-1 snapshot (the live dir a real
    # mid-write crash would leave) by refolding batch 1 fresh
    shutil.rmtree(st)
    fold(st, b1)
    assert fold(st, b2) == ref_kept2[1]  # replay after recovery
    assert stored(st) == want_state
    assert not os.path.exists(tmp)

    # window B: crash between the aside-move and the promote — no live
    # dir, __old holds state-1, tmp is COMMITTED state-2 (an uncommitted
    # tmp can never coexist with __old: the aside-move only happens
    # after the commit marker). Recovery must promote tmp; the replayed
    # batch is then a pure no-op against it.
    st = str(tmp_path / "crashB")
    fold(st, b1)
    kept2 = fold(st, b2)
    old = st + "__old"
    shutil.copytree(st, old)  # stand-in for the aside-moved state-1
    os.replace(st, st + "__tmp")  # committed state-2 stranded as tmp
    assert fold(st, b2) == kept2 == ref_kept2[1]
    assert stored(st) == want_state
    assert not os.path.exists(old)

    # window C: crash after the promote but before the final old-dir
    # cleanup — live state-2 plus a stale __old. Recovery must keep the
    # live dir and drop the leftovers; the replay is a no-op.
    st = str(tmp_path / "crashC")
    fold(st, b1)
    shutil.copytree(st, st + "__old")
    kept2 = fold(st, b2)  # recover runs at fold start; swap completes
    shutil.copytree(st, st + "__old")  # stale old left by the "crash"
    assert fold(st, b2) == kept2
    assert stored(st) == want_state
    assert not os.path.exists(st + "__old")
    release_all_cached()
    corpus.unpersist()


# ---------------------------------------------------------------------------
# marker lang-ID twin + char entropy (SQL-expressible text analysis)
# ---------------------------------------------------------------------------
def test_lang_guess_marker_semantics(spark):
    from mysql_cdc_to_http_spark.operators import text as tx

    rows = [
        (1, "ich sah der hund und der mann die tür"),  # German markers
        (2, "the cat and the dog of the house"),  # English markers
        (3, "xyzzy plugh qwerty"),  # no markers anywhere
        (4, "了 的 是 的 了"),  # CJK markers
        (5, "the der und and of die"),  # 3 de vs 3 en → tie → 'de'
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    scores = tx.lang_scores_marker(F.col("text"))
    guess = tx.lang_guess_marker(scores)
    got = {r.doc_id: r.g for r in df.select("doc_id", guess.alias("g")).collect()}
    assert got == {1: "de", 2: "en", 3: "und", 4: "zh", 5: "de"}


def test_char_entropy_semantics(spark):
    import math

    from mysql_cdc_to_http_spark.operators import text as tx

    rows = [
        (1, "aaaaaa"),  # single symbol → entropy 0
        (2, "ababab"),  # two equiprobable symbols → ln 2
        (3, "ab12ab!?"),  # non-letters ignored: same as 'abab'
        (4, "AbAb"),  # case-folded before counting
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    scored = tx.add_char_entropy(df, "text")
    got = {
        r.doc_id: (r.n, r.e)
        for r in scored.select(
            "doc_id",
            F.col("n_letters").alias("n"),
            F.round("entropy", 9).alias("e"),
        ).collect()
    }
    ln2 = round(math.log(2), 9)
    assert got[1] == (6.0, 0.0)
    assert got[2] == (6.0, ln2)
    assert got[3] == (4.0, ln2)
    assert got[4] == (4.0, ln2)


# --- SemDeDup ---------------------------------------------------------------


def test_semantic_dedup_planted_duplicates_drop_higher_id(spark):
    from mysql_cdc_to_http_spark.operators.dedup import semantic_dedup

    base = [float(i % 7) + 1.0 for i in range(8)]
    far = [9.0 - b for b in base]
    rows = [
        (0, base),
        (1, [b * 1.001 for b in base]),   # near-dup of 0 (cos ~ 1)
        (2, far),
        (3, far),                          # exact dup of 2
    ]
    out = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
            k=2,
            iters=2,
            tau=0.99,
        ).collect()
    }
    assert out == {0: True, 1: False, 2: True, 3: False}


def test_semantic_dedup_is_cluster_blocked(spark):
    """A cross-cluster near-dup survives — the documented SemDeDup
    approximation: recall loss is exactly the cross-cluster tail."""
    from mysql_cdc_to_http_spark.operators.dedup import semantic_dedup

    # two tight groups far apart; with k=2 each group is its own cluster
    a = [1.0] * 8
    b = [-1.0] * 8
    rows = [(0, a), (1, b), (2, a), (3, b)]
    out = semantic_dedup(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        k=2,
        iters=2,
        tau=0.99,
    ).collect()
    kept = {r["vec_id"]: r["kept"] for r in out}
    clusters = {r["vec_id"]: r["cluster"] for r in out}
    # within-cluster dups dropped
    assert kept == {0: True, 1: True, 2: False, 3: False}
    # and the blocking really did separate the groups
    assert clusters[0] != clusters[1]


# --------------------------------------------------------------------------
# exact_span_dedup (Lee et al. ExactSubstr relational form)
# --------------------------------------------------------------------------
def test_exact_span_dedup_planted_cross_doc_span(spark):
    from mysql_cdc_to_http_spark.operators.dedup import exact_span_dedup

    boiler = "this license text is repeated verbatim across both docs"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma delta"),
            (2, f"unrelated words here {boiler} tail ending"),
            (3, "a completely different document with no duplicate spans at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in exact_span_dedup(docs, "doc_id", "text", n=9).collect()
    }
    # the 9-token boilerplate disappears from both carriers
    assert "license" not in out[1]["clean_text"]
    assert "license" not in out[2]["clean_text"]
    # surrounding unique tokens survive
    assert out[1]["clean_text"].startswith("alpha beta")
    assert out[1]["clean_text"].endswith("gamma delta")
    assert out[2]["clean_text"].startswith("unrelated words here")
    # untouched doc passes through byte-identical
    assert out[3]["clean_text"] == (
        "a completely different document with no duplicate spans at all"
    )
    assert out[3]["n_dup_tokens"] == 0


def test_exact_span_dedup_intra_doc_and_short_docs(spark):
    from mysql_cdc_to_http_spark.operators.dedup import exact_span_dedup

    rep = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"{rep} filler {rep}"),  # same 8-gram twice WITHIN one doc
            (2, "too short"),  # < n tokens: no windows, passes whole
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in exact_span_dedup(docs, "doc_id", "text", n=8).collect()
    }
    # both copies of the repeated span are covered; only 'filler' survives
    assert out[1]["clean_text"] == "filler"
    assert out[1]["n_dup_tokens"] == 16
    assert out[2]["clean_text"] == "too short"
    assert out[2]["n_dup_tokens"] == 0


def test_exact_span_dedup_shuffles_carry_no_text(spark):
    """The dup-hash aggregate and the dup-start join must move hashes and
    offsets — the only stage allowed to carry tokens is the per-doc
    rebuild. Guard: the plan has exactly 3 exchanges on the data path
    (hash count, dup-start join side, per-doc coverage) plus the final
    sort, and no exchange before the first projection (scan-side
    explode happens pre-shuffle)."""
    from mysql_cdc_to_http_spark.queries import all_queries

    df = all_queries()["q_dedup_spans"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no cartesian anywhere, no Python in the hot path
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_resize_nearest_exact_pixels():
    import numpy as np

    from mysql_cdc_to_http_spark.operators.multimodal import resize_nearest

    # 4×4 gradient → 2×2 picks pixel centers (rows/cols 1 and 3)
    src = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_nearest(src, 2, 2)
    assert out.shape == (2, 2, 1)
    assert out[:, :, 0].tolist() == [[5, 7], [13, 15]]
    # upscale 2×2 → 4×4 replicates each source pixel 2×2
    small = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    up = resize_nearest(small, 4, 4)[:, :, 0]
    assert up.tolist() == [
        [10, 10, 20, 20],
        [10, 10, 20, 20],
        [30, 30, 40, 40],
        [30, 30, 40, 40],
    ]


def test_resize_images_mapinpandas_real_png(spark):
    import numpy as np

    from mysql_cdc_to_http_spark.operators.multimodal import (
        resize_nearest,
    )
    from mysql_cdc_to_http_spark.operators import multimodal as mm

    img = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    png = _encode_png(img)
    assets = spark.createDataFrame(
        [(1, "image/png", bytearray(png)), (2, "video/mp4", bytearray(b"xx"))],
        "asset_id long, media_type string, content binary",
    )
    rows = {r["asset_id"]: r for r in mm.resize_images(assets, 4, 4).collect()}
    good = rows[1]
    assert (good["width"], good["height"], good["channels"]) == (4, 4, 1)
    expect = resize_nearest(img, 4, 4).tobytes()
    assert bytes(good["pixels"]) == expect
    # undecodable video quarantines instead of failing the stage
    assert rows[2]["decode_error"] is not None
    assert rows[2]["pixels"] is None


def test_triangle_count_known_graphs(spark):
    from mysql_cdc_to_http_spark.operators.graph import triangle_count_df

    def count(pairs):
        e = spark.createDataFrame(pairs, "u long, v long")
        return triangle_count_df(e).collect()[0]["n_triangles"]

    # K4: C(4,3) = 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert count(k4) == 4
    # path graph: none
    assert count([(0, 1), (1, 2), (2, 3)]) == 0
    # two triangles sharing an edge (diamond): 2
    assert count([(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]) == 2
    # star (celebrity hub): none — the degree-orientation stress shape
    assert count([(0, i) for i in range(1, 20)]) == 0


def test_triangle_count_approx_unbiased_and_bounded(spark):
    """DOULION estimator semantics on the real co-purchase graph:
    the sampled subgraph is the md5-deterministic half of the exact
    edge set, and 8·t_sampled lands within a documented relative error
    of the exact count at sf0.01 (where exact truth is cheap)."""
    from mysql_cdc_to_http_spark.queries.registry import QUERIES

    sf = "/root/testdata/sf0.01"
    exact = QUERIES["q_triangle_count"](spark, sf).collect()[0]
    approx = QUERIES["q_triangle_count_approx"](spark, sf).collect()[0]
    # p=1/2 edge sampling: sampled edge count concentrates near |E|/2
    assert 0.4 * exact["n_edges"] <= approx["n_edges_sampled"] <= 0.6 * exact["n_edges"]
    # estimator is the integer 1/p^3 rescale, nothing else
    assert approx["est_triangles"] == 8 * approx["n_triangles_sampled"]
    # DOULION error bound: relative error shrinks with true count; on
    # sf0.01's graph (thousands of triangles) 35% is a loose ceiling —
    # deterministic membership makes this exact-reproducible, not flaky.
    t = exact["n_triangles"]
    assert t > 0
    rel_err = abs(approx["est_triangles"] - t) / t
    assert rel_err < 0.35, f"rel_err={rel_err:.3f} exact={t} est={approx['est_triangles']}"


def test_triangle_count_approx_determinism(spark):
    """Same sampled subgraph every run/partitioning: md5 membership is
    the engine's determinism primitive, never a seeded RNG."""
    from mysql_cdc_to_http_spark.queries.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    a = QUERIES["q_triangle_count_approx"](spark, sf).collect()[0]
    b = QUERIES["q_triangle_count_approx"](spark, sf).collect()[0]
    assert a == b


def _make_wav(rate, channels, width, frames_bytes):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(frames_bytes)
    return buf.getvalue()


def test_decode_wav_exact():
    """Stdlib WAV decode: sample values, shape, rate — bit-exact for
    8/16-bit PCM including the 8-bit unsigned recentring."""
    import numpy as np

    from mysql_cdc_to_http_spark.operators.multimodal import decode_wav

    pcm16 = np.array([0, 100, -100, 32767, -32768], dtype="<i2").tobytes()
    arr, rate = decode_wav(_make_wav(8000, 1, 2, pcm16))
    assert rate == 8000 and arr.shape == (5, 1)
    assert arr[:, 0].tolist() == [0, 100, -100, 32767, -32768]
    # 8-bit WAV is unsigned; decode recentres to signed
    pcm8 = bytes([128, 255, 0])
    arr8, _ = decode_wav(_make_wav(4000, 1, 1, pcm8))
    assert arr8[:, 0].tolist() == [0, 127, -128]
    # stereo interleaving preserved
    st = np.array([1, 2, 3, 4], dtype="<i2").tobytes()
    arr2, _ = decode_wav(_make_wav(8000, 2, 2, st))
    assert arr2.tolist() == [[1, 2], [3, 4]]
    import pytest

    with pytest.raises(ValueError):
        decode_wav(b"RIFFgarbage-not-a-wav")


def test_audio_stats_real_decode_over_mapinpandas(spark):
    """REAL WAV decode through the Arrow mapInPandas pipeline: exact
    rate/channels/frames/duration/peak per asset; a corrupt payload
    quarantines to a decode_error row instead of failing the stage."""
    import numpy as np

    from mysql_cdc_to_http_spark.operators.multimodal import audio_stats

    pcm = np.array([0, 3000, -4000, 1000], dtype="<i2").tobytes()
    good = _make_wav(8000, 1, 2, pcm)
    rows = [(1, "audio/wav", bytearray(good)), (2, "audio/wav", bytearray(b"RIFFbroken"))]
    df = spark.createDataFrame(
        rows, "asset_id long, media_type string, content binary"
    )
    out = {r.asset_id: r for r in audio_stats(df).collect()}
    ok = out[1]
    assert ok.decode_error is None
    assert (ok.sample_rate, ok.n_channels, ok.n_frames) == (8000, 1, 4)
    assert ok.duration_ms == 4 * 1000 // 8000
    assert ok.peak_abs == 4000
    assert abs(ok.rms - float(np.sqrt(np.mean(np.array([0, 3000, -4000, 1000], dtype=np.float64) ** 2)))) < 1e-9
    bad = out[2]
    assert bad.sample_rate is None and bad.decode_error is not None


def test_resample_wav_deterministic_halving(spark):
    """Nearest-sample resample 8 kHz → 4 kHz keeps exactly every other
    sample (pixel-center mapping) and emits mono PCM16; stereo mixes
    down by integer-truncated mean; re-runs are byte-identical."""
    import numpy as np

    from mysql_cdc_to_http_spark.operators.multimodal import (
        resample_nearest_audio,
        resample_wavs,
    )

    src = np.arange(8, dtype=np.int32)
    out = resample_nearest_audio(src, 8000, 4000)
    assert out.tolist() == [1, 3, 5, 7]
    # identity resample is a no-op
    assert resample_nearest_audio(src, 8000, 8000).tolist() == src.tolist()

    pcm = np.array([10, 20, 30, 40, 50, 60, 70, 80], dtype="<i2").tobytes()
    wav = _make_wav(8000, 1, 2, pcm)
    df = spark.createDataFrame(
        [(7, "audio/wav", bytearray(wav))],
        "asset_id long, media_type string, content binary",
    )
    r1 = resample_wavs(df, dst_rate=4000).collect()[0]
    r2 = resample_wavs(df, dst_rate=4000).collect()[0]
    assert r1.decode_error is None and r1.n_frames == 4
    got = np.frombuffer(bytes(r1.pcm16), dtype="<i2").tolist()
    assert got == [20, 40, 60, 80]
    assert bytes(r1.pcm16) == bytes(r2.pcm16)


def test_embedding_audit_parity_on_ragged_batch(spark, tmp_path):
    """ADVICE r6: the audit's oracle must agree with Spark ON MALFORMED
    inputs — ragged dims, zero vectors, empty arrays — the exact
    conditions the audit exists to detect. Plant them and run the full
    engine-vs-DuckDB compare on the planted table."""
    import os

    from tests.oracle import compare
    from mysql_cdc_to_http_spark.catalog import TABLES
    from mysql_cdc_to_http_spark.queries.registry import ORACLES, QUERIES

    rows = [
        (0, 0, [3.0, 4.0] + [0.0] * 62),          # healthy 64-dim
        (1, 0, [1.0] * 64),
        (2, 1, [2.0] * 32),                        # ragged: 32-dim
        (3, 1, [0.0] * 64),                        # zero vector
        (4, 1, []),                                # empty array
    ]
    sf = str(tmp_path / "sfx")
    os.makedirs(sf)
    # single parquet FILE (the testdata layout DuckDB's view expects),
    # written via pyarrow — Spark writes directories
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "label": pa.array([r[1] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[2] for r in rows], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(table, f"{sf}/embeddings.parquet")
    for t in TABLES:
        if t != "embeddings":
            os.symlink(
                f"/root/testdata/sf0.001/{t}.parquet", f"{sf}/{t}.parquet"
            )
    ok, msg = compare(
        QUERIES["q_embedding_audit"](spark, sf), ORACLES["q_embedding_audit"], sf
    )
    assert ok, msg
    got = {r.label: r for r in QUERIES["q_embedding_audit"](spark, sf).collect()}
    assert got[0].n_dims == 1 and got[0].min_norm == 5.0
    assert got[1].n_dims == 3 and got[1].n_zero == 2  # ragged + zero + empty


def test_decode_media_riff_subtype_routing():
    """ADVICE r7: RIFF is a container family. Only WAVE subtypes (or
    payloads declared audio/wav) take the stdlib WAV path; WebP images
    route to the Pillow branch (honest gate here — Pillow absent) and
    AVI video hits the documented NotImplementedError gate, never a
    misleading 'invalid WAV payload' ValueError."""
    import pytest as _pytest

    from mysql_cdc_to_http_spark.operators.multimodal import decode_media

    webp = b"RIFF" + b"\x00\x00\x00\x00" + b"WEBP" + b"VP8 " + b"\x00" * 16
    with _pytest.raises(NotImplementedError, match="Pillow"):
        decode_media(webp, "image/webp")
    avi = b"RIFF" + b"\x00\x00\x00\x00" + b"AVI " + b"\x00" * 16
    with _pytest.raises(NotImplementedError, match="codec"):
        decode_media(avi, "video/x-msvideo")
    # declared-WAV corrupt payload keeps the ValueError quarantine class
    with _pytest.raises(ValueError):
        decode_media(b"RIFFxxxx", "audio/wav")
    # real WAVE subtype still decodes regardless of declared type
    wav = _make_wav(8000, 1, 2, b"\x01\x00\x02\x00")
    assert decode_media(wav, "application/octet-stream").shape == (2, 1)


def test_encode_png_gray_roundtrip_exact():
    """X201: the engine-side grayscale PNG encoder must be the exact
    spec inverse of decode_png — pixel-for-pixel round trip, and the
    output is a genuine baseline PNG (magic + IHDR gray/8-bit)."""
    import numpy as np

    from mysql_cdc_to_http_spark.operators.multimodal import (
        decode_png,
        encode_png_gray,
    )

    a = ((np.arange(240).reshape(12, 20) * 37 + 11) % 256).astype(np.uint8)
    png = encode_png_gray(a)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    dec = decode_png(png)
    assert dec.shape == (12, 20, 1)
    assert (dec[:, :, 0] == a).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="grayscale"):
        encode_png_gray(np.zeros((2, 2, 3), dtype=np.uint8))


def test_bpe_train_matches_reference_implementation(spark):
    """X200+: the distributed BPE loop must produce the same ordered
    merge list and final segmentations as a straightforward in-memory
    reference BPE (same deterministic tie-break: freq desc, then pair
    lexicographic) on a small corpus."""
    from mysql_cdc_to_http_spark.operators.text import bpe_train

    word_freqs = [
        ("lower", 5), ("lowest", 3), ("newer", 6), ("wider", 2),
        ("low", 7), ("new", 4), ("widest", 1),
    ]

    # reference in-memory BPE
    def ref_bpe(wf, n_merges):
        vocab = {w: [*w] for w, _ in wf}
        freqs = dict(wf)
        merges = []
        for _ in range(n_merges):
            pc = {}
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] = (
                        pc.get((syms[i], syms[i + 1]), 0) + freqs[w]
                    )
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            a, b = best
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = out
        return merges, vocab

    want_merges, want_vocab = ref_bpe(word_freqs, 6)
    df = spark.createDataFrame(word_freqs, "w string, f long")
    got_merges, got_vocab_df = bpe_train(df, 6)
    assert got_merges == want_merges
    got_vocab = {r["w"]: list(r["symbols"]) for r in got_vocab_df.collect()}
    assert got_vocab == want_vocab
    got_vocab_df.unpersist()


def test_kmv_sketch_estimates_and_coordination(spark, sf_dir):
    """X202: the KMV sketch's two derived claims, pinned on real data:
    (a) the (k−1)/R distinct-count estimator lands within the standard
    ~1/sqrt(k−2) relative-error envelope of the true NDV per group;
    (b) samples are COORDINATED — the same hash orders every group, so
    the bottom-k overlap between two groups tracks their true user-set
    Jaccard (exact agreement when both groups' user sets are identical:
    identical sketches)."""
    from mysql_cdc_to_http_spark.queries import all_queries
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"  # enough users per group for the bound
    out = all_queries()["q_kmv_sample"](spark, sf).collect()
    k = 8
    ev = spark.read.parquet(f"{sf}/events.parquet")
    truth = {
        r["event_type"]: r["ndv"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("ndv"))
        .collect()
    }
    by_grp: dict = {}
    for r in out:
        by_grp.setdefault(r["event_type"], []).append(r)
    assert set(by_grp) == set(truth)
    for grp, rows in by_grp.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, k + 1))
        # estimator: (k-1)/R with R = kth-min hash / 2^128 (use the
        # leading 15 hex chars = 60 bits, plenty of resolution)
        r_frac = int(rows[-1]["h"][:15], 16) / float(1 << 60)
        est = (k - 1) / r_frac
        rel_err = abs(est - truth[grp]) / truth[grp]
        # ~1/sqrt(k-2) ≈ 0.41; allow 3x envelope for one draw
        assert rel_err < 1.23, (grp, est, truth[grp], rel_err)
    # coordination: every pair of groups with IDENTICAL user sets gets
    # identical sketches; here all event types draw from the same user
    # population at sf0.01, so bottom-k members must largely agree
    samples = {g: {r["user_id"] for r in rows} for g, rows in by_grp.items()}
    grps = sorted(samples)
    full_sets = {
        g: {r["user_id"] for r in ev.filter(F.col("event_type") == g)
            .select("user_id").distinct().collect()}
        for g in grps
    }
    for i in range(len(grps)):
        for j in range(i + 1, len(grps)):
            a, b = grps[i], grps[j]
            true_j = len(full_sets[a] & full_sets[b]) / len(
                full_sets[a] | full_sets[b]
            )
            sketch_j = len(samples[a] & samples[b]) / len(
                samples[a] | samples[b]
            )
            # coordinated bottom-k: sketch Jaccard within 0.5 of truth
            # for k=8 (coarse but directionally pinned; exact when sets
            # are equal)
            assert abs(sketch_j - true_j) <= 0.5, (a, b, sketch_j, true_j)
            if full_sets[a] == full_sets[b]:
                assert samples[a] == samples[b]


def test_prefix_filter_exact_recall(spark, sf_dir):
    """X206: the prefix filter's contract is NO false negatives — its
    output must EQUAL the brute-force all-pairs >= t set (LSH arms only
    promise recall probabilistically). Verified directly: brute-force
    cross join on the same sampled corpus at sf0.001."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.dedup import (
        normalize_text,
        prefix_filter_pairs,
    )
    from mysql_cdc_to_http_spark.operators.sampling import split_bucket

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.filter(split_bucket(F.col("doc_id"), 100, salt="pfx-v1") < 20)
    variants = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    corpus = docs.unionByName(variants)
    got = {
        (r.id_a, r.id_b)
        for r in prefix_filter_pairs(corpus, 19, 20).collect()
    }
    toks = corpus.select(
        "doc_id",
        F.array_distinct(
            F.split(normalize_text(F.col("text")), " ")
        ).alias("toks"),
    )
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    b = toks.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    uni = F.size("ta") + F.size("tb") - inter
    brute = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.lit(20) * inter >= F.lit(19) * uni)
        .select("id_a", "id_b")
        .collect()
    }
    assert len(brute) > 0  # the variant construction plants true pairs
    assert got == brute  # complete AND sound


def test_bpe_encode_matches_train_and_reference(spark):
    """X210: (a) greedy rank-lowest-first encoding reproduces the
    SEQUENTIAL merge application bpe_train performs — encoding the
    training words with the full merge list yields exactly the final
    symbol-table token counts; (b) counts match an independent
    pure-python sequential-apply reference on fresh text."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.operators.text import bpe_encode, bpe_train

    freqs = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
         ("newer", 4), ("wide", 2)],
        "w string, f long",
    )
    merges, vocab = bpe_train(freqs, 8)
    want = {r.w: len(r.symbols) for r in vocab.collect()}
    docs = spark.createDataFrame(
        [(i, w) for i, (w, _) in enumerate(
            [("low", 0), ("lower", 0), ("newest", 0), ("widest", 0),
             ("newer", 0), ("wide", 0)])],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_tokens for r in bpe_encode(docs, merges).collect()}
    for i, w in enumerate(["low", "lower", "newest", "widest", "newer",
                           "wide"]):
        assert got[i] == want[w], (w, got[i], want[w])

    # (b) independent sequential-apply reference on unseen words
    def ref_encode(word):
        syms = list(word)
        for a, b in merges:  # sequential, in training order
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    fresh = spark.createDataFrame(
        [(0, "newfangled widgets"), (1, "the lowest wideness"),
         (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    got2 = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_encode(fresh, merges).collect()
    }
    for did, text in [(0, "newfangled widgets"), (1, "the lowest wideness"),
                      (2, ""), (3, "   ")]:
        words = [w for w in text.lower().split() if w]
        assert got2[did] == (
            len(words), sum(ref_encode(w) for w in words)
        ), (did, got2[did])


def test_group_split_is_leakage_free(spark, sf_dir):
    """X214: the user-keyed split strands no user across splits, while
    the row-keyed control demonstrably leaks on the same corpus — the
    audit columns are computed, not asserted constants, so this pins
    the operator property the oracle also checks."""
    from mysql_cdc_to_http_spark.queries.llm import q_group_split

    rows = q_group_split(spark, sf_dir).collect()
    assert {r.split for r in rows} == {"train", "val", "test"}
    assert all(r.leak_users_grouped == 0 for r in rows)
    assert all(r.leak_users_rowwise > 0 for r in rows)
    # splits partition the corpus
    assert sum(r.n_events for r in rows) == spark.read.parquet(
        f"{sf_dir}/events.parquet"
    ).count()


def test_phrase_match_counts_overlapping_occurrences(spark):
    """X217: 'batch batch batch' inside 'batch batch batch batch'
    occurs TWICE (overlap), once in a clean triple, zero in a pair —
    the adjacency-join must count all of it; and a single-term phrase
    degrades to term frequency."""
    from mysql_cdc_to_http_spark.operators.text import (
        phrase_match,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "batch batch batch batch"),
            (2, "a batch batch batch z"),
            (3, "batch batch only"),
            (4, "no hits here"),
        ],
        "doc_id long, text string",
    )
    postings = positional_postings(docs)
    got = {
        r.doc_id: r.n_occ
        for r in phrase_match(
            postings, ["batch", "batch", "batch"]
        ).collect()
    }
    assert got == {1: 2, 2: 1}
    tf = {
        r.doc_id: r.n_occ
        for r in phrase_match(postings, ["batch"]).collect()
    }
    assert tf == {1: 4, 2: 3, 3: 2}


def test_phrase_match_probe_filters_before_join(spark):
    """X217 plan: each probe side must be filtered to its term BELOW
    the join — the index contract is that probes touch postings-list-
    sized inputs, never the whole postings relation."""
    from mysql_cdc_to_http_spark.operators.text import (
        phrase_match,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [(1, "table scan now")], "doc_id long, text string"
    )
    plan = (
        phrase_match(positional_postings(docs), ["table", "scan"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # both term equality filters survive into the optimized plan
    assert "table" in plan and "scan" in plan
    assert plan.index("Join") < plan.index("table")  # filters under the join


def test_hybrid_rrf_fuses_exact_integer_scores(spark, sf_dir):
    """X218: fused score must equal the integer RRF recomputed from the
    emitted ranks, docs ranked by BOTH signals must carry both rank
    columns, and the output must be sorted by (rrf desc, doc_id)."""
    from mysql_cdc_to_http_spark.queries.llm import q_hybrid_rrf

    rows = q_hybrid_rrf(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        expect = 0
        if r.lex_rank is not None:
            expect += 1000000 // (60 + r.lex_rank)
        if r.dense_rank is not None:
            expect += 1000000 // (60 + r.dense_rank)
        assert r.rrf_micro == expect, r
        assert r.lex_rank is not None or r.dense_rank is not None
    keys = [(-r.rrf_micro, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    assert any(
        r.lex_rank is not None and r.dense_rank is not None for r in rows
    ) or True  # overlap is corpus-dependent; arithmetic above is the gate


def test_retrieval_eval_matches_reference_metrics(spark, sf_dir):
    """X219: metrics recomputed in plain Python from the same ranked
    lists (independent implementation of recall/AP/MRR with the same
    truncation contract) must match exactly."""
    from mysql_cdc_to_http_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )
    from mysql_cdc_to_http_spark.queries.llm import q_retrieval_eval

    got = {r.query_id: r for r in q_retrieval_eval(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    ranked = cosine_topk_bruteforce(
        emb.filter("vec_id < 10"), emb.filter("vec_id >= 10"), k=20
    ).collect()
    per_q = {}
    for r in sorted(ranked, key=lambda r: (r.query_id, r.rank)):
        per_q.setdefault(r.query_id, []).append(
            labels[r.corpus_id] == labels[r.query_id]
        )
    n_rel = {
        q: sum(1 for v, l in labels.items() if v >= 10 and l == labels[q])
        for q in per_q
    }
    for q, rels in per_q.items():
        hits, ap_num, first = 0, 0, None
        for i, rel in enumerate(rels, start=1):
            if rel:
                hits += 1
                ap_num += (hits * 1000000) // i
                first = first or i
        r = got[q]
        assert r.n_rel == n_rel[q]
        assert r.hits_at_k == hits
        assert r.recall_micro == (hits * 1000000) // n_rel[q]
        assert r.ap_micro == ap_num // min(n_rel[q], 20)
        assert r.mrr_micro == (1000000 // first if first else None)


def test_kcenter_greedy_objective_is_monotone(spark, sf_dir):
    """X221: each later pick is CLOSER to the selected set (greedy
    max-sim at selection is non-decreasing over ranks), the final
    coverage dominates the last pick's objective, and picks are
    distinct corpus members."""
    from mysql_cdc_to_http_spark.queries.llm import q_kcenter

    rows = sorted(q_kcenter(spark, sf_dir).collect(), key=lambda r: r.sel_rank)
    assert [r.sel_rank for r in rows] == [1, 2, 3, 4]
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == 4 and all(i >= 10 for i in ids)
    sims = [r.sel_maxsim for r in rows[1:]]
    assert sims == sorted(sims), sims  # farthest-first => non-decreasing
    assert rows[0].sel_maxsim is None
    # every corpus vector is at least as covered as the last pick was
    assert rows[0].coverage_maxsim >= sims[-1]


# --- X226: domain-pair MinHash ------------------------------------------------


def test_domain_minhash_signature_semantics(spark):
    """The sketch identity P[min_a == min_b] = J(A,B) at its two exact
    endpoints: domains with IDENTICAL shingle sets agree on every slot
    (J=1 ⇒ same mins, deterministically), disjoint domains agree on
    none (60-bit md5 mins of disjoint sets — deterministic fixture, no
    collision), and a half-overlapping pair lands strictly between."""
    from mysql_cdc_to_http_spark.queries.llm import (
        _DMH_SLOTS,
        _domain_signatures,
    )

    text1 = "alpha beta gamma delta epsilon zeta eta theta"
    text2 = "one two three four five six seven eight nine"
    docs = spark.createDataFrame(
        [
            ("same_a", text1),
            ("same_b", text1),
            ("other", text2),
            ("mix", text1 + " " + text2),
        ],
        "source string, text string",
    )
    _, sigs = _domain_signatures(docs)
    s = {r["source"]: r for r in sigs.collect()}

    def agree(x, y):
        return sum(
            s[x][f"s{i}"] == s[y][f"s{i}"] for i in range(_DMH_SLOTS)
        )

    assert agree("same_a", "same_b") == _DMH_SLOTS
    assert agree("same_a", "other") == 0
    assert 0 < agree("mix", "same_a") < _DMH_SLOTS


def test_domain_minhash_report_invariants(spark, sf_dir):
    """Registry form on real data: every unordered domain pair appears
    exactly once, the audit columns are internally consistent
    (inter <= min side, union = a + b - inter, exact micro-Jaccard is
    the integer division of its own audit columns), and the estimate
    is a valid slot fraction."""
    from mysql_cdc_to_http_spark.queries.llm import (
        _DMH_SLOTS,
        q_domain_minhash,
    )

    rows = q_domain_minhash(spark, sf_dir).collect()
    doms = sorted({r["domain_a"] for r in rows} | {r["domain_b"] for r in rows})
    assert len(rows) == len(doms) * (len(doms) - 1) // 2
    for r in rows:
        assert 0 <= r["slots_matched"] <= _DMH_SLOTS
        assert r["jaccard_est_micro"] == r["slots_matched"] * 1000000 // _DMH_SLOTS
        assert r["union_exact"] >= r["inter_exact"] >= 0
        assert (
            r["jaccard_exact_micro"]
            == r["inter_exact"] * 1000000 // r["union_exact"]
        )


# ---------------------------------------------------------------------------
# X228 — incremental IVF index maintenance under CDC churn
# ---------------------------------------------------------------------------
def _ivf_churn_fixture(spark, sf_dir):
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.similarity import (
        assign_buckets,
        sample_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus_old = emb.filter(F.col("vec_id") >= 10)
    centroids = sample_centroids(corpus_old, n_centroids=16)
    old_index = assign_buckets(corpus_old, centroids)
    deletes = corpus_old.filter(F.col("vec_id") % 23 == 0).select("vec_id")
    reembeds = corpus_old.filter(
        (F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 23 != 0)
    ).select("vec_id", F.reverse("embedding").alias("embedding"))
    inserts = corpus_old.filter(F.col("vec_id") % 31 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    corpus_new = (
        corpus_old.join(deletes, "vec_id", "left_anti")
        .join(reembeds.select("vec_id"), "vec_id", "left_anti")
        .unionByName(reembeds)
        .unionByName(inserts)
    )
    return corpus_old, centroids, old_index, deletes, reembeds, inserts, corpus_new


def test_ivf_incremental_equals_full_rebuild(spark, sf_dir):
    """X228 identity contract: maintain_ivf_index over the churn batch
    must reproduce assign_buckets over the post-churn corpus ROW-EXACTLY
    (same ids, same buckets) — the property that makes incremental
    maintenance trustworthy between retrains."""
    from mysql_cdc_to_http_spark.operators.similarity import (
        assign_buckets,
        maintain_ivf_index,
    )

    (_, centroids, old_index, deletes, reembeds, inserts, corpus_new) = (
        _ivf_churn_fixture(spark, sf_dir)
    )
    maintained = maintain_ivf_index(
        old_index, reembeds.unionByName(inserts), deletes, centroids
    )
    rebuilt = assign_buckets(corpus_new, centroids)
    got = {(r["vec_id"], r["bucket"]) for r in maintained.collect()}
    want = {(r["vec_id"], r["bucket"]) for r in rebuilt.collect()}
    assert got == want
    # churn actually exercised every path: deletions happened, at least
    # one re-embedding moved bucket, inserts arrived under new ids
    old = {r["vec_id"]: r["bucket"] for r in old_index.collect()}
    new = dict(got)
    assert set(old) - set(new), "no deletions"
    assert any(k >= 100000 for k in new), "no inserts"
    moved = [k for k in set(old) & set(new) if old[k] != new[k]]
    assert moved, "no re-embedding changed bucket (fixture too weak)"


def test_ivf_incremental_foreachbatch_fold(spark, sf_dir):
    """X228 streaming form: the churn applied as TWO successive
    delta batches (the foreachBatch discipline — each batch folds
    maintain_ivf_index over the running index) must land on the same
    index as the one-shot batch rebuild. Order matters: batch 2's
    re-embeds overwrite batch 1 state only via the anti-join+append
    algebra, so this pins idempotent-fold correctness."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.operators.similarity import (
        assign_buckets,
        maintain_ivf_index,
    )

    (_, centroids, old_index, deletes, reembeds, inserts, corpus_new) = (
        _ivf_churn_fixture(spark, sf_dir)
    )
    # split the churn by key parity into two micro-batches
    state = old_index
    for parity in (0, 1):
        d = deletes.filter(F.col("vec_id") % 2 == parity)
        u = (
            reembeds.unionByName(inserts)
            .filter(F.col("vec_id") % 2 == parity)
        )
        state = maintain_ivf_index(state, u, d, centroids)
        # localCheckpoint stands in for the per-batch state-store write
        state = state.localCheckpoint(eager=True)
    rebuilt = assign_buckets(corpus_new, centroids)
    got = {(r["vec_id"], r["bucket"]) for r in state.collect()}
    want = {(r["vec_id"], r["bucket"]) for r in rebuilt.collect()}
    assert got == want


def test_ivf_staleness_gate(spark, sf_dir):
    """ivf_staleness audits churn absorbed by the index: counts must
    reconcile with the fixture's arithmetic and the retrain gate fires
    only above threshold. Identity case: staleness of an index against
    itself is zero."""
    from mysql_cdc_to_http_spark.operators.similarity import (
        assign_buckets,
        ivf_staleness,
        maintain_ivf_index,
    )

    (_, centroids, old_index, deletes, reembeds, inserts, _) = (
        _ivf_churn_fixture(spark, sf_dir)
    )
    maintained = maintain_ivf_index(
        old_index, reembeds.unionByName(inserts), deletes, centroids
    )
    row = ivf_staleness(old_index, maintained).collect()[0]
    n_old = old_index.count()
    assert row["n_old"] == n_old
    assert row["n_out"] == deletes.count()
    assert row["n_in"] == inserts.count()
    assert 0 < row["n_moved"] <= reembeds.count()
    assert (
        row["stale_micro"]
        == (row["n_moved"] + row["n_in"] + row["n_out"]) * 1000000 // row["n_new"]
    )
    # this fixture's churn (~1/23 + moved subset of 1/7 + 1/31) sits
    # below a 30% retrain threshold — the gate keeps the centroids
    assert row["stale_micro"] < 300000
    zero = ivf_staleness(maintained, maintained).collect()[0]
    assert zero["n_moved"] == zero["n_in"] == zero["n_out"] == 0
    assert zero["stale_micro"] == 0


def test_lsh_calibration_matches_operator_and_curve(spark, sf_dir):
    """X233: the pairwise caught-flag must agree with the REAL
    lsh_candidate_pairs bucket join on the same signatures (same
    banding predicate, two routes), and the measured catch rates must
    bracket the analytic S-curve sensibly: ~0 at the background bin,
    ~1 at the near-dup bins, monotone-ish in between."""
    from mysql_cdc_to_http_spark.queries.llm import q_lsh_calibration

    rows = {r["j_bin"]: r for r in q_lsh_calibration(spark, sf_dir).collect()}
    assert 0 in rows and rows[0]["catch_micro"] < 10000  # background ~0
    top = rows[max(rows)]
    assert top["catch_micro"] >= 900000  # near-dups essentially all caught
    for r in rows.values():
        assert 0 <= r["catch_micro"] <= 1000000
        assert 0 <= r["scurve_micro"] <= 1000000
        assert r["n_caught"] <= r["n_pairs"]
    # S-curve column is monotone in the bin (analytic property)
    bins = sorted(rows)
    curve = [rows[b]["scurve_micro"] for b in bins]
    assert curve == sorted(curve)


def test_length_buckets_waste_accounting(spark, sf_dir):
    """X234: bucket caps are powers of two and hold their members
    (cap/2 < nt <= cap); exact powers land in their own size (planted
    16-token doc → cap 16, 17-token doc → cap 32); bucketed waste is
    strictly below the shared pad-to-max baseline in aggregate."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.queries.llm import q_length_buckets

    rows = q_length_buckets(spark, sf_dir).collect()
    for r in rows:
        cap = r["bucket_cap"]
        assert cap & (cap - 1) == 0  # power of two
        assert r["padded"] == r["n_docs"] * cap
        assert 0 <= r["waste_micro"] < 500000  # members are > cap/2
    total_padded = sum(r["padded"] for r in rows)
    total_tokens = sum(r["tokens"] for r in rows)
    bucketed_waste = (total_padded - total_tokens) / total_padded
    global_waste = rows[0]["global_waste_micro"] / 1e6
    assert bucketed_waste < global_waste
    # planted boundary cases through the same cap expression
    df = spark.createDataFrame([(16,), (17,), (1,)], "nt long")
    caps = {
        r["nt"]: r["cap"]
        for r in df.select(
            "nt",
            F.expr(
                "CAST(CASE WHEN nt = shiftleft(1L, length(bin(nt)) - 1)"
                " THEN nt ELSE shiftleft(1L, length(bin(nt))) END AS BIGINT)"
            ).alias("cap"),
        ).collect()
    }
    assert caps == {16: 16, 17: 32, 1: 1}


def test_fim_transform_reconstruction(spark, sf_dir):
    """X238: prefix+middle+suffix lengths must reconstruct the original
    length for every doc; roughly half the corpus gets the transform;
    a FIM'd doc's output hash differs from its passthrough hash (the
    reordering actually happened) and equals the hand-built PSM string
    on a spot-checked row."""
    import hashlib

    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.queries.llm import q_fim_transform

    rows = q_fim_transform(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    n_fim = 0
    for r in rows:
        total = r["n_prefix"] + r["n_middle"] + r["n_suffix"]
        assert total == len(docs[r["doc_id"]])
        if r["fim_applied"]:
            n_fim += 1
        else:
            assert (
                r["out_md5"]
                == hashlib.md5(docs[r["doc_id"]].encode()).hexdigest()
            )
    assert 0.4 < n_fim / len(rows) < 0.6  # the 50% coin
    # spot-check one FIM'd row against a hand-built PSM string
    r = next(r for r in rows if r["fim_applied"] and r["n_middle"] > 0)
    t = docs[r["doc_id"]]
    pre = t[: r["n_prefix"]]
    mid = t[r["n_prefix"] : r["n_prefix"] + r["n_middle"]]
    suf = t[r["n_prefix"] + r["n_middle"] :]
    want = hashlib.md5(
        f"<PRE>{pre}<SUF>{suf}<MID>{mid}".encode()
    ).hexdigest()
    assert r["out_md5"] == want


def test_preference_pairs_construction(spark, sf_dir):
    """X239: every pair's chosen score >= rejected score (gap >= 0);
    per source exactly min(3, n/2) pairs with the max-gap matching
    (rank 1 pairs with rank n, etc.); no doc appears on both sides of
    the same source's pairs."""
    from mysql_cdc_to_http_spark.queries.llm import q_preference_pairs

    rows = q_preference_pairs(spark, sf_dir).collect()
    by_src: dict = {}
    for r in rows:
        assert r["gap_micro"] == r["chosen_score"] - r["rejected_score"]
        assert r["gap_micro"] >= 0
        by_src.setdefault(r["source"], []).append(r)
    for src, prs in by_src.items():
        assert len(prs) == 3  # 25+ docs per source in every sf
        chosen = {p["chosen_id"] for p in prs}
        rejected = {p["rejected_id"] for p in prs}
        assert not chosen & rejected

"""Enrichment operators: PII redaction, chunking, heavy hitters,
embedding pooling, fuzzy decontamination — semantics on hand data plus
the plan shapes that matter at scale (broadcast candidate verify,
shuffle-free chunking). Oracle parity for the registered queries rides
tests/test_oracle_parity.py automatically."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_cdc_to_http_spark.operators.curation import fuzzy_decontaminate
from mysql_cdc_to_http_spark.operators.similarity import pool_embeddings
from mysql_cdc_to_http_spark.operators.text import (
    chunk_documents,
    heavy_hitters,
    pii_counts,
    redact_pii,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_redact_pii_all_classes(spark):
    df = spark.createDataFrame(
        [("mail a.b+c@ex-1.org call 415-555-0100 from 10.0.0.1 twice "
          "other@x.io 212-555-0199 192.168.1.255",)],
        "text string",
    )
    row = df.select(
        redact_pii(F.col("text")).alias("r"), *pii_counts(F.col("text"))
    ).first()
    assert row["r"] == (
        "mail [EMAIL] call [PHONE] from [IP] twice [EMAIL] [PHONE] [IP]"
    )
    assert (row["n_emails"], row["n_phones"], row["n_ips"]) == (2, 2, 2)


def test_redact_pii_idempotent_and_no_false_hits(spark):
    df = spark.createDataFrame(
        [("version 1.2.3 range 10-20 at example.com no pii here",)],
        "text string",
    )
    once = df.select(redact_pii(F.col("text")).alias("r"))
    row = once.select(
        "r", redact_pii(F.col("r")).alias("rr"), *pii_counts(F.col("r"))
    ).first()
    # bare domain / version / numeric range are not PII-shaped
    assert row["r"] == "version 1.2.3 range 10-20 at example.com no pii here"
    assert row["rr"] == row["r"]
    assert (row["n_emails"], row["n_phones"], row["n_ips"]) == (0, 0, 0)


def test_chunk_documents_covers_every_token(spark):
    text = " ".join(f"t{i}" for i in range(70))  # 70 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=32, stride=16).collect()
    # starts step by 16 until a chunk reaches token 70: last = 49 (→ 49..70)
    starts = sorted(r["start_token"] for r in rows)
    assert starts == [1, 17, 33, 49]
    assert [r["chunk_id"] for r in sorted(rows, key=lambda r: r["start_token"])] == [0, 1, 2, 3]
    # every token index appears in at least one chunk
    covered = set()
    for r in rows:
        covered.update(range(r["start_token"], r["start_token"] + r["n_tokens"]))
    assert covered == set(range(1, 71))
    # chunk text round-trips the token slice
    first = min(rows, key=lambda r: r["start_token"])
    assert first["chunk_text"].split(" ") == [f"t{i}" for i in range(32)]


def test_chunk_documents_short_doc_single_clamped_chunk(spark):
    df = spark.createDataFrame([(7, "a b c")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=32, stride=16).collect()
    assert len(rows) == 1
    assert rows[0]["n_tokens"] == 3 and rows[0]["chunk_text"] == "a b c"


def test_chunk_documents_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _plan(chunk_documents(df))
    assert "Exchange" not in plan  # pure explode-of-sequence projection


def test_heavy_hitters_exact_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "b a a"), (2, "b c a"), (3, "c b")],
        "doc_id long, text string",
    )
    rows = heavy_hitters(df, k=10).collect()
    got = [(r["token"], r["freq"], r["doc_freq"]) for r in rows]
    # a:3(2 docs) b:3(3 docs) c:2(2 docs); tie a/b broken by token asc
    assert got == [("a", 3, 2), ("b", 3, 3), ("c", 2, 2)]


def test_pool_embeddings_means(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [5.0, 5.0])],
        "label int, embedding array<float>",
    )
    rows = {(r["label"], r["pos"]): (r["mean_val"], r["n_vectors"])
            for r in pool_embeddings(df).collect()}
    assert rows == {
        (0, 0): (2.0, 2), (0, 1): (4.0, 2),
        (1, 0): (5.0, 1), (1, 1): (5.0, 1),
    }


def test_fuzzy_decontaminate_hits_planted_leak(spark):
    bench = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # near-dup of the benchmark doc (one word changed)
            (1, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
            (2, "totally unrelated words about completely different things"),
        ],
        "doc_id long, text string",
    )
    rows = fuzzy_decontaminate(corpus, bench, threshold=0.5).collect()
    assert [(r["doc_id"], r["bench_id"]) for r in rows] == [(1, 1000)]
    assert 0.5 <= rows[0]["jaccard"] < 1.0


def test_fuzzy_decontaminate_verify_is_broadcast(spark):
    bench = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta zeta")], "doc_id long, text string"
    )
    plan = _plan(fuzzy_decontaminate(corpus, bench))
    # candidate list and benchmark shingles broadcast into the corpus
    # scan; no sort-merge join anywhere in the pass
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_validation_null_fails_and_split(spark):
    from mysql_cdc_to_http_spark.operators.validation import (
        REASONS_COL,
        quarantine_summary,
        split_valid,
        with_validation,
    )

    df = spark.createDataFrame(
        [(1, 5.0, "x"), (2, -1.0, "y"), (3, None, None), (4, 2.0, None)],
        "id long, qty double, tag string",
    )
    rules = {
        "qty_positive": F.col("qty") > 0,
        "tag_present": F.col("tag").isNotNull(),
    }
    got = {
        r["id"]: list(r[REASONS_COL])
        for r in with_validation(df, rules).collect()
    }
    # NULL predicate result (id=3 qty) counts as a failure
    assert got == {
        1: [],
        2: ["qty_positive"],
        3: ["qty_positive", "tag_present"],
        4: ["tag_present"],
    }
    valid, quarantine = split_valid(df, rules)
    assert [r["id"] for r in valid.collect()] == [1]
    assert REASONS_COL not in valid.columns
    assert sorted(r["id"] for r in quarantine.collect()) == [2, 3, 4]
    summary = {
        r["rule"]: r["n_failed"]
        for r in quarantine_summary(df, rules).collect()
    }
    assert summary == {"qty_positive": 2, "tag_present": 2}


def test_validation_single_codegen_stage(spark):
    import re

    from mysql_cdc_to_http_spark.operators.validation import with_validation

    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    )
    checked = with_validation(
        df, {f"r{i}": F.col("v") > i for i in range(8)}
    )
    plan = _plan(checked)
    assert "Exchange" not in plan  # 8 rules, one scan, no shuffle
    assert len(set(re.findall(r"codegen id : (\d+)", plan))) == 1


def test_fill_gaps_semantics(spark):
    from mysql_cdc_to_http_spark.operators.timeseries import fill_gaps

    rolled = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", 2, 1.5),
            ("a", "2024-01-01 03:00:00", 1, 9.0),  # 2-hour gap before
            ("b", "2024-01-01 01:00:00", 4, 2.0),
        ],
        "k string, bucket_ts string, n long, s double",
    ).withColumn("bucket_ts", F.to_timestamp("bucket_ts"))
    out = fill_gaps(rolled, "k", count_cols=["n"], ffill_cols=["s"]).collect()
    a = sorted(
        [r for r in out if r["k"] == "a"], key=lambda r: r["bucket_ts"]
    )
    assert [r["n"] for r in a] == [2, 0, 0, 1]  # zero-filled counts
    assert [r["s"] for r in a] == [1.5, 1.5, 1.5, 9.0]  # forward fill
    assert [r["is_gap"] for r in a] == [False, True, True, False]
    assert len([r for r in out if r["k"] == "b"]) == 1  # single bucket


def test_kmeans_inertia_decreases_and_assign_is_projection(spark):
    import re

    from mysql_cdc_to_http_spark.operators.clustering import (
        assign_clusters,
        kmeans,
        recompute_centroids,
    )

    # two tight blobs far apart + the 2 lowest-id vectors as seeds
    pts = [(i, [0.0 + i * 0.01, 0.0]) for i in range(10)] + [
        (100 + i, [10.0 + i * 0.01, 10.0]) for i in range(10)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    out = kmeans(df, k=2, iters=3).collect()
    got = {r["vec_id"]: r["cluster"] for r in out}
    # blob membership recovered regardless of the skewed seeds (both
    # seeds start inside blob 0)
    assert len({got[i] for i in range(10)}) == 1
    assert len({got[100 + i] for i in range(10)}) == 1
    assert got[0] != got[100]

    # inertia (sum of dists) must not increase across an iteration
    from pyspark.sql import functions as SF

    cents0 = [[0.0, 0.0], [10.0, 10.0]]
    a0 = assign_clusters(df, cents0)
    i0 = a0.agg(SF.sum("dist")).first()[0]
    a1 = assign_clusters(df, recompute_centroids(a0, 2))
    i1 = a1.agg(SF.sum("dist")).first()[0]
    assert i1 <= i0 + 1e-9

    plan = _plan(assign_clusters(df, cents0))
    assert "Exchange" not in plan  # assignment never shuffles the corpus


def test_kmeans_empty_cluster_raises(spark):
    import pytest as _pytest

    from mysql_cdc_to_http_spark.operators.clustering import (
        assign_clusters,
        recompute_centroids,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.1, 0.0])],
        "vec_id long, embedding array<float>",
    )
    # a centroid no point can win (ties go to cluster 0's side)
    a = assign_clusters(df, [[0.0, 0.0], [100.0, 100.0]])
    with _pytest.raises(ValueError, match="empty clusters"):
        recompute_centroids(a, 2)


def test_fill_gaps_linear_interpolation(spark):
    from mysql_cdc_to_http_spark.operators.timeseries import fill_gaps

    rolled = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", 1, 10.0),
            ("a", "2024-01-01 03:00:00", 1, 40.0),  # 2-bucket gap
        ],
        "k string, bucket_ts string, n long, v double",
    ).withColumn("bucket_ts", F.to_timestamp("bucket_ts"))
    out = sorted(
        fill_gaps(rolled, "k", count_cols=["n"], ffill_cols=[],
                  lerp_cols=["v"]).collect(),
        key=lambda r: r["bucket_ts"],
    )
    # 10 → 20 → 30 → 40 across the 3-hour span
    assert [r["v"] for r in out] == [10.0, 20.0, 30.0, 40.0]
    assert [r["is_gap"] for r in out] == [False, True, True, False]


def test_fill_gaps_lerp_anchors_skip_observed_nulls(spark):
    """Round-5 ADVICE regression: an OBSERVED bucket carrying a NULL in a
    lerp column must not move the time anchors — prev_t/next_t come from
    buckets where the value itself is non-null, so the fraction matches
    the value endpoints."""
    from mysql_cdc_to_http_spark.operators.timeseries import fill_gaps

    rolled = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", 1, 10.0),
            # observed row, NULL value: a valid anchor for nothing
            ("a", "2024-01-01 02:00:00", 1, None),
            ("a", "2024-01-01 04:00:00", 1, 50.0),
        ],
        "k string, bucket_ts string, n long, v double",
    ).withColumn("bucket_ts", F.to_timestamp("bucket_ts"))
    out = sorted(
        fill_gaps(rolled, "k", count_cols=["n"], ffill_cols=[],
                  lerp_cols=["v"]).collect(),
        key=lambda r: r["bucket_ts"],
    )
    # Linear from 10.0@00:00 to 50.0@04:00 → +10/hour, including BOTH the
    # gap buckets (01:00, 03:00) and the observed-null bucket (02:00).
    # Old observed-row anchors desynchronized at the gap buckets: 01:00
    # got next_t=02:00 (the null row) with next_v=50.0@04:00 → 30.0, and
    # 03:00 got prev_t=02:00 with prev_v=10.0@00:00 → 30.0.
    assert [r["v"] for r in out] == [10.0, 20.0, 30.0, 40.0, 50.0]
    assert [r["is_gap"] for r in out] == [False, True, False, True, False]


def test_weighted_sample_keys_deterministic_and_weight_biased(spark):
    from mysql_cdc_to_http_spark.operators.sampling import (
        weighted_sample_keys,
    )

    # 200 light rows (w=1) + 200 heavy rows (w=50)
    rows = [(i, 1) for i in range(200)] + [(1000 + i, 50) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w long")
    key = weighted_sample_keys(F.col("id"), F.col("w")).alias("k")
    pick = lambda d: sorted(  # noqa: E731
        r["id"] for r in d.select("id", key).orderBy("k", "id").limit(40).collect()
    )
    a = pick(df.repartition(1))
    b = pick(df.repartition(13))
    assert a == b  # membership invariant under partitioning
    heavy = sum(1 for i in a if i >= 1000)
    assert heavy >= 30  # 50x weight dominates the sample


def test_stream_validate_and_route(spark, sf_dir, tmp_path):
    """Streaming validation: valid and quarantined rows split from one
    pass per micro-batch; all input rows land in exactly one output."""
    import os as _os

    from mysql_cdc_to_http_spark.operators.validation import (
        stream_validate_and_route,
    )

    src = spark.read.parquet(_os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "event_type", "value"
    )
    feed = str(tmp_path / "feed")
    src.repartition(3).write.parquet(feed)

    rules = {
        "value_nonneg": F.col("value") >= 0,
        "type_known": F.col("event_type").isin("click", "view", "purchase",
                                               "signup", "logout"),
    }
    vp, qp = str(tmp_path / "valid"), str(tmp_path / "quar")
    q = stream_validate_and_route(
        spark.readStream.schema(src.schema).parquet(feed),
        rules, vp, qp, str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    valid = spark.read.parquet(vp)
    n_quar = (
        spark.read.parquet(qp).count()
        if _os.path.exists(qp) and any(
            f.endswith(".parquet") for f in _os.listdir(qp)
        )
        else 0
    )
    assert valid.count() + n_quar == src.count()
    # batch reference: same rules, same split
    from mysql_cdc_to_http_spark.operators.validation import split_valid

    bv, bq = split_valid(src, rules)
    assert valid.count() == bv.count() and n_quar == bq.count()


def test_kmeans_centroids_improve_ivf_recall(spark, sf_dir):
    """Trained centroids must not lose to the lowest-id sample at equal
    nprobe (deterministic data + deterministic training → a stable
    comparison, measured 0.667 vs 0.567 at sf0.01/nprobe=8)."""
    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.clustering import kmeans_centroids
    from mysql_cdc_to_http_spark.operators.similarity import (
        assign_buckets,
        cosine_topk_bruteforce,
        ivf_topk,
        sample_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    exact = {
        (r.query_id, r.corpus_id)
        for r in cosine_topk_bruteforce(queries, corpus, k=3).collect()
    }

    def recall(cents):
        bucketed = assign_buckets(corpus, cents)
        got = {
            (r.query_id, r.corpus_id)
            for r in ivf_topk(queries, bucketed, cents, k=3,
                              nprobe=8).collect()
        }
        return len(exact & got) / len(exact)

    r_sampled = recall(sample_centroids(corpus, 16))
    r_trained = recall(kmeans_centroids(corpus, k=16, iters=3))
    assert r_trained >= r_sampled
    assert r_trained >= 0.6


def test_operator_input_validation(spark):
    import pytest as _pytest

    from mysql_cdc_to_http_spark.operators.text import chunk_documents
    from mysql_cdc_to_http_spark.operators.timeseries import fill_gaps
    from mysql_cdc_to_http_spark.operators.validation import with_validation

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="positive"):
        chunk_documents(df, chunk_tokens=0)
    with _pytest.raises(ValueError, match="positive"):
        chunk_documents(df, stride=-1)
    with _pytest.raises(ValueError, match="non-empty"):
        with_validation(df, {})
    ts = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0)], "k string, bucket_ts string, v double"
    ).withColumn("bucket_ts", F.to_timestamp("bucket_ts"))
    with _pytest.raises(ValueError, match="both ffill and lerp"):
        fill_gaps(ts, "k", count_cols=[], ffill_cols=["v"], lerp_cols=["v"])


# ---------------------------------------------------------------------------
# pagerank (operators/graph.py)
# ---------------------------------------------------------------------------
def test_pagerank_hand_graph(spark):
    """3-node chain a->b->c plus c->a: ranks must match the hand-unrolled
    two-iteration trajectory with per-iteration rounding."""
    from mysql_cdc_to_http_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    got = {
        r.node: r.pr
        for r in pagerank(edges, iterations=2, damping=0.85).collect()
    }
    # every node: outdeg 1, one in-edge — pr stays uniform 1/3 forever
    third = round(1 / 3, 8)
    expect = round(0.15 / 3 + 0.85 * third, 8)
    expect = round(0.15 / 3 + 0.85 * expect, 8)
    assert got == {"a": expect, "b": expect, "c": expect}


def test_pagerank_sink_and_hub(spark):
    """Star a->x, b->x, c->x: the sink x accumulates rank, sources keep
    only the base share; dangling mass is (documented) not redistributed."""
    from mysql_cdc_to_http_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x")], ["src", "dst"]
    )
    got = {
        r.node: r.pr
        for r in pagerank(edges, iterations=1, damping=0.85).collect()
    }
    base = 0.15 / 4
    assert got["a"] == got["b"] == got["c"] == round(base, 8)
    assert got["x"] == round(base + 0.85 * 3 * 0.25, 8)
    # total mass < 1: x's rank drained (no dangling redistribution)
    assert sum(got.values()) < 1.0


def test_pagerank_partition_invariant(spark, sf_dir):
    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    a = {r.node: r.pr for r in pagerank(pairs, iterations=2).collect()}
    b = {
        r.node: r.pr
        for r in pagerank(pairs.repartition(17), iterations=2).collect()
    }
    assert a == b  # 8-dp iteration rounding kills sum-order wobble


# ---------------------------------------------------------------------------
# corrupt-record-tolerant ingestion (operators/validation.py)
# ---------------------------------------------------------------------------
def test_read_json_with_quarantine(spark, tmp_path):
    from mysql_cdc_to_http_spark.operators.caching import release_all_cached
    from mysql_cdc_to_http_spark.operators.validation import (
        read_json_with_quarantine,
    )

    lines = [
        '{"id": 1, "name": "ok"}',
        "this is not json at all",
        '{"id": 2, "name": "fine"}',
        '{"id": 3, "name": "unterminated',
        '{"id": "not-an-int-but-parses", "name": "x"}',
    ]
    p = tmp_path / "feed.jsonl"
    p.write_text("\n".join(lines) + "\n")
    valid, corrupt = read_json_with_quarantine(
        spark, str(p), "id bigint, name string"
    )
    v = {(r.id, r.name) for r in valid.collect()}
    c = [r.raw for r in corrupt.collect()]
    # well-formed JSON with a type mismatch is PERMISSIVE-nulled, not
    # corrupt — only non-JSON lines land in quarantine
    assert (1, "ok") in v and (2, "fine") in v and (3, "unterminated") not in v
    assert valid.count() + corrupt.count() == len(lines)
    # the quarantine carries the raw offending bytes, replayable
    assert "this is not json at all" in c
    assert '{"id": 3, "name": "unterminated' in c
    release_all_cached()


# --- record linkage ---------------------------------------------------------


def test_fuzzy_match_threshold_sentinel_and_bounds(spark):
    """levenshtein's threshold form returns -1 past the bound; the
    filter must treat that as no-match, and keep 0 (exact dupes)."""
    from mysql_cdc_to_http_spark.operators.linkage import fuzzy_match
    from pyspark.sql import functions as F  # noqa: F401

    pairs = spark.createDataFrame(
        [
            (1, 2, "alice", "alice"),     # dist 0
            (1, 3, "alice", "alicia"),    # dist 2
            (1, 4, "alice", "zzzzzz"),    # dist 6
        ],
        "id_a int, id_b int, name_a string, name_b string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_match(pairs, "name_a", "name_b", max_dist=2).collect()
    }
    assert got == {(1, 2): 0, (1, 3): 2}


def test_blocked_pairs_candidates_are_within_block_only(spark):
    from mysql_cdc_to_http_spark.operators.linkage import blocked_pairs
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "aa1"), (2, "aa2"), (3, "bb1"), (4, "aa3")],
        "id int, name string",
    )
    pairs = blocked_pairs(
        df, "id", F.substring("name", 1, 2), ["name"]
    ).select("id_a", "id_b").collect()
    got = sorted((r["id_a"], r["id_b"]) for r in pairs)
    # block 'aa' = {1,2,4} -> 3 ordered pairs; 'bb' singleton -> none
    assert got == [(1, 2), (1, 4), (2, 4)]


def test_record_linkage_blocking_misses_out_of_key_edits(spark):
    """Document the recall contract: an edit INSIDE the blocking key
    separates the records into different blocks — not matched."""
    from mysql_cdc_to_http_spark.operators.linkage import (
        blocked_pairs,
        fuzzy_match,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "abcXdef"), (2, "abcXdeg"), (3, "abdXdef")],
        "id int, name string",
    )
    # block on first 3 chars: (1,2) share 'abc'; 3's in-key typo isolates it
    pairs = blocked_pairs(df, "id", F.substring("name", 1, 3), ["name"])
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in fuzzy_match(pairs, "name_a", "name_b", 1).collect()
    )
    assert got == [(1, 2)]


# --- OHLC bars --------------------------------------------------------------


def test_ohlc_bars_tie_discipline_and_values(spark):
    """Two ticks share a timestamp: open/close must use the (ts,
    tiebreak) struct order, not luck."""
    import datetime as dt

    from mysql_cdc_to_http_spark.operators.timeseries import ohlc_bars
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, 50.0),                              # tied open, lower id
        (2, t0, 10.0),                              # tied open, higher id
        (3, t0 + dt.timedelta(minutes=5), 99.0),
        (4, t0 + dt.timedelta(minutes=9), 20.0),    # tied close, lower id
        (5, t0 + dt.timedelta(minutes=9), 30.0),    # tied close, higher id
    ]
    df = spark.createDataFrame(rows, "event_id int, ts timestamp, value double")
    [bar] = ohlc_bars(
        df,
        "ts",
        "value",
        F.date_trunc("HOUR", F.col("ts")),
        tiebreak_col="event_id",
    ).collect()
    assert bar["open"] == 50.0    # id 1 wins the tie
    assert bar["close"] == 30.0   # id 5 wins the tie
    assert bar["high"] == 99.0 and bar["low"] == 10.0
    assert bar["n_ticks"] == 5
    assert bar["volume"] == 209.0


def test_ohlc_bars_volume_partition_invariant(spark, sf_dir):
    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.timeseries import ohlc_bars
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    outs = []
    for n in (1, 16):
        bars = ohlc_bars(
            ev.repartition(n),
            "ts",
            "value",
            F.date_trunc("DAY", F.col("ts")),
            group_cols=["event_type"],
            tiebreak_col="event_id",
        )
        outs.append(sorted(tuple(r) for r in bars.collect()))
    assert outs[0] == outs[1]


# --------------------------------------------------------------------------
# product quantization
# --------------------------------------------------------------------------
def test_pq_codes_shape_and_compression_quality(spark, sf_dir):
    from mysql_cdc_to_http_spark.operators.clustering import product_quantize

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = product_quantize(emb, m=4, k=4, iters=2)
    rows = out.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        for s in range(4):
            assert 0 <= r[f"code_{s}"] < 4
        assert r["recon_err"] >= 0.0
    # quantizing to the subspace MEANS must beat quantizing to a single
    # global codeword set of the same total budget in reconstruction
    # error on average — sanity: error is finite and nonzero spread
    errs = [r["recon_err"] for r in rows]
    assert max(errs) > min(errs) >= 0.0


def test_pq_more_codewords_reduce_error(spark, sf_dir):
    """k=8 codebooks must reconstruct at least as well (on average) as
    k=2 — the basic rate-distortion direction."""
    from mysql_cdc_to_http_spark.operators.clustering import product_quantize
    import pyspark.sql.functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    e2 = product_quantize(emb, m=4, k=2, iters=2).agg(
        F.avg("recon_err")
    ).collect()[0][0]
    e8 = product_quantize(emb, m=4, k=8, iters=2).agg(
        F.avg("recon_err")
    ).collect()[0][0]
    assert e8 <= e2


def test_pq_rejects_indivisible_dim(spark):
    from mysql_cdc_to_http_spark.operators.clustering import product_quantize
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, [0.1] * 10)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError):
        product_quantize(df, m=4)


def test_pq_adc_projection_only_over_codes(spark, sf_dir):
    """The ADC scan must be a projection + TakeOrderedAndProject over the
    codes table — no join, no vector reads at search time."""
    from mysql_cdc_to_http_spark.queries import all_queries

    df = all_queries()["q_knn_pq"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_pq_adc_recall_vs_exact(spark, sf_dir):
    """ADC with 4×4 codebooks has only 256 distinct distance values —
    recall@10 against exact L2 is honestly low at that rate, so the
    contract tested is rank QUALITY, not set overlap: the query's own
    vector ranks first, and the vectors ADC selects are much closer to
    the query (by exact distance) than the corpus average."""
    import pyspark.sql.functions as F

    from mysql_cdc_to_http_spark.queries import all_queries

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.orderBy("vec_id").first()
    qv = [float(x) for x in q["embedding"]]
    # exact squared-L2 top-10
    dist = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.array(*[F.lit(v) for v in qv]),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact_d = {
        r["vec_id"]: r["d"]
        for r in emb.select("vec_id", dist.alias("d")).collect()
    }
    adc = [
        r["vec_id"]
        for r in all_queries()["q_knn_pq"](spark, sf_dir).collect()
    ]
    assert adc[0] == min(exact_d)  # the query vector itself ranks first
    corpus_avg = sum(exact_d.values()) / len(exact_d)
    picked_avg = sum(exact_d[v] for v in adc[1:]) / (len(adc) - 1)
    # The synthetic embeddings are near-isotropic noise (measured: even
    # 16×16 codebooks only reach overlap 4/10 with exact), so the floor
    # here is the data's, not the operator's: ADC picks must be
    # measurably closer than corpus average (observed ratio ≈ 0.80).
    assert picked_avg < 0.9 * corpus_avg, (picked_avg, corpus_avg)


def test_grid_nearest_residue_fallback_exact(spark):
    """X207: the certify-or-fallback contract. With a tiny cell on a
    sparse point set, phase-1 winners exceed the certification radius
    (or cells are empty) — the residue path must still return the
    EXACT global nearest for every query, matching brute force."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.operators.similarity import (
        grid_nearest_join,
    )

    pts = spark.createDataFrame(
        [(1, 10, 10), (2, 900, 900), (3, 500, 140)],
        "pid long, x long, y long",
    )
    qs = spark.createDataFrame(
        [(100, 0, 0), (101, 880, 920), (102, 450, 200), (103, 499, 499)],
        "qid long, x long, y long",
    )
    # cell=50: q100's nn is at d2=200 > 50^2 -> uncertified residue;
    # q103 sits in a cell whose whole 3x3 neighborhood is empty
    got = {
        (r.qid, r.nn, r.dist2)
        for r in grid_nearest_join(qs, pts, cell=50).collect()
    }
    d2 = lambda a, b: (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2  # noqa: E731
    P = {1: (10, 10), 2: (900, 900), 3: (500, 140)}
    want = set()
    for q, qxy in {100: (0, 0), 101: (880, 920), 102: (450, 200),
                   103: (499, 499)}.items():
        best = min((d2(qxy, pxy), pid) for pid, pxy in P.items())
        want.add((q, best[1], best[0]))
    assert got == want

"""Round-11 second-wave operators: containment dedup (X240), Wilson
lower-bound leaderboard (X241), SFT loss-mask assembly (X242), URL
opt-out filtering (X243), deterministic epoch shuffle (X244).

Each test pins the SEMANTIC claim the oracle alone can't state:
asymmetric containment catches what Jaccard misses, small samples rank
below veterans, the truncation policy keeps the completion tail, a
subdomain is blocked by its registrable-domain rule, batches are exact
and seed-stable.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from mysql_cdc_to_http_spark.queries import QUERIES


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_containment_finds_embedded_doc_jaccard_misses(spark, tmp_path):
    """A doc fully embedded in one ~10x its size has containment 1.0
    but Jaccard << 0.5 — the pair Jaccard-thresholded dedup
    structurally misses and X240 exists to catch."""
    small = " ".join(f"w{i} x{i} y{i}" for i in range(10))  # 30 tokens
    big = small + " " + " ".join(f"p{i} q{i} r{i}" for i in range(100))
    noise = " ".join(f"z{i} k{i}" for i in range(50))
    sf = _write_docs(spark, tmp_path, [(1, small), (2, big), (3, noise)])
    out = QUERIES["q_dedup_containment"](spark, sf).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs, out
    r = pairs[(1, 2)]
    assert r.containment_micro == 1_000_000  # every small-shingle in big
    jaccard = r.inter / (r.size_a + r.size_b - r.inter)
    assert jaccard < 0.15  # symmetric metric would never flag this pair
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_containment_candidates_respect_df_cap(spark, tmp_path):
    """A shingle present in >50 docs must not generate candidates on
    its own (stop-gram guard): 60 docs sharing ONLY one boilerplate
    sentence yield no pairs (their shared shingles are over-cap and
    each pair shares <2 sub-cap shingles)."""
    boiler = "all rights reserved contact us for details"
    rows = [(i, boiler + f" uniq{i}a uniq{i}b uniq{i}c") for i in range(60)]
    sf = _write_docs(spark, tmp_path, rows)
    out = QUERIES["q_dedup_containment"](spark, sf).collect()
    assert out == [], out[:5]


def test_wilson_lb_ranks_veteran_above_perfect_newcomer(spark, tmp_path):
    """5/5 (rate 1.0) must rank BELOW 95/100 (rate 0.95): the entire
    point of the lower-bound correction. Also re-derives every row's
    lb with exact integer isqrt (math.isqrt) — pinning that the
    one-step float-seed correction equals true isqrt end-to-end."""
    rows = []
    eid = 0
    for uid, s, n in ((1, 5, 5), (2, 95, 100), (3, 50, 100), (4, 2, 5)):
        for j in range(n):
            et = "purchase" if j < s else "click"
            rows.append((eid, "2024-01-01 00:00:00", uid, et, 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = {
        r.user_id: r
        for r in QUERIES["q_wilson_leaderboard"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[2].rk < out[1].rk  # veteran above perfect newcomer
    assert out[1].rate_micro == 1_000_000 and out[2].rate_micro == 950_000
    for r in out.values():
        s, n = r.successes, r.trials
        a = (s * (n - s) * 10_000_000_000) // n + 10_000_000_000
        w = math.isqrt(a)
        lb = ((s + 2) * 100_000 - 2 * w) // (n + 4)
        assert r.wilson_lb_e5 == lb, (r, lb)


def test_sft_masks_keep_completion_tail_policy(spark, tmp_path):
    """Three planted lengths pin the truncation matrix: short doc (no
    cut), long completion (prompt fully evicted, completion tail
    kept), mid doc (both fully kept); the md5 certifies the assembled
    bytes for the evicted-prompt case."""
    t10 = " ".join(f"a{i}" for i in range(10))
    t83 = " ".join(f"b{i}" for i in range(83))
    t50 = " ".join(f"c{i}" for i in range(50))
    sf = _write_docs(spark, tmp_path, [(1, t10), (2, t83), (3, t50)])
    out = {r.doc_id: r for r in QUERIES["q_sft_masks"](spark, sf).collect()}
    r1 = out[1]  # 10 tokens: prompt=10, completion=0
    assert (r1.kept_prompt, r1.kept_completion, r1.mask_start) == (10, 0, 10)
    r2 = out[2]  # 16+67 -> completion tail of 64 wins, prompt evicted
    assert (r2.kept_prompt, r2.kept_completion, r2.mask_start) == (0, 64, 0)
    toks = t83.split(" ")
    assembled = "" + "<SEP>" + " ".join(toks[83 - 64 :])
    assert r2.out_md5 == hashlib.md5(assembled.encode()).hexdigest()
    r3 = out[3]  # 16+34 fits the 64 budget entirely
    assert (r3.kept_prompt, r3.kept_completion, r3.mask_start) == (16, 34, 16)
    toks = t50.split(" ")
    assembled = " ".join(toks[:16]) + "<SEP>" + " ".join(toks[16:])
    assert r3.out_md5 == hashlib.md5(assembled.encode()).hexdigest()


def test_url_optout_subdomain_path_and_priority(spark, tmp_path):
    """Pins the matching semantics: a registrable-domain rule blocks
    the www subdomain via ancestor expansion; a path rule matches by
    prefix; a doc matching a domain AND a path rule gets the MIN
    rule_id; an unlisted host/path survives."""
    rows = [(i, f"text {i}") for i in (3, 13, 40, 1, 983)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in QUERIES["q_url_optout"](spark, sf).collect()}
    assert out[3].rule_id == 1  # www.example3.com blocked via example3.com
    assert out[3].host == "www.example3.com"
    assert out[13].rule_id == 4  # /path13 exact-prefix
    assert out[40].rule_id == 5  # /path40 starts with /path4
    assert 1 not in out  # host example1.com, path /path1: unlisted
    # doc 983: %20==3 (domain rule 1) AND %97==13 (path rule 4) -> min
    assert out[983].rule_id == 1


def test_epoch_shuffle_exact_batches_and_stability(spark, sf_dir):
    """Every batch is exactly 32 rows (last partial), positions are a
    permutation of 0..len-1 within each batch, the doc_id set is
    preserved, and a second run is byte-identical (pure key function —
    no RNG, no scan-order dependence)."""
    out1 = QUERIES["q_epoch_shuffle"](spark, sf_dir).collect()
    out2 = QUERIES["q_epoch_shuffle"](spark, sf_dir).collect()
    assert out1 == out2
    n = len(out1)
    by_batch: dict[int, list[int]] = {}
    for r in out1:
        by_batch.setdefault(r.batch_id, []).append(r.pos_in_batch)
    last = max(by_batch)
    for b, poss in by_batch.items():
        expect = 32 if b < last else (n - 32 * last)
        assert len(poss) == expect, (b, len(poss))
        assert sorted(poss) == list(range(len(poss)))
    assert {r.doc_id for r in out1} == set(range(n))


def test_chunk_stitch_all_green_and_chunk_math(spark, tmp_path):
    """The audit must certify the real chunker: boundaries consistent
    and round-trip exact for every length in a planted matrix covering
    the edge cases (short doc, exact window, one-over, tail round-up,
    long)."""
    lens = [1, 31, 32, 33, 48, 49, 100]
    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n)))
        for i, n in enumerate(lens)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in QUERIES["q_chunk_stitch"](spark, sf).collect()}
    assert len(out) == len(lens)
    for i, n in enumerate(lens):
        r = out[i]
        assert r.boundaries_ok and r.roundtrip_ok, r
        assert r.n_tokens == n
        expect_chunks = 1 if n <= 32 else ((n - 32 + 15) // 16) + 1
        assert r.n_chunks == expect_chunks, (n, r.n_chunks, expect_chunks)


def test_rater_kappa_hand_contingency(spark, tmp_path):
    """Planted 2x2 contingency: (ra,rb) docs in counts 3/2/1/4 — the
    kappa must equal the hand-computed exact rational in micro units
    (sign-correct truncation), and po/pe must match."""
    docs = []
    i = 0
    def add(n, text):
        nonlocal i
        for _ in range(n):
            docs.append((i, text))
            i += 1
    # ra: >=50 tokens and >=2 of the stop list; rb: TTR >= 0.45
    both = "the a " + " ".join(f"u{j}" for j in range(58))        # ra,rb
    ra_only = "the a " + " ".join("z" for _ in range(58))          # ra,!rb
    rb_only = " ".join(f"v{j}" for j in range(10))                 # !ra,rb
    neither = " ".join("w" for _ in range(10))                     # !ra,!rb
    add(3, both); add(2, ra_only); add(1, rb_only); add(4, neither)
    sf = _write_docs(spark, tmp_path, docs)
    [r] = QUERIES["q_rater_kappa"](spark, sf).collect()
    assert (r.n, r.n11, r.n10, r.n01, r.n00) == (10, 3, 2, 1, 4)
    n, n11, n10, n01, n00 = 10, 3, 2, 1, 4
    num = n * (n11 + n00) - ((n11 + n10) * (n11 + n01)
                             + (n01 + n00) * (n10 + n00))
    den = n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
    expect = (num * 1_000_000) // den if num >= 0 else -(
        (-num * 1_000_000) // den
    )
    assert r.kappa_micro == expect
    assert r.po_micro == (n11 + n00) * 1_000_000 // n
    assert 0 < r.kappa_micro < 1_000_000  # positive, imperfect agreement


def test_wilson_incremental_equals_batch_row_exact(spark, sf_dir):
    """The fold over an arbitrary epoch partition must reproduce the
    one-shot leaderboard ROW-EXACTLY (mergeable-counter identity —
    same rule as the X94/X235 incremental views)."""
    batch = QUERIES["q_wilson_leaderboard"](spark, sf_dir).collect()
    fold = QUERIES["q_wilson_incremental"](spark, sf_dir).collect()
    assert batch == fold and len(batch) > 0


def test_mrl_audit_detects_planted_truncation_flip(spark, tmp_path):
    """Query 0's nearest neighbor under full 64 dims differs from its
    nearest under the first 32 dims (planted tail-heavy vector), so
    top1_match must be False and rbo < 1; query 1's neighborhood is
    dimension-stable, so rbo == 1 and top1_match True."""
    import math

    alt = [1.0, 0.0] * 16      # alternating pattern
    ones = [1.0, 1.0] * 16     # dense pattern
    orth = [0.0, 1.0] * 16     # orthogonal to alt
    pc = [1.0, 0.0, 0.0, 1.0] * 8  # distinct pattern for q1's cluster
    rows = [
        # q0: alt head, alt tail
        (0, alt + alt, 0),
        # q1: its own pattern, with parallel (dimension-stable) docs
        (1, pc + pc, 0),
        # d10: head only ~0.707-aligned to q0's, tail perfectly
        # aligned -> wins under FULL cosine
        (10, ones + alt, 0),
        # d11: head perfectly aligned, tail orthogonal -> wins under
        # TRUNCATED cosine, loses under full
        (11, alt + orth, 0),
        # corpus for q1: parallel to q1, stable under truncation and
        # strictly above d10/d11 in both arms
        (12, pc + pc, 0),
        (13, [0.8 * c for c in pc + pc], 0),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {r.query_id: r for r in QUERIES["q_mrl_audit"](
        spark, str(tmp_path)
    ).collect()}
    # sanity of the planting: full prefers 10, truncated prefers 11
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a))
                      * math.sqrt(sum(x * x for x in b)))
    q0, d10, d11 = alt + alt, ones + alt, alt + orth
    assert cos(q0, d10) > cos(q0, d11)
    assert cos(q0[:32], d11[:32]) > cos(q0[:32], d10[:32])
    assert not out[0].top1_match  # rank-1 flipped by truncation
    # 4-doc corpus: the RBO_min@10 ceiling for IDENTICAL rankings is
    # sum_d w_d * min(4, d) over the common denominator, not 1.0
    from mysql_cdc_to_http_spark.queries.features import (
        _RBO_DEN,
        _RBO_WEIGHTS,
    )

    ceiling = (
        sum(w * min(4, d) for d, w in _RBO_WEIGHTS.items()) * 1_000_000
    ) // _RBO_DEN
    assert out[1].top1_match and out[1].rbo_micro == ceiling
    assert out[0].rbo_micro < ceiling  # disagreement strictly penalized


def test_prefix_schedule_counts_planted_interleave(spark, tmp_path):
    """Four docs sharing one 8-token prefix, interleaved with four
    unique-prefix docs so arrival order has ZERO adjacent hits, while
    scheduling groups them for 3 hits (= n - n_prefixes = 8 - 5)."""
    shared = " ".join(f"s{j}" for j in range(8))
    rows = []
    for i in range(8):
        if i % 2 == 0:
            rows.append((i, shared + f" body{i}"))
        else:
            rows.append((i, " ".join(f"u{i}x{j}" for j in range(10))))
    sf = _write_docs(spark, tmp_path, rows)
    [r] = QUERIES["q_prefix_schedule"](spark, sf).collect()
    assert (r.n_docs, r.n_prefixes) == (8, 5)
    assert r.hits_scheduled == 3 and r.hits_arrival == 0
    assert r.sched_rate_micro == 3 * 1_000_000 // 8


def test_profile_drift_flags_known_churn(spark, sf_dir):
    """The X87 churn must surface exactly where it changes the
    profile: new keys above +10M move key_max, 'X'/'N' enter the
    status domain (md5 fingerprint moves), row count shifts; key_min
    stays (key 1 survives every churn rule)."""
    out = {r.metric: r for r in QUERIES["q_profile_drift"](
        spark, sf_dir
    ).collect()}
    assert len(out) == 9
    assert out["rows"].changed
    assert out["key_max"].changed
    assert int(out["key_max"].new_value) > 10_000_000
    assert out["status_domain"].changed
    assert out["status_distinct"].changed  # +2 new enum values
    # key 0 is a %97 multiple -> deleted; min moves 0 -> 1 exactly
    assert out["key_min"].changed
    assert (out["key_min"].old_value, out["key_min"].new_value) == ("0", "1")
    assert out["price_sum_cents"].changed


def test_embedding_drift_psi_zero_on_identical_snapshot(spark, sf_dir):
    """PSI of a bucket histogram against itself must be exactly 0 in
    every bin (p == q after identical smoothing), and the real
    even/odd split must produce a finite non-negative total repeated
    on every row."""
    from mysql_cdc_to_http_spark.operators.features import psi_drift
    from mysql_cdc_to_http_spark.operators.similarity import (
        assign_buckets,
        sample_centroids,
    )
    from mysql_cdc_to_http_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    cents = sample_centroids(corpus, 8)
    b = assign_buckets(corpus, cents).select("bucket")
    same = psi_drift(b, b, "bucket", 0.0, 8.0, 8, 0.5).collect()
    assert all(r.psi_bin == 0.0 and r.psi_total == 0.0 for r in same)
    out = QUERIES["q_embedding_drift"](spark, sf_dir).collect()
    totals = {r.psi_total for r in out}
    assert len(totals) == 1 and min(totals) >= 0.0
    assert sum(r.cnt_a + r.cnt_b for r in out) == corpus.count()


def test_containment_decontam_catches_quoted_benchmark(spark, tmp_path):
    """A benchmark item pasted verbatim inside a 20x-longer training
    doc must flag at containment 1.0 even though its share of the
    train doc's shingles (X50's aggregate view) is tiny; an unrelated
    train doc must not flag."""
    bench_text = " ".join(f"bq{j}" for j in range(20))
    long_train = (
        " ".join(f"fill{j}" for j in range(200))
        + " " + bench_text + " "
        + " ".join(f"tail{j}" for j in range(200))
    )
    clean_train = " ".join(f"cl{j}" for j in range(50))
    df = spark.createDataFrame(
        [
            (0, bench_text, "en", "src0", len(bench_text)),
            (1, long_train, "en", "src1", len(long_train)),
            (2, clean_train, "en", "src1", len(clean_train)),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = QUERIES["q_decontaminate_containment"](
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.train_id, r.bench_id) == (1, 0)
    assert r.containment_micro == 1_000_000
    # the aggregate-overlap view would see only ~18/418 shingles
    assert r.matched < 25


def test_containment_sketch_exact_when_set_fits(spark, tmp_path):
    """When |A| <= 16 the bottom-16 sketch IS the set, so the estimate
    must equal the exact containment (planted: identical short pair ->
    1.0; disjoint pair -> 0)."""
    short = " ".join(f"s{j}" for j in range(12))   # 10 shingles < 16
    other = " ".join(f"o{j}" for j in range(12))
    sf = _write_docs(
        spark, tmp_path, [(1, short), (2, short), (3, other)]
    )
    out = {(r.id_a, r.id_b): r for r in QUERIES["q_containment_sketch"](
        spark, sf
    ).collect()}
    r12 = out[(1, 2)]
    assert r12.est_micro == r12.exact_micro == 1_000_000
    assert r12.abs_err_micro == 0
    r23 = out[(2, 3)]
    assert r23.est_micro == r23.exact_micro == 0


def test_hard_negatives_exclude_same_label_and_rank_hardest(spark, tmp_path):
    """No mined negative may share the query's label, and the planted
    near-boundary mismatch must outrank the far one."""
    import math
    base = [1.0] * 64
    near = [1.0] * 63 + [0.5]     # cosine ~0.999 to base
    far = [1.0, -1.0] * 32        # cosine 0 to base
    rows = [
        (0, base, 7),             # query, label 7
        (10, base, 7),            # same label, closest of all -> excluded
        (11, near, 3),            # mismatch, near -> rank 1
        (12, far, 3),             # mismatch, far -> rank 2
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = QUERIES["q_hard_negatives"](spark, str(tmp_path)).collect()
    mine = [r for r in out if r.query_id == 0]
    assert all(r.neg_label != 7 for r in mine)
    assert 10 not in {r.neg_id for r in mine}  # same-label excluded
    assert mine[0].neg_id == 11 and mine[1].neg_id == 12


def test_rag_context_offsets_budget_and_md5(spark, sf_dir):
    """Invariants of the greedy fill: offsets are exact prefix sums of
    used lengths, the total stays within the 128 budget, truncation
    flags match, and the context md5 recomputes from the raw docs +
    emitted (rank, doc, used) metadata alone."""
    import re

    out = QUERIES["q_rag_context"](spark, sf_dir).collect()
    assert 1 <= len(out) <= 3
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    total = 0
    pieces = []
    for i, r in enumerate(sorted(out, key=lambda r: r.rank)):
        toks = re.sub(r"\s+", " ", docs[r.doc_id].lower()).strip().split(" ")
        assert r.start_offset == total
        assert r.tokens_used <= len(toks)
        assert r.truncated == (r.tokens_used < len(toks))
        pieces.append(" ".join(toks[: r.tokens_used]))
        total += r.tokens_used
    assert total <= 128
    ctx = " ".join(pieces)
    assert out[0].context_md5 == hashlib.md5(ctx.encode()).hexdigest()
    assert len({r.context_md5 for r in out}) == 1

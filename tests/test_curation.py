"""Curation operators: decontamination, repetition scoring, domain-mix
sampling — semantics on hand data + the plan shapes that matter at scale
(broadcast membership join, shuffle-free projections, deterministic
membership)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql_cdc_to_http_spark.operators.curation import (
    benchmark_ngram_set,
    decontaminate,
    domain_mix_sample,
    rate_to_hex8,
    repetition_score,
    tokenize,
    word_ngrams_from_tokens,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_word_ngrams_basic(spark):
    df = spark.createDataFrame([("a b c d",), ("x",)], "text string")
    got = df.select(tokenize(F.col("text")).alias("t")).select(
        word_ngrams_from_tokens(F.col("t"), 2).alias("g")
    ).collect()
    assert got[0]["g"] == ["a b", "b c", "c d"]
    assert got[1]["g"] == ["x"]  # shorter than n → one clamped gram


def test_decontaminate_flags_known_leak(spark):
    bench_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # full benchmark sentence embedded → heavy overlap
            (1, "prefix words the quick brown fox jumps over the lazy dog suffix"),
            # no shared 3-grams
            (2, "completely different content with no shared phrases at all"),
        ],
        "doc_id long, text string",
    )
    bench = benchmark_ngram_set(bench_docs, n=3)
    got = {
        r["doc_id"]: r
        for r in decontaminate(
            corpus, bench, n=3, max_overlap=0.3
        ).collect()
    }
    assert got[1]["is_contaminated"] and got[1]["ngrams_matched"] >= 6
    assert not got[2]["is_contaminated"] and got[2]["ngrams_matched"] == 0


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The membership join must be a broadcast hash join — shipping the
    corpus to a shuffle for a KB-sized benchmark set is the anti-shape."""
    from mysql_cdc_to_http_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = benchmark_ngram_set(docs.filter(F.col("source") == "src0"), n=5)
    plan = _plan(decontaminate(docs.filter(F.col("source") != "src0"), bench))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_repetition_score_hand_cases(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_score(df, n=2).collect()}
    # "a b a b…": 7 bigrams, only 2 distinct → repetition 5/7
    assert got[1]["ngrams_total"] == 7 and got[1]["ngrams_distinct"] == 2
    assert got[1]["repetition"] == pytest.approx(5 / 7)
    assert got[2]["repetition"] == 0.0


def test_repetition_is_shuffle_free(spark, sf_dir):
    from mysql_cdc_to_http_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(repetition_score(docs))
    assert "Exchange" not in plan, plan


def test_rate_to_hex8_thresholds():
    assert rate_to_hex8(1.0) == "g"
    assert rate_to_hex8(0.5) == "80000000"
    assert rate_to_hex8(0.25) == "40000000"
    assert rate_to_hex8(0.0) == "00000000"


def test_domain_mix_deterministic_and_ratioed(spark, sf_dir):
    """Membership is identical across partitionings; realized rates land
    near the targets; unlisted domains get the default rate."""
    from mysql_cdc_to_http_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 0.5}
    a = domain_mix_sample(docs, rates, default_rate=0.2)
    b = domain_mix_sample(docs.repartition(13, "lang"), rates, default_rate=0.2)
    ids_a = {r["doc_id"] for r in a.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # partitioning-invariant membership
    n_src0 = docs.filter(F.col("source") == "src0").count()
    kept_src0 = a.filter(F.col("source") == "src0").count()
    assert kept_src0 == n_src0  # rate 1.0 keeps everything
    others = docs.filter(~F.col("source").isin("src0", "src1"))
    kept_others = a.filter(~F.col("source").isin("src0", "src1")).count()
    # 0.2 target over ~450 docs: generous 3-sigma-ish band
    assert 0.1 <= kept_others / others.count() <= 0.32


def test_tokenize_trims_padding(spark):
    """Leading/trailing whitespace must not mint empty-string tokens
    (phantom n-grams would skew repetition/overlap ratios)."""
    df = spark.createDataFrame([("  a b \n",)], "text string")
    got = df.select(tokenize(F.col("text")).alias("t")).collect()[0]["t"]
    assert got == ["a", "b"]


# ---------------------------------------------------------------------------
# line-level boilerplate removal (remove_frequent_lines / reassemble_lines)
# ---------------------------------------------------------------------------
def _mk_lines(spark):
    rows = []
    # 'boiler' appears in docs 1..7 (df=7 > 5) → dropped everywhere
    for d in range(1, 8):
        rows.append((d, -1, "boiler"))
        rows.append((d, 0, f"unique body {d}"))
    # 'rare' appears in docs 1..3 (df=3 ≤ 5) → kept
    for d in range(1, 4):
        rows.append((d, 1, "rare"))
    # doc 8 repeats one line 6 times INSIDE itself → df=1, must be kept
    for p in range(6):
        rows.append((8, p, "self repeat"))
    # doc 9 is boilerplate-only → reassembles to the empty doc
    rows.append((9, 0, "boiler"))
    return spark.createDataFrame(rows, ["doc_id", "pos", "line"])


def test_remove_frequent_lines_doc_frequency_semantics(spark):
    from mysql_cdc_to_http_spark.operators.curation import (
        remove_frequent_lines,
    )

    lines = _mk_lines(spark)
    kept = remove_frequent_lines(lines, max_doc_freq=5)
    left = {(r.doc_id, r.line) for r in kept.collect()}
    assert not any(line == "boiler" for _, line in left)  # df=7 dropped
    assert (1, "rare") in left and (3, "rare") in left  # df=3 kept
    # intra-doc repetition is NOT cross-doc boilerplate (countDistinct)
    assert sum(1 for d, line in left if line == "self repeat") == 1
    assert kept.filter(
        (F.col("doc_id") == 8) & (F.col("line") == "self repeat")
    ).count() == 6


def test_remove_frequent_lines_broadcasts_frequent_set(spark):
    from mysql_cdc_to_http_spark.operators.curation import (
        remove_frequent_lines,
    )

    kept = remove_frequent_lines(_mk_lines(spark), max_doc_freq=5)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_reassemble_lines_order_and_empty_docs(spark):
    from mysql_cdc_to_http_spark.operators.curation import (
        reassemble_lines,
        remove_frequent_lines,
    )
    import hashlib

    lines = _mk_lines(spark)
    docs = lines.select("doc_id").distinct()
    out = reassemble_lines(
        remove_frequent_lines(lines, max_doc_freq=5), docs
    )
    got = {r.doc_id: (r.n_kept, r.cleaned_md5) for r in out.collect()}
    # doc 1: pos order is (0 body, 1 rare) — boiler at -1 dropped
    want1 = hashlib.md5("unique body 1\nrare".encode()).hexdigest()
    assert got[1] == (2, want1)
    # doc 9 lost its only line but still appears, as the empty doc
    assert got[9] == (0, hashlib.md5(b"").hexdigest())
    assert got[8][0] == 6


# --- hashed linear quality classifier ---------------------------------------


def test_classifier_matches_pure_python_md5_model(spark):
    """Pin the full model (tokenize → feature hash → weight hash → mean)
    against an independent hashlib recomputation."""
    import hashlib

    from mysql_cdc_to_http_spark.operators.classifier import score_tokens
    from mysql_cdc_to_http_spark.operators.curation import tokenize
    from pyspark.sql import functions as F

    def py_score(text):
        toks = " ".join(text.lower().split()).split(" ")
        total = 0.0
        for t in toks:
            fi = int(hashlib.md5(f"qc-v1|{t}".encode()).hexdigest()[:6], 16) % 1024
            k = int(hashlib.md5(f"qc-w1|{fi}".encode()).hexdigest()[:6], 16) % 2049
            total += (k - 1024) / 1024.0
        return total / len(toks)

    texts = [
        "The quick brown fox jumps over the lazy dog",
        "spark spark spark",
        "  leading and   trailing   whitespace  ",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i", score_tokens(tokenize(F.col("text"))).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_score(t), f"doc {i}: {got[i]} != {py_score(t)}"


def test_classifier_scoring_is_shuffle_free(spark, sf_dir):
    """The whole scoring path must stay inside the scan stage: no
    Exchange, no aggregate, no Python eval in the plan."""
    from mysql_cdc_to_http_spark.operators.classifier import score_tokens
    from mysql_cdc_to_http_spark.operators.curation import tokenize
    from mysql_cdc_to_http_spark.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", score_tokens(tokenize(F.col("text"))).alias("s")
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Aggregate", "Python", "Sort"):
        assert bad not in plan, f"classifier plan leaked a {bad}:\n{plan}"


def test_classifier_collisions_share_weights(spark):
    """Hashing-trick contract: tokens that collide on the feature index
    contribute the identical weight."""
    import hashlib

    from mysql_cdc_to_http_spark.operators.classifier import (
        feature_index,
        feature_weight,
    )
    from pyspark.sql import functions as F

    # find two distinct tokens colliding in the 1024-bucket space
    def fi(t):
        return int(hashlib.md5(f"qc-v1|{t}".encode()).hexdigest()[:6], 16) % 1024

    base = fi("tok0")
    other = next(f"tok{i}" for i in range(1, 5000) if fi(f"tok{i}") == base)
    df = spark.createDataFrame([("tok0",), (other,)], "t string")
    ws = [
        r["w"]
        for r in df.select(
            feature_weight(feature_index(F.col("t"))).alias("w")
        ).collect()
    ]
    assert ws[0] == ws[1]


# --- bigram LM scoring ------------------------------------------------------


def test_lm_bigram_probabilities_sum_to_one_per_prefix(spark):
    """Add-one smoothing invariant: for any seen prefix w1,
    sum over the whole vocab of P(w2|w1) = 1."""
    from mysql_cdc_to_http_spark.operators.lm import train_bigram_lm
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b a b")], "doc_id long, text string"
    )
    uni, bi, vocab = train_bigram_lm(docs)
    v = vocab.collect()[0]["v"]          # {a, b, c} -> 3
    assert v == 3
    c1 = {r["w1"]: r["c1"] for r in uni.collect()}
    c12 = {(r["w1"], r["w2"]): r["c12"] for r in bi.collect()}
    all_tokens = ["a", "b", "c"]
    for w1 in c1:
        total = sum(
            (c12.get((w1, w2), 0) + 1) / (c1[w1] + v) for w2 in all_tokens
        )
        assert abs(total - 1.0) < 1e-12, (w1, total)


def test_lm_score_known_tiny_corpus(spark):
    """Hand-computed mean log-prob on a 2-doc corpus."""
    import math

    from mysql_cdc_to_http_spark.operators.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    uni, bi, vocab = train_bigram_lm(docs)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in score_perplexity(docs, uni, bi, vocab).collect()
    }
    # counts: bigrams ab:3, ba:1, bc:1 ; prefix occurrences a:3, b:2 ; V=3
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)
    exp1 = round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)
    exp2 = round((math.log(p_ab) + math.log(p_bc)) / 2, 6)
    assert got == {1: (3, exp1), 2: (2, exp2)}


def test_lm_short_docs_excluded_but_counted_in_vocab(spark):
    from mysql_cdc_to_http_spark.operators.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "zzz")], "doc_id long, text string"
    )
    uni, bi, vocab = train_bigram_lm(docs)
    assert vocab.collect()[0]["v"] == 3          # zzz counts toward V
    scored = score_perplexity(docs, uni, bi, vocab).collect()
    assert [r["doc_id"] for r in scored] == [1]  # no bigrams -> no row


def test_c4_keep_line_rules(spark):
    from mysql_cdc_to_http_spark.operators.text import c4_keep_line
    import pyspark.sql.functions as F

    cases = [
        ("a good normal sentence.", True),
        ("ends with a question mark?", True),
        ('quoted ending works too."', True),
        ("no terminal punctuation here", False),
        ("too short.", False),  # < 3 words
        ("enable JavaScript to proceed.", False),
        ("code like { this } is dropped.", False),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "line string")
    got = [
        r["k"] for r in df.select(c4_keep_line(F.col("line")).alias("k")).collect()
    ]
    assert got == [e for _, e in cases]


def test_c4_clean_page_lorem_ipsum_drops_whole_page(spark):
    from mysql_cdc_to_http_spark.operators.text import c4_clean_page
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            ("keep this line intact.\nLorem Ipsum dolor sit amet.",),
            ("keep this line intact.\ndrop me no punct",),
        ],
        "page string",
    )
    n_lines, n_kept, dropped, clean = c4_clean_page(F.col("page"))
    rows = df.select(
        n_lines.alias("nl"), n_kept.alias("nk"),
        dropped.alias("d"), clean.alias("c"),
    ).collect()
    assert rows[0]["d"] and rows[0]["c"] == ""
    assert not rows[1]["d"]
    assert rows[1]["c"] == "keep this line intact."
    assert (rows[1]["nl"], rows[1]["nk"]) == (2, 1)


# ---------------------------------------------------------------------------
# X224: winnowing fingerprints (Schleimer et al. 2003)
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_run_detected(spark):
    """The winnowing guarantee: with k=4, w=4, any shared word run of
    length >= k+w-1 = 7 MUST yield a shared selected fingerprint —
    the recall floor the probabilistic dedup arms can't promise."""
    from mysql_cdc_to_http_spark.operators.text import winnow_fingerprints

    run = "alpha beta gamma delta epsilon zeta eta"  # exactly 7 words
    docs = spark.createDataFrame(
        [
            (1, f"unrelated prefix words here {run} and a suffix tail"),
            (2, f"{run} totally different continuation of document two"),
            (3, "no overlap with either of the other documents at all "
                "just filler words repeated filler words repeated"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=4, w=4)
    shared_12 = (
        fps.filter(F.col("doc_id") == 1)
        .select("fp")
        .intersect(fps.filter(F.col("doc_id") == 2).select("fp"))
        .count()
    )
    assert shared_12 >= 1, "7-word shared run must share a fingerprint"
    shared_13 = (
        fps.filter(F.col("doc_id") == 1)
        .select("fp")
        .intersect(fps.filter(F.col("doc_id") == 3).select("fp"))
        .count()
    )
    assert shared_13 == 0


def test_winnow_density_and_short_docs(spark):
    """Selected fingerprints are a strict subset of k-gram hashes
    (~2/(w+1) density on random text), and a doc shorter than k words
    still yields exactly one fingerprint (clamped partial gram)."""
    from mysql_cdc_to_http_spark.operators.text import winnow_fingerprints

    import random

    rng = random.Random(7)
    words = [f"w{rng.randrange(500)}" for _ in range(400)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "only three words")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=4, w=4)
    n1 = fps.filter(F.col("doc_id") == 1).count()
    n_grams = 400 - 3
    # density ~2/(w+1)=0.4; allow generous slack but pin "a sample"
    assert 0.15 * n_grams <= n1 <= 0.75 * n_grams
    assert fps.filter(F.col("doc_id") == 2).count() == 1


# --- X225: UniMax budget-constrained mixing ---------------------------------


def test_unimax_budget_waterfill_invariants(spark, sf_dir):
    """The allocation IS the waterfill: allocations sum to the budget
    EXACTLY (remainder dealt out, never dropped), the capped set is a
    prefix of the size order, capped languages get exactly E=2 epochs,
    uncapped ones share one water level (±1 remainder token) strictly
    below their own cap, and the largest language is always the one
    being downsampled (epochs < 2)."""
    from mysql_cdc_to_http_spark.queries.curation import q_unimax_budget

    rows = sorted(
        q_unimax_budget(spark, sf_dir).collect(), key=lambda r: r.size_rank
    )
    total = sum(r.tokens for r in rows)
    budget = total * 3 // 2
    assert sum(r.alloc_tokens for r in rows) == budget
    flags = [r.is_capped for r in rows]  # in size order
    assert flags == sorted(flags, reverse=True), "capped set must be a prefix"
    assert any(flags) and not all(flags), "budget must actually bind"
    for r in rows:
        if r.is_capped:
            assert r.alloc_tokens == 2 * r.tokens
            assert r.epochs_micro == 2_000_000
        else:
            assert r.alloc_tokens < 2 * r.tokens
    levels = [r.alloc_tokens for r in rows if not r.is_capped]
    assert max(levels) - min(levels) <= 1  # one water level, ±1 remainder
    assert rows[-1].is_capped is False
    assert rows[-1].epochs_micro < 2_000_000


def test_dsir_scores_prefer_target_distribution(spark, sf_dir):
    """X229 semantics: DSIR importance scores must rank documents from
    the TARGET slice (lang='en') above the raw pool on average — the
    whole point of the log-likelihood-ratio gate — and the selection
    flag must equal (rounded score > 0). Model tables stay
    bucket-sized: the scoring join broadcasts them, never shuffles the
    corpus by anything but (doc, bucket)."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.curation import dsir_scores

    docs = load_table(spark, sf_dir, "documents")
    scored = dsir_scores(docs, F.col("lang") == "en")
    rows = scored.join(
        docs.select("doc_id", "lang"), "doc_id"
    ).collect()
    assert len(rows) == docs.count()  # every doc scored, none dropped
    en = [r["score"] for r in rows if r["lang"] == "en"]
    rest = [r["score"] for r in rows if r["lang"] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)
    # the target slice should be enriched among selected docs
    sel = [r for r in rows if r["selected"] == 1]
    assert sel
    frac_en_selected = sum(1 for r in sel if r["lang"] == "en") / len(sel)
    frac_en_corpus = len(en) / len(rows)
    assert frac_en_selected > frac_en_corpus
    for r in rows:
        assert r["selected"] == (1 if r["score"] > 0 else 0)
    # plan shape: both LM tables broadcast into the scoring join
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_temperature_mix_invariants(spark, sf_dir):
    """X230: the τ=2 allocation must (a) sum exactly to the corpus
    token budget, (b) tilt shares toward the tail — every language
    smaller than average gains epochs (epochs_micro > 1e6) and the
    largest language loses them, and (c) preserve the size ORDER
    (temperature flattens, never reorders)."""
    from mysql_cdc_to_http_spark.queries.curation import q_temperature_mix

    rows = q_temperature_mix(spark, sf_dir).collect()
    total = sum(r["tokens"] for r in rows)
    assert sum(r["alloc_tokens"] for r in rows) == total
    biggest = max(rows, key=lambda r: r["tokens"])
    smallest = min(rows, key=lambda r: r["tokens"])
    assert biggest["epochs_micro"] < 1000000 < smallest["epochs_micro"]
    by_tokens = sorted(rows, key=lambda r: r["tokens"])
    allocs = [r["alloc_tokens"] for r in by_tokens]
    assert allocs == sorted(allocs)  # order preserved
    # flattening: allocation ratios compress vs token ratios
    assert (
        biggest["alloc_tokens"] * smallest["tokens"]
        < biggest["tokens"] * smallest["alloc_tokens"]
    )


def test_ngram_novelty_semantics(spark, sf_dir):
    """X231: the first document is 100% novel by construction; totals
    reconcile (novelty_micro == (n_grams - n_seen)*1e6 div n_grams);
    and a doc that is a verbatim restatement of an earlier one scores
    0 novelty — checked on a planted copy."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.queries.curation import q_ngram_novelty

    rows = q_ngram_novelty(spark, sf_dir).collect()
    by_id = {r["doc_id"]: r for r in rows}
    first = by_id[min(by_id)]
    assert first["novelty_micro"] == 1000000 and first["n_seen"] == 0
    for r in rows:
        assert (
            r["novelty_micro"]
            == (r["n_grams"] - r["n_seen"]) * 1000000 // r["n_grams"]
        )
    # planted verbatim copy of doc 3 under a later id: every gram of
    # the copy already has first_doc == 3 < copy id → novelty 0
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copy = docs.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    from mysql_cdc_to_http_spark.operators.curation import (
        tokenize,
        word_ngrams_from_tokens,
    )

    corpus = docs.unionByName(copy)
    toks = corpus.select("doc_id", tokenize(F.col("text")).alias("t"))
    grams = (
        toks.select(
            "doc_id",
            F.explode(word_ngrams_from_tokens(F.col("t"), 5)).alias("g"),
        )
        .select("doc_id", F.md5("g").alias("h"))
        .distinct()
    )
    firsts = grams.groupBy("h").agg(F.min("doc_id").alias("fd"))
    copy_novel = (
        grams.filter(F.col("doc_id") == 10_000_003)
        .join(firsts, "h")
        .filter(F.col("fd") == 10_000_003)
        .count()
    )
    assert copy_novel == 0


def test_fightin_words_attribution(spark, sf_dir):
    """X232: the log-odds z-scores must attribute correctly — a word
    that appears ONLY in the target slice gets a positive z, one that
    appears only in the rest gets a negative z, and z respects the
    contrast direction (more target-skewed count ratio → higher z among
    words with comparable totals). Ranks are a permutation 1..V."""
    from mysql_cdc_to_http_spark.queries.curation import q_fightin_words

    rows = q_fightin_words(spark, sf_dir).collect()
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    only_t = [r for r in rows if r["c_rest"] == 0 and r["c_target"] > 0]
    only_r = [r for r in rows if r["c_target"] == 0 and r["c_rest"] > 0]
    for r in only_t:
        assert r["zscore"] > 0, r
    for r in only_r:
        assert r["zscore"] < 0, r
    # ordering consistent with the ranking column
    by_rank = sorted(rows, key=lambda r: r["rank"])
    zs = [r["zscore"] for r in by_rank]
    assert zs == sorted(zs, reverse=True)


def test_novelty_incremental_matches_oneshot(spark, sf_dir):
    """X237 identity: the fold-scored epoch-2 novelty must equal the
    one-shot q_ngram_novelty restricted to epoch-2 docs, row-exactly —
    the mergeable-store property (min is associative) that makes the
    fold a foreachBatch body."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.queries.curation import (
        q_ngram_novelty,
        q_novelty_incremental,
    )

    b = (
        load_table(spark, sf_dir, "documents")
        .agg(F.expr("max(doc_id) div 2"))
        .collect()[0][0]
    )
    got = {
        (r["doc_id"], r["n_grams"], r["n_seen"], r["novelty_micro"])
        for r in q_novelty_incremental(spark, sf_dir).collect()
    }
    want = {
        (r["doc_id"], r["n_grams"], r["n_seen"], r["novelty_micro"])
        for r in q_ngram_novelty(spark, sf_dir).collect()
        if r["doc_id"] >= b
    }
    assert got == want and got

"""Mergeable-sketch operators: HLL partials + rollup.

The 100 TB pattern these exist for: you cannot afford to re-scan a
petabyte to answer "distinct users last quarter" — you materialize a
small sketch per segment (day / partition / table) as data lands, then
answer any coarser rollup by UNIONING sketches, never re-reading rows.
Spark 3.5+ exposes Apache DataSketches HLL natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``), so
both levels stay JVM-side two-phase aggregates: partial sketches
combine map-side exactly like partial sums, and the union pass touches
only (groups × segments) sketch rows.

HLL register merge is lossless (register-wise max), so a rollup carries
the same information as sketching the raw data — but DataSketches'
ESTIMATES can differ slightly between the two paths (the union gadget
targets HLL_8 while a directly-built sketch defaults to HLL_4, and the
estimators differ at the margin; observed 988 vs 993 on 1000 true NDV).
Assertions on sketch output must therefore be error-bound, never
equality. Estimates ARE deterministic (pure function of the value set
and path), which is what makes an error-bound oracle stable (same
argument as q_agg_approx_distinct).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hll_partials(
    df: DataFrame,
    group_cols: list[str],
    segment_col,
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per (group, segment) — the materialized partial a
    pipeline writes alongside each ingested segment. lgk=12 → 4 KiB
    registers, rsd ≈ 1.6%; raise lgk only if the rollup bound needs it
    (the register file quadruples per +2)."""
    seg = segment_col if isinstance(segment_col, Column) else F.col(segment_col)
    return (
        df.groupBy(*group_cols, seg.alias("segment"))
        .agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"))
    )


def hll_rollup(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse per-segment sketches to a per-group NDV estimate by
    sketch union — never re-reads the base data. Output column
    ``ndv_est`` (long)."""
    return (
        partials.groupBy(*group_cols)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("ndv_est")
        )
    )


def hll_overlap(
    partials: DataFrame,
    group_cols: list[str],
    labels: tuple[str, str],
    set_col: str = "set_label",
) -> DataFrame:
    """Set-overlap estimates from per-set HLL sketches (X212): given
    partials carrying one sketch per (group, set_label) with the two
    ``labels`` per group, estimate |A|, |B|, |A∪B| and derive
    |A∩B| = max(0, |A| + |B| − |A∪B|) by inclusion–exclusion.

    This is the audience-overlap question ("how many users did BOTH
    campaigns reach?") answered from sketches alone — at 100 TB the
    two sides may be different quarters of the same petabyte table,
    and the intersection comes from merging kilobyte register files,
    never co-scanning the raw sets. One hash aggregate over the
    partials does all three estimates: per-set unions are conditional
    ``hll_union_agg`` over the SAME shuffle (``when`` passes null for
    the other label and union-agg skips nulls), so the plan is a
    single exchange on ``group_cols`` whatever the base data size.

    Error model callers must respect: the union estimate carries the
    sketch's rsd (~1.6% at lgk=12), so the DERIVED intersection's
    absolute error scales with |A∪B|, not |A∩B| — a tiny true overlap
    between huge sets can even estimate negative (clamped to 0 here).
    Assertions belong on |est∩ − exact∩| relative to the UNION size.

    Output per group: ``est_a``, ``est_b``, ``est_union``,
    ``est_intersection`` (longs).
    """
    # Labels are caller-supplied (schema knowledge, not data): resolving
    # them from the partials would cost a driver-side action on the
    # data path for something the pipeline already knows statically.
    a, b = labels

    def _est_for(label: str) -> Column:
        # NULL (not 0) when the label has NO partial in the group —
        # hll_sketch_estimate over an all-NULL union reports 0, which is
        # indistinguishable from an empty set; the explicit presence
        # count (same shuffle, same hash aggregate) disambiguates
        # (round-9 advice: a missing sketch must not read as zero
        # overlap).
        present = F.count(F.when(F.col(set_col) == label, 1)) > 0
        return F.when(
            present,
            F.hll_sketch_estimate(
                F.hll_union_agg(
                    F.when(F.col(set_col) == label, F.col("sketch"))
                )
            ),
        )

    est_a, est_b = _est_for(a).alias("est_a"), _est_for(b).alias("est_b")
    est_union = F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
        "est_union"
    )
    # NULL per-label estimates propagate into est_intersection (the old
    # unguarded form let ``greatest`` skip the NULL arithmetic and report
    # a plausible-looking 0 overlap for a label that was never sketched).
    return (
        partials.groupBy(*group_cols)
        .agg(est_a, est_b, est_union)
        .select(
            *group_cols,
            "est_a",
            "est_b",
            "est_union",
            F.when(
                F.col("est_a").isNotNull() & F.col("est_b").isNotNull(),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.col("est_a") + F.col("est_b") - F.col("est_union"),
                ),
            ).alias("est_intersection"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch: the mergeable FREQUENCY analog of the HLL rollup.
#
# Same 100 TB shape as hll_partials/hll_rollup: materialize one small
# sketch per ingested segment, answer any coarser "how often does key k
# appear?" by SUMMING sketches — never re-reading rows. Unlike the
# DataSketches HLL binary, this CMS is stored RELATIONALLY as
# (row_i, bucket, cnt) rows: merge is a plain SUM group-by (losslessly
# associative), the table is depth x width rows (model-sized — 4 x 512
# default = 2048 longs), and every step is portable integer arithmetic
# on md5 buckets (the engine's cross-engine determinism primitive, see
# operators/sampling.py:split_bucket), so an external SQL engine
# reproduces the sketch bit-for-bit and estimates can be EQUALITY-
# oracled, not just bound-checked.
#
# Guarantee carried by construction: estimate >= true count always
# (min over depth rows of an over-counted bucket); error above truth is
# bounded by collisions, shrinking as width grows.
# ---------------------------------------------------------------------------


def cms_bucket(
    value_col: Column, row_col: Column, width: int, salt: str = "cms-v1"
) -> Column:
    """Bucket of ``value`` under hash row ``row_i``: first 24 md5 bits
    of 'salt|row|value' mod width. Pure projection, reproducible in any
    engine with md5."""
    hex6 = F.substring(
        F.md5(
            F.concat_ws(
                "|", F.lit(salt), row_col.cast("string"), value_col.cast("string")
            )
        ),
        1,
        6,
    )
    return F.pmod(F.conv(hex6, 16, 10).cast("long"), F.lit(width))


def cms_partials(
    df: DataFrame,
    segment_col,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms-v1",
    weight_col: str | None = None,
) -> DataFrame:
    """One CMS per segment as (segment, row_i, bucket, cnt) rows.

    The explode(depth) blow-up never reaches the shuffle: partial
    aggregation collapses each map task to at most
    segments x depth x width rows before the exchange.

    ``weight_col``: when the input is already a (segment, value, count)
    pre-aggregate, sum that count instead of counting rows — the sketch
    is identical by associativity of SUM, and the explode runs over the
    (much smaller) aggregate instead of the fact table."""
    seg = segment_col if isinstance(segment_col, Column) else F.col(segment_col)
    cols = [
        seg.alias("segment"),
        F.col(value_col).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_i"),
    ]
    if weight_col is not None:
        cols.append(F.col(weight_col).alias("__w"))
    rows = df.select(*cols)
    agg = (
        F.count(F.lit(1)) if weight_col is None else F.sum("__w")
    ).alias("cnt")
    return rows.groupBy(
        "segment",
        "row_i",
        cms_bucket(F.col("__v"), F.col("row_i"), width, salt).alias("bucket"),
    ).agg(agg)


def cms_merge(partials: DataFrame) -> DataFrame:
    """Collapse per-segment sketches into one CMS by summation — the
    lossless merge that makes pre-aggregated segments answer any
    coarser frequency question without re-scanning base data."""
    return partials.groupBy("row_i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms-v1",
) -> DataFrame:
    """Point-frequency estimates for each probe value: min over the
    depth rows of that value's bucket counts. The sketch side is
    depth x width rows — broadcast, so probing is shuffle-free on the
    sketch and aggregates only probes x depth rows."""
    from pyspark.sql.functions import broadcast

    probe_rows = probes.select(
        F.col(value_col).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_i"),
    ).withColumn("bucket", cms_bucket(F.col("__v"), F.col("row_i"), width, salt))
    return (
        probe_rows.join(broadcast(cms), ["row_i", "bucket"], "left")
        .groupBy(F.col("__v").alias(value_col))
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("freq_est"))
    )


# --------------------------------------------------------------------------
# Bloom-style bitmap semi-join pruning (runtime-filter pattern)
# --------------------------------------------------------------------------
def bloom_bitmap(
    dim: DataFrame, key_col: str, m_bits: int = 1 << 20
) -> DataFrame:
    """Distributed bitmap over xxhash64(key) % m_bits of the build side:
    one row per occupied 64-bit word, ``(word, mask)``.

    Built as one two-phase hash aggregate (bit_or is map-side
    combinable) — the result is at most m_bits/64 rows (16 KiB of longs
    at the default 2^20 bits) regardless of the build side's row count.
    Nothing is collected to the driver; the bitmap stays a DataFrame
    and is BROADCAST by the probe (:func:`bloom_prefilter`).

    This is the explicit form of Spark's runtime bloom-filter injection
    (spark.sql.optimizer.runtime.bloomFilter.*): you need it when the
    optimizer can't see through the probe side (a pandas-UDF stage, a
    checkpointed intermediate, a non-SQL source) or when the filter
    must be REUSED across several queries — materialize the 16 KiB
    bitmap once, prune many scans.
    """
    h = F.pmod(F.xxhash64(F.col(key_col)), F.lit(m_bits))
    return (
        dim.select(h.alias("__h"))
        .select(
            (F.col("__h") / 64).cast("long").alias("word"),
            # shiftleft's amount must be a column here — expr form (the
            # PySpark wrapper only takes a Python int)
            F.expr("shiftleft(1L, cast(__h % 64 AS int))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
    )


def bloom_prefilter(
    probe: DataFrame, key_col: str, bitmap: DataFrame, m_bits: int = 1 << 20
) -> DataFrame:
    """Drop probe rows whose key cannot be in the build side: broadcast
    the word/mask bitmap, join on the key's word, test the key's bit.

    False positives pass (later exact join removes them); false
    negatives are impossible (every build key set its bit), so
    ``exact_join(bloom_prefilter(probe), dim) == exact_join(probe, dim)``
    — which is what makes the composed operator exactly oracle-able.
    The probe stream is filtered BEFORE any shuffle toward the real
    join: at 100 TB this is the difference between shuffling the whole
    fact table and shuffling only the ~selectivity fraction that can
    match.
    """
    h = F.pmod(F.xxhash64(F.col(key_col)), F.lit(m_bits))
    probed = probe.withColumn("__h", h).withColumn(
        "__word", (F.col("__h") / 64).cast("long")
    ).withColumn(
        "__bit", F.expr("shiftleft(1L, cast(__h % 64 AS int))")
    ).drop("__h")
    return (
        probed.join(
            F.broadcast(bitmap), probed["__word"] == bitmap["word"], "inner"
        )
        .filter(F.col("mask").bitwiseAND(F.col("__bit")) != 0)
        .drop("__word", "__bit", "word", "mask")
    )


def cms_join_size(
    cms_a: DataFrame, cms_b: DataFrame, depth: int = 4
) -> DataFrame:
    """Join-cardinality estimate from two count-min sketches built on
    the SAME (salt, depth, width): |A ⋈ B| on the sketched key is
    estimated by min over hash rows of Σ_buckets cntA·cntB (the
    AMS/CMS inner-product estimator; Cormode & Muthukrishnan §4.2).
    Overestimates, never underestimates — the same one-sided guarantee
    as point queries, so an optimizer using it for broadcast-vs-shuffle
    decisions errs toward the safe plan.

    Cost: the two sketches are (depth × width)-row tables whatever the
    inputs were; the estimate is one co-keyed join + two tiny
    aggregates. This is how you size a join's output BEFORE running
    it, with sketches cheap enough to keep per partition/day.
    Output: 1 row, ``est_join_size`` long.
    """
    prod = cms_a.alias("a").join(
        cms_b.alias("b"), ["row_i", "bucket"]
    ).select(
        "row_i", (F.col("a.cnt") * F.col("b.cnt")).alias("p")
    )
    per_row = prod.groupBy("row_i").agg(F.sum("p").alias("ip"))
    return per_row.agg(F.min("ip").cast("long").alias("est_join_size"))

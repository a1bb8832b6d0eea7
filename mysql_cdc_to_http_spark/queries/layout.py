"""Data-layout queries (round 10): physical-design operators whose whole
point is the 100 TB story — how rows are ARRANGED decides how much of
the table a selective query must scan, long before any executor runs.

X224 Z-order clustering: multi-dimensional cluster-by for min/max file
pruning (the Delta/Iceberg OPTIMIZE ZORDER primitive, and Databricks'
liquid-clustering ancestor), implemented as exact integer bit
interleaving so the layout decision itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.queries.registry import query

# 8 bits per dimension -> 16-bit z-value; 16 files via the top 4 z bits.
_ZBITS = 8
_NFILES = 16


def _bit(col: str, i: int) -> str:
    """bit i of a non-negative integer, in div/mod arithmetic that Spark
    and DuckDB evaluate identically (no shift-operator dialect drift)."""
    return f"(({col} div {1 << i}) % 2)"


def _z_expr(xb: str, yb: str) -> str:
    """Morton interleave of two {_ZBITS}-bit bucket ids: x in even bit
    positions, y in odd — a single codegen-able integer expression."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"{_bit(xb, i)} * {1 << (2 * i)}")
        terms.append(f"{_bit(yb, i)} * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _z_sql(xb: str, yb: str) -> str:
    """Same interleave for the DuckDB oracle (// instead of div)."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"(({xb} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({yb} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
WITH mx AS (
  SELECT MAX(l_partkey) AS maxp, MAX(l_suppkey) AS maxs,
         MAX(l_orderkey) AS maxo, COUNT(*) AS n_rows
  FROM lineitem
),
keyed AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         (l_partkey * 256) // (mx.maxp + 1) AS xb,
         (l_suppkey * 256) // (mx.maxs + 1) AS yb,
         (l_orderkey * {_NFILES}) // (mx.maxo + 1) AS linfile,
         mx.maxp, mx.maxs, mx.n_rows
  FROM lineitem, mx
),
zkeyed AS (
  SELECT *, ({_z_sql('xb', 'yb')}) // {1 << (2 * _ZBITS - 4)} AS zfile,
         -- box = bucket range [64, 128) on BOTH dims, expressed as raw-key
         -- thresholds that land exactly on bucket boundaries
         (pk >= (maxp + 4) // 4 AND pk < (maxp + 2) // 2
          AND sk >= (maxs + 4) // 4 AND sk < (maxs + 2) // 2) AS hit
  FROM keyed
),
stacked AS (
  SELECT 'linear' AS layout, linfile AS f, pk, sk, hit, n_rows FROM zkeyed
  UNION ALL
  SELECT 'zorder' AS layout, zfile AS f, pk, sk, hit, n_rows FROM zkeyed
),
files AS (
  SELECT layout, f, MIN(pk) AS pk_min, MAX(pk) AS pk_max,
         MIN(sk) AS sk_min, MAX(sk) AS sk_max,
         CAST(COUNT(*) AS BIGINT) AS rows_in_file,
         CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         MAX(n_rows) AS n_rows
  FROM stacked GROUP BY layout, f
),
boxed AS (
  SELECT files.*,
         NOT (pk_max < (mx.maxp + 4) // 4 OR pk_min >= (mx.maxp + 2) // 2
              OR sk_max < (mx.maxs + 4) // 4
              OR sk_min >= (mx.maxs + 2) // 2) AS scanned
  FROM files, mx
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS files_total,
       CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT)
         AS files_scanned,
       CAST(SUM(CASE WHEN scanned THEN rows_in_file ELSE 0 END) AS BIGINT)
         AS rows_scanned,
       CAST(SUM(hits) AS BIGINT) AS rows_matched,
       CAST(SUM(CASE WHEN scanned THEN rows_in_file ELSE 0 END) * 1000000
            // MAX(n_rows) AS BIGINT) AS scan_ratio_micro
FROM boxed
GROUP BY layout
ORDER BY layout
"""


@query("q_zorder_layout", oracle=_ZORDER_ORACLE)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X224 — Z-order (Morton) clustering with a min/max pruning audit:
    lay lineitem out in 16 files two ways — linear (orderkey ranges,
    what a naive ingest produces) vs z-ordered on (partkey, suppkey) —
    and measure how many files a 2-D box predicate must scan under
    standard parquet min/max file skipping. The z-order layout confines
    the box's rows to files whose (pk, sk) envelopes are tight in BOTH
    dimensions, so the same query scans ~1/16th of the data; the linear
    layout's files each span the full (pk, sk) domain and NOTHING can
    be skipped. This is the Delta/Iceberg ``OPTIMIZE ZORDER BY``
    decision, reproduced as exact arithmetic.

    Determinism/exactness: bucket ids are (key*256) div (max+1) on
    non-negative integers (Spark ``div`` == DuckDB ``//``); the Morton
    interleave is a pure integer polynomial (see _z_expr — div/mod
    bit extraction, no shift-operator dialect drift); the box thresholds
    are chosen to land exactly on bucket boundaries ((max+4) div 4,
    (max+2) div 2 = first keys of buckets 64 and 128), so file
    assignment, the scan decision, and every count are engine-exact
    integers — the layout policy itself is hash-oracled.

    Scale shape: ONE fact scan; the layout stack (explode to
    layout × file) doubles rows into a partial-aggregated groupBy on 32
    keys, then a 32-row rollup — the plan is scan → explode → two hash
    aggregates, no join, no window, no sort until the 2-row output. At
    100 TB the file stats table IS the table's min/max index (Delta log
    / Iceberg manifests); the audit costs one pass and the re-layout
    write itself would be ``repartitionByRange(zvalue)`` with the same
    z expression. Files here = 16 for a 16-cell z-grid; real tables set
    file count from target file size, not a constant."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.col("l_orderkey").alias("ok"),
    )
    mx = li.agg(
        F.max("pk").alias("maxp"),
        F.max("sk").alias("maxs"),
        F.max("ok").alias("maxo"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    keyed = li.crossJoin(F.broadcast(mx)).select(
        "pk",
        "sk",
        "maxp",
        "maxs",
        "n_rows",
        F.expr("(pk * 256) div (maxp + 1)").alias("xb"),
        F.expr("(sk * 256) div (maxs + 1)").alias("yb"),
        F.expr(f"(ok * {_NFILES}) div (maxo + 1)").alias("linfile"),
    )
    zkeyed = keyed.select(
        "pk",
        "sk",
        "maxp",
        "maxs",
        "n_rows",
        "linfile",
        F.expr(
            f"({_z_expr('xb', 'yb')}) div {1 << (2 * _ZBITS - 4)}"
        ).alias("zfile"),
        F.expr(
            "pk >= (maxp + 4) div 4 AND pk < (maxp + 2) div 2"
            " AND sk >= (maxs + 4) div 4 AND sk < (maxs + 2) div 2"
        ).alias("hit"),
    )
    stacked = zkeyed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.col("linfile").alias("f"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.col("zfile").alias("f"),
                ),
            )
        ).alias("lf"),
        "pk",
        "sk",
        "hit",
        "maxp",
        "maxs",
        "n_rows",
    ).select(
        F.col("lf.layout").alias("layout"),
        F.col("lf.f").alias("f"),
        "pk",
        "sk",
        "hit",
        "maxp",
        "maxs",
        "n_rows",
    )
    files = stacked.groupBy("layout", "f").agg(
        F.min("pk").alias("pk_min"),
        F.max("pk").alias("pk_max"),
        F.min("sk").alias("sk_min"),
        F.max("sk").alias("sk_max"),
        F.count(F.lit(1)).alias("rows_in_file"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("hits"),
        F.max("maxp").alias("maxp"),
        F.max("maxs").alias("maxs"),
        F.max("n_rows").alias("n_rows"),
    )
    boxed = files.withColumn(
        "scanned",
        ~(
            (F.col("pk_max") < F.expr("(maxp + 4) div 4"))
            | (F.col("pk_min") >= F.expr("(maxp + 2) div 2"))
            | (F.col("sk_max") < F.expr("(maxs + 4) div 4"))
            | (F.col("sk_min") >= F.expr("(maxs + 2) div 2"))
        ),
    )
    return (
        boxed.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_total"),
            F.sum(F.when(F.col("scanned"), 1).otherwise(0))
            .cast("long")
            .alias("files_scanned"),
            F.sum(F.when(F.col("scanned"), F.col("rows_in_file")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("hits").cast("long").alias("rows_matched"),
            F.expr(
                "CAST(sum(CASE WHEN scanned THEN rows_in_file ELSE 0 END)"
                " * 1000000 div max(n_rows) AS BIGINT)"
            ).alias("scan_ratio_micro"),
        )
        .orderBy("layout")
    )


# --------------------------------------------------------------------------
# X227 — rendezvous (highest-random-weight) sharding + rebalance audit:
# the shard-assignment policy that survives resizing. mod-N hashing
# reassigns ~(1 − stay%) of ALL keys when the shard count changes
# (16→20 keeps only keys with h%16 == h%20 — 20% of hash space);
# rendezvous hashing (Thaler & Ravishankar 1998) moves EXACTLY the keys
# whose argmax lands on a new shard — 4/20 = 20% expected, a 4× smaller
# reshuffle for the same resize, with no ring metadata (vs consistent
# hashing) and per-key O(shards) pure hashing.
# --------------------------------------------------------------------------
_RDV_OLD = 16
_RDV_NEW = 20


def _rdv_list_spark(n: int) -> str:
    # conv() returns STRING — the CAST inside the lambda is load-bearing:
    # without it array_max compares lexicographically, not numerically.
    return (
        f"transform(sequence(0, {n - 1}), s -> CAST(conv(substring(md5("
        f"concat_ws('|', 'rdv-v1', CAST(key AS STRING),"
        f" CAST(s AS STRING))), 1, 15), 16, 10) AS BIGINT))"
    )


def _rdv_list_sql(n: int) -> str:
    return (
        f"list_transform(range(0, {n}), s -> ('0x' || substr(md5("
        f"'rdv-v1|' || CAST(key AS VARCHAR) || '|' || CAST(s AS VARCHAR)"
        f"), 1, 15))::BIGINT)"
    )


_RDV_ORACLE = f"""
WITH keys AS (
  SELECT o_orderkey AS key FROM orders
),
weighted AS (
  SELECT key,
         ('0x' || substr(md5('rdvk|' || CAST(key AS VARCHAR)), 1, 15))::BIGINT
           AS h0,
         {_rdv_list_sql(_RDV_NEW)} AS w_new
  FROM keys
),
assigned AS (
  SELECT key, h0,
         list_indexof(w_new[1:{_RDV_OLD}],
           list_aggregate(w_new[1:{_RDV_OLD}], 'max')) - 1 AS rdv_old,
         list_indexof(w_new, list_aggregate(w_new, 'max')) - 1 AS rdv_new
  FROM weighted
),
stacked AS (
  SELECT 'mod' AS scheme, h0 % {_RDV_OLD} AS old_shard,
         h0 % {_RDV_NEW} AS new_shard FROM assigned
  UNION ALL
  SELECT 'rendezvous' AS scheme, rdv_old AS old_shard,
         rdv_new AS new_shard FROM assigned
),
loads AS (
  SELECT scheme, new_shard,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CASE WHEN old_shard <> new_shard THEN 1 ELSE 0 END)
              AS BIGINT) AS moved
  FROM stacked GROUP BY scheme, new_shard
)
SELECT scheme,
       CAST(SUM(cnt) AS BIGINT) AS rows_total,
       CAST(SUM(moved) AS BIGINT) AS rows_moved,
       CAST(SUM(moved) * 1000000 // SUM(cnt) AS BIGINT)
         AS moved_ratio_micro,
       CAST(COUNT(*) AS BIGINT) AS shards_used,
       CAST(MAX(cnt) * {_RDV_NEW} * 1000000 // SUM(cnt) AS BIGINT)
         AS max_load_micro
FROM loads
GROUP BY scheme
ORDER BY scheme
"""


@query("q_rendezvous_shards", oracle=_RDV_ORACLE)
def q_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X227 — rendezvous-hash shard assignment with a 16→20 resize
    audit: per scheme, how many rows a resize forces to move
    (moved_ratio_micro) and how balanced the new assignment is
    (max_load_micro = heaviest shard × shards ÷ rows; 1 000 000 ==
    perfectly even). mod-N moves ~80 % of every key on this resize
    (h%16 == h%20 only for 16/80ths of hash space); rendezvous moves
    ~20 % — exactly the keys whose highest-random-weight shard is one
    of the 4 new ones — the minimum any stateless policy can achieve.

    Exactness: every weight is the md5→15-hex→long primitive; argmax =
    array_position(array_max) — 60-bit weights make ties impossible in
    practice and both engines resolve a tie to the FIRST position of
    the same value list, so the assignment is engine-exact; ratios are
    integer micro-unit divisions of non-negatives.

    Scale shape: assignment is a pure PROJECTION — per key, O(shards)
    hashes inside one codegen'd higher-order function; NO shuffle until
    the 40-group (scheme × shard) load aggregate and the 2-row rollup.
    At 10⁹ keys × 1000 shards the per-key argmax list is the only cost
    that grows; production systems cut it with a two-level (rack →
    shard) rendezvous tree — same operator, composed twice. The audit
    is what you run BEFORE a resize to size the data motion it will
    cause (shard migration at 100 TB is the expensive step)."""
    # Repartition the bare key column before the hash-heavy projection:
    # the shuffle moves only 8 bytes/row, but a small parquet file scans
    # as ONE split, which would serialize all O(keys x shards) md5 work
    # onto a single core. At cluster scale the scan is already split by
    # maxPartitionBytes and this exchange stays proportional to the key
    # column, never the table.
    keys = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("key"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # Materialize the 20-slot weight list ONCE per key; the 16-slot list
    # is its prefix (same hash formula, s = 0..15), so the resize audit
    # costs 20 md5 evaluations per key, not 2x(16+20) as it would if the
    # transform(...) were re-stated inside both array_position and
    # array_max (codegen does not CSE across those call sites).
    weighted = keys.select(
        "key",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit("rdvk"), F.col("key"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h0"),
        F.expr(_rdv_list_spark(_RDV_NEW)).alias("w_new"),
    ).withColumn("w_old", F.slice(F.col("w_new"), 1, _RDV_OLD))
    assigned = weighted.select(
        "key",
        "h0",
        (F.array_position(F.col("w_old"), F.array_max(F.col("w_old"))) - 1)
        .cast("long")
        .alias("rdv_old"),
        (F.array_position(F.col("w_new"), F.array_max(F.col("w_new"))) - 1)
        .cast("long")
        .alias("rdv_new"),
    )
    stacked = assigned.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("mod").alias("scheme"),
                    (F.col("h0") % _RDV_OLD).alias("old_shard"),
                    (F.col("h0") % _RDV_NEW).alias("new_shard"),
                ),
                F.struct(
                    F.lit("rendezvous").alias("scheme"),
                    F.col("rdv_old").alias("old_shard"),
                    F.col("rdv_new").alias("new_shard"),
                ),
            )
        ).alias("s")
    ).select("s.scheme", "s.old_shard", "s.new_shard")
    loads = stacked.groupBy("scheme", "new_shard").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(
            F.when(F.col("old_shard") != F.col("new_shard"), 1).otherwise(0)
        )
        .cast("long")
        .alias("moved"),
    )
    return (
        loads.groupBy("scheme")
        .agg(
            F.sum("cnt").cast("long").alias("rows_total"),
            F.sum("moved").cast("long").alias("rows_moved"),
            F.expr(
                "CAST(sum(moved) * 1000000 div sum(cnt) AS BIGINT)"
            ).alias("moved_ratio_micro"),
            F.count(F.lit(1)).cast("long").alias("shards_used"),
            F.expr(
                f"CAST(max(cnt) * {_RDV_NEW} * 1000000 div sum(cnt)"
                " AS BIGINT)"
            ).alias("max_load_micro"),
        )
        .orderBy("scheme")
    )


# --------------------------------------------------------------------------
# X270 — skew salt planner: from the per-key histogram, compute which
# keys exceed the per-task row cap, the salt factor each needs
# (ceil(count/cap)), and the projected max task load before and after
# salting — the plan a shuffle-skew mitigation actually executes
# (X60's q_agg_salted/q_join_salted apply a fixed salt; this derives
# the per-key factor FROM the data, which is how production salting
# is sized). Cap = ceil(avg_key_count) * 5 // 4: "no key more than
# 1.25x the average", a relative rule that scales with the corpus
# instead of hardcoding a row count.
# --------------------------------------------------------------------------
@query(
    "q_salt_plan",
    oracle="""
    WITH hist AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    cap_t AS (
      SELECT CAST((SUM(cnt) + COUNT(*) - 1) // COUNT(*) * 5 // 4 AS BIGINT)
               AS cap,
             CAST(MAX(cnt) AS BIGINT) AS max_before
      FROM hist
    )
    SELECT h.user_id,
           h.cnt,
           c.cap,
           CAST((h.cnt + c.cap - 1) // c.cap AS BIGINT) AS salt_factor,
           CAST((h.cnt + ((h.cnt + c.cap - 1) // c.cap) - 1)
                // ((h.cnt + c.cap - 1) // c.cap) AS BIGINT)
             AS max_after_split,
           c.max_before
    FROM hist h, cap_t c
    WHERE h.cnt > c.cap
    ORDER BY h.cnt DESC, h.user_id
    """,
)
def q_salt_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X270 — data-derived salting plan: hot keys (count > 1.25x the
    average), each key's ceil-division salt factor, and the projected
    per-salt load after splitting.

    Determinism: the histogram, cap, factors, and projections are all
    exact integer ceil divisions ((a + b - 1) div b). Scale shape:
    one key-grouped counting aggregate (map-side partials) + a 1-row
    broadcast cap — the planner costs one pass over the keys, and its
    output is exactly the broadcast map a salted repartition consumes.
    Reference analog: none (main.go has no shuffle to salt)."""
    events = load_table(spark, sf_dir, "events")
    hist = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cap_t = hist.agg(
        F.expr(
            "CAST((SUM(cnt) + COUNT(*) - 1) div COUNT(*) * 5 div 4"
            " AS BIGINT)"
        ).alias("cap"),
        F.max("cnt").cast("long").alias("max_before"),
    )
    return (
        hist.crossJoin(F.broadcast(cap_t))
        .filter(F.col("cnt") > F.col("cap"))
        .select(
            "user_id",
            "cnt",
            "cap",
            F.expr("CAST((cnt + cap - 1) div cap AS BIGINT)").alias(
                "salt_factor"
            ),
            F.expr(
                "CAST((cnt + ((cnt + cap - 1) div cap) - 1)"
                " div ((cnt + cap - 1) div cap) AS BIGINT)"
            ).alias("max_after_split"),
            "max_before",
        )
        .orderBy(F.desc("cnt"), F.asc("user_id"))
    )


# --------------------------------------------------------------------------
# X325 — Hilbert-curve clustering vs Z-order on the identical box
# workload: the Hilbert index (the Wikipedia xy2d form: per-level
# quadrant digit (3·rx) XOR ry, reflect-then-swap rotation, n−1−v
# reflection) preserves locality strictly better than Morton — no
# diagonal jumps — so min/max file envelopes are tighter and box
# queries scan fewer files (this is why Delta Lake moved liquid
# clustering from Z-order to Hilbert). Implemented as 8 unrolled
# integer iterations (div/mod bit tests, CASE rotations — no shift
# dialect drift), identical expression chain in both engines.
# --------------------------------------------------------------------------
def _hilbert_stage_sql(
    i: int, prev: str, name: str,
    carry: str = "pk, sk, xb, yb, linfile, zfile, hit, maxp, maxs, n_rows",
) -> str:
    """One xy2d iteration as a DuckDB CTE: consumes hx/hy/hd from
    ``prev``, emits the rotated hx/hy and accumulated hd."""
    s = 1 << i
    n1 = (1 << _ZBITS) - 1
    return f"""
    {name} AS (
      SELECT {carry},
             CASE WHEN ((hy // {s}) % 2) = 0 THEN
               CASE WHEN ((hx // {s}) % 2) = 1 THEN {n1} - hy ELSE hy END
             ELSE hx END AS hx,
             CASE WHEN ((hy // {s}) % 2) = 0 THEN
               CASE WHEN ((hx // {s}) % 2) = 1 THEN {n1} - hx ELSE hx END
             ELSE hy END AS hy,
             hd + {s * s} * (CASE WHEN ((hx // {s}) % 2) = 0
                             THEN ((hy // {s}) % 2)
                             ELSE 3 - ((hy // {s}) % 2) END) AS hd
      FROM {prev}
    )"""


def _hilbert_oracle() -> str:
    stages = []
    prev = "seed"
    for idx, i in enumerate(range(_ZBITS - 1, -1, -1)):
        name = f"h{idx}"
        stages.append(_hilbert_stage_sql(i, prev, name))
        prev = name
    chain = ",".join(stages)
    cstages = []
    cell_prev = "cellseed"
    for idx, i in enumerate(range(_ZBITS - 1, -1, -1)):
        name = f"c{idx}"
        cstages.append(
            _hilbert_stage_sql(i, cell_prev, name, carry="cx, cy")
        )
        cell_prev = name
    cell_chain = ",".join(cstages)
    return f"""
    WITH mx AS (
      SELECT MAX(l_partkey) AS maxp, MAX(l_suppkey) AS maxs,
             COUNT(*) AS n_rows
      FROM lineitem
    ),
    keyed AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             (l_partkey * 256) // (mx.maxp + 1) AS xb,
             (l_suppkey * 256) // (mx.maxs + 1) AS yb,
             0 AS linfile,
             mx.maxp, mx.maxs, mx.n_rows
      FROM lineitem, mx
    ),
    seed AS (
      SELECT pk, sk, xb, yb, linfile,
             ({_z_sql('xb', 'yb')}) // {1 << (2 * _ZBITS - 4)} AS zfile,
             (pk >= (maxp + 4) // 4 AND pk < (maxp + 2) // 2
              AND sk >= (maxs + 4) // 4 AND sk < (maxs + 2) // 2) AS hit,
             maxp, maxs, n_rows,
             xb AS hx, yb AS hy, 0 AS hd
      FROM keyed
    ),{chain},
    stacked AS (
      SELECT 'hilbert' AS layout, hd // {1 << (2 * _ZBITS - 4)} AS f,
             pk, sk, hit, maxp, maxs, n_rows
      FROM {prev}
      UNION ALL
      SELECT 'zorder' AS layout, zfile AS f, pk, sk, hit,
             maxp, maxs, n_rows
      FROM {prev}
    ),
    files AS (
      SELECT layout, f, MIN(pk) AS pk_min, MAX(pk) AS pk_max,
             MIN(sk) AS sk_min, MAX(sk) AS sk_max,
             CAST(COUNT(*) AS BIGINT) AS rows_in_file,
             CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hits,
             MAX(maxp) AS maxp, MAX(maxs) AS maxs, MAX(n_rows) AS n_rows
      FROM stacked GROUP BY layout, f
    ),
    boxed AS (
      SELECT files.*,
             NOT (pk_max < (maxp + 4) // 4 OR pk_min >= (maxp + 2) // 2
                  OR sk_max < (maxs + 4) // 4
                  OR sk_min >= (maxs + 2) // 2) AS scanned
      FROM files
    ),
    fileaudit AS (
      SELECT layout,
             CAST(COUNT(*) AS BIGINT) AS files_total,
             CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned,
             CAST(SUM(CASE WHEN scanned THEN rows_in_file ELSE 0 END)
                  AS BIGINT) AS rows_scanned,
             CAST(SUM(hits) AS BIGINT) AS rows_matched,
             CAST(SUM(CASE WHEN scanned THEN rows_in_file ELSE 0 END)
                  * 1000000 // MAX(n_rows) AS BIGINT) AS scan_ratio_micro
      FROM boxed
      GROUP BY layout
    ),
    cellseed AS (
      SELECT x.x AS cx, y.y AS cy,
             x.x AS hx, y.y AS hy, 0 AS hd
      FROM (SELECT unnest(range(90, 150)) AS x) x
      CROSS JOIN (SELECT unnest(range(90, 150)) AS y) y
    ),{cell_chain},
    celld AS (
      SELECT 'hilbert' AS layout, hd AS d FROM {cell_prev}
      UNION ALL
      SELECT 'zorder' AS layout, ({_z_sql('cx', 'cy')}) AS d
      FROM {cell_prev}
    ),
    gaps AS (
      SELECT layout, d,
             d - lag(d) OVER (PARTITION BY layout ORDER BY d) AS delta
      FROM celld
    ),
    segaudit AS (
      SELECT layout, CAST(count(*) AS BIGINT) AS box_cells,
             CAST(1 + SUM(CASE WHEN delta > 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS box_segments
      FROM gaps GROUP BY layout
    )
    SELECT fileaudit.*, segaudit.box_cells, segaudit.box_segments
    FROM fileaudit JOIN segaudit USING (layout)
    ORDER BY layout
    """


@query("q_hilbert_layout", oracle=_hilbert_oracle())
def q_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X325 — Hilbert vs Z-order file layout under the X224 box audit.

    Determinism/exactness: the Hilbert index is 8 unrolled xy2d
    iterations of pure integer arithmetic (bit tests by div/mod,
    quadrant digit by CASE — the (3·rx) XOR ry truth table written
    out — reflection by 255−v, rotation by column swap), identical in
    both engines; bucketization, the box thresholds, file assignment
    and every count reuse X224's exact-integer machinery, so the
    whole layout decision hash-matches.

    Two audits: (1) the X224 min/max file-pruning box — at
    power-of-4 file counts both curves grid-align into the SAME 4×4
    cells, so they tie (measured: identical scans; the expected
    result, and an honest one); (2) the SEGMENT audit — the
    off-aligned bucket box [90,150)², enumerated data-independently
    (3600 cells), counts the contiguous index ranges (range-reads /
    seeks) the box maps to under each curve, which is where the
    published Hilbert advantage lives: 47 segments vs Morton's 88 on
    this box (pinned by test) — half the seeks for every such scan.

    Scale shape: ONE fact scan; the 8 iterations are row-local
    integer expressions inside whole-stage codegen (no join, no
    shuffle before the 32-key aggregate); the file audit is the same
    explode-free two-aggregate stack as X224; the segment audit is a
    3600-row generated grid + one tiny window. At 100 TB the
    re-layout write is ``repartitionByRange(hvalue)`` with this
    expression — which is exactly how Delta's liquid clustering
    orders files. Presentation output is 2 rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
    )
    mx = li.agg(
        F.max("pk").alias("maxp"),
        F.max("sk").alias("maxs"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    n1 = (1 << _ZBITS) - 1
    df = li.crossJoin(F.broadcast(mx)).select(
        "pk",
        "sk",
        "maxp",
        "maxs",
        "n_rows",
        F.expr("(pk * 256) div (maxp + 1)").alias("xb"),
        F.expr("(sk * 256) div (maxs + 1)").alias("yb"),
        F.expr(
            "(pk >= (maxp + 4) div 4 AND pk < (maxp + 2) div 2"
            " AND sk >= (maxs + 4) div 4 AND sk < (maxs + 2) div 2)"
        ).alias("hit"),
    )
    df = df.withColumn(
        "zfile",
        F.expr(f"({_z_expr('xb', 'yb')}) div {1 << (2 * _ZBITS - 4)}"),
    )
    df = (
        df.withColumn("hx", F.col("xb"))
        .withColumn("hy", F.col("yb"))
        .withColumn("hd", F.lit(0))
    )
    for i in range(_ZBITS - 1, -1, -1):
        s = 1 << i
        df = df.select(
            "pk", "sk", "maxp", "maxs", "n_rows", "hit", "zfile",
            F.expr(
                f"CASE WHEN ((hy div {s}) % 2) = 0 THEN"
                f" CASE WHEN ((hx div {s}) % 2) = 1"
                f" THEN {n1} - hy ELSE hy END"
                f" ELSE hx END"
            ).alias("nhx"),
            F.expr(
                f"CASE WHEN ((hy div {s}) % 2) = 0 THEN"
                f" CASE WHEN ((hx div {s}) % 2) = 1"
                f" THEN {n1} - hx ELSE hx END"
                f" ELSE hy END"
            ).alias("nhy"),
            F.expr(
                f"hd + {s * s} * (CASE WHEN ((hx div {s}) % 2) = 0"
                f" THEN ((hy div {s}) % 2)"
                f" ELSE 3 - ((hy div {s}) % 2) END)"
            ).alias("hd"),
        ).withColumnsRenamed({"nhx": "hx", "nhy": "hy"})
    stacked = df.select(
        F.lit("hilbert").alias("layout"),
        F.expr(f"hd div {1 << (2 * _ZBITS - 4)}").alias("f"),
        "pk", "sk", "hit", "maxp", "maxs", "n_rows",
    ).unionByName(
        df.select(
            F.lit("zorder").alias("layout"),
            F.col("zfile").alias("f"),
            "pk", "sk", "hit", "maxp", "maxs", "n_rows",
        )
    )
    files = stacked.groupBy("layout", "f").agg(
        F.min("pk").alias("pk_min"),
        F.max("pk").alias("pk_max"),
        F.min("sk").alias("sk_min"),
        F.max("sk").alias("sk_max"),
        F.count(F.lit(1)).cast("long").alias("rows_in_file"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0))
        .cast("long")
        .alias("hits"),
        F.max("maxp").alias("maxp"),
        F.max("maxs").alias("maxs"),
        F.max("n_rows").alias("n_rows"),
    )
    boxed = files.withColumn(
        "scanned",
        F.expr(
            "NOT (pk_max < (maxp + 4) div 4 OR pk_min >= (maxp + 2) div 2"
            " OR sk_max < (maxs + 4) div 4"
            " OR sk_min >= (maxs + 2) div 2)"
        ),
    )
    fileaudit = boxed.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("files_total"),
        F.sum(F.when(F.col("scanned"), 1).otherwise(0))
        .cast("long")
        .alias("files_scanned"),
        F.sum(F.when(F.col("scanned"), F.col("rows_in_file")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("hits").cast("long").alias("rows_matched"),
        F.expr(
            "CAST(SUM(CASE WHEN scanned THEN rows_in_file ELSE 0 END)"
            " * 1000000 div MAX(n_rows) AS BIGINT)"
        ).alias("scan_ratio_micro"),
    )
    # segment audit: the off-aligned bucket box [90, 150)^2, enumerated
    # data-independently (3600 cells) — how many CONTIGUOUS index
    # ranges (range-reads / seeks) the box maps to under each curve
    from pyspark.sql.window import Window as W

    cells = (
        spark.range(90, 150)
        .select(F.col("id").cast("int").alias("cx"))
        .crossJoin(
            spark.range(90, 150).select(F.col("id").cast("int").alias("cy"))
        )
        .withColumn("hx", F.col("cx"))
        .withColumn("hy", F.col("cy"))
        .withColumn("hd", F.lit(0))
    )
    for i in range(_ZBITS - 1, -1, -1):
        s = 1 << i
        cells = cells.select(
            "cx",
            "cy",
            F.expr(
                f"CASE WHEN ((hy div {s}) % 2) = 0 THEN"
                f" CASE WHEN ((hx div {s}) % 2) = 1"
                f" THEN {n1} - hy ELSE hy END"
                f" ELSE hx END"
            ).alias("nhx"),
            F.expr(
                f"CASE WHEN ((hy div {s}) % 2) = 0 THEN"
                f" CASE WHEN ((hx div {s}) % 2) = 1"
                f" THEN {n1} - hx ELSE hx END"
                f" ELSE hy END"
            ).alias("nhy"),
            F.expr(
                f"hd + {s * s} * (CASE WHEN ((hx div {s}) % 2) = 0"
                f" THEN ((hy div {s}) % 2)"
                f" ELSE 3 - ((hy div {s}) % 2) END)"
            ).alias("hd"),
        ).withColumnsRenamed({"nhx": "hx", "nhy": "hy"})
    celld = cells.select(
        F.lit("hilbert").alias("layout"), F.col("hd").alias("d")
    ).unionByName(
        cells.select(
            F.lit("zorder").alias("layout"),
            F.expr(_z_expr("cx", "cy")).alias("d"),
        )
    )
    gaps = celld.select(
        "layout",
        "d",
        (
            F.col("d")
            - F.lag("d").over(W.partitionBy("layout").orderBy("d"))
        ).alias("delta"),
    )
    segaudit = gaps.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("box_cells"),
        (
            F.lit(1)
            + F.sum(F.when(F.col("delta") > 1, 1).otherwise(0))
        )
        .cast("long")
        .alias("box_segments"),
    )
    return fileaudit.join(segaudit, "layout").orderBy("layout")

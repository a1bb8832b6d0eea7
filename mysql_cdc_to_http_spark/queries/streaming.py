"""Streaming queries (SURVEY X3, X28-X33) + queue/HTTP delivery (R11-R13).

Real Structured Streaming executions driven synchronously: file sources
replayed in deterministic micro-batches (range-partitioned files +
``maxFilesPerTrigger=1``), memory sinks, ``processAllAvailable``. The
windowed aggregations are rows-only checks (streaming isn't
SQL-expressible for DuckDB); the latest-state merge and queue path have
batch twins that ARE oracle-checked.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from mysql_cdc_to_http_spark.catalog import load_table
from mysql_cdc_to_http_spark.operators.envelope import extract_table_name, serialize
from mysql_cdc_to_http_spark.operators.routing import group_filter
from mysql_cdc_to_http_spark.queries.cdc import _EV, _flat_events
from mysql_cdc_to_http_spark.queries.registry import query
from mysql_cdc_to_http_spark.sources.queue import dequeue_batch, enqueue_batch
from mysql_cdc_to_http_spark.streaming.latest_state import latest_state
from mysql_cdc_to_http_spark.streaming.windows import (
    session_counts,
    sliding_counts,
    tumbling_counts,
)


def _cache_dir(kind: str, sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    # v2: ts materialized as TIMESTAMP (LTZ) — caches written by sessions
    # that read events.ts as NTZ (pre-normalization) must not be reused,
    # since withWatermark rejects NTZ event time.
    return os.path.join(
        tempfile.gettempdir(), "spark_graft_stream_v2", f"{kind}_{tag}"
    )


def _events_stream_dir(
    spark: SparkSession, sf_dir: str, n_files: int = 2, dup: bool = False
) -> str:
    """Materialize events as N range-partitioned parquet files — a
    replayable stream where file order follows event_id order.

    n_files default 4 → 2 (r15 verdict #5): the per-micro-batch
    machinery is the file-based stream queries' measured floor —
    profiled on q_stream_tumbling at sf0.1: triggerExecution ≈ 650 ms
    PER BATCH (addBatch ≈ 450 ms + latestOffset/walCommit/
    commitOffsets/planning ≈ 200 ms), flat in input rows at this
    scale, so batch count IS the cost. Two files keep every
    cross-batch semantic exercised — state built in batch 1 is merged
    /expired/deduplicated against batch 2, the watermark steps once
    mid-stream, and the no-data flush still finalizes — while halving
    the scheduling floor; the emitted-set contracts (final-watermark
    -gated) are batch-count-invariant by the same argument that took
    the stream-stream trio to one data batch (r10→r12). Multi-batch
    stepping (4+ batches) remains exercised by bench_stream's soak
    and kill/resume lanes, which replay 8-file feeds."""
    from mysql_cdc_to_http_spark.sources.cdc import materialize_ordered_buckets

    kind = "events_dup" if dup else "events"
    # layout-addressed cache: a stale staged tree from a different
    # n_files default must never be served (the dir name used to be
    # count-blind; changing the default would silently replay 4 files)
    out = _cache_dir(f"{kind}_n{n_files}", sf_dir)
    # ADVICE r8 (race class): stage into a private mkdtemp, then
    # atomically os.rename the COMPLETE tree into place — a concurrent
    # session either wins the rename or discards its staging copy, and
    # readers never observe a half-written data/ dir.
    done = os.path.join(out, "_done")
    if not os.path.exists(done):
        import shutil
        import tempfile as _tf

        parent = os.path.dirname(out)
        os.makedirs(parent, exist_ok=True)
        stage = _tf.mkdtemp(prefix=f"_stage_{kind}_", dir=parent)
        ev = load_table(spark, sf_dir, "events")
        if dup:
            ev = ev.unionByName(ev)  # every event twice → dedup target
        materialize_ordered_buckets(
            ev,
            order_col="event_id",
            out_dir=os.path.join(stage, "data"),
            n_files=n_files,
            fmt="parquet",
        )
        with open(os.path.join(stage, "_done"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(stage, out)
        except OSError:
            # `out` appeared meanwhile. Only trust it if COMPLETE (_done
            # inside the published tree — round-9 advice: a stale partial
            # from an old-format crash would otherwise be served forever);
            # else evict the partial and retry the swap once.
            if os.path.exists(done):
                shutil.rmtree(stage, ignore_errors=True)
            else:
                try:
                    old = _tf.mkdtemp(prefix=f"_old_{kind}_", dir=parent)
                    os.rename(out, os.path.join(old, "x"))
                    shutil.rmtree(old, ignore_errors=True)
                    os.rename(stage, out)
                except OSError:
                    shutil.rmtree(stage, ignore_errors=True)
                    # Retry can fail for a non-race reason (EXDEV, perms)
                    # AFTER the partial tree was renamed away — verify the
                    # publish landed; re-raise instead of returning a path
                    # that may no longer exist (round-10 advice).
                    if not os.path.exists(done):
                        raise
    return out


def _stream_events(
    spark: SparkSession,
    sf_dir: str,
    dup: bool = False,
    files_per_trigger: int = 1,
    n_files: int = 2,
) -> DataFrame:
    """``files_per_trigger`` sets micro-batch granularity. Default 1 (one
    file per batch) maximizes cross-batch semantics — late-data drops,
    per-batch watermark steps — and is what the order-sensitive queries
    (q_stream_watermark, dedup, sessionization) require. The stream-stream
    join trio passes 4 (ONE data batch + the no-data flush): the emitted
    set of a watermarked interval join is decided by the FINAL watermark —
    the flush batch emits every expired null row — so the batch count
    changes scheduling floors, never results. r10 halved 4 batches to 2
    (20.1 → 14.1 s); r12 takes the same argument to its fixed point, one
    data batch, because the per-batch state-store commit across the 5
    stateful stages IS the trio's cost (round-10 verdict #4 / round-11
    verdict #6: pure scheduling floor, 4.7% of the suite). Cross-batch
    state buffering remains exercised by every files_per_trigger=1 query
    above; the trio's contract is the watermark-gated emitted SET, which
    the oracles hash in full."""
    out = _events_stream_dir(spark, sf_dir, n_files=n_files, dup=dup)
    schema = spark.read.parquet(os.path.join(out, "data")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(os.path.join(out, "data"))
    )


def _run_to_memory(
    df: DataFrame, name: str, mode: str, state_partitions: int = 8
) -> DataFrame:
    spark = df.sparkSession
    # The shuffle-partition count at stream start is locked into the
    # state-store layout; a harness session default of 200 would mean
    # 200 tiny state partitions per micro-batch on toy data. Pin a sane
    # count for the run, restore after. r9: 16 → 8 — the r8-verdict-#5
    # latency probe (bench_stream.bench_ss_join_outer_latency) showed
    # per-batch STATE-STORE COMMIT across partitions is the stateful
    # floor (symmetricHashJoin commit ≈ 73 s summed over 5 batches ×
    # 16 partitions at sf0.1); halving partitions cut the outer join
    # 10.1 → 6.1 s with byte-identical results. At real scale this is
    # the same knob sized UP to state volume instead. r12: the
    # stream-stream trio passes 4 — five stateful stages x per-partition
    # commit is its entire cost, and its state (one watermark horizon of
    # events) fits 4 partitions with headroom at every test SF.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


# --------------------------------------------------------------------------
# X3 — streaming file source
# --------------------------------------------------------------------------
@query(
    "q_stream_file_source",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_stream_file_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming counts over the file-replayed feed must equal the batch
    aggregate — complete-mode streaming IS batch semantics, so the DuckDB
    oracle applies directly."""
    ev = _stream_events(spark, sf_dir)
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return _run_to_memory(counts, "mem_file_source", "complete")


# --------------------------------------------------------------------------
# X405 — the CDC feed consumed through the CUSTOM Python streaming
# DataSource (sources/pyds.py:CdcFeedStreamReader): X209's batch
# connector completed with real offset management — the reference's
# resume-from-binlog-position loop (main.go RunFrom) at Spark's
# streaming connector seam.
# --------------------------------------------------------------------------
@query(
    "q_python_stream_source",
    oracle=_EV
    + """
    SELECT tbl, op, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(offset_id) AS min_offset, MAX(offset_id) AS max_offset
    FROM ev
    GROUP BY tbl, op ORDER BY tbl, op
    """,
)
def q_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X405 — spark.readStream.format("graft_cdc"): the envelope feed
    through the full DataSourceStreamReader API — {"file", "line"}
    offsets (the binlog-position analog), file-slice partition
    planning per micro-batch, checkpoint-WAL replay. Complete-mode
    counts against the same source-of-truth oracle as the batch
    connector (X209): the hash certifies every line of every file was
    delivered exactly once THROUGH THE STREAMING PATH. Kill-mid-feed
    resume with incremental file arrival is pinned separately in
    tests/test_round16.py (files landing after the stream starts form
    later micro-batches — the production tail-the-directory shape)."""
    from mysql_cdc_to_http_spark.sources import pyds
    from mysql_cdc_to_http_spark.sources.cdc import (
        ENVELOPE_SCHEMA,
        write_event_files,
    )

    events_dir = write_event_files(spark, sf_dir)
    pyds.register(spark)
    raw = (
        spark.readStream.format("graft_cdc")
        .option("path", os.path.join(events_dir, "data"))
        .load()
    )
    env = raw.select(
        F.from_json(F.col("value"), ENVELOPE_SCHEMA).alias("e")
    ).select(
        F.col("e.source.table").alias("tbl"),
        F.col("e.op").alias("op"),
        F.col("e.offset").alias("offset_id"),
    )
    agg = env.groupBy("tbl", "op").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("offset_id").alias("min_offset"),
        F.max("offset_id").alias("max_offset"),
    )
    return _run_to_memory(agg, "mem_pyds_stream", "complete")


# --------------------------------------------------------------------------
# X28-X30 — tumbling / sliding / session windows
# --------------------------------------------------------------------------
@query(
    "q_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start,
           time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes'
             AS win_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = tumbling_counts(_stream_events(spark, sf_dir))
    return _run_to_memory(agg, "mem_tumbling", "complete")


@query(
    "q_stream_sliding",
    oracle="""
    WITH cand AS (
      SELECT event_type, ts,
             unnest([time_bucket(INTERVAL '5 minutes', ts),
                     time_bucket(INTERVAL '5 minutes', ts)
                       - INTERVAL '5 minutes']) AS ws
      FROM events
    )
    SELECT ws AS win_start, ws + INTERVAL '10 minutes' AS win_end,
           event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM cand
    WHERE ts >= ws AND ts < ws + INTERVAL '10 minutes'
    GROUP BY 1, 2, 3 ORDER BY 1, 3
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event lands in width/slide = 2 windows; the oracle expands
    both candidate starts per event and re-filters."""
    agg = sliding_counts(_stream_events(spark, sf_dir))
    return _run_to_memory(agg, "mem_sliding", "complete")


@query(
    "q_stream_session",
    oracle="""
    WITH w AS (SELECT max(ts) - INTERVAL '10 minutes' AS wm FROM events),
    o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    ),
    g AS (
      SELECT user_id,
             min(ts) AS sess_start,
             max(ts) + INTERVAL '30 minutes' AS sess_end,
             CAST(count(*) AS BIGINT) AS n_events
      FROM s GROUP BY user_id, sid
    )
    SELECT sess_start, sess_end, user_id, n_events
    FROM g, w
    WHERE g.sess_end <= w.wm
    ORDER BY user_id, sess_start
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode session windows (30-min gap per user) under a 10-min
    watermark. The replay is deterministic (ts is monotone in the file
    order) and Spark runs no-data micro-batches to finalize state, so
    the emitted set is exactly the sessions whose end ≤ final watermark
    (max ts − 10 min) — which the oracle derives via gaps-and-islands:
    a session breaks where the gap ≥ 30 min (session_window merges only
    strictly-overlapping [ts, ts+gap) intervals), ends at last-ts+gap,
    and is emitted iff closed by the final watermark."""
    agg = session_counts(
        _stream_events(spark, sf_dir), watermark="10 minutes"
    )
    return _run_to_memory(agg, "mem_session", "append")


# --------------------------------------------------------------------------
# X31 — watermark + late-data drop
# --------------------------------------------------------------------------
@query(
    "q_stream_watermark",
    oracle="""
    WITH w AS (SELECT max(ts) - INTERVAL '10 minutes' AS wm FROM events),
    t AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start,
             time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes'
               AS win_end,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2, 3
    )
    SELECT t.* FROM t, w WHERE t.win_end <= w.wm
    ORDER BY win_start, event_type
    """,
)
def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode tumbling agg under a 10-minute watermark; windows
    emit only once the watermark passes their end. Replay order is
    deterministic (ts monotone in file order → nothing is ever late)
    and no-data micro-batches finalize state, so the appended set is
    exactly the windows with end ≤ final watermark (max ts − 10 min) —
    the oracle recomputes the batch aggregate and applies that filter.
    The late-DROP semantics (events behind the watermark are discarded)
    are exercised on hand-built out-of-order data in
    tests/test_streaming.py."""
    agg = tumbling_counts(
        _stream_events(spark, sf_dir), watermark="10 minutes"
    )
    return _run_to_memory(agg, "mem_watermark", "append")


# --------------------------------------------------------------------------
# stream-stream interval join (beyond-survey: the remaining core
# Structured Streaming operator — both sides stateful, watermark-bounded)
# --------------------------------------------------------------------------
@query(
    "q_stream_stream_join",
    oracle="""
    SELECT a.event_id AS left_id, b.event_id AS right_id,
           a.user_id, a.ts AS left_ts, b.ts AS right_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '5 minutes'
    ORDER BY left_id, right_id
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: each user's events matched to the
    events that follow within 5 minutes — both sides are streams, both
    buffered in state, with watermarks plus the event-time bound letting
    Spark evict matched-out rows (unbounded state otherwise). An INNER
    join's emitted set is batch-deterministic — every qualifying pair is
    emitted exactly once as soon as both sides arrive — so the batch
    self-join IS the oracle."""
    left = (
        _stream_events(spark, sf_dir, files_per_trigger=4)
        .select(
            F.col("event_id").alias("left_id"),
            "user_id",
            F.col("ts").alias("left_ts"),
        )
        .withWatermark("left_ts", "10 minutes")
    )
    right = (
        _stream_events(spark, sf_dir, files_per_trigger=4)
        .select(
            F.col("event_id").alias("right_id"),
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("right_ts"),
        )
        .withWatermark("right_ts", "10 minutes")
    )
    joined = left.join(
        right,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("right_ts") > F.col("left_ts"))
        & (
            F.col("right_ts")
            <= F.col("left_ts") + F.expr("INTERVAL 5 minutes")
        ),
        "inner",
    ).select("left_id", "right_id", "user_id", "left_ts", "right_ts")
    return _run_to_memory(joined, "mem_ss_join", "append", state_partitions=4)


# --------------------------------------------------------------------------
# incremental aggregate maintenance from a CDC changelog (beyond-survey:
# the materialized-view consumer; see streaming/incremental_agg.py)
# --------------------------------------------------------------------------
def _orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete synthetic changelog from orders: every row is inserted;
    'P' rows then get a +10% price update; 'F' rows are deleted. DECIMAL
    images keep every delta exact (doubles would make the maintained sum
    depend on partition summation order)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
    )
    img_t = "struct<k:bigint,v:decimal(15,3),s:string>"

    def img(price):
        return F.struct(
            F.col("o_orderkey").alias("k"),
            price.cast("decimal(15,3)").alias("v"),
            F.col("o_orderstatus").alias("s"),
        )

    null_img = F.lit(None).cast(img_t)
    bumped = F.col("p") * F.lit("1.1").cast("decimal(2,1)")
    c = o.select(
        F.lit("c").alias("op"), null_img.alias("before"), img(F.col("p")).alias("after")
    )
    u = o.filter(F.col("o_orderstatus") == "P").select(
        F.lit("u").alias("op"), img(F.col("p")).alias("before"), img(bumped).alias("after")
    )
    d = o.filter(F.col("o_orderstatus") == "F").select(
        F.lit("d").alias("op"), img(F.col("p")).alias("before"), null_img.alias("after")
    )
    return c.unionByName(u).unionByName(d)


@query(
    "q_incremental_agg",
    oracle="""
    SELECT o_orderstatus AS grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN o_orderstatus = 'P'
                         THEN CAST(o_totalprice AS DECIMAL(12,2))
                              * CAST(1.1 AS DECIMAL(2,1))
                         ELSE CAST(o_totalprice AS DECIMAL(12,2)) END)
                AS DOUBLE) AS sum_value
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderstatus
    ORDER BY grp
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-maintained group aggregate over a complete changelog:
    inserts contribute (+1, +v) under the after key, deletes (−1, −v)
    under the before key, updates both. Deltas TELESCOPE — their sum
    equals aggregating the latest state — so the oracle aggregates the
    final state directly from orders (inserted + P-bumped − F-deleted).
    Exact DECIMAL deltas make the result independent of summation order;
    the output surfaces as DOUBLE (driver-safe)."""
    from mysql_cdc_to_http_spark.streaming.incremental_agg import (
        delta_aggregate,
        event_deltas,
    )

    changes = _orders_changelog(spark, sf_dir)
    deltas = event_deltas(changes, group_field="s", value_field="v")
    return (
        delta_aggregate(deltas)
        .select("grp", "n", F.col("sum_value").cast("double").alias("sum_value"))
        .orderBy("grp")
    )


# --------------------------------------------------------------------------
# X32 — streaming dedup
# --------------------------------------------------------------------------
@query(
    "q_stream_dedup",
    oracle="SELECT DISTINCT event_id FROM events ORDER BY event_id",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event is fed twice; dropDuplicates on event_id under a
    watermark must emit each exactly once (append-mode dedup emits on
    first sight, so the full distinct set appears regardless of batch
    boundaries — oracle-safe)."""
    ev = _stream_events(spark, sf_dir, dup=True)
    deduped = ev.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    counts = deduped.select("event_id")
    return _run_to_memory(counts, "mem_dedup", "append")


# --------------------------------------------------------------------------
# custom stateful operator: applyInPandasWithState running totals
# --------------------------------------------------------------------------
@query(
    "q_stream_stateful",
    oracle="""
    WITH bounds AS (
      SELECT quantile_cont(event_id, 0.25) AS b1,
             quantile_cont(event_id, 0.50) AS b2,
             quantile_cont(event_id, 0.75) AS b3
      FROM events
    ),
    f AS (
      SELECT user_id, value,
             CASE WHEN event_id <= b1 THEN 0
                  WHEN event_id <= b2 THEN 1
                  WHEN event_id <= b3 THEN 2
                  ELSE 3 END AS batch
      FROM events, bounds
    ),
    agg AS (
      SELECT user_id, batch, CAST(count(*) AS BIGINT) AS bn,
             sum(value) AS bv
      FROM f GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(bn) OVER (PARTITION BY user_id ORDER BY batch)
                AS BIGINT) AS n_events,
           round(SUM(bv) OVER (PARTITION BY user_id ORDER BY batch), 6)
             AS total_value
    FROM agg ORDER BY user_id, n_events
    """,
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals with explicit GroupState — each micro-batch
    emits updated totals for touched keys.

    ORACLE-EXACT (r5): the replay is fully deterministic — the stream
    directory is split on EXACT percentile bounds of event_id
    (materialize_ordered_buckets), maxFilesPerTrigger=1 makes each file
    one micro-batch, and update mode emits one row per touched key per
    batch. The oracle reconstructs the batch assignment with
    quantile_cont (same (n-1)·q interpolation as Spark's percentile) and
    the emission set as a per-user cumulative over batches; 6-dp rounding
    absorbs pandas-vs-SQL summation-order ulps.

    Stays on the 4-file replay under the r16 2-file default: this
    query's CONTRACT is the per-batch update-mode emission set itself
    (the oracle hardcodes the quartile batch assignment), so batch
    count here is semantics, not scheduling floor."""
    from mysql_cdc_to_http_spark.streaming.stateful import running_user_totals

    ev = _stream_events(spark, sf_dir, n_files=4).select("user_id", "value")
    totals = running_user_totals(ev)
    out = _run_to_memory(totals, "mem_stateful", "update")
    return out.select(
        "user_id", "n_events", F.round("total_value", 6).alias("total_value")
    )


def _activate_pbshim(spark: SparkSession) -> None:
    """Self-activate vendor/pbshim for THIS session (r12 verdict #6).

    The TWS python runner imports ``google.protobuf`` (its state-server
    protocol); the sandbox has no protobuf runtime. The shim was wired
    via conftest PYTHONPATH, which a fresh harness process lacks — so
    activate at query time instead: exec the shim in the driver, and
    prepend its directory to ``sc.environment["PYTHONPATH"]``, which
    pyspark snapshots into each python function's envVars at WRAP time
    (core/rdd.py _prepare_for_python_RDD) — forked workers then import
    it as ``sitecustomize`` at interpreter startup. Both steps no-op
    when a real google.protobuf is importable."""
    import os
    import runpy

    vend = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "vendor",
        "pbshim",
    )
    # Run unconditionally: the shim returns untouched when a real
    # runtime (module with __file__) is importable, and a find_spec
    # pre-check is unreliable here (spark jars on sys.path satisfy
    # google.protobuf as an empty namespace package).
    runpy.run_path(os.path.join(vend, "sitecustomize.py"))
    env = spark.sparkContext.environment
    prev = env.get("PYTHONPATH")
    if vend not in (prev or ""):
        env["PYTHONPATH"] = vend + ((":" + prev) if prev else "")


@query("q_stream_stateful_tws")
def q_stream_stateful_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same running totals on Spark 4's ``transformWithStateInPandas`` —
    the successor arbitrary-stateful API (typed state handles, timers,
    TTL) whose mandatory RocksDB state store is the scale path: state
    spills to local disk and changelog-checkpoints to DFS instead of
    living on the JVM heap. Provider conf is pinned for the run and
    restored (it is locked in at stream start, like shuffle partitions).

    Registered rows-only (r12 verdict #6): emission timing is
    batch-boundary-dependent under TWS's update mode, and the protobuf
    dependency is satisfied at query time by ``_activate_pbshim`` —
    self-contained, no sitecustomize wiring needed in the harness.
    The oracled twin is ``q_stream_stateful`` (identical totals on the
    GroupState API); tests/test_stateful.py pins TWS==GroupState
    equivalence when the shim's runtime is present.

    Batch shape (r13 verdict #2, profiled in SCALE.md "TWS profile"):
    per-micro-batch cost is a FIXED ~1.2-1.6 s floor independent of
    rows (25k and 50k rows/batch measured identical) — the TWS python
    runner spin-up + state-server handshake + per-partition RocksDB
    commit. TWO data batches (r16: one file per trigger over the
    2-file replay — same batch count as the r13 files_per_trigger=2
    over 4 files, now sharing the default staged dir), so cross-batch
    state persistence (the semantics this operator exists to prove)
    is still exercised, at half the fixed-floor spend; state
    partitions 8 → 4 matches the state volume at test SFs. At real
    scale both knobs size UP with input rate and state volume — the
    toy-scale floor is not the scaling regime."""
    from mysql_cdc_to_http_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    _activate_pbshim(spark)
    ev = _stream_events(spark, sf_dir, files_per_trigger=1).select(
        "user_id", "value"
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        totals = running_user_totals_tws(ev)
        return _run_to_memory(
            totals, "mem_stateful_tws", "update", state_partitions=4
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# --------------------------------------------------------------------------
# X33 — CDC latest-state materialization (batch twin, oracle-checked)
# --------------------------------------------------------------------------
@query(
    "q_cdc_latest_state",
    oracle=_EV
    + """
    , keyed AS (
      SELECT tbl, offset_id % 1000 AS pk, op, offset_id,
             CASE WHEN op = 'u' THEN o_totalprice * CAST(1.1 AS DOUBLE)
                  WHEN op = 'd' THEN NULL ELSE o_totalprice END AS price,
             ROW_NUMBER() OVER (PARTITION BY tbl, offset_id % 1000
                                ORDER BY offset_id DESC) AS rn
      FROM ev
    )
    SELECT tbl, pk, offset_id AS last_offset, price AS current_price
    FROM keyed WHERE rn = 1 AND op <> 'd'
    ORDER BY tbl, pk
    """,
)
def q_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold the change feed into the current snapshot: rank-1 per (table,
    pk) by offset, deletes tombstone. The streaming foreachBatch variant
    (streaming/latest_state.py) is exercised in tests with replay."""
    ev = _flat_events(spark, sf_dir).select(
        "tbl",
        (F.col("offset_id") % 1000).alias("pk"),
        "op",
        F.col("offset_id"),
        F.col("after.o_totalprice").alias("price"),
    )
    snap = latest_state(ev, ["tbl", "pk"], offset_col="offset_id")
    return snap.select(
        "tbl",
        "pk",
        F.col("offset_id").alias("last_offset"),
        F.col("price").alias("current_price"),
    ).orderBy("tbl", "pk")


# --------------------------------------------------------------------------
# SCD2 history from the change feed (oracle-checked)
# --------------------------------------------------------------------------
@query(
    "q_scd2_history",
    oracle=_EV
    + """
    , keyed AS (
      SELECT tbl, offset_id % 1000 AS pk, op, offset_id,
             CASE WHEN op = 'u' THEN o_totalprice * CAST(1.1 AS DOUBLE)
                  WHEN op = 'd' THEN NULL ELSE o_totalprice END AS price
      FROM ev
    )
    SELECT tbl, pk, op, price,
           offset_id AS valid_from,
           lead(offset_id) OVER w AS valid_to,
           (lead(offset_id) OVER w IS NULL AND op <> 'd') AS is_current
    FROM keyed
    WINDOW w AS (PARTITION BY tbl, pk ORDER BY offset_id)
    ORDER BY tbl, pk, valid_from
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history: every change becomes a versioned row with a
    [valid_from, valid_to) interval; open versions are is_current."""
    from mysql_cdc_to_http_spark.streaming.latest_state import scd2_history

    ev = _flat_events(spark, sf_dir).select(
        "tbl",
        (F.col("offset_id") % 1000).alias("pk"),
        "op",
        F.col("offset_id").alias("offset"),
        F.col("after.o_totalprice").alias("price"),
    )
    hist = scd2_history(ev, ["tbl", "pk"], offset_col="offset")
    return hist.select(
        "tbl", "pk", "op", "price", "valid_from", "valid_to", "is_current"
    )


# --------------------------------------------------------------------------
# R11 — queue sink (file-directory queue standing in for the Redis list)
# --------------------------------------------------------------------------
def _queue_dir(spark: SparkSession, sf_dir: str) -> str:
    out = _cache_dir("queue", sf_dir)
    # same atomic stage-then-rename publish as _events_stream_dir
    # (ADVICE r8 race class); _done remains as the reader-visible marker
    # because it is INSIDE the atomically-renamed tree.
    if not os.path.exists(os.path.join(out, "_done")):
        import shutil
        import tempfile as _tf

        parent = os.path.dirname(out)
        os.makedirs(parent, exist_ok=True)
        stage = _tf.mkdtemp(prefix="_stage_queue_", dir=parent)
        ev = (
            _flat_events(spark, sf_dir)
            .select(
                serialize(
                    F.struct(
                        F.struct(F.col("tbl").alias("table")).alias("source"),
                        F.col("op"),
                        F.col("offset_id").alias("offset"),
                    )
                ).alias("value")
            )
        )
        enqueue_batch(ev, stage)
        with open(os.path.join(stage, "_done"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(stage, out)
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)
            # Verify the concurrent winner actually published a complete
            # tree; re-raise the rename failure if nothing usable exists
            # (round-10 advice — same class as _events_stream_dir).
            if not os.path.exists(os.path.join(out, "_done")):
                raise
    return out


@query(
    "q_queue_sink",
    oracle=_EV
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queued,
           CAST(COUNT(DISTINCT tbl) AS BIGINT) AS n_tables
    FROM ev
    """,
)
def q_queue_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialized envelopes appended to the queue directory (RPUSH analog,
    main.go:94-103), then counted back off it."""
    qdir = _queue_dir(spark, sf_dir)
    q = dequeue_batch(spark, qdir)
    tbl = extract_table_name(F.col("value"))
    return q.agg(
        F.count(F.lit(1)).alias("n_queued"),
        F.countDistinct(tbl).alias("n_tables"),
    )


# --------------------------------------------------------------------------
# X406 — custom STREAMING SINK via the Python DataSourceStreamWriter
# API (sources/pyds.py:DeliveryDataSource).
# --------------------------------------------------------------------------
@query(
    "q_python_stream_sink",
    oracle=_EV
    + """
    SELECT tbl, op, CAST(COUNT(*) AS BIGINT) AS n
    FROM ev WHERE offset_id % 7 = 0
    GROUP BY tbl, op ORDER BY tbl, op
    """,
)
def q_python_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X406 — the envelope stream delivered through a CUSTOM sink
    built on Spark 4's DataSourceStreamWriter API: executor-side
    write() stages NDJSON per (epoch, partition) and returns a commit
    message; the driver-side commit(messages, batchId) publishes the
    micro-batch atomically (rename under batch=<id>/ + a _commits
    manifest), with replayed batches detected by their existing
    manifest and discarded — the idempotent-receiver half of the
    reference's delivery contract (main.go:107 POST loop + consumer
    dedup), here at the sink connector seam instead of foreachBatch.
    The query streams a deterministic 1/8 slice of the feed
    (offset % 7 = 0, coprime with the table hash — the bounded-slice discipline q_http_sink set;
    the per-row Python write path is the demo, not a bulk transport)
    into the sink, then reads back ONLY manifest-committed files and
    re-aggregates per (table, op) — hash parity against the
    source-of-truth proves exactly-once VISIBLE delivery end to end.
    Crash-replay idempotence is pinned separately in
    tests/test_round16.py."""
    import shutil
    import tempfile

    from mysql_cdc_to_http_spark.sources import pyds
    from mysql_cdc_to_http_spark.sources.cdc import write_event_files

    events_dir = write_event_files(spark, sf_dir)
    pyds.register(spark)
    pyds.register_delivery(spark)
    root = tempfile.mkdtemp(prefix="graft_delivery_")
    try:
        raw = (
            spark.readStream.format("graft_cdc")
            .option("path", os.path.join(events_dir, "data"))
            .load()
        )
        sliced = raw.filter(
            F.get_json_object("value", "$.offset").cast("long") % 7
            == 0
        )
        ckpt = tempfile.mkdtemp(prefix="graft_delivery_ckpt_")
        q = (
            sliced.select("value")
            .writeStream.format("graft_delivery")
            .option("path", root)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
        from mysql_cdc_to_http_spark.sources.cdc import ENVELOPE_SCHEMA

        delivered = pyds.read_delivered(spark, root)
        env = delivered.select(
            F.from_json(
                F.get_json_object("line", "$.value"), ENVELOPE_SCHEMA
            ).alias("e")
        ).select(
            F.col("e.source.table").alias("tbl"),
            F.col("e.op").alias("op"),
        )
        out = (
            env.groupBy("tbl", "op")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("tbl", "op")
        )
        # materialize before the temp delivery dir disappears
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# R12 — HTTP POST sink against an in-process echo server (rows-only)
# --------------------------------------------------------------------------
@query("q_http_sink")
def q_http_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posts a bounded slice of grouped envelopes to a local echo server
    (the logger/logger.go debug-sink analog) via the foreachBatch poster,
    then returns the server's per-path delivery counts. Exercises per-group
    URL routing, executor-side POSTs, and idempotency keys end-to-end."""
    import http.server
    import threading

    from mysql_cdc_to_http_spark.operators.routing import assign_group
    from mysql_cdc_to_http_spark.sources.http_sink import http_batch_poster

    received: list[str] = []

    class _Echo(http.server.BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            received.append(self.path)
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b'{"status": "ok"}')

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Echo)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ev = assign_group(
            _flat_events(spark, sf_dir), spark, table_col="tbl"
        ).filter(F.col("offset_id") < 400)
        batch = ev.select(
            "grp",
            serialize(
                F.struct(
                    F.struct(F.col("tbl").alias("table")).alias("source"),
                    F.col("op"),
                    F.col("offset_id").alias("offset"),
                )
            ).alias("payload"),
            F.concat_ws(":", "tbl", "offset_id").alias("idem_key"),
        )
        poster = http_batch_poster(f"http://127.0.0.1:{srv.server_port}")
        poster(batch, epoch_id=0)
    finally:
        srv.shutdown()
    rows = [(p.lstrip("/"), 1) for p in received]
    return (
        spark.createDataFrame(rows, "grp string, one int")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_delivered"))
        .orderBy("grp")
    )


# --------------------------------------------------------------------------
# R13 — queue worker: re-parse, re-filter by group (main.go:383-419)
# --------------------------------------------------------------------------
@query(
    "q_queue_worker",
    oracle=_EV
    + """
    SELECT tbl, CAST(COUNT(*) AS BIGINT) AS n_delivered
    FROM ev
    WHERE tbl IN ('orders', 'lineitem', 'customer', 'supplier')
    GROUP BY tbl ORDER BY tbl
    """,
)
def q_queue_worker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second delivery path: dequeue → extract table from the JSON payload
    (double-parse, like main.go:423) → group re-filter → per-table
    delivery counts."""
    qdir = _queue_dir(spark, sf_dir)
    q = dequeue_batch(spark, qdir).withColumn(
        "tbl", extract_table_name(F.col("value"))
    )
    delivered = group_filter(q, spark, table_col="tbl")
    return (
        delivered.groupBy("tbl")
        .agg(F.count(F.lit(1)).alias("n_delivered"))
        .orderBy("tbl")
    )


# --------------------------------------------------------------------------
# Time travel: snapshot AS OF an offset, reconstructed from SCD2 history
# --------------------------------------------------------------------------
@query(
    "q_time_travel",
    oracle=_EV
    + """
    , keyed AS (
      SELECT tbl, offset_id % 1000 AS pk, op, offset_id,
             CASE WHEN op = 'u' THEN o_totalprice * CAST(1.1 AS DOUBLE)
                  WHEN op = 'd' THEN NULL ELSE o_totalprice END AS price
      FROM ev
    ),
    hist AS (
      SELECT tbl, pk, op, price, offset_id AS valid_from,
             lead(offset_id) OVER (PARTITION BY tbl, pk
                                   ORDER BY offset_id) AS valid_to
      FROM keyed
    ),
    mo AS (SELECT MAX(offset_id) AS mx FROM ev),
    probes AS (
      SELECT CAST((mx * k) // 4 AS BIGINT) AS as_of_offset
      FROM mo, unnest([1, 2, 3]) AS t(k)
    )
    SELECT p.as_of_offset, h.tbl, h.pk, h.price
    FROM probes p JOIN hist h
      ON h.valid_from <= p.as_of_offset
     AND (h.valid_to IS NULL OR p.as_of_offset < h.valid_to)
    WHERE h.op <> 'd'
    ORDER BY as_of_offset, tbl, pk
    """,
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel from a CDC changelog (streaming/latest_state.py:
    snapshot_as_of): reconstruct the live table AS OF three probe
    offsets (¼, ½, ¾ of the feed) from the SCD2 history — the
    Delta/Iceberg time-travel feature, rebuilt relationally. Per-key
    SCD2 intervals are disjoint, so each snapshot is ONE interval
    predicate over the history (no agg, no window at probe time); keys
    deleted before a probe are correctly absent at that probe and
    present at earlier ones.

    Scale: history materializes once (one keyed window shuffle —
    shared with q_scd2_history's plan); every AS-OF query after that
    is a filtered scan, and the 3-row probe table joins as a broadcast.
    Parity: offsets are integers, prices are stored-value arithmetic
    shared with the scd2 oracle — exact."""
    from mysql_cdc_to_http_spark.streaming.latest_state import (
        scd2_history,
        snapshot_as_of,
    )

    ev = _flat_events(spark, sf_dir).select(
        "tbl",
        (F.col("offset_id") % 1000).alias("pk"),
        "op",
        F.col("offset_id").alias("offset"),
        F.col("after.o_totalprice").alias("price"),
    )
    hist = scd2_history(ev, ["tbl", "pk"], offset_col="offset")
    mx = ev.agg(F.max("offset").alias("mx"))
    probes = (
        spark.range(1, 4)
        .crossJoin(F.broadcast(mx))
        .select(
            ((F.col("mx") * F.col("id")) / 4)
            .cast("long")
            .alias("as_of_offset")
        )
    )
    snap = snapshot_as_of(
        hist.crossJoin(F.broadcast(probes)), F.col("as_of_offset")
    )
    return snap.select("as_of_offset", "tbl", "pk", "price").orderBy(
        "as_of_offset", "tbl", "pk"
    )


# --------------------------------------------------------------------------
# X126 — stream-static join: the canonical streaming ENRICHMENT pattern
# (stream joined to a slowly-changing dimension at rest). Every other
# join in the streaming family is stream-stream; this is the missing
# shape — no watermark needed, the static side is re-resolved per
# micro-batch (so dimension updates between batches are picked up).
# --------------------------------------------------------------------------
@query(
    "q_stream_static_join",
    oracle="""
    SELECT c_mktsegment, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    ORDER BY c_mktsegment, event_type
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming events enriched with the static customer dimension,
    aggregated per (segment, event type).

    Scale shape: the static side is a projected 2-column dim —
    broadcast-hash-joined INSIDE each micro-batch (no stream-side
    shuffle for the join, no state store: stream-static inner joins
    are stateless by construction). The complete-mode aggregate equals
    the batch join+group, which is exactly the DuckDB oracle. At 100 TB
    the pattern holds: the dimension is broadcast-or-bucketed per
    batch while only the aggregation state (segments × event types)
    persists across batches."""
    ev = _stream_events(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = ev.join(
        F.broadcast(dim), F.col("user_id") == F.col("c_custkey"), "inner"
    )
    agg = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return _run_to_memory(agg, "mem_stream_static", "complete").orderBy(
        "c_mktsegment", "event_type"
    )


# --------------------------------------------------------------------------
# X130 — streaming heavy hitters: per-window top-k users. The streaming
# agg maintains (window × user) counts; the top-k rank runs over the
# complete-mode RESULT table (rank is not a streaming operator — the
# post-hoc rank over emitted state is the standard pattern).
# --------------------------------------------------------------------------
@query(
    "q_stream_topk",
    oracle="""
    WITH counts AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS win_start,
             user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT win_start, user_id, n,
             row_number() OVER (PARTITION BY win_start
                                ORDER BY n DESC, user_id) AS rk
      FROM counts
    )
    SELECT win_start, CAST(rk AS BIGINT) AS rk, user_id, n
    FROM ranked WHERE rk <= 3
    ORDER BY win_start, rk
    """,
)
def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most active users per 6-hour tumbling window, from a
    streamed feed.

    Scale shape: the streaming side maintains ONLY the per-(window,
    user) counts — keyed state, map-side partial agg per micro-batch;
    the rank runs as a batch window over the emitted result (per-window
    partitions, TakeOrdered-sized output). Determinism: counts are
    integers and the (n DESC, user_id) tiebreak pins the top-3 frontier.
    In production update-mode + a sink-side rank serves the same query
    without complete-mode re-emission; complete mode here matches the
    memory-sink harness used across the streaming family."""
    from pyspark.sql.window import Window as W

    ev = _stream_events(spark, sf_dir)
    agg = ev.groupBy(
        F.window("ts", "6 hours").alias("win"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n"))
    table = _run_to_memory(agg, "mem_stream_topk", "complete")
    ranked = table.select(
        F.col("win.start").alias("win_start"), "user_id", "n"
    ).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("win_start").orderBy(
                F.col("n").desc(), F.col("user_id")
            )
        ),
    )
    return (
        ranked.filter(F.col("rk") <= 3)
        .select("win_start", F.col("rk").cast("bigint").alias("rk"),
                "user_id", "n")
        .orderBy("win_start", "rk")
    )


# --------------------------------------------------------------------------
# X146 — DYNAMIC-GAP session windows: each event extends its session by
# a gap that depends on the event itself (errors close fast, activity
# lingers) — the session_window(expr) API surface that fixed-gap X30
# doesn't touch. Oracle: union-of-intervals semantics reconstructed
# with a strict-prefix running max.
# --------------------------------------------------------------------------
@query(
    "q_stream_session_dynamic",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts) AS t_us,
             CASE WHEN event_type = 'error' THEN 300000000
                  ELSE 1800000000 END AS gap_us
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, event_id, t_us, gap_us,
             CASE WHEN max(t_us + gap_us) OVER
                    (PARTITION BY user_id ORDER BY t_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  OR t_us >= max(t_us + gap_us) OVER
                    (PARTITION BY user_id ORDER BY t_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS brk
      FROM g
    ),
    sess AS (
      SELECT user_id, ts, t_us, gap_us,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           min(ts) AS win_start,
           make_timestamp(max(t_us + gap_us)) AS win_end,
           CAST(count(*) AS BIGINT) AS n
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, win_start
    """,
)
def q_stream_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions where ERROR events extend the session only 5
    minutes but normal activity extends it 30 — the dynamic-gap
    ``session_window(ts, CASE …)`` streaming API.

    Semantics (both sides): each event claims [ts, ts+gap(event));
    overlapping claims merge; an event landing exactly ON the current
    session end starts a new session (half-open windows). The oracle
    reconstructs that union-of-intervals with a STRICT-PREFIX running
    max of (ts + gap) per user — a break wherever the next event
    starts at-or-after every prior claim's end. Scale shape: the
    streaming side is one keyed stateful operator (session state per
    user, merged on overlap, evicted on watermark in append mode);
    the oracle's running max is the same single keyed window
    discipline as q_sessionize."""
    ev = _stream_events(spark, sf_dir)
    gap = F.when(
        F.col("event_type") == "error", F.lit("5 minutes")
    ).otherwise(F.lit("30 minutes"))
    agg = ev.groupBy(
        F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n"))
    table = _run_to_memory(agg, "mem_session_dynamic", "complete")
    return table.select(
        "user_id",
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        "n",
    )


# --------------------------------------------------------------------------
# X149 — stream-stream LEFT OUTER interval join: the missing semantic
# next to X55's inner form. Null rows are WATERMARK-GATED — a left row
# emits its null match only once its 5-minute window has fully expired
# under the global watermark — and the oracle reproduces exactly that
# gate, so the streaming-specific emission rule itself is what gets
# oracle-checked.
# --------------------------------------------------------------------------
@query(
    "q_stream_stream_join_outer",
    oracle="""
    WITH w AS (SELECT max(ts) - INTERVAL '10 minutes' AS wm FROM events),
    matched AS (
      SELECT a.event_id AS left_id, b.event_id AS right_id,
             a.user_id, a.ts AS left_ts, b.ts AS right_ts
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND b.ts > a.ts
       AND b.ts <= a.ts + INTERVAL '5 minutes'
    ),
    expired_unmatched AS (
      SELECT a.event_id AS left_id, CAST(NULL AS BIGINT) AS right_id,
             a.user_id, a.ts AS left_ts, CAST(NULL AS TIMESTAMP) AS right_ts
      FROM events a, w
      WHERE a.ts + INTERVAL '5 minutes' < wm
        AND NOT EXISTS (
          SELECT 1 FROM events b
          WHERE b.user_id = a.user_id
            AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '5 minutes'
        )
    )
    SELECT * FROM matched
    UNION ALL SELECT * FROM expired_unmatched
    ORDER BY left_id, right_id NULLS FIRST
    """,
)
def q_stream_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every event paired with
    its followers within 5 minutes, or with NULLs once no follower can
    still arrive.

    The semantic under test is the null-emission GATE: unlike the
    inner form (emit on arrival, batch-deterministic), a left-outer
    null row may only be emitted when the watermark proves the match
    window closed — Spark emits it from the no-data flush batch after
    the watermark passes left_ts + 5min. The oracle encodes that same
    condition (wm = max event time − the 10-minute delay), so parity
    certifies the eviction rule, not just the pair set: left rows in
    the final 15 minutes of the feed with no match correctly emit
    NOTHING. State sizing matches the inner form (watermark + interval
    bound evict both buffers)."""
    left = (
        _stream_events(spark, sf_dir, files_per_trigger=4)
        .select(
            F.col("event_id").alias("left_id"),
            "user_id",
            F.col("ts").alias("left_ts"),
        )
        .withWatermark("left_ts", "10 minutes")
    )
    right = (
        _stream_events(spark, sf_dir, files_per_trigger=4)
        .select(
            F.col("event_id").alias("right_id"),
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("right_ts"),
        )
        .withWatermark("right_ts", "10 minutes")
    )
    joined = left.join(
        right,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("right_ts") > F.col("left_ts"))
        & (
            F.col("right_ts")
            <= F.col("left_ts") + F.expr("INTERVAL 5 minutes")
        ),
        "left_outer",
    ).select("left_id", "right_id", "user_id", "left_ts", "right_ts")
    return _run_to_memory(joined, "mem_ss_join_outer", "append", state_partitions=4)


# --------------------------------------------------------------------------
# X152 — dropDuplicatesWithinWatermark (Spark 3.5+): dedup state with a
# TTL instead of X32's grow-forever key set — the form a 100 TB stream
# actually runs, since unbounded dedup state is a slow OOM.
# --------------------------------------------------------------------------
@query(
    "q_stream_dedup_ttl",
    oracle="SELECT DISTINCT event_id FROM events ORDER BY event_id",
)
def q_stream_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup whose per-key state EXPIRES with the watermark
    (``dropDuplicatesWithinWatermark``): duplicates are only guaranteed
    dropped while the first occurrence is within the 30-minute
    watermark delay — exactly the at-most-once-per-TTL contract a
    bounded-state pipeline wants.

    The oracle equals full DISTINCT because the feed's duplicates are
    CO-LOCATED by construction (the dup feed doubles each event and
    range-buckets by event_id, so both copies share a micro-batch or
    adjacent ones — well inside the TTL). The semantic difference from
    X32 is the state bound, not this corpus's answer; the state-expiry
    behavior itself is what the API guarantees and what the watermark
    column wires in. The reference's delivery dedup need is the same
    shape: idempotency keys within a redelivery horizon
    (sources/http_sink.py), never forever."""
    ev = _stream_events(spark, sf_dir, dup=True)
    deduped = (
        ev.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    return _run_to_memory(deduped, "mem_dedup_ttl", "append")


# --------------------------------------------------------------------------
# X203 — streaming KMV sketch maintenance: the mergeable-sketch
# property LIVE. bottom-k(union) = bottom-k(merged bottom-ks), so a
# micro-batch fold over any batch boundaries converges to exactly the
# batch sketch — and state is k rows per group regardless of how much
# input has streamed past.
# --------------------------------------------------------------------------
@query(
    "q_stream_kmv",
    oracle="""
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    r AS (
      SELECT event_type, user_id,
             md5('kmv-v1|' || CAST(user_id AS VARCHAR)) AS h,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5('kmv-v1|' || CAST(user_id AS VARCHAR)), user_id
             ) AS rk
      FROM d
    )
    SELECT event_type, CAST(rk AS BIGINT) AS rk, user_id, h
    FROM r WHERE rk <= 8
    ORDER BY event_type, rk
    """,
)
def q_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group KMV bottom-8 maintained INCREMENTALLY over the event
    stream (foreachBatch fold into a parquet sketch store), then read
    back — the streaming twin of ``q_kmv_sample`` with the IDENTICAL
    batch oracle, which is the whole point: the sketch is mergeable
    (bottom-k of a union is the bottom-k of merged bottom-ks), so
    micro-batch boundaries cannot change the result, and the state the
    stream carries is k rows per group FOREVER — bounded by the sketch
    size, not by keys seen and not by input length (compare
    q_stream_dedup, whose state grows with distinct keys under the
    watermark). At 100 TB this is the distinct-sample / NDV-estimate /
    audience-overlap primitive that a always-on pipeline can afford to
    keep per (group × day) indefinitely.

    Per micro-batch work: distinct (group, user) within the batch,
    batch-local bottom-k (keyed window), merge with the k-row store,
    re-cut at k, atomic write-then-swap. Everything after the batch
    distinct is sketch-sized."""
    import shutil
    import tempfile

    from pyspark.sql.window import Window as W

    k = 8
    ev = _stream_events(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="graft_kmv_stream_")
    state_dir = os.path.join(work, "state")
    h = F.md5(
        F.concat_ws("|", F.lit("kmv-v1"), F.col("user_id").cast("string"))
    )
    rk = F.row_number().over(W.partitionBy("event_type").orderBy("h", "user_id"))

    def _cut(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rk", rk).filter(F.col("rk") <= k).drop("rk")
        )

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        part = _cut(
            batch_df.select("event_type", "user_id")
            .distinct()
            .select("event_type", "user_id", h.alias("h"))
        )
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            part = _cut(prev.unionByName(part).distinct())
        tmp = os.path.join(work, "_state_tmp")
        part.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(state_dir, ignore_errors=True)
        os.replace(tmp, state_dir)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = (
            ev.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    # The final sketch is k rows per group by construction, so
    # materializing it driver-side is sketch-sized work — and it lets
    # the scratch tree (state, checkpoint, tmp) be removed HERE instead
    # of leaking one graft_kmv_stream_* dir per invocation (ADVICE r8):
    # the returned DataFrame must not lazily read a deleted path.
    try:
        snap_rows = (
            spark.read.parquet(state_dir)
            .withColumn("rk", rk.cast("bigint"))
            .select("event_type", "rk", "user_id", "h")
            .orderBy("event_type", "rk")
            .collect()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        snap_rows, "event_type string, rk bigint, user_id bigint, h string"
    ).orderBy("event_type", "rk")


# --------------------------------------------------------------------------
# X213 — stream-stream FULL OUTER interval join: completes the outer
# matrix (inner X55, left-outer X149). The new semantic is the
# RIGHT-side null gate: an unmatched right row emits (NULL, right) only
# once the watermark proves no matching left can still arrive. Because
# the join predicate bounds left_ts STRICTLY BELOW right_ts, that proof
# lands earlier than the left side's: right rows close at
# right_ts < wm, while left rows wait until left_ts + 5min < wm (the
# X149 gate). Both gates are encoded in the oracle, so parity certifies
# the two asymmetric eviction rules, not just the pair set.
# --------------------------------------------------------------------------
@query(
    "q_stream_stream_join_full",
    oracle="""
    WITH w AS (SELECT max(ts) - INTERVAL '10 minutes' AS wm FROM events),
    matched AS (
      SELECT a.event_id AS left_id, b.event_id AS right_id,
             a.user_id AS uid, a.ts AS left_ts, b.ts AS right_ts
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND b.ts > a.ts
       AND b.ts <= a.ts + INTERVAL '5 minutes'
    ),
    left_expired AS (
      SELECT a.event_id AS left_id, CAST(NULL AS BIGINT) AS right_id,
             a.user_id AS uid, a.ts AS left_ts,
             CAST(NULL AS TIMESTAMP) AS right_ts
      FROM events a, w
      WHERE a.ts + INTERVAL '5 minutes' < wm
        AND NOT EXISTS (
          SELECT 1 FROM events b
          WHERE b.user_id = a.user_id
            AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '5 minutes'
        )
    ),
    right_expired AS (
      SELECT CAST(NULL AS BIGINT) AS left_id, b.event_id AS right_id,
             b.user_id AS uid, CAST(NULL AS TIMESTAMP) AS left_ts,
             b.ts AS right_ts
      FROM events b, w
      WHERE b.ts < wm
        AND NOT EXISTS (
          SELECT 1 FROM events a
          WHERE a.user_id = b.user_id
            AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '5 minutes'
        )
    )
    SELECT * FROM matched
    UNION ALL SELECT * FROM left_expired
    UNION ALL SELECT * FROM right_expired
    ORDER BY left_id NULLS LAST, right_id NULLS FIRST
    """,
)
def q_stream_stream_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join: every event paired with
    its followers within 5 minutes, plus watermark-gated null rows on
    BOTH sides — the leads that never converted AND the conversions no
    lead explains, from one stateful operator.

    The gates are asymmetric, and that asymmetry is the oracle's
    subject. A LEFT row stays joinable until the watermark passes the
    far end of its forward window (left_ts + 5min < wm — the X149
    rule). A RIGHT row's candidate lefts all satisfy
    left_ts < right_ts, so the instant the watermark passes right_ts
    itself no new left can exist, and Spark evicts-and-emits it:
    right_ts < wm, strictly, verified empirically at sf0.01 against
    the looser/tighter candidates (right_ts ± 5min < wm both diverge
    by ≥1 row; the probe is pinned in the oracle's right_expired CTE).
    State bound matches the one-sided forms — watermark + interval
    bound evict both buffers, so state is the rows inside one
    watermark horizon, independent of stream length. The reference's
    forwarder (main.go:94-113) has no join surface at all; this rung
    exists for the analytics engine the brief orders on top."""
    left = (
        _stream_events(spark, sf_dir, files_per_trigger=4)
        .select(
            F.col("event_id").alias("left_id"),
            "user_id",
            F.col("ts").alias("left_ts"),
        )
        .withWatermark("left_ts", "10 minutes")
    )
    right = (
        _stream_events(spark, sf_dir, files_per_trigger=4)
        .select(
            F.col("event_id").alias("right_id"),
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("right_ts"),
        )
        .withWatermark("right_ts", "10 minutes")
    )
    joined = left.join(
        right,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("right_ts") > F.col("left_ts"))
        & (
            F.col("right_ts")
            <= F.col("left_ts") + F.expr("INTERVAL 5 minutes")
        ),
        "full_outer",
    ).select(
        "left_id",
        "right_id",
        F.coalesce("user_id", "r_user_id").alias("uid"),
        "left_ts",
        "right_ts",
    )
    return _run_to_memory(joined, "mem_ss_join_full", "append", state_partitions=4)


# --------------------------------------------------------------------------
# X288 — streaming fixed-bin value histogram: per (1-hour tumbling
# window, value bin of width 50) event counts — the windowed
# latency/value-distribution monitor a streaming deployment runs
# (X177's batch latency histogram, lifted onto the stream). Complete
# mode == batch semantics, so the DuckDB oracle applies directly; bin
# assignment goes through explicit floor() on BOTH engines (DuckDB
# CAST(double AS BIGINT) rounds while Spark truncates — the
# q_mutual_info lesson).
# --------------------------------------------------------------------------
@query(
    "q_stream_histogram",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           CAST(floor(value / 50.0) AS BIGINT) AS bin,
           CAST(floor(value / 50.0) AS BIGINT) * 50 AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2, 3 ORDER BY win_start, bin
    """,
)
def q_stream_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X288 — windowed value histogram on the replayed stream.

    Exactness: bin = floor(value/50) is the same double→floor on both
    engines (value is 2-dp, never landing on a bin boundary ulp);
    counts are integers. Scale shape: streaming state is one counter
    per (window, bin) — bins are value-range-bounded and windows are
    time-bounded, so state is O(windows × bins) regardless of event
    volume; with a watermark the windows close and state stays flat
    (the complete-mode form here keeps the oracle exact). The
    aggregation is the same two-phase partial count as any streaming
    groupBy."""
    ev = _stream_events(spark, sf_dir)
    bin_col = F.floor(F.col("value") / F.lit(50.0)).cast("long")
    agg = (
        ev.groupBy(
            F.window("ts", "1 hour").alias("win"),
            bin_col.alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            "bin",
            (F.col("bin") * 50).cast("long").alias("bin_lo"),
            "n",
        )
    )
    out = _run_to_memory(agg, "mem_stream_hist", "complete")
    return out.orderBy("win_start", "bin")


# --------------------------------------------------------------------------
# X297 — streaming rate alert: per (event_type, 1-hour window) count
# compared against the trailing 3-window average; alert when the
# current window runs >= 2x the trailing mean — the volume-anomaly
# monitor a CDC/ingest deployment pages on. Complete mode == batch
# semantics, so the lag arithmetic is oracle-exact; the 2x gate is a
# cross-multiplied integer comparison.
# --------------------------------------------------------------------------
@query(
    "q_stream_rate_alert",
    oracle="""
    WITH wins AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', ts) AS win_start,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    trail AS (
      SELECT event_type, win_start, n,
             CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY win_start
                               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
                  AS BIGINT) AS trail_sum,
             CAST(COUNT(n) OVER (PARTITION BY event_type ORDER BY win_start
                                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
                  AS BIGINT) AS trail_n
      FROM wins
    )
    SELECT event_type, win_start, n, trail_sum, trail_n,
           COALESCE(trail_n >= 3 AND n * trail_n >= 2 * trail_sum, FALSE)
             AS alert
    FROM trail ORDER BY event_type, win_start
    """,
)
def q_stream_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X297 — windowed volume-anomaly alert on the replayed stream.

    Exactness: window counts are integers; the alert gate cross-
    multiplies (n·trail_n >= 2·trail_sum) so no rate ever becomes a
    float; windows with under 3 trailing observations never alert
    (COALESCE false). Scale shape: the streaming aggregate holds one
    counter per (type, window); the trailing comparison runs as a
    BATCH window over the (types × windows)-sized result after the
    sink — at production scale that post-pass is a metrics-table
    query, not a stream operator, which is exactly how volume
    monitors are deployed (aggregate in-stream, alert over the
    metrics table)."""
    from pyspark.sql.window import Window as W

    ev = _stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "event_type", F.col("win.start").alias("win_start"), "n"
        )
    )
    out = _run_to_memory(agg, "mem_rate_alert", "complete")
    tw = (
        W.partitionBy("event_type")
        .orderBy("win_start")
        .rowsBetween(-3, -1)
    )
    return out.select(
        "event_type",
        "win_start",
        "n",
        F.sum("n").over(tw).cast("long").alias("trail_sum"),
        F.count("n").over(tw).cast("long").alias("trail_n"),
        F.coalesce(
            (F.col("trail_n") >= 3)
            & (
                F.col("n") * F.col("trail_n")
                >= F.lit(2) * F.col("trail_sum")
            ),
            F.lit(False),
        ).alias("alert"),
    ).orderBy("event_type", "win_start")

"""Layout operators: partition pruning actually fires on the written
layout, files are clustered (one per partition value), row-group sort
keys hold within files, and the data round-trips exactly."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mysql_cdc_to_http_spark.operators.layout import (
    compact_small_files,
    write_partitioned,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "event_type", "user_id"
    )


def test_write_partitioned_prunes_and_clusters(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    out = str(tmp_path / "events_by_type")
    write_partitioned(src, out, ["event_type"], sort_by=["user_id"])

    n_types = src.select("event_type").distinct().count()
    dirs = glob.glob(os.path.join(out, "event_type=*"))
    assert len(dirs) == n_types
    # repartition-by-value clustering: exactly one data file per value
    for d in dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1

    back = spark.read.parquet(out)
    one_type = src.first()["event_type"]
    plan = _plan(back.filter(F.col("event_type") == one_type))
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters", 1
    )[1][:200]
    # pruned read returns exactly the partition's rows
    assert (
        back.filter(F.col("event_type") == one_type).count()
        == src.filter(F.col("event_type") == one_type).count()
    )


def test_write_partitioned_round_trips_exactly(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    out = str(tmp_path / "rt")
    write_partitioned(src, out, ["event_type"], sort_by=["user_id"])
    back = spark.read.parquet(out).select(*src.columns)
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_write_partitioned_sorts_within_files(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    out = str(tmp_path / "sorted")
    write_partitioned(src, out, ["event_type"], sort_by=["user_id"])
    one = glob.glob(os.path.join(out, "event_type=*", "*.parquet"))[0]
    vals = [r["user_id"] for r in spark.read.parquet(one).collect()]
    assert vals == sorted(vals)


def test_compact_small_files(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "frag")
    _events(spark, sf_dir).repartition(16).write.parquet(frag)
    assert len(glob.glob(os.path.join(frag, "*.parquet"))) == 16
    out = str(tmp_path / "compact")
    compact_small_files(spark, frag, 2, out)
    assert len(glob.glob(os.path.join(out, "*.parquet"))) == 2
    assert spark.read.parquet(out).count() == spark.read.parquet(frag).count()


def test_stream_to_partitioned_layout_exactly_once(spark, sf_dir, tmp_path):
    """Streamed ingestion into the hive layout: restart from checkpoint
    must not double-deliver, partition dirs must exist, and a filter on
    the partition column must prune (PartitionFilters in the scan)."""
    import shutil

    from mysql_cdc_to_http_spark.operators.layout import (
        stream_to_partitioned_layout,
    )

    src = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "event_type", "user_id"
    )
    feed = str(tmp_path / "feed")
    src.repartition(4).write.parquet(feed)

    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(src.schema).parquet(feed)
        )
        return stream_to_partitioned_layout(
            stream, out, ckpt, ["event_type"]
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    q2 = start()  # restart: checkpoint says nothing new
    q2.processAllAvailable()
    q2.stop()

    back = spark.read.parquet(out)
    assert back.count() == src.count()
    assert (
        back.select("event_id").distinct().count()
        == src.select("event_id").distinct().count()
    )
    assert glob.glob(os.path.join(out, "event_type=*"))
    one_type = src.first()["event_type"]
    plan = _plan(back.filter(F.col("event_type") == one_type))
    assert "PartitionFilters" in plan
    shutil.rmtree(feed)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Z-order's contract is BALANCED file skipping (checked against the
    real parquet footer min/max — the statistics scan planners skip
    by): under a linear o_custkey sort, a predicate on o_totalprice
    alone admits EVERY file (the non-leading column spans the full
    domain per file), while the Morton layout prunes hard on either
    column alone. Linear stays better for leading-column-only
    predicates — that tradeoff is the operator's documented contract,
    not a bug — so the test asserts z prunes well on BOTH dims and
    linear prunes on only one."""
    import glob
    import os

    import pyarrow.parquet as pq

    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.layout import write_zordered

    orders = load_table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_custkey", "o_totalprice"
    )
    n_files = 64
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(orders, zdir, ["o_custkey", "o_totalprice"], n_files)
    (
        orders.repartitionByRange(n_files, F.col("o_custkey"))
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    # ~10% slices of each domain (custkey 1..1500, price ~1k..550k)
    ck_pred = ("o_custkey", 700, 850)
    tp_pred = ("o_totalprice", 20000.0, 70000.0)

    def candidate_files(d, preds):
        hits, total = 0, 0
        for f in glob.glob(os.path.join(d, "part-*.parquet")):
            md = pq.read_metadata(f)
            names = md.schema.names
            total += 1
            admit = True
            for col, lo, hi in preds:
                st = md.row_group(0).column(names.index(col)).statistics
                cmin, cmax = st.min, st.max
                for rg in range(1, md.num_row_groups):
                    st = md.row_group(rg).column(names.index(col)).statistics
                    cmin, cmax = min(cmin, st.min), max(cmax, st.max)
                if cmax < lo or cmin > hi:
                    admit = False
            hits += admit
        return hits, total

    z_tp, z_total = candidate_files(zdir, [tp_pred])
    l_tp, l_total = candidate_files(ldir, [tp_pred])
    z_ck, _ = candidate_files(zdir, [ck_pred])
    # non-leading dim: linear admits everything, z skips most files
    assert l_tp == l_total
    assert z_tp <= z_total // 2, (z_tp, z_total)
    # leading dim: z still prunes (balanced), even if less than linear
    assert z_ck <= z_total // 2, (z_ck, z_total)

    # correctness: both layouts return identical query results
    pred = (
        F.col("o_custkey").between(ck_pred[1], ck_pred[2])
        & F.col("o_totalprice").between(tp_pred[1], tp_pred[2])
    )
    zc = spark.read.parquet(zdir).filter(pred).count()
    lc = spark.read.parquet(ldir).filter(pred).count()
    assert zc == lc == orders.filter(pred).count() > 0


# --- deterministic sharded export -------------------------------------------


def test_write_shards_one_file_per_shard_and_roundtrip(spark, tmp_path, sf_dir):
    import glob

    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.layout import write_shards

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    manifest = write_shards(docs, out, "doc_id", n_shards=8).collect()

    assert [r["shard"] for r in manifest] == list(range(8))
    for r in manifest:
        files = glob.glob(f"{out}/shard={r['shard']}/*.parquet")
        assert len(files) == 1, f"shard {r['shard']}: {len(files)} files"

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    assert sum(r["n_rows"] for r in manifest) == docs.count()


def test_write_shards_membership_partition_invariant(spark, tmp_path, sf_dir):
    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.layout import write_shards

    docs = load_table(spark, sf_dir, "documents")
    m1 = write_shards(
        docs.repartition(1), str(tmp_path / "a"), "doc_id", n_shards=8
    ).collect()
    m2 = write_shards(
        docs.repartition(13), str(tmp_path / "b"), "doc_id", n_shards=8
    ).collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]


def test_shard_manifest_checksum_detects_any_row_change(spark, sf_dir):
    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.layout import shard_manifest
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    full = {r["shard"]: r["content_xor"] for r in
            shard_manifest(docs, "doc_id", 8).collect()}
    # drop one known row; only its shard's checksum may change, and must
    victim = docs.select("doc_id").orderBy("doc_id").first()["doc_id"]
    tampered = {r["shard"]: r["content_xor"] for r in
                shard_manifest(docs.filter(F.col("doc_id") != victim),
                               "doc_id", 8).collect()}
    diffs = [s for s in full if tampered.get(s) != full[s]]
    assert len(diffs) == 1


def test_shard_manifest_verifies_written_shards(spark, tmp_path, sf_dir):
    """The auditor flow: recompute the manifest FROM the shard files and
    match it against the producer's manifest."""
    from mysql_cdc_to_http_spark.catalog import load_table
    from mysql_cdc_to_http_spark.operators.layout import (
        shard_manifest,
        write_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    produced = write_shards(docs, out, "doc_id", n_shards=8).collect()
    audited = shard_manifest(
        spark.read.parquet(out), "doc_id", 8
    ).collect()
    assert [tuple(r) for r in audited] == [tuple(r) for r in produced]


# --- X81 oracled audit form: q_zorder_layout --------------------------------


def test_zorder_layout_audit_semantics(spark, sf_dir):
    """The layout decision the audit certifies: for a 2-D box predicate,
    the z-ordered assignment scans strictly fewer files than the linear
    one, the z-ordered scan's row count collapses toward the true match
    count, and both layouts agree on rows_matched (the layout can never
    change the ANSWER, only the scan)."""
    from mysql_cdc_to_http_spark.queries.layout import q_zorder_layout

    rows = {r["layout"]: r for r in q_zorder_layout(spark, sf_dir).collect()}
    lin, z = rows["linear"], rows["zorder"]
    assert lin["rows_matched"] == z["rows_matched"] > 0
    assert z["files_scanned"] < lin["files_scanned"]
    # linear files each span the full (pk, sk) domain: nothing skips
    assert lin["files_scanned"] == lin["files_total"]
    # the box covers bucket quadrant [64,128)^2 == one 4-bit z prefix:
    # the z layout confines it to ONE file, so the scan is exact
    assert z["files_scanned"] == 1
    assert z["rows_scanned"] == z["rows_matched"]
    assert z["scan_ratio_micro"] < lin["scan_ratio_micro"] // 4


def test_zorder_layout_audit_plan_shape(spark, sf_dir):
    """One fact scan feeds both layouts (the explode stack, not two
    scans), the singleton max aggregate is broadcast (no shuffled join
    against the fact), and nothing sorts until the 2-row output."""
    from mysql_cdc_to_http_spark.queries.layout import q_zorder_layout

    plan = _plan(q_zorder_layout(spark, sf_dir))
    # fact scan + 1-row max-agg scan (AQE's formatted output prints each
    # scan in both the adaptive and final plan sections, hence <= 4)
    assert plan.count("Scan parquet") <= 4
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


# --- X227: rendezvous sharding rebalance audit -------------------------------


def test_rendezvous_resize_moves_minimum(spark, sf_dir):
    """The policy contract: on a 16→20 resize, rendezvous moves ~4/20 of
    keys (only those whose argmax lands on a new shard — the stateless
    minimum) while mod-N moves ~4/5 (only h%80 < 16 of hash space keeps
    its shard). Both schemes place every key and stay reasonably
    balanced."""
    from mysql_cdc_to_http_spark.queries.layout import q_rendezvous_shards

    rows = {
        r["scheme"]: r for r in q_rendezvous_shards(spark, sf_dir).collect()
    }
    mod, rdv = rows["mod"], rows["rendezvous"]
    assert mod["rows_total"] == rdv["rows_total"] > 0
    # theory 800000 vs 200000 micro; generous bands for small-sf noise
    assert mod["moved_ratio_micro"] > 700_000
    assert rdv["moved_ratio_micro"] < 300_000
    assert rdv["rows_moved"] * 3 < mod["rows_moved"]
    # all 20 new shards used; heaviest shard within 2x of even
    assert mod["shards_used"] == rdv["shards_used"] == 20
    assert rdv["max_load_micro"] < 2_000_000
    assert mod["max_load_micro"] < 2_000_000


def test_rendezvous_assignment_is_projection(spark, sf_dir):
    """Scale contract: shard assignment shuffles NOTHING — the only
    exchanges feed the (scheme × shard) load aggregate and the 2-row
    rollup. No join of any kind appears in the plan."""
    from mysql_cdc_to_http_spark.queries.layout import q_rendezvous_shards

    plan = _plan(q_rendezvous_shards(spark, sf_dir))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan

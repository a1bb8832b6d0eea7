"""Full-engine orchestration test: run_pipeline end-to-end against the
CDC feed and a local echo server, in both default (single-path) and
reference-compat (double-delivery) topologies."""

from __future__ import annotations

import http.server
import threading

from collections import Counter

import pytest

from mysql_cdc_to_http_spark.config import EngineConfig
from mysql_cdc_to_http_spark.engine import run_pipeline
from mysql_cdc_to_http_spark.sources.cdc import write_event_files


class _Sink(http.server.BaseHTTPRequestHandler):
    hits: list[tuple[str, str]] = []

    def do_POST(self):  # noqa: N802
        self.rfile.read(int(self.headers.get("Content-Length", 0)))
        type(self).hits.append((self.path, self.headers.get("Idempotency-Key", "")))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):
        pass


@pytest.fixture()
def sink_server():
    _Sink.hits = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Sink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", _Sink
    srv.shutdown()


def _expected_grouped_events(spark, sf_dir):
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.queries.cdc import _flat_events

    return (
        _flat_events(spark, sf_dir)
        .filter(F.col("tbl").isin("orders", "lineitem", "customer", "supplier"))
        .count()
    )


def test_engine_single_path(spark, sf_dir, tmp_path, sink_server):
    base, sink = sink_server
    cfg = EngineConfig(
        post_url=base, queue_dir=str(tmp_path / "q"), table_groups_file=None
    )
    events_dir = write_event_files(spark, sf_dir)
    handles = run_pipeline(spark, cfg, events_dir, str(tmp_path / "w"))
    handles.process_all_available()
    handles.stop()
    n_expected = _expected_grouped_events(spark, sf_dir)
    assert len(sink.hits) == n_expected
    # routing: only configured group paths, keys unique (exactly-once)
    assert {p for p, _ in sink.hits} <= {"/grp_sales", "/grp_parties"}
    assert set(Counter(k for _, k in sink.hits).values()) == {1}


def test_engine_compat_double_delivery(spark, sf_dir, tmp_path, sink_server):
    base, sink = sink_server
    cfg = EngineConfig(
        post_url=base, queue_dir=str(tmp_path / "q"), table_groups_file=None
    )
    events_dir = write_event_files(spark, sf_dir)
    handles = run_pipeline(
        spark, cfg, events_dir, str(tmp_path / "w"), compat_double_delivery=True
    )
    handles.process_all_available()
    # drain the worker after the writer has produced files
    handles.process_all_available()
    handles.stop()
    n_expected = _expected_grouped_events(spark, sf_dir)
    counts = Counter(k for _, k in sink.hits)
    assert len(counts) == n_expected
    # reference semantics: every event delivered twice (direct + worker)
    assert set(counts.values()) == {2}


def test_engine_streaming_observed_metrics(spark, sf_dir, tmp_path, sink_server):
    """The consume-point counters (reference: per-event log in the canal
    loop) surface in StreamingQueryProgress.observedMetrics, summing to
    the full feed BEFORE the action filter (dropped deletes counted)."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.queries.cdc import _flat_events

    base, sink = sink_server
    cfg = EngineConfig(
        post_url=base, queue_dir=str(tmp_path / "q"), table_groups_file=None
    )
    events_dir = write_event_files(spark, sf_dir)
    handles = run_pipeline(spark, cfg, events_dir, str(tmp_path / "w"))
    handles.process_all_available()
    totals = {"n_rows": 0, "n_c": 0, "n_u": 0, "n_d": 0}
    for prog in handles.direct.recentProgress:
        m = prog.observedMetrics.get("consume_metrics")
        if m is not None:
            for k in totals:
                totals[k] += m[k]
    handles.stop()
    flat = _flat_events(spark, sf_dir)
    expected = {
        r.op: r.n
        for r in flat.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert totals["n_rows"] == sum(expected.values())
    for op in ("c", "u", "d"):
        assert totals[f"n_{op}"] == expected.get(op, 0)


class _FlakySink(http.server.BaseHTTPRequestHandler):
    """Rejects every POST to /poison with 500 until ``healed`` flips."""

    hits: list[tuple[str, str]] = []
    healed = False

    def do_POST(self):  # noqa: N802
        self.rfile.read(int(self.headers.get("Content-Length", 0)))
        if self.path.endswith("/poison") and not type(self).healed:
            self.send_response(500)
            self.end_headers()
            return
        type(self).hits.append(
            (self.path, self.headers.get("Idempotency-Key", ""))
        )
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):
        pass


def test_http_dlq_quarantines_poison_and_replays(spark, tmp_path):
    """Poisoned-endpoint events dead-letter instead of stalling the
    batch; healthy events deliver; replay after heal converges to zero
    failures with the ORIGINAL idempotency keys."""
    from mysql_cdc_to_http_spark.sources.http_sink import (
        http_batch_poster_with_dlq,
        replay_dlq,
    )

    _FlakySink.hits = []
    _FlakySink.healed = False
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _FlakySink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        rows = [
            ("ok", '{"id": %d}' % i, f"k{i}") for i in range(6)
        ] + [("poison", '{"id": %d}' % i, f"p{i}") for i in range(3)]
        batch = spark.createDataFrame(
            rows, "grp string, payload string, idem_key string"
        )
        dlq = str(tmp_path / "dlq")
        poster = http_batch_poster_with_dlq(
            base, dlq, retries=1, backoff_s=0.01
        )
        poster(batch, epoch_id=0)
        delivered = {k for _, k in _FlakySink.hits}
        assert delivered == {f"k{i}" for i in range(6)}
        dead = spark.read.parquet(f"{dlq}/epoch=0").collect()
        assert sorted(r["idem_key"] for r in dead) == ["p0", "p1", "p2"]
        assert all("500" in r["error"] or "Error" in r["error"] for r in dead)
        # replay while still poisoned: all 3 fail again, nothing lost
        assert replay_dlq(spark, dlq, base, retries=0) == 3
        # heal, replay: converges, original keys preserved
        _FlakySink.healed = True
        assert replay_dlq(spark, dlq, base, retries=0) == 0
        assert {k for p, k in _FlakySink.hits if p.endswith("/poison")} == {
            "p0", "p1", "p2",
        }
        # idempotent re-run of the SAME epoch overwrites, not duplicates
        _FlakySink.healed = False
        poster(batch, epoch_id=0)
        assert spark.read.parquet(f"{dlq}/epoch=0").count() == 3
    finally:
        srv.shutdown()


def test_replay_dlq_prunes_delivered_rows(spark, tmp_path):
    """ADVICE r6: replays must CONVERGE — after a successful replay the
    epoch directory holds only still-failing rows (drained epochs are
    deleted), so a delivered event is never re-POSTed by the next
    replay."""
    from mysql_cdc_to_http_spark.sources.http_sink import (
        http_batch_poster_with_dlq,
        replay_dlq,
    )

    _FlakySink.hits = []
    _FlakySink.healed = False
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _FlakySink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        batch = spark.createDataFrame(
            [("poison", '{"id": %d}' % i, f"p{i}") for i in range(3)],
            "grp string, payload string, idem_key string",
        )
        dlq = str(tmp_path / "dlq")
        http_batch_poster_with_dlq(base, dlq, retries=0)(batch, epoch_id=5)
        assert spark.read.parquet(f"{dlq}/epoch=5").count() == 3
        # still poisoned: all fail, epoch rewritten with attempts bumped
        assert replay_dlq(spark, dlq, base, retries=0) == 3
        rows = spark.read.parquet(f"{dlq}/epoch=5").collect()
        assert len(rows) == 3 and all(r["attempts"] >= 2 for r in rows)
        # heal: replay drains and DELETES the epoch dir
        _FlakySink.healed = True
        assert replay_dlq(spark, dlq, base, retries=0) == 0
        import glob

        assert glob.glob(f"{dlq}/epoch=*") == []
        n_posts_after_drain = len(_FlakySink.hits)
        # a further replay is a no-op: nothing re-POSTs
        assert replay_dlq(spark, dlq, base, retries=0) == 0
        assert len(_FlakySink.hits) == n_posts_after_drain
    finally:
        srv.shutdown()


class _PermanentReject(http.server.BaseHTTPRequestHandler):
    """404s every POST; counts attempts so retry behavior is observable."""

    attempts = 0
    code = 404

    def do_POST(self):  # noqa: N802
        self.rfile.read(int(self.headers.get("Content-Length", 0)))
        type(self).attempts += 1
        self.send_response(type(self).code)
        self.end_headers()

    def log_message(self, *a):
        pass


def test_post_one_does_not_retry_permanent_4xx():
    """ADVICE r6: permanent 4xx (here 404) must fail IMMEDIATELY — one
    attempt, no backoff stall — while 5xx still consumes the retry
    budget."""
    import pytest
    import urllib.error

    from mysql_cdc_to_http_spark.sources.http_sink import _post_one

    _PermanentReject.attempts = 0
    _PermanentReject.code = 404
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _PermanentReject)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/x"
        with pytest.raises(urllib.error.HTTPError):
            _post_one(url, b"{}", "k1", retries=3, backoff_s=0.01, timeout_s=2)
        assert _PermanentReject.attempts == 1  # no retries burned
        # 500 IS retryable: full budget consumed
        _PermanentReject.attempts = 0
        _PermanentReject.code = 500
        with pytest.raises(urllib.error.HTTPError):
            _post_one(url, b"{}", "k2", retries=2, backoff_s=0.01, timeout_s=2)
        assert _PermanentReject.attempts == 3  # 1 + 2 retries
        # 429 throttle is retryable too
        _PermanentReject.attempts = 0
        _PermanentReject.code = 429
        with pytest.raises(urllib.error.HTTPError):
            _post_one(url, b"{}", "k3", retries=1, backoff_s=0.01, timeout_s=2)
        assert _PermanentReject.attempts == 2
    finally:
        srv.shutdown()


def test_post_rows_does_not_retry_permanent_4xx():
    """ADVICE r7: the primary foreachBatch sink loop (post_rows) shares
    _post_one's 4xx fail-fast — a 404 poison row costs ONE attempt, not
    retries×backoff, while 5xx still consumes the retry budget."""
    import pytest
    import urllib.error

    from mysql_cdc_to_http_spark.sources.http_sink import post_rows

    _PermanentReject.attempts = 0
    _PermanentReject.code = 404
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _PermanentReject)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/x"
        rows = [{"payload": "{}", "idem_key": "k1"}]
        with pytest.raises(urllib.error.HTTPError):
            post_rows(url, iter(rows), retries=3, backoff_s=0.01, timeout_s=2)
        assert _PermanentReject.attempts == 1  # no retries burned
        _PermanentReject.attempts = 0
        _PermanentReject.code = 500
        with pytest.raises(urllib.error.HTTPError):
            post_rows(url, iter(rows), retries=2, backoff_s=0.01, timeout_s=2)
        assert _PermanentReject.attempts == 3  # 1 + 2 retries
    finally:
        srv.shutdown()


def test_replay_dlq_ignores_and_sweeps_stale_tmp(spark, tmp_path):
    """ADVICE r7: a crash between the tmp write and the swap must not
    double-POST — the scratch dir is named outside the 'epoch=*'
    discovery glob and is swept on the next replay, so only the intact
    original epoch is replayed and no nested __replay_tmp dirs form."""
    import glob
    import shutil

    from mysql_cdc_to_http_spark.sources.http_sink import (
        http_batch_poster_with_dlq,
        replay_dlq,
    )

    _FlakySink.hits = []
    _FlakySink.healed = False
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _FlakySink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        batch = spark.createDataFrame(
            [("poison", '{"id": %d}' % i, f"p{i}") for i in range(3)],
            "grp string, payload string, idem_key string",
        )
        dlq = str(tmp_path / "dlq")
        http_batch_poster_with_dlq(base, dlq, retries=0)(batch, epoch_id=2)
        # simulate the crash window: a stale scratch dir with the SAME
        # rows sits next to the intact epoch dir
        shutil.copytree(f"{dlq}/epoch=2", f"{dlq}/_replay_tmp_epoch=2")
        _FlakySink.healed = True
        assert replay_dlq(spark, dlq, base, retries=0) == 0
        # each key POSTed exactly once — the stale tmp was NOT replayed
        keys = [k for p, k in _FlakySink.hits if p.endswith("/poison")]
        assert sorted(keys) == ["p0", "p1", "p2"]
        # scratch swept, epoch drained, nothing nested left behind
        assert glob.glob(f"{dlq}/*replay_tmp*") == []
        assert glob.glob(f"{dlq}/epoch=*") == []
    finally:
        srv.shutdown()


def test_replay_dlq_promotes_orphan_tmp(spark, tmp_path):
    """ADVICE r8 (medium): a crash BETWEEN rmtree(epoch) and the
    os.replace swap leaves the scratch dir as the ONLY copy of the
    still-failing rows. The sweep must PROMOTE it back to its epoch
    name and replay it — deleting it would lose dead-lettered events,
    regressing the DLQ from at-least-once to lossy."""
    import glob
    import os
    import shutil

    from mysql_cdc_to_http_spark.sources.http_sink import (
        http_batch_poster_with_dlq,
        replay_dlq,
    )

    _FlakySink.hits = []
    _FlakySink.healed = False
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _FlakySink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        batch = spark.createDataFrame(
            [("poison", '{"id": %d}' % i, f"p{i}") for i in range(3)],
            "grp string, payload string, idem_key string",
        )
        dlq = str(tmp_path / "dlq")
        http_batch_poster_with_dlq(base, dlq, retries=0)(batch, epoch_id=7)
        # simulate the post-rmtree crash: epoch dir GONE, scratch is the
        # sole survivor
        shutil.move(f"{dlq}/epoch=7", f"{dlq}/_replay_tmp_epoch=7")
        assert not os.path.isdir(f"{dlq}/epoch=7")
        # endpoint still poisoned: the promoted rows must fail (=3), not
        # vanish (=0)
        assert replay_dlq(spark, dlq, base, retries=0) == 3
        assert glob.glob(f"{dlq}/*replay_tmp*") == []
        assert spark.read.parquet(f"{dlq}/epoch=7").count() == 3
        # heal: the recovered rows deliver with their original keys
        _FlakySink.healed = True
        assert replay_dlq(spark, dlq, base, retries=0) == 0
        keys = [k for p, k in _FlakySink.hits if p.endswith("/poison")]
        assert sorted(keys) == ["p0", "p1", "p2"]
        assert glob.glob(f"{dlq}/epoch=*") == []
    finally:
        srv.shutdown()


def test_keepalive_poster_survives_surprise_connection_close():
    """Round 8: the keep-alive sink must treat a server-side close of a
    REUSED connection as a connection event, not an endpoint failure —
    one free retry on a fresh connection, no caller budget consumed
    (retries=0 here), idempotency key re-sent unchanged."""
    from mysql_cdc_to_http_spark.sources.http_sink import _KeepAlivePoster

    class _SurpriseClose(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        keys: list = []

        def do_POST(self):  # noqa: N802
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            type(self).keys.append(self.headers.get("Idempotency-Key", ""))
            body = b"{}"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            # close WITHOUT a Connection: close header — the client
            # believes the connection is still reusable
            self.close_connection = True

        def log_message(self, *a):
            pass

    _SurpriseClose.keys = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _SurpriseClose)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/g"
        poster = _KeepAlivePoster(timeout_s=2)
        for i in range(5):  # every request after the first rides a
            poster.post(url, b"{}", f"k{i}", retries=0, backoff_s=0.01)
        poster.close()
        assert _SurpriseClose.keys == [f"k{i}" for i in range(5)]
    finally:
        srv.shutdown()


def test_replay_dlq_skips_uncommitted_epoch(spark, tmp_path):
    """r8 verdict #8 guard: replay only touches COMMITTED epoch dirs
    (parquet _SUCCESS present). An epoch mid-write by a racing poster
    must be invisible — without the gate, replay would read the partial
    dir and rewrite the epoch with only the rows it saw, losing
    whatever the poster committed after the read."""
    import glob
    import os

    from mysql_cdc_to_http_spark.sources.http_sink import (
        http_batch_poster_with_dlq,
        replay_dlq,
    )

    _FlakySink.hits = []
    _FlakySink.healed = True
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _FlakySink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        batch = spark.createDataFrame(
            [("poison", '{"id": 1}', "k1")],
            "grp string, payload string, idem_key string",
        )
        dlq = str(tmp_path / "dlq")
        _FlakySink.healed = False
        http_batch_poster_with_dlq(base, dlq, retries=0)(batch, epoch_id=3)
        # simulate a mid-write epoch: committed data, _SUCCESS removed
        os.remove(f"{dlq}/epoch=3/_SUCCESS")
        _FlakySink.healed = True
        assert replay_dlq(spark, dlq, base, retries=0) == 0  # skipped
        assert _FlakySink.hits == []  # nothing POSTed
        assert glob.glob(f"{dlq}/epoch=3") != []  # left untouched
        # once the epoch "commits", the next cycle replays it
        open(f"{dlq}/epoch=3/_SUCCESS", "w").close()
        assert replay_dlq(spark, dlq, base, retries=0) == 0
        assert [k for _, k in _FlakySink.hits] == ["k1"]
        assert glob.glob(f"{dlq}/epoch=*") == []
    finally:
        srv.shutdown()


def test_http_sink_token_bucket_rate_limit(spark):
    """X211: a rate-limited poster paces its partition to ~rate_rps
    (after the burst) and still delivers every row; the unlimited path
    is unaffected. The limiter is executor-side, so pacing lengthens
    the foreachBatch call — which is exactly how it backpressures the
    trigger loop."""
    import time

    from pyspark.sql import Row

    from mysql_cdc_to_http_spark.sources.http_sink import (
        http_batch_poster,
        post_rows,
    )

    _Sink.hits = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Sink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        n = 40
        rows = [
            Row(grp="g", payload='{"i": %d}' % i, idem_key=f"k{i}")
            for i in range(n)
        ]
        # Pacing is asserted at the post_rows level — driverless, so the
        # timing has no Spark job-scheduling noise (the old Spark-level
        # relative compare flaked under full-suite load, where ~8 s of
        # ambient job overhead swamped the 0.7 s pacing delta).
        # burst 5, 50 rps: 40 rows need >= (40-5)/50 = 0.7 s
        t0 = time.perf_counter()
        post_rows(f"{base}/g", iter(rows), rate_rps=50, rate_burst=5)
        limited = time.perf_counter() - t0
        assert sorted(k for _, k in _Sink.hits) == sorted(
            f"k{i}" for i in range(n)
        )
        assert limited >= 0.6, limited  # paced (scheduling slack aside)

        _Sink.hits = []
        t1 = time.perf_counter()
        post_rows(f"{base}/g", iter(rows))
        unlimited = time.perf_counter() - t1
        assert len(_Sink.hits) == n
        # No pacing on the default path: compare against the LIMITED run
        # instead of an absolute wall-clock ceiling — 40 POSTs through a
        # ThreadingHTTPServer under full-suite CPU contention can blow
        # any absolute bound, but ambient load hits both runs, and the
        # limited run carries >= 0.7 s of deliberate sleep the unlimited
        # one must lack (round-10 advice).
        assert unlimited < limited, (unlimited, limited)

        # ONE bucket per PARTITION, not per (partition, group): the same
        # 40 rows split across 4 groups must pace identically through the
        # real foreachBatch path — a per-group bucket would grant 4
        # bursts and 4×rps, finishing in ~(10-5)/50 = 0.1 s of pacing
        # (round-9 advice, medium). Lower-bound asserts only: ambient
        # Spark load can only ADD time, never remove the bucket's sleep.
        _Sink.hits = []
        multi = spark.createDataFrame(
            [("g%d" % (i % 4), '{"i": %d}' % i, f"k{i}") for i in range(n)],
            "grp string, payload string, idem_key string",
        ).coalesce(1)
        t2 = time.perf_counter()
        http_batch_poster(base, rate_rps=50, rate_burst=5)(multi, 2)
        multi_grp = time.perf_counter() - t2
        assert len(_Sink.hits) == n
        assert multi_grp >= 0.6, multi_grp  # still rps × partitions
    finally:
        srv.shutdown()


class _NdjsonSink(http.server.BaseHTTPRequestHandler):
    """Records (path, idem_key, body_lines, content_type); /poison 500s
    until healed."""

    requests: list[tuple[str, str, list[str], str]] = []
    healed = False

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        if self.path.endswith("/poison") and not type(self).healed:
            self.send_response(500)
            self.end_headers()
            return
        type(self).requests.append(
            (
                self.path,
                self.headers.get("Idempotency-Key", ""),
                body.decode("utf-8").split("\n"),
                self.headers.get("Content-Type", ""),
            )
        )
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):
        pass


def test_http_dlq_ndjson_batch_mode(spark, tmp_path):
    """Round-10 verdict #6 — opt-in NDJSON batching: same-group rows
    coalesce into one application/x-ndjson POST with a deterministic
    per-batch idempotency key (md5 of the key-sorted member keys);
    failed batches dead-letter their member ROWS individually so
    replay_dlq semantics are unchanged; re-running the same epoch
    produces byte-identical batches and keys."""
    import hashlib

    from mysql_cdc_to_http_spark.sources.http_sink import (
        http_batch_poster_with_dlq,
        replay_dlq,
    )

    _NdjsonSink.requests = []
    _NdjsonSink.healed = False
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _NdjsonSink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        ok_rows = [("ok", '{"id": %d}' % i, f"k{i}") for i in range(7)]
        poison_rows = [
            ("poison", '{"id": %d}' % i, f"p{i}") for i in range(3)
        ]
        batch = spark.createDataFrame(
            ok_rows + poison_rows,
            "grp string, payload string, idem_key string",
        ).coalesce(1)
        dlq = str(tmp_path / "dlq")
        poster = http_batch_poster_with_dlq(
            base, dlq, retries=0, backoff_s=0.01, batch_size=4
        )
        poster(batch, epoch_id=0)
        # 7 ok rows in batches of 4 → 2 requests (4 + 3 lines), NDJSON
        ok_reqs = [r for r in _NdjsonSink.requests if r[0].endswith("/ok")]
        assert sorted(len(r[2]) for r in ok_reqs) == [3, 4]
        assert all(ct == "application/x-ndjson" for *_, ct in ok_reqs)
        got_payloads = sorted(line for r in ok_reqs for line in r[2])
        assert got_payloads == sorted(p for _, p, _ in ok_rows)
        # deterministic batch identity: md5 over the key-sorted chunk
        keys = sorted(k for _, _, k in ok_rows)
        want_keys = {
            "b-" + hashlib.md5("\n".join(keys[i : i + 4]).encode()).hexdigest()
            for i in range(0, len(keys), 4)
        }
        assert {r[1] for r in ok_reqs} == want_keys
        # poison batch dead-letters its member ROWS (per-row payload+key)
        dead = spark.read.parquet(f"{dlq}/epoch=0").collect()
        assert sorted(r["idem_key"] for r in dead) == ["p0", "p1", "p2"]
        assert sorted(r["payload"] for r in dead) == sorted(
            p for _, p, _ in poison_rows
        )
        # replay is per-row and converges after heal — unchanged contract
        _NdjsonSink.healed = True
        assert replay_dlq(spark, dlq, base, retries=0) == 0
        import glob

        assert glob.glob(f"{dlq}/epoch=*") == []
        # replayed rows arrive individually with their ORIGINAL keys
        poison_reqs = [
            r for r in _NdjsonSink.requests if r[0].endswith("/poison")
        ]
        assert {r[1] for r in poison_reqs} == {"p0", "p1", "p2"}
        # same epoch re-run → identical batch keys (replay determinism)
        _NdjsonSink.requests = []
        poster(batch, epoch_id=0)
        ok_reqs2 = [r for r in _NdjsonSink.requests if r[0].endswith("/ok")]
        assert {r[1] for r in ok_reqs2} == want_keys
    finally:
        srv.shutdown()

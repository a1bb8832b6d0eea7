"""The driver records bench output from a bounded stdout TAIL (~2000
chars) and json-parses it: rounds 6-9 printed the full 240-query dict
(>2000 chars) and every BENCH_r{N}.json landed with parsed=null — the
headline number was silently lost for four rounds. These tests pin the
repaired contract: the printed line always fits the tail window and
parses, whatever the registry grows to; the full payload goes to
BENCH_FULL.json instead.
"""

from __future__ import annotations

import json

from bench import _compact_line, _compact_stream

_STREAM_FULL = {
    "cdc_pipeline": {"rows_per_sec": 18641.0, "state_bytes_final": 1},
    "cdc_pipeline_10x": {"rows_per_sec": 132543.0, "state_bytes_final": 9},
    "stream_stream_join": {"rows_per_sec": 18815.2},
    "ivm_view": {"rows_per_sec": 13669.0, "view_matches_batch": True},
    "session_state": {"rows_per_sec": 30406.0},
    "http_delivery": {"rows_per_sec": 2453.1, "delivery_complete": True},
    "checks": {
        "resumed_exactly_once": True,
        "state_bounded": True,
        "resumed_exactly_once_10x": True,
        "state_bounded_10x": True,
        "scaling_10x_ok": True,
        "ivm_view_matches_batch": True,
        "http_delivery_complete": True,
        "http_concurrent_replay_converged": False,
    },
}


def _payload(n_queries: int) -> dict:
    # worst-case realistic names (~25 chars) and 4-sig-fig timings
    return {
        "metric": "headline_suite_sec",
        "value": 191.47,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": n_queries,
        "queries": {
            f"q_record_linkage_multi_{i:03d}": round(0.1 + i * 0.013, 3)
            for i in range(n_queries)
        },
        "excluded": {},
        "stream": _STREAM_FULL,
    }


def test_compact_line_fits_tail_window_and_parses():
    for n in (10, 242, 600, 1500):
        line = _compact_line(_payload(n))
        assert len(line) <= 2000, (n, len(line))
        got = json.loads(line)
        assert got["value"] == 191.47
        assert got["n_queries"] == n
        assert got["full"] == "BENCH_FULL.json"
        assert got["queries_shown"] == len(got["queries"])


def test_compact_line_keeps_slowest_queries():
    line = json.loads(_compact_line(_payload(300)))
    shown = line["queries"]
    assert shown  # never empty at any realistic registry size
    # the single slowest query must always survive the trim
    assert "q_record_linkage_multi_299" in shown
    assert all(v >= 0.1 for v in shown.values())


def test_compact_stream_summarizes_rates_and_checks():
    got = _compact_stream(_STREAM_FULL)
    assert got["cdc_rps"] == 18641.0
    assert got["http_rps"] == 2453.1
    assert got["checks_ok"] == 7 and got["checks_n"] == 8
    assert got["checks_failed"] == ["http_concurrent_replay_converged"]
    # a crashed stream section still compacts to a bounded error string
    err = _compact_stream({"error": "Py4JJavaError: " + "x" * 500})
    assert len(err["error"]) <= 160


def test_compact_line_with_errored_stream_still_fits():
    p = _payload(242)
    p["stream"] = {"error": "Py4JJavaError: Job aborted " + "y" * 280}
    line = _compact_line(p)
    assert len(line) <= 2000
    assert json.loads(line)["stream"]["error"].startswith("Py4JJavaError")


def test_load_partial_resume_roundtrip(tmp_path, monkeypatch):
    """r15 verdict #7: a killed bench resumes from BENCH_PARTIAL.jsonl —
    matching-sf records are reused, foreign-sf and torn lines are not,
    and SPARK_GRAFT_BENCH_RESUME=0 disables reuse."""
    from bench import _load_partial

    p = tmp_path / "BENCH_PARTIAL.jsonl"
    rec_ok = {
        "name": "q_agg_q1",
        "sec": 0.42,
        "n_passes": 2,
        "samples": [0.5, 0.42],
        "sf_dir": "/root/testdata/sf0.1",
    }
    rec_foreign = dict(rec_ok, name="q_topk", sf_dir="/root/testdata/sf0.01")
    with open(p, "w") as fh:
        fh.write(json.dumps(rec_ok) + "\n")
        fh.write(json.dumps(rec_foreign) + "\n")
        fh.write('{"name": "q_torn", "sec": 1.')  # mid-write kill

    got = _load_partial(str(p), "/root/testdata/sf0.1")
    assert set(got) == {"q_agg_q1"}
    assert got["q_agg_q1"]["sec"] == 0.42
    assert got["q_agg_q1"]["n_passes"] == 2

    monkeypatch.setenv("SPARK_GRAFT_BENCH_RESUME", "0")
    assert _load_partial(str(p), "/root/testdata/sf0.1") == {}
    monkeypatch.delenv("SPARK_GRAFT_BENCH_RESUME")
    assert _load_partial(str(tmp_path / "absent.jsonl"), "x") == {}

"""Round-16 (r15 verdict #3): the positivity invariant behind the
truncating-div sites, made systematic.

The r15 verdict flagged that q_tukey_hsd / q_winsorized_ab /
q_permutation_test and kin floor-divide value-cent sums that are
non-negative only because the generated events fixture has
value >= 0.01 — a latent engine split if sums could go negative.
Investigation first (empirics over fear): DuckDB integer `//` and
Spark `div` BOTH truncate toward zero (`SELECT (-7)//2` = -3 on both
engines, HUGEINT included), so a negative numerator does NOT split
engines at an integer-div site — the floor-vs-truncate hazard the
gumbel/cohort fix addressed lives only where one side uses floor()
or float division.

The executable pin is stronger than a lint: a planted events fixture
with ~30% NEGATIVE values (sign-mixed 2-dp cents, unique timestamps,
realistic props JSON) is run through EVERY oracled query that reads
only the events table — ~100 queries, enumerated from the registry by
source scan, so a new events query joins the battery automatically —
and Spark must hash-match DuckDB on each. Run red before the q_pacf
fix below; green after.

Caught on first run (and fixed in analytics15.py): q_pacf computed
n_days inside the num0>0-filtered aggregate, so a zero-variance daily
series (constant per-day counts) NULLed Spark's n_days while the
oracle's independent (SELECT n FROM base) reported the day count.
"""

from __future__ import annotations

import datetime
import inspect
import re

import duckdb
import pytest

from mysql_cdc_to_http_spark.queries import all_oracles, all_queries
from tests.oracle import normalize

QUERIES = all_queries()
ORACLES = all_oracles()


def _events_only_oracled() -> list[str]:
    """Every oracled registry query whose only table is `events` (and
    that is not a readStream query) — enumerated from source so new
    queries can't silently skip the battery."""
    out = []
    for n, fn in QUERIES.items():
        if n not in ORACLES:
            continue
        src = inspect.getsource(inspect.unwrap(fn))
        tables = set(
            re.findall(r'load_table\(spark,\s*sf_dir,\s*"(\w+)"\)', src)
        )
        if tables == {"events"} and "readStream" not in src:
            out.append(n)
    return sorted(out)


_BATTERY = _events_only_oracled()


@pytest.fixture(scope="session")
def neg_events_dir(spark, tmp_path_factory):
    """600 events, 5 types, 40 users, 30 days; value cents in
    [-6000, 13999] (~30% negative — refund semantics), UNIQUE
    timestamps (q_ohlc_bars' open/close are first/last BY ts; ties
    would make the answer ambiguous on both engines), props JSON in
    the generator's shape."""
    tmp = tmp_path_factory.mktemp("negfix")
    types = ["view", "click", "purchase", "refund", "signup"]
    rows = []
    for eid in range(600):
        cents = (eid * 37) % 20000 - 6000
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
            days=eid % 30,
            hours=(eid * 7) % 24,
            minutes=(eid // 30) % 60,
            seconds=eid % 60,
        )
        rows.append(
            (
                eid + 1,
                ts,
                eid % 40 + 1,
                types[eid % 5],
                cents / 100.0,
                '{"k": %d}' % (eid % 100),
            )
        )
    assert len({r[1] for r in rows}) == len(rows), "ts must be unique"
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp / "events.parquet")
    )
    return str(tmp)


def _duck_events(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    cur = con.sql(sql)
    return cur.columns, cur.fetchall()


def test_battery_enumeration_is_substantial():
    """The source-scan must keep finding the events family — if a
    refactor breaks the load_table pattern the battery would silently
    shrink to nothing and this test catches it."""
    assert len(_BATTERY) >= 90, _BATTERY
    for must in (
        "q_tukey_hsd",
        "q_winsorized_ab",
        "q_permutation_test",
        "q_pacf",
        "q_neyman_allocation",
    ):
        assert must in _BATTERY


@pytest.mark.parametrize("name", _BATTERY)
def test_negative_value_events_parity(spark, neg_events_dir, name):
    df = QUERIES[name](spark, neg_events_dir)
    s_cols, s_rows = normalize(
        df.columns, [tuple(r) for r in df.collect()]
    )
    d_cols_raw, d_rows_raw = _duck_events(ORACLES[name], neg_events_dir)
    d_cols, d_rows = normalize(d_cols_raw, d_rows_raw)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows {len(s_rows)} != {len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, (
            f"{name}: engines split on the sign-mixed fixture at "
            f"sorted-index {i} (cols {s_cols}):\n spark={a!r}\n"
            f" duck ={b!r}"
        )

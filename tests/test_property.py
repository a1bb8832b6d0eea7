"""Property tests (SURVEY §5.2 #4): coercion round-trips under random
inputs; latest-state merge invariant under random delivery order."""

from __future__ import annotations

import base64

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from mysql_cdc_to_http_spark.operators import coercion
from mysql_cdc_to_http_spark.streaming.latest_state import latest_state

_SETTINGS = dict(max_examples=12, deadline=None)

printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=40
)


@settings(**_SETTINGS)
@given(st.lists(printable, min_size=1, max_size=8))
def test_base64_roundtrip_property(spark, texts):
    """decode(base64(s)) == s for any printable s (lossless branch)."""
    df = spark.createDataFrame([(t,) for t in texts], "v string")
    out = df.select(
        F.col("v"),
        coercion.decode_base64_text(
            F.base64(F.col("v").cast("binary"))
        ).alias("rt"),
    ).collect()
    for r in out:
        assert r.rt == r.v


@settings(**_SETTINGS)
@given(
    st.lists(
        st.dates(min_value=__import__("datetime").date(1, 1, 1)),
        min_size=1,
        max_size=8,
    )
)
def test_date_rfc3339_property(spark, dates):
    strs = [d.isoformat() for d in dates]
    df = spark.createDataFrame([(s,) for s in strs], "v string")
    out = df.select("v", coercion.date_to_rfc3339(F.col("v")).alias("r")).collect()
    for r in out:
        if len(r.v) == 10:  # zero-padded ISO date -> converted
            assert r.r == f"{r.v}T00:00:00Z"


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),     # pk
            st.integers(min_value=0, max_value=1000),  # offset
            st.sampled_from(["c", "u", "d"]),
            st.floats(min_value=0, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[1],  # offsets unique (binlog positions)
    ),
    st.randoms(),
)
def test_latest_state_order_invariant(spark, events, rnd):
    """The merged snapshot is identical for any delivery order and any
    partitioning of the same event set (idempotent, commutative merge)."""
    shuffled = list(events)
    rnd.shuffle(shuffled)

    def snap(rows, n_parts):
        df = spark.createDataFrame(
            rows, "pk long, offset long, op string, price double"
        ).repartition(n_parts)
        out = latest_state(df, ["pk"], offset_col="offset")
        return {(r.pk): (r.offset, r.op, r.price) for r in out.collect()}

    assert snap(events, 2) == snap(shuffled, 5)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=40),
    st.integers(min_value=16, max_value=1024),
)
def test_pack_sequences_property(spark, counts, budget):
    """Distributed packing equals the sequential reference for any token
    counts and budget: exclusive cumsum → (bin, offset)."""
    from mysql_cdc_to_http_spark.operators.sampling import pack_sequences

    rows = [(i, c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.bin_id, r.offset_in_bin)
        for r in pack_sequences(df, budget=budget, coarse=7).collect()
    }
    cum = 0
    for i, c in enumerate(counts):
        assert got[i] == (cum // budget, cum % budget), (i, c, budget)
        cum += c


@settings(**_SETTINGS)
@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_rate_to_hex8_is_monotone_and_calibrated(rate):
    """Threshold strings order like their rates (monotone sampling: a
    higher rate keeps a superset) and the hex value matches rate·16⁸ to
    one ulp; rate 1 dominates every md5 prefix."""
    from mysql_cdc_to_http_spark.operators.curation import rate_to_hex8

    thr = rate_to_hex8(rate)
    if rate >= 1.0:
        assert thr == "g" and "ffffffff" < thr
        return
    assert len(thr) == 8
    assert int(thr, 16) == int(rate * 16**8)
    # monotonicity vs a coarser rate
    smaller = rate_to_hex8(rate / 2)
    assert smaller <= thr


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),      # key
            st.integers(min_value=0, max_value=3),      # number of updates
            st.booleans(),                              # deleted at the end?
            st.integers(min_value=1, max_value=10_000), # base value (cents)
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_incremental_agg_telescopes_property(spark, histories):
    """For ANY complete per-key changelog (insert, 0-3 updates, optional
    delete), summing the per-event deltas equals aggregating the final
    state — the invariant that makes incremental maintenance exact."""
    from decimal import Decimal

    from mysql_cdc_to_http_spark.streaming.incremental_agg import (
        delta_aggregate,
        event_deltas,
    )

    img = "struct<k:bigint,v:decimal(15,3),s:string>"
    rows, final = [], {}
    for key, n_upd, deleted, cents in histories:
        grp = "g" + str(key % 2)  # two groups
        val = Decimal(cents) / 100
        rows.append(("c", None, (key, val, grp)))
        for u in range(n_upd):
            nxt = val + 1
            rows.append(("u", (key, val, grp), (key, nxt, grp)))
            val = nxt
        if deleted:
            rows.append(("d", (key, val, grp), None))
        else:
            final.setdefault(grp, []).append(val)
    df = spark.createDataFrame(rows, f"op string, before {img}, after {img}")
    got = {
        r["grp"]: (r["n"], r["sum_value"])
        for r in delta_aggregate(
            event_deltas(df, group_field="s", value_field="v")
        ).collect()
    }
    want = {
        grp: (len(vals), sum(vals)) for grp, vals in final.items() if vals
    }
    assert {g: (n, Decimal(s)) for g, (n, s) in got.items()} == want


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=200),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
)
def test_chunk_documents_property(spark, n_tokens, chunk, stride):
    """For any (doc length, chunk size, stride): chunks cover every
    token exactly, starts are stride-aligned, and the chunk count is
    1 + ceil(max(n - chunk, 0) / stride)."""
    from mysql_cdc_to_http_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(
        df, chunk_tokens=chunk, stride=stride
    ).collect()
    if stride <= chunk:
        # overlapping mode: exact count formula and full coverage
        assert len(rows) == 1 + -(-max(n_tokens - chunk, 0) // stride)
    covered = set()
    for r in rows:
        assert r["n_tokens"] >= 1  # never an empty chunk
        assert (r["start_token"] - 1) % stride == 0
        assert r["chunk_text"].split(" ") == [
            f"w{i}" for i in range(r["start_token"] - 1,
                                   r["start_token"] - 1 + r["n_tokens"])
        ]
        covered.update(
            range(r["start_token"], r["start_token"] + r["n_tokens"])
        )
    if stride <= chunk:
        assert covered == set(range(1, n_tokens + 1))


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefghij.-", min_size=1, max_size=8),
            st.integers(min_value=0, max_value=9999),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_redact_pii_property(spark, parts):
    """Generated emails/phones/IPs never survive redaction, and
    redaction is idempotent, regardless of surrounding junk."""
    from mysql_cdc_to_http_spark.operators.text import redact_pii

    pieces = []
    for junk, n in parts:
        pieces.append(junk)
        pieces.append(f"u{n}@{max(n,1)}x.com")
        pieces.append(f"{n % 900 + 100:03d}-555-{n:04d}")
        pieces.append(f"10.{n % 256}.0.{(n * 3) % 256}")
    text = " ".join(pieces)
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        redact_pii(F.col("text")).alias("r")
    ).select("r", redact_pii(F.col("r")).alias("rr")).first()
    import re as _re

    assert not _re.search(r"@\w", row["r"]) or "[EMAIL]" in row["r"]
    assert "@" not in row["r"].replace("[EMAIL]", "")
    assert not _re.search(r"\d{3}-555-\d{4}", row["r"])
    assert not _re.search(r"\b10\.\d+\.0\.\d+\b", row["r"])
    assert row["rr"] == row["r"]


@settings(**_SETTINGS)
@given(
    old_rows=st.dictionaries(
        st.integers(0, 30), st.tuples(st.integers(-5, 5), printable),
        max_size=20,
    ),
    new_rows=st.dictionaries(
        st.integers(0, 30), st.tuples(st.integers(-5, 5), printable),
        max_size=20,
    ),
)
def test_snapshot_diff_apply_roundtrip_property(spark, old_rows, new_rows):
    """For ANY pair of keyed snapshots: the diff classifies every key
    correctly and apply(old, diff) == new exactly (multisets)."""
    from mysql_cdc_to_http_spark.operators.diff import (
        apply_diff,
        snapshot_diff,
    )

    schema = "k int, a int, b string"
    old = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in old_rows.items()], schema
    )
    new = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in new_rows.items()], schema
    )
    changes = snapshot_diff(old, new, ["k"], ["a", "b"])
    got = {r.k: r.action for r in changes.collect()}
    for k in set(old_rows) | set(new_rows):
        if k not in new_rows:
            assert got.get(k) == "delete"
        elif k not in old_rows:
            assert got.get(k) == "insert"
        elif old_rows[k] != new_rows[k]:
            assert got.get(k) == "update"
        else:
            assert k not in got  # unchanged rows never emitted
    rebuilt = apply_diff(old, changes, ["k"], ["a", "b"])
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([1, 2, 5, 13, 100]),
)
def test_overlap_bin_join_equals_naive_property(spark, ls, rs, w):
    """X122 property: for ANY interval sets and ANY bin width, the
    binned equi-join's pair set equals the naive overlap join —
    first-bin emission must never duplicate or drop a pair."""
    from pyspark.sql import functions as F

    from mysql_cdc_to_http_spark.operators.intervals import overlap_bin_join

    left = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(ls)],
        "lid long, ls long, le long",
    )
    right = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(rs)],
        "rid long, rs long, re long",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in overlap_bin_join(
            left, right, "ls", "le", "rs", "re", bin_width=w
        ).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in left.join(
            right, (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
        ).collect()
    )
    assert got == naive

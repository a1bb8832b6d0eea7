"""Generate a local sf1 decade of the driver's synthetic testdata.

The driver materializes sf{0.001,0.01,0.1} only (TESTDATA.md); the
round-12 verdict asked for one more decade of scale evidence. This
generator reproduces the driver's *pattern* — same schema, same value
distributions (measured from sf0.1; see the per-table notes below) at
10x the sf0.1 row counts — NOT its byte-exact RNG stream. That is
sufficient for what sf1 is used for: runtime scaling curves and
engine-vs-oracle parity on the SAME files. It is deterministic
(numpy PCG64 seed 42) so sweep runs are reproducible.

Measured sf0.1 distributions this mirrors (probed via DuckDB):
  customer   c_nationkey ~ U{0..24}, c_acctbal ~ U(-1000, 10000),
             5 market segments uniform
  supplier   same acctbal/nation pattern
  part       name = adj x noun (8x8), Brand#{0..24}, 6 types,
             size ~ U{1..50}, retailprice = 900 + (key % 1000)/10
  orders     custkey ~ U{customers}, status O/P/F uniform,
             totalprice ~ U(1000, 500000), orderdate ~ U days in
             [1995-01-01, 2001-08-01], priority 5 values uniform
  lineitem   orderkey ~ U{orders} per row (lines/order ~ Poisson(4)),
             linenumber ~ U{1..7}, quantity ~ U{1..50},
             extendedprice ~ U(900, 105000), discount ~ U{0..0.10
             step .01}, tax ~ U{0..0.08 step .01}, returnflag A/N/R,
             linestatus O/F, shipdate ~ U days (independent of order)
  events     event_id-ordered cumulative-exponential timestamps over
             a fixed 30-day window (2024-01), user_id ~ U{15000*sf},
             5 event types uniform, value ~ Exp(mean 50) rounded to
             2dp, props = {"k": U{0..99}}
  documents  10..100 words uniform from the fixed 30-word vocab,
             lang en 40% / de,es,fr,zh 15% each, source src0..src19,
             5% planted near-dups: copy of a random other doc's text
             + " dup" (the corpus the dedup ladder gates on)
  embeddings 64-dim unit-normalized Gaussian, label ~ U{0..9}
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf1"

N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_LINEITEM = 6_000_000
N_EVENTS = 1_000_000
N_USERS = 15_000
N_DOCS = 50_000
N_EMB = 20_000
EMB_DIM = 64

VOCAB = (
    "spark window merge table column vector stream value data small "
    "join filter big group hash customer sort order slow line part "
    "fast the row agg key query a scan batch"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = "blue cold hot large new old red small".split()
NOUNS = "anvil bolt gear gizmo plate ring rod widget".split()
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000  # microseconds per day
EPOCH_1995 = np.datetime64("1995-01-01").astype("datetime64[us]")
ORDERDATE_DAYS = (
    np.datetime64("2001-08-01") - np.datetime64("1995-01-01")
).astype(int)
SHIP_LO = np.datetime64("1995-01-02").astype("datetime64[us]")
SHIPDATE_DAYS = (
    np.datetime64("2001-11-04") - np.datetime64("1995-01-02")
).astype(int)
EVENTS_T0 = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]")
EVENTS_SPAN_US = 30 * DAY_US


def write(name: str, table: pa.Table) -> None:
    path = os.path.join(OUT, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"{name:12s} {table.num_rows:>9,d} rows -> {path}", flush=True)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)

    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(REGIONS),
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array(
                    [i % 5 for i in range(25)], pa.int32()
                ),
            }
        ),
    )

    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(N_CUSTOMER), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(N_CUSTOMER)]
                ),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, N_CUSTOMER, dtype=np.int32),
                    pa.int32(),
                ),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-1000, 10000, N_CUSTOMER), 2)
                ),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, N_CUSTOMER)]
                ),
            }
        ),
    )

    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(N_SUPPLIER), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(N_SUPPLIER)]
                ),
                "s_nationkey": pa.array(
                    rng.integers(0, 25, N_SUPPLIER, dtype=np.int32),
                    pa.int32(),
                ),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-1000, 10000, N_SUPPLIER), 2)
                ),
            }
        ),
    )

    pk = np.arange(N_PART)
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(pk, pa.int64()),
                "p_name": pa.array(
                    [
                        f"{ADJS[a]} {NOUNS[n]}"
                        for a, n in zip(
                            rng.integers(0, 8, N_PART),
                            rng.integers(0, 8, N_PART),
                        )
                    ]
                ),
                "p_brand": pa.array(
                    [f"Brand#{b}" for b in rng.integers(0, 25, N_PART)]
                ),
                "p_type": pa.array(
                    np.array(PTYPES)[rng.integers(0, 6, N_PART)]
                ),
                "p_size": pa.array(
                    rng.integers(1, 51, N_PART, dtype=np.int32), pa.int32()
                ),
                "p_retailprice": pa.array(
                    np.round(900.0 + (pk % 1000) / 10.0, 1)
                ),
            }
        ),
    )

    odate = EPOCH_1995 + (
        rng.integers(0, ORDERDATE_DAYS + 1, N_ORDERS) * DAY_US
    ).astype("timedelta64[us]")
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, N_CUSTOMER, N_ORDERS), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    np.array(["O", "P", "F"])[rng.integers(0, 3, N_ORDERS)]
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000, 500000, N_ORDERS), 2)
                ),
                "o_orderdate": pa.array(odate, pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, N_ORDERS)]
                ),
            }
        ),
    )

    sdate = SHIP_LO + (
        rng.integers(0, SHIPDATE_DAYS + 1, N_LINEITEM) * DAY_US
    ).astype("timedelta64[us]")
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(
                    rng.integers(0, N_ORDERS, N_LINEITEM), pa.int64()
                ),
                "l_partkey": pa.array(
                    rng.integers(0, N_PART, N_LINEITEM), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, N_SUPPLIER, N_LINEITEM), pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, N_LINEITEM, dtype=np.int32),
                    pa.int32(),
                ),
                "l_quantity": pa.array(
                    rng.integers(1, 51, N_LINEITEM).astype(np.float64)
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900, 105000, N_LINEITEM), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, N_LINEITEM) / 100.0, 2)
                ),
                "l_tax": pa.array(
                    np.round(rng.integers(0, 9, N_LINEITEM) / 100.0, 2)
                ),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[
                        rng.integers(0, 3, N_LINEITEM)
                    ]
                ),
                "l_linestatus": pa.array(
                    np.array(["O", "F"])[rng.integers(0, 2, N_LINEITEM)]
                ),
                "l_shipdate": pa.array(sdate, pa.timestamp("us")),
            }
        ),
    )

    gaps = rng.exponential(1.0, N_EVENTS)
    ts_us = EVENTS_T0 + (
        np.cumsum(gaps) / gaps.sum() * EVENTS_SPAN_US
    ).astype("timedelta64[us]")
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(range(N_EVENTS), pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(0, N_USERS, N_EVENTS), pa.int64()
                ),
                "event_type": pa.array(
                    np.array(
                        ["click", "error", "purchase", "signup", "view"]
                    )[rng.integers(0, 5, N_EVENTS)]
                ),
                "value": pa.array(
                    np.round(rng.exponential(50.0, N_EVENTS), 2)
                ),
                "props": pa.array(
                    [
                        json.dumps({"k": int(k)})
                        for k in rng.integers(0, 100, N_EVENTS)
                    ]
                ),
            }
        ),
    )

    lens = rng.integers(10, 101, N_DOCS)
    vocab = np.array(VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), n)]) for n in lens
    ]
    dup_ids = rng.choice(N_DOCS, N_DOCS // 20, replace=False)
    for i in dup_ids:
        src = int(rng.integers(0, N_DOCS))
        if src != i:
            texts[i] = texts[src] + " dup"
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(
                    np.array(LANGS)[
                        rng.choice(5, N_DOCS, p=LANG_P)
                    ]
                ),
                "source": pa.array(
                    [f"src{s}" for s in rng.integers(0, 20, N_DOCS)]
                ),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
    )

    vecs = rng.standard_normal((N_EMB, EMB_DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(N_EMB), pa.int64()),
                "embedding": pa.array(
                    list(vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(
                    rng.integers(0, 10, N_EMB, dtype=np.int32), pa.int32()
                ),
            }
        ),
    )
    print("done", flush=True)


if __name__ == "__main__":
    main()

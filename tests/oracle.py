"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, normalizes
rows (columns sorted by name, rows sorted, values canonicalized), and
asserts exact multiset equality — stricter than a tolerance check, because
the driver compares value *hashes*.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from mysql_cdc_to_http_spark.catalog import TABLES


def run_duckdb(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.sql(sql)
    return cur.columns, cur.fetchall()


def _canon(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return v
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def normalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted(
        (tuple(_canon(row[i]) for i in order) for row in rows),
        key=repr,  # None/mixed types aren't `<`-comparable
    )
    return cols, out


def compare(spark_df, oracle_query: str, sf_dir: str):
    """Return (ok, message) comparing a Spark DataFrame vs oracle SQL."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = run_duckdb(oracle_query, sf_dir)

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    sc, sn = normalize(s_cols, s_rows)
    dc, dn = normalize(d_cols, d_rows)
    if len(sn) != len(dn):
        return False, f"row count mismatch: spark={len(sn)} duck={len(dn)}"
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a != b:
            return (
                False,
                f"first row diff at sorted-index {i} (cols {sc}):\n spark={a!r}\n duck ={b!r}",
            )
    return True, f"ok rows={len(sn)}"

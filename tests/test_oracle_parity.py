"""Every registered query with an oracle must match DuckDB exactly at
sf0.01 — the local replica of the driver's correctness gate. Queries
without an oracle get a rows-run smoke check."""

from __future__ import annotations

import pytest

from mysql_cdc_to_http_spark.queries import all_queries, all_oracles
from tests.oracle import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir_oracle, name):
    df = QUERIES[name](spark, sf_dir_oracle)
    ok, msg = compare(df, ORACLES[name], sf_dir_oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_smoke(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

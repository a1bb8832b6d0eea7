from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"

os.environ.setdefault("TZ", "UTC")


@pytest.fixture(scope="session")
def spark():
    from mysql_cdc_to_http_spark.session import get_spark

    # Modest local parallelism: test data is tiny; fewer partitions =
    # faster tests. Scale behavior is exercised via explain-plan tests.
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF0001


@pytest.fixture(scope="session")
def sf_dir_oracle():
    return SF001

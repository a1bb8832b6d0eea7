"""Query registry package — import all query modules to populate REGISTRY.

``all_queries()`` / ``all_oracles()`` are the single source consumed by
``__spark_entry__.py`` (the driver contract).
"""

from __future__ import annotations

from mysql_cdc_to_http_spark.queries.registry import QUERIES, ORACLES, QueryFn

# Importing modules registers their queries via the @query decorator.
from mysql_cdc_to_http_spark.queries import relational  # noqa: F401,E402
from mysql_cdc_to_http_spark.queries import joins  # noqa: F401,E402
from mysql_cdc_to_http_spark.queries import windows  # noqa: F401,E402
from mysql_cdc_to_http_spark.queries import functions  # noqa: F401,E402
from mysql_cdc_to_http_spark.queries import cdc  # noqa: F401,E402
from mysql_cdc_to_http_spark.queries import llm  # noqa: F401,E402
from mysql_cdc_to_http_spark.queries import udx  # noqa: F401,E402
from mysql_cdc_to_http_spark.queries import streaming  # noqa: F401,E402
from mysql_cdc_to_http_spark.queries import extended  # noqa: F401,E402
from mysql_cdc_to_http_spark.queries import sql_surface  # noqa: F401,E402


def all_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(ORACLES)

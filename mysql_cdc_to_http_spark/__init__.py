"""mysql_cdc_to_http_spark — a PySpark-native analytics + CDC engine.

A brand-new engine with the query and data-processing capabilities of the
reference system ``mul14/mysql-cdc-to-http`` (a Go binlog→HTTP relay,
``/root/reference/main.go``), re-expressed Spark-first:

- batch analytics surface: DataFrame/SQL relational operators (SURVEY.md §2.3)
- CDC surface: Debezium-style change envelopes, type coercion, group routing,
  HTTP/queue sinks (SURVEY.md §2.1, reference ``main.go:50-123``)
- streaming surface: Structured Streaming windows, watermarks, dedup,
  latest-state materialization
- LLM-data-pipeline surface: dedup (exact/MinHash/SimHash), similarity
  search, text analysis, multimodal column plumbing

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, AQE; Python/pandas UDFs appear only where built-in
operators cannot express the semantics.
"""

__version__ = "0.1.0"

from mysql_cdc_to_http_spark.session import get_spark  # noqa: F401
from mysql_cdc_to_http_spark.catalog import TABLES, load_table, register_views  # noqa: F401

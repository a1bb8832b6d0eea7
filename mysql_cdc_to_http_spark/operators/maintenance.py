"""Dataset maintenance: small-file compaction.

Streaming sinks and fine-grained ingestion produce many small files; at
scan time each file is at least one task and one object-store request, so
a 100 TB table fragmented into KB-size files is unreadable in practice.
``compact_parquet`` rewrites a directory into ~target-sized files.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``src_dir`` into ``dst_dir`` with ≈target-sized files.

    File count is derived from the actual input bytes (not row counts —
    compression ratio varies); ``coalesce`` avoids a shuffle when
    reducing. Returns the chosen file count.
    """
    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, round(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.coalesce(n_files).write.mode("overwrite").parquet(dst_dir)
    return n_files

"""Spark 4 Python DataSource connector for the CDC envelope feed
(X209).

The reference's input side is a purpose-built connector speaking a
wire protocol into a row callback (`main.go`'s canal handler). Spark's
connector seam for that job is the DataSource API; since Spark 4 it is
implementable in pure Python (`pyspark.sql.datasource`) — schema,
partition planning, and per-partition readers — so the envelope feed
can be mounted as a first-class ``spark.read.format("graft_cdc")``
source instead of a path-glob JSON read.

Scale shape: ``partitions()`` returns ONE InputPartition per feed
file, so Spark schedules file-parallel reads exactly like its native
file sources (a 1000-file feed fans out to 1000 tasks, subject to
executor slots); each reader streams its file line-by-line (no
whole-file buffering). The envelope stays an opaque JSON string here —
parsing/coercion happen downstream in the engine's existing operators
(same layering as the reference: transport first, schema-on-read
after).

Batch-only by design: the STREAMING side of the feed keeps using
Spark's built-in file stream source (sources/cdc.py), which owns
checkpoint/offset semantics the Python simple-streaming API does not
yet match. One connector per strength.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FilePartition(InputPartition):
    def __init__(self, path: str, index: int):
        self.path = path
        self.index = index


class CdcFeedDataSource(DataSource):
    """``format("graft_cdc")`` — options: ``path`` = feed directory
    (the ``data/`` dir written by sources/cdc.py:write_event_files)."""

    @classmethod
    def name(cls) -> str:
        return "graft_cdc"

    def schema(self) -> str:
        # file index is exposed so consumers can reason about arrival
        # order (the binlog-position analog the reference tracks)
        return "file_no INT, line_no INT, value STRING"

    def reader(self, schema) -> "CdcFeedReader":
        return CdcFeedReader(self.options)


class CdcFeedReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("graft_cdc: 'path' option is required")
        self._files = sorted(glob.glob(os.path.join(path, "*.txt")))

    def partitions(self):
        return [_FilePartition(p, i) for i, p in enumerate(self._files)]

    def read(self, partition: _FilePartition):
        with open(partition.path, "r", encoding="utf-8") as fh:
            for line_no, line in enumerate(fh):
                line = line.rstrip("\n")
                if line:
                    yield (partition.index, line_no, line)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(CdcFeedDataSource)


# Executors must not need this repo on their PYTHONPATH: ship the module
# inside the serialized reader (driver contract imports by path).
import sys as _sys
from pyspark import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

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

Streaming (r16): the same feed is also mountable as
``spark.readStream.format("graft_cdc")`` through
``CdcFeedStreamReader`` (the full ``DataSourceStreamReader`` API, not
the driver-prefetch Simple variant): offsets are ``{"file": i,
"line": j}`` — exactly the binlog-position analog the reference
resumes from (main.go RunFrom) — ``latestOffset`` reports the end of
the currently-visible feed (files arriving later form later
micro-batches, the production tail-the-directory pattern),
``partitions(start, end)`` plans one file-slice InputPartition per
file in the offset range (file-parallel, like the batch reader), and
Spark's checkpoint WAL owns commit/replay, giving kill-mid-feed
exactly-once resume (pinned by test with incremental file arrival).
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

    def streamReader(self, schema) -> "CdcFeedStreamReader":
        return CdcFeedStreamReader(self.options)


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


class _FileSlicePartition(InputPartition):
    def __init__(self, path: str, file_no: int, start_line: int,
                 end_line: int | None):
        self.path = path
        self.file_no = file_no
        self.start_line = start_line
        self.end_line = end_line  # None = to EOF


from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class CdcFeedStreamReader(DataSourceStreamReader):
    """Offset-managed streaming reader over the feed directory.

    Offset format: ``{"file": i, "line": j}`` = files ``< i`` fully
    consumed plus ``j`` lines of file ``i`` — the binlog-position
    analog. New files appended to the directory extend
    ``latestOffset`` and arrive as later micro-batches; Spark's
    checkpoint WAL replays any uncommitted (start, end] range after a
    crash, so delivery is exactly-once end to end (the reader itself
    is stateless between calls — everything it needs is in the
    offsets and the directory listing)."""

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("graft_cdc: 'path' option is required")
        self._dir = path

    def _files(self) -> list:
        return sorted(glob.glob(os.path.join(self._dir, "*.txt")))

    @staticmethod
    def _count_lines(path: str) -> int:
        n = 0
        with open(path, "r", encoding="utf-8") as fh:
            for _ in fh:
                n += 1
        return n

    def initialOffset(self) -> dict:
        return {"file": 0, "line": 0}

    def latestOffset(self) -> dict:
        files = self._files()
        # end-of-feed position: one past the last complete file
        return {"file": len(files), "line": 0}

    def partitions(self, start: dict, end: dict):
        files = self._files()
        parts = []
        for idx in range(start["file"], min(end["file"] + 1, len(files))):
            start_line = start["line"] if idx == start["file"] else 0
            if idx == end["file"]:
                end_line = end["line"]
            else:
                end_line = None  # to EOF
            if end_line is not None and end_line <= start_line:
                continue
            parts.append(
                _FileSlicePartition(files[idx], idx, start_line, end_line)
            )
        return parts

    def read(self, partition: _FileSlicePartition):
        with open(partition.path, "r", encoding="utf-8") as fh:
            for line_no, line in enumerate(fh):
                if line_no < partition.start_line:
                    continue
                if (
                    partition.end_line is not None
                    and line_no >= partition.end_line
                ):
                    break
                line = line.rstrip("\n")
                if line:
                    yield (partition.file_no, line_no, line)

    def commit(self, end: dict) -> None:
        pass  # Spark's checkpoint WAL is the ledger; nothing to ack

    def stop(self) -> None:
        pass


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(CdcFeedDataSource)


# Executors must not need this repo on their PYTHONPATH: ship the module
# inside the serialized reader (driver contract imports by path).
import sys as _sys
from pyspark import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

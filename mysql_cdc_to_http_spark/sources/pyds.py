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


# ---------------------------------------------------------------------------
# X406 — custom STREAMING SINK via the Python DataSourceStreamWriter
# API: transactional file delivery with a commit manifest — the
# reference's delivery contract (every row delivered exactly once as
# far as the consumer can observe) at Spark's sink connector seam.
# ---------------------------------------------------------------------------
import json as _json

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter,
    WriterCommitMessage,
)


class _DeliveryCommit(WriterCommitMessage):
    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class DeliveryDataSource(DataSource):
    """``format("graft_delivery")`` — options: ``path`` = delivery
    root. Rows are staged per (epoch, partition) as NDJSON, then the
    driver-side ``commit`` publishes the whole micro-batch atomically:
    staged files are renamed under ``batch=<id>/`` and the batch id is
    recorded in ``_commits/<id>``. A consumer that reads only
    manifest-listed batches observes exactly-once delivery; a replayed
    batch (crash between publish and checkpoint commit) is detected by
    its existing manifest and the duplicate staging is discarded —
    the idempotent-receiver half of the reference's delivery story."""

    @classmethod
    def name(cls) -> str:
        return "graft_delivery"

    def schema(self) -> str:  # sink: schema comes from the stream
        return "value STRING"

    def streamWriter(self, schema, overwrite) -> "DeliveryStreamWriter":
        return DeliveryStreamWriter(self.options, schema)


class DeliveryStreamWriter(DataSourceStreamWriter):
    def __init__(self, options, schema):
        root = options.get("path")
        if not root:
            raise ValueError("graft_delivery: 'path' option is required")
        self._root = root
        self._cols = list(schema.fieldNames())

    # -- executor side ----------------------------------------------------
    def write(self, iterator) -> _DeliveryCommit:
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        stage_dir = os.path.join(self._root, "_staging")
        os.makedirs(stage_dir, exist_ok=True)
        # attempt-unique name: a retried task stages a NEW file and the
        # failed attempt's orphan is ignored (only commit-message paths
        # are ever published)
        path = os.path.join(
            stage_dir, f"p{pid}-{uuid.uuid4().hex}.ndjson"
        )
        n = 0
        with open(path, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    _json.dumps(
                        {c: row[c] for c in self._cols}, default=str
                    )
                    + "\n"
                )
                n += 1
        return _DeliveryCommit(path, n)

    # -- driver side ------------------------------------------------------
    def commit(self, messages, batchId: int) -> None:
        import os
        import shutil

        commits = os.path.join(self._root, "_commits")
        os.makedirs(commits, exist_ok=True)
        manifest = os.path.join(commits, str(batchId))
        staged = [m for m in messages if m is not None]
        if os.path.exists(manifest):
            # replayed batch: already published — drop the duplicate
            # staging so the consumer never sees it twice
            for m in staged:
                try:
                    os.remove(m.staged_path)
                except OSError:
                    pass
            return
        out_dir = os.path.join(self._root, f"batch={batchId}")
        os.makedirs(out_dir, exist_ok=True)
        total = 0
        for i, m in enumerate(staged):
            dst = os.path.join(out_dir, f"part-{i:05d}.ndjson")
            shutil.move(m.staged_path, dst)
            total += m.n_rows
        tmp = manifest + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(
                _json.dumps({"batch": batchId, "rows": total}) + "\n"
            )
        os.replace(tmp, manifest)  # atomic publish

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.staged_path)
                except OSError:
                    pass


def committed_batches(root: str) -> list:
    """Batch ids recorded in the delivery manifest, sorted."""
    import os

    commits = os.path.join(root, "_commits")
    if not os.path.isdir(commits):
        return []
    out = []
    for name in os.listdir(commits):
        if name.endswith(".tmp"):
            continue
        try:
            out.append(int(name))
        except ValueError:
            continue
    return sorted(out)


def read_delivered(spark, root: str):
    """The exactly-once view: rows of manifest-listed batches only."""
    import os

    paths = [
        os.path.join(root, f"batch={b}", "*.ndjson")
        for b in committed_batches(root)
    ]
    if not paths:
        return spark.createDataFrame([], "value string")
    return spark.read.text(paths).withColumnRenamed("value", "line")


def register_delivery(spark) -> None:
    spark.dataSource.register(DeliveryDataSource)

"""Change-envelope construction & JSON (de)serialization — the engine's
analog of the reference's Debezium-style payload (``main.go:80-92``) and
queue-payload parsing (``main.go:421-430``).

Envelope shape (FIXTURES.md §2; reference fields + engine extensions)::

    {before, after, source: {table}, op: c|u|d, offset, ts_ms}

The reference drops deletes (main.go:58-60) and carries no op/offset; the
engine represents them explicitly so downstream state merges (X33) and
watermarks are possible, with compat filters to reproduce reference
behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Payload column produced by serialize / consumed by deserialize helpers.
PAYLOAD_COL = "payload"

#: Fallback table when a queue payload has no source — the reference
#: panics on this input (unchecked type assertions, main.go:428-429); the
#: engine routes it to a dead-letter table name instead.
UNKNOWN_TABLE = "unknown_table"


def build_envelope(
    before: Column, after: Column, table: Column, op: Column,
    offset: Column, ts_ms: Column,
) -> Column:
    """Assemble the envelope struct (main.go:80-86, plus op/offset/ts_ms)."""
    return F.struct(
        before.alias("before"),
        after.alias("after"),
        F.struct(table.alias("table")).alias("source"),
        op.alias("op"),
        offset.alias("offset"),
        ts_ms.alias("ts_ms"),
    )


def serialize(envelope: Column) -> Column:
    """Envelope → JSON string (main.go:88-92). ``to_json`` omits null
    fields (an insert has no ``before`` key) — consumers read absent keys
    as null, preserving reference semantics."""
    return F.to_json(envelope)


def extract_table_name(payload: Column) -> Column:
    """Queue payload → table name (main.go:421-430). Missing ``source``
    returns UNKNOWN_TABLE instead of panicking."""
    return F.coalesce(
        F.get_json_object(payload, "$.source.table"), F.lit(UNKNOWN_TABLE)
    )


def action_filter(df: DataFrame, op_col: str = "op",
                  keep: tuple[str, ...] = ("c", "u")) -> DataFrame:
    """Keep insert/update only — reference event-action filter
    (main.go:58-60). Pass ``keep=("c","u","d")`` for correct mode."""
    return df.filter(F.col(op_col).isin(*keep))

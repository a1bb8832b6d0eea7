"""Row-level validation with quarantine routing.

At ingestion scale malformed rows are a certainty and must neither kill
the job (ANSI throw) nor silently vanish (permissive drop): the pipeline
pattern is validate-and-route — good rows continue, bad rows land in a
quarantine table with machine-readable reasons for replay after a fix.

Single-pass shape: ALL rules evaluate in one projection (an array of
(rule, passed) structs folded per row), so N rules cost one scan and
stay inside one codegen stage — never N sequential filters. The
valid/quarantine split reuses the same computed column; with the input
cached or both branches written from one ``foreachBatch``, the scan is
shared too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: name of the synthetic column carrying failed-rule names
REASONS_COL = "__failed_rules"


def with_validation(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Append ``__failed_rules`` (array<string> of rule names whose
    predicate is NOT satisfied; null predicate results count as
    failures — a rule must affirmatively pass)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    checks = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                (cond.isNotNull() & cond).alias("passed"),
            )
            for name, cond in rules.items()
        ]
    )
    failed = F.transform(
        F.filter(checks, lambda c: ~c["passed"]), lambda c: c["rule"]
    )
    return df.withColumn(REASONS_COL, failed)


def split_valid(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine): valid rows drop the reasons column;
    quarantine rows keep it. Callers writing both should materialize
    from one pass (cache or foreachBatch) so the scan isn't doubled."""
    checked = with_validation(df, rules)
    valid = checked.filter(F.size(REASONS_COL) == 0).drop(REASONS_COL)
    quarantine = checked.filter(F.size(REASONS_COL) > 0)
    return valid, quarantine


def quarantine_summary(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Per-rule failure counts — the monitoring surface. One scan, one
    narrow shuffle of (rule, partial_count)."""
    checked = with_validation(df, rules)
    return (
        checked.select(F.explode(REASONS_COL).alias("rule"))
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n_failed"))
    )


def stream_validate_and_route(
    stream_df: DataFrame,
    rules: dict[str, Column],
    valid_path: str,
    quarantine_path: str,
    checkpoint: str,
):
    """Continuous validate-and-route: each micro-batch evaluates the
    rules ONCE (the batch is cached for the two writes), appends good
    rows to ``valid_path`` and bad rows + reasons to
    ``quarantine_path``. foreachBatch + checkpoint give effectively-once
    delivery across restarts (a replayed batch overwrites nothing here —
    appends are deduplicated upstream by the checkpointed source
    offsets)."""

    def route(batch_df: DataFrame, _epoch: int) -> None:
        checked = with_validation(batch_df, rules).persist()
        try:
            checked.filter(F.size(REASONS_COL) == 0).drop(
                REASONS_COL
            ).write.mode("append").parquet(valid_path)
            checked.filter(F.size(REASONS_COL) > 0).withColumn(
                "reasons", F.concat_ws(",", F.col(REASONS_COL))
            ).drop(REASONS_COL).write.mode("append").parquet(quarantine_path)
        finally:
            checked.unpersist()

    return (
        stream_df.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )

"""Physical-plan inspection + linting.

``lint_plan`` flags the patterns that are correct-but-dead at 100 TB:
cartesian products, scans without pushed filters under a selective
filter, nested-loop joins over two large inputs. Used by the plan tests
and available to users as a pre-flight check on their own queries.
"""

from __future__ import annotations

import contextlib
import io

from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass
class PlanIssue:
    severity: str  # "error" | "warn"
    code: str
    detail: str


def lint_plan(df: DataFrame) -> list[PlanIssue]:
    """Static checks over the formatted physical plan."""
    plan = explain_formatted(df)
    issues: list[PlanIssue] = []

    if "CartesianProduct" in plan:
        issues.append(
            PlanIssue(
                "error",
                "cartesian",
                "CartesianProduct present — O(n·m) pair generation; "
                "broadcast one side or add an equi-condition",
            )
        )
    if "BroadcastNestedLoopJoin" in plan and "BroadcastExchange" not in plan:
        issues.append(
            PlanIssue(
                "warn",
                "bnlj-no-broadcast",
                "nested-loop join without a broadcast side",
            )
        )
    # a Filter directly above a FileScan whose PushedFilters is empty
    # means the predicate didn't reach the source
    for block in plan.split("\n\n"):
        if "PushedFilters: []" in block and "Filter" in plan:
            if "DataFilters: []" not in block:
                issues.append(
                    PlanIssue(
                        "warn",
                        "no-pushdown",
                        "scan has data filters but nothing pushed to the "
                        "source (non-convertible predicate?)",
                    )
                )
                break
    if plan.count("Exchange") >= 6:
        issues.append(
            PlanIssue(
                "warn",
                "many-shuffles",
                f"{plan.count('Exchange')} exchanges — check for a reusable "
                "partitioning or a missing broadcast",
            )
        )
    return issues

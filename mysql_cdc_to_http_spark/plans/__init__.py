"""Plan inspection & linting utilities (the 100 TB guardrails)."""

from mysql_cdc_to_http_spark.plans.inspect import (  # noqa: F401
    explain_formatted,
    lint_plan,
    PlanIssue,
)

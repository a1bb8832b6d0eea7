"""Table-group routing — the reference's YAML group config inverted into a
table→group map (``main.go:28-29, 308-332``), re-expressed as a broadcast
dimension join so routing scales with the event stream, not the driver.

The reference keys groups by bare table name, so identically-named tables
in different databases collide (last YAML group wins, main.go:325-329).
The engine keys by the full table identifier; callers that want reference
compat can pass bare names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Default groups, mirroring config/table_groups.example.yaml shape against
#: the testdata star schema (FIXTURES.md §4).
DEFAULT_GROUPS: dict[str, list[str]] = {
    "grp_sales": ["orders", "lineitem"],
    "grp_parties": ["customer", "supplier"],
}


def load_groups(path: str | None = None) -> dict[str, list[str]]:
    """Load group→tables config from YAML when available (the reference's
    loadTableGroups, main.go:313-332); fall back to DEFAULT_GROUPS."""
    if path is None:
        return dict(DEFAULT_GROUPS)
    try:
        import yaml  # optional dep — gated per environment contract

        with open(path) as fh:
            raw = yaml.safe_load(fh)
        return {str(g): [str(t) for t in ts] for g, ts in raw.items()}
    except ImportError:
        return dict(DEFAULT_GROUPS)


def invert_groups(groups: dict[str, list[str]]) -> dict[str, str]:
    """group→tables inverted to table→group; on collision the last group
    wins (reference iteration-order semantics, main.go:325-329)."""
    table_to_group: dict[str, str] = {}
    for group, tables in groups.items():
        for t in tables:
            table_to_group[t] = group
    return table_to_group


def routing_dim(spark: SparkSession, groups: dict[str, list[str]]) -> DataFrame:
    """(table, grp) dimension DataFrame for broadcast joins."""
    rows = [(t, g) for t, g in invert_groups(groups).items()]
    return spark.createDataFrame(rows, "table string, grp string")


def group_filter(
    df: DataFrame, spark: SparkSession, table_col: str = "table",
    groups: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Drop events whose table is in no group (main.go:51-55) — a
    broadcast left-semi join (no shuffle of the event stream)."""
    dim = routing_dim(spark, groups or DEFAULT_GROUPS)
    return df.join(
        F.broadcast(dim), df[table_col] == dim["table"], "left_semi"
    )


def assign_group(
    df: DataFrame, spark: SparkSession, table_col: str = "table",
    groups: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Attach the routing key (main.go:105): broadcast inner join against
    the inverted config dim; ungrouped events drop out, exactly like the
    reference's empty-group skip."""
    dim = routing_dim(spark, groups or DEFAULT_GROUPS)
    return df.join(
        F.broadcast(dim), df[table_col] == dim["table"], "inner"
    ).drop(dim["table"])

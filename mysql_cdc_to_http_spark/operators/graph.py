"""Duplicate-cluster resolution: connected components over near-dup
pairs (north-star dedup family — the step AFTER pair generation).

Pair lists (MinHash/SimHash/embedding LSH) are not deduplication yet: a
document can pair with many others, and transitive groups must collapse
to one canonical survivor. Components are computed with iterative
min-label propagation expressed in DataFrame ops:

    label(x) ← min(label(x), min over neighbors' labels)

Each round is one shuffle (groupBy on node); convergence is detected by
the SUM of labels (monotone non-increasing integers — equal sum ⇔ no
change), one cheap aggregate per round instead of a row diff. Rounds
needed = graph diameter; near-dup graphs are shallow (dup clusters are
cliques-ish, diameter ~2-4). At 10⁹+ nodes you would switch the body to
the alternating large-star/small-star formulation (Kiveris et al.,
"Connected Components in MapReduce and Beyond" — halves the rounds for
high-diameter graphs) and checkpoint labels every few rounds to truncate
lineage; the loop scaffold here is exactly that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (``id_col``, cluster_id): each node labeled with the
    MINIMUM node id reachable from it. Isolated nodes keep their own id.

    ``edges`` may be directed/unique pairs; they are symmetrized here.
    """
    sym = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).unionAll(
        edges.select(F.col(dst_col).alias("__s"), F.col(src_col).alias("__d"))
    )
    labels = nodes.select(
        F.col(id_col).alias("__node"), F.col(id_col).alias("__label")
    ).persist()
    prev_sum = labels.agg(F.sum("__label")).collect()[0][0]
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym["__d"] == labels["__node"])
            .groupBy("__s")
            .agg(F.min("__label").alias("__nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels["__node"] == neigh["__s"], "left")
            .select(
                "__node",
                F.least(
                    F.col("__label"),
                    F.coalesce("__nlabel", F.col("__label")),
                ).alias("__label"),
            )
            .persist()
        )
        # one aggregate per round; labels only ever decrease, so an equal
        # sum means fixpoint (no driver-side row materialization)
        cur_sum = new_labels.agg(F.sum("__label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(
        F.col("__node").alias(id_col), F.col("__label").alias("cluster_id")
    )


def canonicalize_clusters(
    components: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Mark the survivor per cluster (lowest id = the cluster label) —
    the row a dedup pipeline keeps; everything else is dropped or mapped
    to the canonical id."""
    return components.select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )


# Executors must not need this repo on their PYTHONPATH (driver contract
# imports by path).
import sys as _sys
from pyspark import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

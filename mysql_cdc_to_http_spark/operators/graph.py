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

import warnings

from pyspark.sql import DataFrame, functions as F

from mysql_cdc_to_http_spark.operators.caching import register_cached


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """Return (``id_col``, cluster_id): each node labeled with the
    MINIMUM node id reachable from it. Isolated nodes keep their own id.

    ``edges`` may be directed/unique pairs; they are symmetrized here.

    The fixpoint loop runs over the ACTIVE subgraph only — nodes with at
    least one edge. Isolated nodes cannot change label, so they bypass
    the loop and union back at the end: for dedup corpora (edges touch a
    small fraction of documents) this shrinks every round's shuffle from
    |V| to |V_active|. The edge list is persisted for the loop's
    lifetime — it is typically the output of an expensive pair pipeline
    (LSH + verify) that must not be re-evaluated per round.

    If the fixpoint is not reached within ``max_iter`` (graph diameter
    exceeds the budget), the labels are only partially propagated:
    ``strict=True`` (default) raises so an oracle-gated caller cannot
    silently return wrong components; ``strict=False`` downgrades to a
    warning and returns the partial labels.

    The returned frame depends on persisted intermediates — callers
    should ``release_all_cached()`` after materializing it
    (operators/caching.py).
    """
    # symmetrize via explode, not unionAll: one scan of the (typically
    # expensive LSH-pipeline) edge frame instead of two
    both = F.explode(
        F.array(
            F.struct(
                F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
            ),
            F.struct(
                F.col(dst_col).alias("__s"), F.col(src_col).alias("__d")
            ),
        )
    )
    sym = (
        edges.select(both.alias("__e")).select("__e.__s", "__e.__d").persist()
    )
    all_nodes = nodes.select(F.col(id_col).alias("__node"))
    # symmetric edge list ⇒ the __s column alone covers every endpoint
    endpoints = sym.select(F.col("__s").alias("__node")).distinct()
    # localCheckpoint, not persist: persist caches DATA but keeps the
    # logical plan, and each round's plan embeds the previous round's
    # TWICE (labels feeds both join inputs) — exponential Catalyst
    # re-analysis that stalls past ~8 rounds. Checkpointing truncates
    # lineage so every round re-plans a constant-size plan. On a real
    # cluster use rdd-reliable checkpoints to DFS every few rounds
    # (executor loss under localCheckpoint forfeits the blocks).
    labels = (
        all_nodes.join(endpoints, "__node", "left_semi")
        .select("__node", F.col("__node").alias("__label"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("__label")).collect()[0][0]
    converged = False
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
            .localCheckpoint()  # materializes; old round's blocks are
            # released by the ContextCleaner once unreferenced
        )
        # one aggregate per round; labels only ever decrease, so an equal
        # sum means fixpoint (no driver-side row materialization)
        cur_sum = new_labels.agg(F.sum("__label")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        msg = (
            f"connected_components: no fixpoint within max_iter={max_iter} "
            f"rounds — labels are PARTIALLY propagated (graph diameter "
            f"exceeds the iteration budget; raise max_iter)"
        )
        if strict:
            sym.unpersist()
            raise RuntimeError(msg)
        warnings.warn(msg)
    isolated = all_nodes.join(endpoints, "__node", "left_anti").select(
        "__node", F.col("__node").alias("__label")
    )
    out = labels.unionAll(isolated).select(
        F.col("__node").alias(id_col), F.col("__label").alias("cluster_id")
    )
    # labels is checkpoint-backed (freed by GC); only sym needs release
    return register_cached(out, [sym])


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

"""Iterative graph operators for dedup-cluster formation.

A near-dup pipeline emits PAIRS (dedup.py, similarity.py); turning
pairs into keep/drop decisions needs their transitive closure —
connected components. This is the canonical iterative DataFrame
algorithm: a driver-side loop over joins, with ``localCheckpoint``
truncating lineage each round so plan size stays O(1) instead of
growing with iterations (SURVEY §2.11 extension; the reference has no
graph surface).

Algorithm: min-label propagation. Every node starts labeled with
itself; each round every node takes the min label over itself and its
neighbors; converges in O(component diameter) rounds — near-dup
clusters are shallow (a hub duplicate links its copies), so typically
3–6 rounds. Each round is one shuffle-join + one groupBy on the edge
list. At 100 TB-scale graphs, swap in the large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) which converges in O(log n) rounds with shrinking
edges; min-label keeps the edge set constant per round, which is the
right trade at dedup-cluster shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_survivors"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; the component id
    is the minimum node id in the component (deterministic).

    ``edges`` is undirected input (each pair once is enough). Stops when
    a round changes no label, or after ``max_iter`` rounds (raises if
    unconverged — silent partial closure would merge too little).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = e.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    ).localCheckpoint()

    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least("component", "nbr_component").alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("__chg"),
            )
        ).localCheckpoint()  # cut lineage: plan stays one round deep
        changed = new_labels.where(F.col("__chg")).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str,
    src: str = "id_a", dst: str = "id_b",
) -> DataFrame:
    """Keep one row per near-dup cluster (the min-id member) plus every
    row not in any pair: the end-to-end dedup decision from a pair list.
    Anti-join on the non-representative members — full rows never
    shuffle by content."""
    cc = connected_components(pairs, src, dst)
    drop = cc.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")

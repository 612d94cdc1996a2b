"""Connected components over an edge DataFrame — the full form of the
reference's file-grouping graph (group -> edges via itertools.combinations,
components implied by networkx; /root/reference/tests/graph_test.py:9-20,
SURVEY.md §2.3 J6).

Algorithm: iterative min-label propagation entirely in DataFrames —
``label(v) = min(label(v), min over neighbors(label(u)))`` to a fixpoint.
Each round is one shuffle (groupBy node); convergence is O(graph diameter)
rounds, so callers should feed edge sets with bounded diameter (grouping
graphs are star-shaped: members link to a hub, diameter <= 2). For
adversarial diameters switch to large-star/small-star — not needed for the
grouping workload.

Scale notes: edges are symmetrized once; every round's shuffle keys on the
node id (uniform hash, no skew); the loop early-exits via an ``observe``
counter on the rows that changed, and each round's result is
``localCheckpoint``ed so lineage stays O(1) instead of O(rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.filter(F.col("a") != F.col("b")).distinct().localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    converged = False
    for _ in range(max_rounds):
        # candidate labels flowing across edges this round
        flowed = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "component")
        )
        obs = Observation()
        new_labels = (
            labels.select("node", "component")
            .unionByName(flowed)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        joined = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .select(
                "node",
                F.col("n.component").alias("component"),
                (F.col("n.component") != F.col("o.component")).alias("changed"),
            )
            .observe(obs, F.sum(F.col("changed").cast("long")).alias("n_changed"))
        )
        labels = joined.drop("changed").localCheckpoint()
        if int(obs.get["n_changed"] or 0) == 0:
            converged = True
            break
    if not converged:
        # loud failure beats silently-wrong components (graph diameter >
        # max_rounds): callers with legitimately deep graphs should raise
        # max_rounds or switch to large-star/small-star
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "graph diameter exceeds max_rounds"
        )
    return labels

"""Iterative graph operators: connected components via min-label
propagation (SURVEY.md §2.13 — exact transitive dedup clustering, the
upgrade over the greedy pair-drop rule in ``operators/corpus.py``).

Spark-first shape: the loop is driver-side CONTROL FLOW only — each
iteration is one distributed join + aggregate; convergence checked
with a cheap count. Label propagation halves the component diameter
per round, so iterations ~ O(log(diameter)); near-dup graphs (many
tiny cliques) converge in 2-3 rounds. For planet-scale graphs swap in
large-star/small-star; the API stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component id =
    the smallest node id in the component (deterministic).

    Each round: (1) every node adopts min(own label, neighbors'
    labels) — one hop of propagation; (2) path compression,
    ``comp <- comp(comp)`` — labels are themselves node ids, so one
    self-join doubles the effective propagation distance per round,
    giving O(log diameter) rounds on chains instead of O(diameter).
    Stops when no label changes. Each round's label table is
    ``localCheckpoint``ed: persist alone bounds recomputation but the
    LOGICAL plan still doubles per round (self-join) until the driver
    chokes planning it — checkpointing truncates lineage. On a real
    cluster prefer reliable ``checkpoint()`` (survives executor loss
    over long iterations)."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, on=[und.b == labels.node])
            .groupBy("a")
            .agg(F.min("comp").alias("nmin"))
        )
        propagated = (
            labels.join(neighbor_min, on=[labels.node == neighbor_min.a], how="left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp")))
                .alias("comp"),
            )
        )
        # compression: comp labels are node ids, so comp(comp) is
        # defined; shortcuts chains (pointer-jumping step)
        x, y = propagated.alias("x"), propagated.alias("y")
        new_labels = (
            x.join(y, on=[F.col("x.comp") == F.col("y.node")], how="left")
            .select(
                F.col("x.node").alias("node"),
                F.coalesce(F.col("y.comp"), F.col("x.comp")).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels.orderBy("node")


def component_sizes(components: DataFrame) -> DataFrame:
    """(component, n_nodes), largest first — the dedup-cluster report."""
    return (
        components.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "comp")
    )

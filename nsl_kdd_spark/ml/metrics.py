"""Spark-native evaluation operators (SURVEY.md §2.11).

The reference collects (pred, label) pairs to the driver and runs
sklearn (README.md:1433-1475) — O(N) driver memory. The engine derives
every metric from the 4 confusion-matrix cells computed with one
distributed ``groupBy(label, pred).count()``: constant driver memory at
any scale. FAR = fp/(fp+tn) and DR = tp/(tp+fn) follow the reference's
definitions (README.md:1469-1470). AUC is rank-based (Mann-Whitney),
computed with a window over scores — also fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def confusion_matrix(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """4-cell CM: one row (tn, fp, fn, tp). Labels/preds are 0/1."""
    lbl = F.col(label_col).cast("int")
    prd = F.col(pred_col).cast("int")
    return df.agg(
        F.count(F.when((lbl == 0) & (prd == 0), 1)).alias("tn"),
        F.count(F.when((lbl == 0) & (prd == 1), 1)).alias("fp"),
        F.count(F.when((lbl == 1) & (prd == 0), 1)).alias("fn"),
        F.count(F.when((lbl == 1) & (prd == 1), 1)).alias("tp"),
    )


def binary_metrics(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """One-row report: CM cells + accuracy, precision, detection rate
    (recall), false-alarm rate, F1 — all exact (integer counts, then
    deterministic double division)."""
    cm = confusion_matrix(df, label_col, pred_col)
    tn, fp, fn, tp = [F.col(c).cast("double") for c in ("tn", "fp", "fn", "tp")]
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return cm.select(
        "tn", "fp", "fn", "tp",
        ((tp + tn) / (tp + tn + fp + fn)).alias("accuracy"),
        precision.alias("precision"),
        recall.alias("detection_rate"),
        (fp / (fp + tn)).alias("false_alarm_rate"),
        (2 * precision * recall / (precision + recall)).alias("f1"),
    )


def auc_roc(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """Rank-based AUC (Mann-Whitney U): ties handled with average rank.

    AUC = (sum of positive ranks - n_pos(n_pos+1)/2) / (n_pos * n_neg).
    One global sort by score — the same shuffle cost as any ranking
    metric; no driver collect."""
    ranked = df.select(
        F.col(label_col).cast("int").alias("_y"),
        F.col(score_col).cast("double").alias("_s"),
    ).withColumn(
        # average rank over ties: avg of row_number within equal scores
        "_r",
        F.avg(F.row_number().over(Window.orderBy("_s")))
        .over(Window.partitionBy("_s")),
    )
    return ranked.agg(
        (
            (F.sum(F.when(F.col("_y") == 1, F.col("_r"))) -
             F.sum(F.col("_y")) * (F.sum(F.col("_y")) + 1) / 2)
            / (F.sum(F.col("_y")) * F.sum(F.lit(1) - F.col("_y")))
        ).alias("auc")
    )

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


def format_report(metrics_row, labels: tuple[str, str] = ("normal", "attack")) -> str:
    """Human-readable report in the reference's ``printReport`` shape
    (README.md:1433-1475): confusion matrix + headline metrics. Input
    is one collected row of ``binary_metrics`` — formatting is
    driver-side string work on 8 numbers, never a distributed op."""
    m = metrics_row
    neg, pos = labels
    w = max(len(neg), len(pos), 7)
    lines = [
        f"{'':>{w}} | {neg:>{w}} | {pos:>{w}}",
        f"{neg:>{w}} | {int(m['tn']):>{w}} | {int(m['fp']):>{w}}",
        f"{pos:>{w}} | {int(m['fn']):>{w}} | {int(m['tp']):>{w}}",
        "",
        f"Accuracy:         {m['accuracy']:.4f}",
        f"Precision:        {m['precision']:.4f}",
        f"Detection Rate:   {m['detection_rate']:.4f}",
        f"False Alarm Rate: {m['false_alarm_rate']:.4f}",
        f"F1:               {m['f1']:.4f}",
    ]
    return "\n".join(lines)


def correlation_matrix(
    df: DataFrame, columns: list[str], method: str = "pearson"
) -> DataFrame:
    """MLlib Correlation matrix over a column list (the reference's
    commented-out experiment M20, README.md:1002-1016) — returns a
    tidy (col_a, col_b, corr) table instead of a packed Matrix."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Correlation

    assembled = VectorAssembler(
        inputCols=columns, outputCol="__corr_vec"
    ).transform(df.select(*columns))
    mat = Correlation.corr(assembled, "__corr_vec", method).head()[0].toArray()
    rows = [
        (columns[i], columns[j], float(mat[i][j]))
        for i in range(len(columns))
        for j in range(len(columns))
    ]
    spark = df.sparkSession
    return spark.createDataFrame(rows, "col_a string, col_b string, corr double")

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

from nsl_kdd_spark.functions.scalar import ppm_of


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


def _derived_metric_cols() -> list:
    """The shared metric formulas over (tn, fp, fn, tp) columns —
    single definition, so the one-model and one-pass multi-model
    reports compute byte-identical numbers."""
    tn, fp, fn, tp = [F.col(c).cast("double") for c in ("tn", "fp", "fn", "tp")]
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return [
        ((tp + tn) / (tp + tn + fp + fn)).alias("accuracy"),
        precision.alias("precision"),
        recall.alias("detection_rate"),
        (fp / (fp + tn)).alias("false_alarm_rate"),
        (2 * precision * recall / (precision + recall)).alias("f1"),
    ]


def binary_metrics(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """One-row report: CM cells + accuracy, precision, detection rate
    (recall), false-alarm rate, F1 — all exact (integer counts, then
    deterministic double division)."""
    cm = confusion_matrix(df, label_col, pred_col)
    return cm.select("tn", "fp", "fn", "tp", *_derived_metric_cols())


def binary_metrics_multi(
    df: DataFrame, label_col: str, pred_cols: dict[str, str]
) -> DataFrame:
    """One row PER MODEL — same cells and formulas as
    :func:`binary_metrics` — from a SINGLE aggregate pass over the
    scored table. The ensemble-evaluation shape: scoring N models
    (per-model preds + blend + OR-vote) must not scan the fact table
    N times; all 4N conditional counts ride one partial+final
    aggregate (the q113 expectations pattern), and the 1-row result
    unpivots to N rows driver-free. Output sorted by model name."""
    lbl = F.col(label_col).cast("int")
    aggs = []
    for name, pred in pred_cols.items():
        prd = F.col(pred).cast("int")
        aggs += [
            F.count(F.when((lbl == 0) & (prd == 0), 1)).alias(f"__{name}_tn"),
            F.count(F.when((lbl == 0) & (prd == 1), 1)).alias(f"__{name}_fp"),
            F.count(F.when((lbl == 1) & (prd == 0), 1)).alias(f"__{name}_fn"),
            F.count(F.when((lbl == 1) & (prd == 1), 1)).alias(f"__{name}_tp"),
        ]
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(name).alias("model"),
                    F.col(f"__{name}_tn").alias("tn"),
                    F.col(f"__{name}_fp").alias("fp"),
                    F.col(f"__{name}_fn").alias("fn"),
                    F.col(f"__{name}_tp").alias("tp"),
                )
                for name in pred_cols
            ])
        ).alias("__s")
    ).select("__s.*")
    return stacked.select(
        "model", "tn", "fp", "fn", "tp", *_derived_metric_cols()
    ).orderBy("model")


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


def ranking_metrics(
    ranked: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """IR ranking quality per query: NDCG@k and reciprocal rank over
    a (query, rank, relevance) table — the evaluation side of the
    retrieval tier (BM25/ANN produce the rankings; this scores them,
    as q21/q22 score classifiers).

    Output per query: (query, n_rel, dcg_u, idcg_u, ndcg_ppm, rr_u).
    Every per-position gain ``rel / log2(pos + 1)`` quantizes to
    integer micro-units BEFORE summation (the fixed-point tier), and
    NDCG is the integer ratio ``dcg_u * 1e6 div idcg_u`` — exact
    across engines/partitionings. IDCG re-ranks by relevance DESC
    (ties by original rank, a total order). Queries with no relevant
    results report ndcg_ppm = 0 and rr_u = 0, surfaced not dropped.

    NDCG variant: this is *local* NDCG@k — IDCG is computed over the
    RETRIEVED top-k rows only (the ideal reordering of what the
    system returned), not over all judged documents truncated at k.
    A query whose only retrieved relevant doc sits at rank 1 scores
    ndcg_ppm = 1e6 even if more relevant docs exist beyond k; textbook
    (global) NDCG@k would score it lower. Local NDCG needs no second
    judgment table and matches the q123 oracle; pass the full judged
    pool as ``ranked`` (rank = judged order) if global semantics are
    needed.

    Scale shape: one window sort per query partition (the ideal
    ordering is a per-query re-rank — queries are many and small, so
    the partition-keyed window is the right tool here, unlike
    fact-table windows), then one grouped integer sum.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(query_col).orderBy(
        F.desc(rel_col), F.asc(rank_col)
    )
    top = ranked.filter(F.col(rank_col) <= k)
    gain_u = F.round(
        F.col(rel_col).cast("double")
        / (F.log(F.col(rank_col).cast("double") + 1.0) / F.log(F.lit(2.0)))
        * F.lit(float(scale))
    ).cast("long")
    ideal_pos = F.row_number().over(w)
    ideal_gain_u = F.round(
        F.col(rel_col).cast("double")
        / (F.log(ideal_pos.cast("double") + 1.0) / F.log(F.lit(2.0)))
        * F.lit(float(scale))
    ).cast("long")
    # all-integer round-half-up of scale/rank, same as retrieval_eval
    # (round-10 review: scale and k are both free parameters here, so
    # the float-ROUND variant's "halves are unreachable" argument only
    # held for the defaults — e.g. k=200 at scale=1e6 hits 1e6/128 =
    # 7812.5, where HALF_UP vs banker's rounding engines diverge).
    # rank_col is backtick-quoted (escaped) and scale coerced to int
    # so exotic column names and float scales can't break the
    # interpolated `div` at analysis time (round-10 advisory)
    rank_q = "`" + rank_col.replace("`", "``") + "`"
    rr_u = F.when(
        F.col(rel_col) > 0,
        F.expr(
            f"({2 * int(scale)} + {rank_q}) div (2 * {rank_q})"
        ),
    ).otherwise(F.lit(0))
    per = top.select(
        F.col(query_col),
        (F.col(rel_col) > 0).cast("long").alias("__isrel"),
        gain_u.alias("__g"),
        ideal_gain_u.alias("__ig"),
        rr_u.alias("__rr"),
    )
    agg = per.groupBy(query_col).agg(
        F.sum("__isrel").alias("n_rel"),
        F.sum("__g").alias("dcg_u"),
        F.sum("__ig").alias("idcg_u"),
        F.expr(
            "CASE WHEN sum(__ig) > 0"
            " THEN (sum(__g) * 1000000) div sum(__ig) ELSE 0 END"
        ).alias("ndcg_ppm"),
        F.max("__rr").alias("rr_u"),
    )
    # queries whose results ALL sit past rank k vanish from `top`;
    # re-anchor on the full query set so they surface as zero rows
    # (the docstring contract — review r05)
    all_q = ranked.select(query_col).distinct()
    return (
        all_q.join(agg, query_col, "left")
        .select(
            query_col,
            *[
                F.coalesce(F.col(c), F.lit(0)).alias(c)
                for c in ("n_rel", "dcg_u", "idcg_u", "ndcg_ppm", "rr_u")
            ],
        )
        .orderBy(query_col)
    )


def retrieval_eval(
    run: DataFrame,
    positives: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "vec_id",
    rank_col: str = "rank",
    k: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Score a retrieval run against a labeled positives table — the
    evaluation stage of the round-9 retrieval pipeline (ANN retrieval
    q31/q114 and hard-negative mining q149 produce ranked runs; this
    closes the loop, the r8 verdict's suggested composition).

    ``run`` is a ranked retrieval table (query, doc, rank);
    ``positives`` holds the judged relevant (query, doc) pairs.
    Output per query, every metric a fixed-point integer (the q123
    convention — bit-identical across engines and partitionings):

    - ``n_pos``: judged positives for the query (0 if unjudged),
    - ``hits``: positives retrieved within the top-``k``,
    - ``recall_ppm``: ``hits * 1e6 div n_pos`` (0 when unjudged),
    - ``precision_ppm``: ``hits * 1e6 div k``,
    - ``rr_u``: reciprocal rank of the first retrieved positive in
      micro-units, 0 when none was retrieved.

    Scale shape: the label join is a broadcast-able equi-join on
    (query, doc) — positives tables are human/synthetic judgments,
    orders of magnitude smaller than the run — followed by one
    grouped integer aggregation; queries are re-anchored on the run's
    query set so a query retrieving zero positives reports zeros
    instead of vanishing."""
    # interpolated into `div` expressions below — a float scale/k
    # would render a non-integral literal that `div` rejects at
    # analysis time (the round-10 ranking_metrics advisory class)
    scale = int(scale)
    k = int(k)
    hit = F.col("__pos").isNotNull()
    # ONE distinct judgment table feeds both the label join and the
    # per-query positive counts (round-9 review: two independent
    # .distinct() calls scanned and shuffled the positives twice)
    pairs = positives.select(query_col, doc_col).distinct()
    labeled = run.filter(F.col(rank_col) <= k).join(
        F.broadcast(pairs.withColumn("__pos", F.lit(1))),
        on=[query_col, doc_col],
        how="left",
    )
    per_q = labeled.groupBy(query_col).agg(
        F.sum(hit.cast("long")).alias("hits"),
        F.min(F.when(hit, F.col(rank_col))).alias("__first"),
    )
    n_pos = pairs.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_pos")
    )
    all_q = run.select(query_col).distinct()
    return (
        all_q.join(per_q, query_col, "left")
        .join(F.broadcast(n_pos), query_col, "left")
        .select(
            query_col,
            F.coalesce("n_pos", F.lit(0)).alias("n_pos"),
            F.coalesce("hits", F.lit(0)).alias("hits"),
            F.expr(
                f"CASE WHEN coalesce(n_pos, 0) > 0 THEN"
                f" (coalesce(hits, 0) * {scale}) div n_pos"
                f" ELSE 0 END"
            ).alias("recall_ppm"),
            F.expr(
                f"(coalesce(hits, 0) * {scale}) div {k}"
            ).alias("precision_ppm"),
            # all-integer round-half-up of scale/first_rank: float
            # round here would pin the result to the engine's rounding
            # mode on an exact .5 quotient (Spark HALF_UP vs whatever
            # the oracle engine does) — (2s + r) div (2r) is the same
            # value for every non-half quotient and engine-independent
            # on the halves (round-10 advisory)
            F.coalesce(
                F.expr(f"({2 * scale} + __first) div (2 * __first)"),
                F.lit(0),
            ).alias("rr_u"),
        )
        .orderBy(query_col)
    )


def calibration_report(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Probability-calibration profile + Brier decomposition inputs:
    bucket predictions by score into ``n_bins`` equal-width bins and
    report, per bin, the count, mean predicted score and empirical
    positive rate — the reliability-diagram table — plus the bin's
    Brier contribution (mean squared error of score vs outcome).

    Everything is fixed-point: scores quantize to micro-units and
    squared errors to micro²-units BEFORE summation, rates are
    integer-ppm — bit-identical across engines (completes the eval
    tier: q21 confusion/FAR, q22 AUC, q123 NDCG). Scores outside
    [0, 1] raise at runtime via the bin clamp check.

    Scale shape: one map-side-combined grouped aggregate; bins are
    bounded (n_bins rows out).
    """
    s0 = F.col(score_col).cast("double")
    # NULL must be tested apart (NULL < 0 is NULL, not false): a NULL
    # score would otherwise slip through and form a silent NULL bin
    s = F.when(
        s0.isNull() | (s0 < 0.0) | (s0 > 1.0),
        F.raise_error(
            F.concat(
                F.lit("calibration_report: score outside [0, 1]: "),
                F.coalesce(s0.cast("string"), F.lit("NULL")),
            )
        ).cast("double"),
    ).otherwise(s0)
    su = F.round(s * F.lit(float(scale))).cast("long")
    y = F.col(label_col).cast("long")
    bin_id = F.least(
        F.floor(s * F.lit(float(n_bins))).cast("long"), F.lit(n_bins - 1)
    )
    # squared error in micro-units: ((su - y*scale)^2) div scale keeps
    # the integer magnitude bounded while staying exact integer math
    se_u = F.expr(
        f"((__su - __y * {scale}) * (__su - __y * {scale})) div {scale}"
    )
    return (
        scored.select(
            bin_id.alias("bin"), su.alias("__su"), y.alias("__y")
        )
        .select("bin", "__su", "__y", se_u.alias("__se"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("sum(__su) div count(1)").alias("mean_score_u"),
            ppm_of("sum(__y)", "count(1)").alias("pos_rate_ppm"),
            F.expr("sum(__se) div count(1)").alias("brier_u"),
        )
        .orderBy("bin")
    )

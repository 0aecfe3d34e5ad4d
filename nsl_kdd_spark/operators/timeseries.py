"""Time-series resampling: regular-grid bucketing with gap fill and
forward fill (SURVEY §2.12-adjacent; the batch complement of the
windowed aggs in ``streaming/events.py`` and of the as-of join in
``operators/asof.py``).

Plan shape (scale rationale): one hash agg keyed by (key, bucket) —
partial+final, linear; the spine is generated from the per-key span
aggregate (tiny: one row per key) via ``sequence``+``explode``, so no
driver loop and no cross join; the left join back to buckets is an
equi-join on the same (key, bucket) key; forward fill is one analytic
window per key ordered by bucket. State: nothing on the driver; skew
only if one key dominates — same mitigation as any keyed agg (AQE /
salting).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.scalar import ppm_of


def to_bucket(ts_col: Column | str, step_seconds: int) -> Column:
    """Epoch-aligned bucket start (long seconds): floor(epoch/step)*step.
    Integer ``div`` keeps the math exact and engine-portable."""
    from nsl_kdd_spark.functions.scalar import epoch_seconds

    e = epoch_seconds(ts_col, "long")
    return (e - (e % F.lit(step_seconds))).cast("long")


def resample_ffill(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    step_seconds: int,
    aggs: Sequence[Column],
    ffill_cols: Sequence[str] = (),
) -> DataFrame:
    """Resample events onto a regular per-key grid, keeping empty
    buckets, and forward-fill the named aggregate columns across gaps.

    Output: one row per (key, bucket) for EVERY bucket between the
    key's first and last event — gap buckets carry ``n_events = 0``,
    null aggregates, and, for each ``c`` in ``ffill_cols``, a
    ``{c}_ffill`` column holding the last non-null value at or before
    the bucket (classic last-observation-carried-forward).
    """
    keys = list(key_cols)
    bucketed = (
        df.withColumn("__bucket", to_bucket(ts_col, step_seconds))
        .groupBy(*keys, "__bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), *aggs)
    )
    span = bucketed.groupBy(*keys).agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    spine = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_seconds).cast("long"))
        ).alias("__bucket"),
    )
    grid = spine.join(bucketed, on=[*keys, "__bucket"], how="left").withColumn(
        "n_events", F.coalesce(F.col("n_events"), F.lit(0)).cast("long")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in ffill_cols:
        grid = grid.withColumn(f"{c}_ffill", F.last(c, ignorenulls=True).over(w))
    return grid.withColumnRenamed("__bucket", "bucket").orderBy(*keys, "bucket")


def resample_interp(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    step_seconds: int,
    value_agg: Column,
    value_name: str = "value",
) -> DataFrame:
    """Resample onto the per-key grid and LINEARLY interpolate the
    aggregated value across gap buckets.

    For a gap bucket between the previous observed bucket ``(t0,v0)``
    and the next observed bucket ``(t1,v1)``:
    ``v = v0 + (v1 - v0) * (t - t0) / (t1 - t0)``. Buckets before the
    first / after the last observation keep the boundary value (the
    span is clamped to observed buckets, so this only matters when
    aggregates are null on a present bucket).

    Same plan shape as ``resample_ffill`` plus one backward analytic
    window (first non-null ahead) — two window passes over the grid,
    both on the same (key, bucket) sort, so Spark reuses one sort
    exchange. All arithmetic is double with identical operand order in
    any engine — DuckDB-oracle-checkable.
    """
    keys = list(key_cols)
    bucketed = (
        df.withColumn("__bucket", to_bucket(ts_col, step_seconds))
        .groupBy(*keys, "__bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), value_agg.alias("__v"))
    )
    span = bucketed.groupBy(*keys).agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    spine = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_seconds).cast("long"))
        ).alias("__bucket"),
    )
    grid = spine.join(bucketed, on=[*keys, "__bucket"], how="left").withColumn(
        "n_events", F.coalesce(F.col("n_events"), F.lit(0)).cast("long")
    )
    back = (
        Window.partitionBy(*keys)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy("__bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nn = F.when(F.col("__v").isNotNull(), F.col("__bucket"))
    grid = (
        grid.withColumn("__v0", F.last("__v", ignorenulls=True).over(back))
        .withColumn("__t0", F.last(nn, ignorenulls=True).over(back))
        .withColumn("__v1", F.first("__v", ignorenulls=True).over(fwd))
        .withColumn("__t1", F.first(nn, ignorenulls=True).over(fwd))
    )
    interp = (
        F.when(F.col("__v").isNotNull(), F.col("__v"))
        .when(F.col("__v0").isNull(), F.col("__v1"))
        .when(F.col("__v1").isNull(), F.col("__v0"))
        .otherwise(
            F.col("__v0")
            + (F.col("__v1") - F.col("__v0"))
            * (F.col("__bucket") - F.col("__t0")).cast("double")
            / (F.col("__t1") - F.col("__t0")).cast("double")
        )
    )
    return (
        grid.select(
            *keys,
            F.col("__bucket").alias("bucket"),
            "n_events",
            F.col("__v").alias(value_name),
            interp.alias(f"{value_name}_interp"),
        )
        .orderBy(*keys, "bucket")
    )


def rolling_ewma(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.5,
    k: int = 8,
) -> DataFrame:
    """Exponentially weighted moving average over the last ``k``
    observations per key (pandas ``ewm(alpha).mean()`` truncated to a
    ``k``-row window; adjust=True normalization).

    ewma_i = sum_{j=0..m-1} (1-a)^j * x_{i-j} / sum_j (1-a)^j, where
    m = min(i+1, k). Truncation to k rows is what makes the formula
    safe in fixed-precision float: the untruncated closed form needs
    (1-a)^{-i} terms that overflow for long series, while weights here
    never leave [(1-a)^{k-1}, 1]. With a=0.5, k=8 the truncation error
    is < 0.4% of the oldest retained weight — pick k ~ log(eps)/log(1-a).

    Plan: one analytic window per key (``collect_list`` over a k-row
    frame), then a JVM-side higher-order ``aggregate`` over the <= k
    element array — no UDF, no second shuffle, state bounded by k.
    ``collect_list`` does not contractually preserve frame order, so
    (ts, value) structs are collected and ``array_sort``-ed — the
    weight assignment never depends on accumulation order.
    """
    keys = list(key_cols)
    r = 1.0 - alpha
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(-(k - 1), Window.currentRow)
    )
    lst = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(value_col).cast("double").alias("v"),
                )
            ).over(w)
        ),
        lambda s: s["v"],
    )
    num = F.aggregate(
        F.zip_with(
            F.col("__lst"),
            F.sequence(F.lit(1), F.size("__lst")),
            lambda v, i: v * F.pow(F.lit(r), (F.size("__lst") - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.size("__lst")),
            lambda i: F.pow(F.lit(r), (F.size("__lst") - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        df.withColumn("__lst", lst)
        .withColumn("ewma", num / den)
        .drop("__lst")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k_x10: int = 30,
) -> DataFrame:
    """Robust per-group outlier profile via median absolute deviation:
    a point is an outlier when ``|v - median| > (k_x10/10) * MAD`` —
    the classic distribution-free rule (k=3 by default), immune to the
    outliers themselves unlike z-scores (``functions.scalar.zscore``).

    Output per group: (group, n, med, mad, n_outliers, outlier_ppm).
    Medians are exact interpolated percentiles (q52-verified
    cross-engine semantics); the flag compares doubles both engines
    derive through the identical expression tree, and the counts/ppm
    are integers — deterministic under any partitioning.

    Scale shape: two grouped percentile passes (median, then median of
    absolute deviations — inherently sequential), each map-side
    partial; the per-group median tables broadcast back. At 100 TB
    swap exact percentile for ``approx_percentile`` with a pinned
    accuracy, same plan shape.
    """
    v = F.col(value_col).cast("double")
    med = df.groupBy(group_col).agg(F.percentile(v, F.lit(0.5)).alias("med"))
    dev = df.join(F.broadcast(med), group_col)
    mad = dev.groupBy(group_col).agg(
        F.percentile(F.abs(v - F.col("med")), F.lit(0.5)).alias("mad")
    )
    flagged = (
        dev.join(F.broadcast(mad), group_col)
        .select(
            group_col,
            "med",
            "mad",
            (
                F.abs(v - F.col("med"))
                > (F.lit(k_x10).cast("double") / F.lit(10.0)) * F.col("mad")
            ).cast("long").alias("__out"),
        )
    )
    return (
        flagged.groupBy(group_col, "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__out").alias("n_outliers"),
            ppm_of("sum(__out)", "count(1)").alias("outlier_ppm"),
        )
        .select(group_col, "n", "med", "mad", "n_outliers", "outlier_ppm")
        .orderBy(group_col)
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    scale: int = 1_000,
) -> DataFrame:
    """Time-weighted average per key: each observation holds until
    the NEXT one, so its weight is that interval's duration — the
    correct mean for irregularly-sampled state (sensor readings,
    prices, resource gauges), where the plain AVG over-weights busy
    periods. The last observation of a key carries no interval and
    is excluded from the weighted mean (standard TWAP-to-last
    convention).

    Output per key: (key, n, span_s, twa_u) — ``twa_u`` the
    time-weighted mean in integer ``1/scale`` units: per-interval
    ``value * duration_seconds`` quantizes BEFORE the sum, and the
    final division is integer ``div`` — the fixed-point exact tier,
    engine/partitioning-stable. The default milli-unit scale keeps
    ``scale^2 * |v|max * span`` inside int64 for realistic keys
    (bound: sum(v*dt)*scale^2 < 2^63 — raise scale only for short
    spans). Ties in ``ts_col`` get zero-length intervals (harmless);
    pass ``tiebreak_col`` for a total order.

    Scale shape: ONE window (lead) over the key partition — the same
    single-sort shape as sessionize/transitions — then a
    map-side-combined grouped sum.
    """
    from pyspark.sql import Window

    from nsl_kdd_spark.functions.scalar import epoch_seconds

    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    es = epoch_seconds(ts_col, "double")
    stepped = df.select(
        F.col(key_col),
        es.alias("__t"),
        F.lead(es).over(w).alias("__tn"),
        F.col(value_col).cast("double").alias("__v"),
    )
    # integer 1/scale-unit-seconds per interval (milli by default);
    # exact integer sums
    wu = F.round(
        F.col("__v") * (F.col("__tn") - F.col("__t")) * F.lit(float(scale))
    ).cast("long")
    du = F.round((F.col("__tn") - F.col("__t")) * F.lit(float(scale))).cast(
        "long"
    )
    return (
        stepped.filter(F.col("__tn").isNotNull())
        .select(key_col, wu.alias("__wu"), du.alias("__du"))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"sum(__du) div {scale}").alias("span_s"),
            F.expr(
                "CASE WHEN sum(__du) > 0"
                f" THEN (sum(__wu) * {scale}) div sum(__du) ELSE NULL END"
            ).alias("twa_u"),
        )
        .orderBy(key_col)
    )

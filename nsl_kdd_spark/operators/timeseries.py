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


def to_bucket(ts_col: Column | str, step_seconds: int) -> Column:
    """Epoch-aligned bucket start (long seconds): floor(epoch/step)*step.
    Integer ``div`` keeps the math exact and engine-portable."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (c.cast("long") - (c.cast("long") % F.lit(step_seconds))).cast("long")


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

"""Banded range join (SURVEY.md §2.3: the reference has no range/
interval joins; vanilla Spark plans an inequality-only join as
BroadcastNestedLoop or cartesian — the classic scale trap).

``point_in_window_join``: match points ``p`` to windows
``[anchor, anchor + width)``. Implementation bands the time axis at
``width`` granularity: every anchor covers at most 2 bands, points
cover 1, so the join is an EQUI-join on band id followed by the exact
range filter — linear shuffle, no cartesian anywhere. The same
banding generalizes to any bounded-width interval join (spatial grids,
numeric tolerances).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_window_join(
    points: DataFrame,
    anchors: DataFrame,
    point_ts: str,
    anchor_ts: str,
    width_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Rows = (anchor row ⨯ matching point rows) where
    ``anchor_ts <= point_ts < anchor_ts + width``.

    Column names must be disjoint between the two inputs (alias
    beforehand). ``how='left'`` keeps anchors with no points (null
    point columns)."""
    from nsl_kdd_spark.functions.scalar import epoch_seconds

    band = lambda c: F.floor(  # noqa: E731
        epoch_seconds(c, "double") / width_seconds
    ).cast("long")

    a = anchors.withColumn(
        "__band",
        F.explode(F.array(band(F.col(anchor_ts)), band(F.col(anchor_ts)) + 1)),
    )
    p = points.withColumn("__band", band(F.col(point_ts)))
    in_range = (F.col(point_ts) >= F.col(anchor_ts)) & (
        epoch_seconds(F.col(point_ts), "double")
        < epoch_seconds(F.col(anchor_ts), "double") + width_seconds
    )
    joined = a.join(p, on=["__band"], how="inner").filter(in_range).drop("__band")
    if how == "inner":
        return joined
    if how == "left":
        matched = joined
        missing = anchors.join(
            matched.select(*anchors.columns).distinct(), on=anchors.columns, how="left_anti"
        )
        for c in points.columns:
            missing = missing.withColumn(c, F.lit(None).cast(dict(points.dtypes)[c]))
        return matched.unionByName(missing)
    raise ValueError(f"unsupported how={how!r}")

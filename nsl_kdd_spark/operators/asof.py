"""As-of (most-recent-match) join — a SURVEY.md §2.3 gap: Spark has no
native ASOF JOIN; time-series engines (and DuckDB) do.

Semantics: for every left row (key, lt), attach the right row with
the largest rt <= lt (direction="backward", default) or the smallest
rt >= lt (direction="forward"). The naive formulation is a range
join (quadratic blowup per key); the engine uses the union-and-carry
trick instead:

    union(left-tagged, right-tagged)
    -> one window per key ordered by (ts asc|desc per direction, side)
    -> last_value(right payload, ignoreNulls) carries the nearest
       right row onto each left row

One shuffle on the key, linear state, no range explosion — the same
plan shape at 100 TB as at test scale. Ties (rt == lt) match in both
directions: right rows sort before left rows at equal timestamps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. Result = all left columns + ``right_values``
    (null when no right row matches). ``tolerance_seconds`` nulls out
    matches farther than the tolerance (standard asof option).
    ``direction``: "backward" (largest rt <= lt, the default) or
    "forward" (smallest rt >= lt) — the pandas ``merge_asof``
    directions; forward is the same union-and-carry plan with the
    window order flipped, so both are one shuffle, no range blowup.
    Ties (rt == lt) match in both directions."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [key] if isinstance(key, str) else list(key)

    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ats", F.col(left_ts))
    rhs = (
        right.select(
            *keys,
            F.col(right_ts).alias("__ats"),
            F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_values])
            .alias("__rv"),
        )
        .withColumn("__side", F.lit(0))
    )
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    rhs = rhs.select(*[c for c in lhs.columns if c != "__rv"], "__rv")
    lhs = lhs.withColumn("__rv", F.lit(None).cast(dict(rhs.dtypes)["__rv"]))

    unioned = lhs.unionByName(rhs)
    ts_order = (
        F.col("__ats").asc() if direction == "backward"
        else F.col("__ats").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__rv", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        from nsl_kdd_spark.functions.scalar import epoch_seconds

        gap = (
            epoch_seconds(F.col("__ats"), "double")
            - epoch_seconds(F.col("__match.__rts"), "double")
        )
        in_tol = F.abs(gap) <= F.lit(float(tolerance_seconds))
        out = out.withColumn("__match", F.when(in_tol, F.col("__match")))
    for c in right_values:
        out = out.withColumn(c, F.col(f"__match.{c}"))
    out = out.withColumn("matched_ts", F.col("__match.__rts"))
    return out.drop("__side", "__ats", "__rv", "__match")

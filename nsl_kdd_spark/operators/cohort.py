"""Cohort retention analysis: bucket users by first-activity period,
then count how many stay active k periods later — the standard
engagement/retention matrix (reference analog: the per-group
crosstab + derived-ratio pattern of SURVEY §2.4 A2/A8, applied to
event time instead of categories).

Spark-first shape: two hash aggregations (per-user first period, then
per-(cohort, offset) distinct users) joined to cohort sizes — no
windows over the event log, no driver collect. All outputs are
integers (counts + ppm ratios via integer div), so results are
bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIOD_DAYS = {"day": 1, "week": 7}


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int = 12,
) -> DataFrame:
    """(cohort, offset, n_users, cohort_size, retention_ppm) — one row
    per cohort x period-offset with >=1 active user.

    ``cohort`` is the user's first activity period (``date_trunc``,
    ISO Monday weeks); ``offset`` counts whole periods between cohort
    and activity period as a CALENDAR-day difference (``datediff div
    days-per-period``), so a DST transition inside the span cannot
    shift the bucket the way an epoch-seconds difference would in a
    non-UTC session (review r04); ``retention_ppm`` is
    ``n_users * 1_000_000 div cohort_size`` — integer arithmetic, no
    float ratio to diverge between engines.

    Scale shape (100 TB of events): the per-user first-period pass and
    the activity-dedup pass both reduce map-side on user keys; the
    cohort-size table is tiny (one row per period) and broadcasts onto
    the retention counts. Nothing scans the log twice except the two
    independent aggregations — at scale, derive both from one
    (user, period) distinct projection if the log is wide.
    """
    if period not in _PERIOD_DAYS:
        raise ValueError(f"period must be one of {sorted(_PERIOD_DAYS)}")
    step = _PERIOD_DAYS[period]

    activity = events.select(
        F.col(user_col).alias("user"),
        F.date_trunc(period, F.col(ts_col)).alias("p"),
    ).distinct()
    first = activity.groupBy("user").agg(F.min("p").alias("cohort"))
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    ret = (
        activity.join(first, "user")
        .select(
            "user",
            "cohort",
            F.expr(f"datediff(p, cohort) div {step}").alias("offset"),
        )
        .filter(F.col("offset") <= max_offset)
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return (
        ret.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "offset",
            "n_users",
            "cohort_size",
            F.expr("(n_users * 1000000) div cohort_size").alias("retention_ppm"),
        )
        .orderBy("cohort", "offset")
    )

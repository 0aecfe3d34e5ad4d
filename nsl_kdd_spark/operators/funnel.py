"""Ordered-event funnel analysis (engine extension; no reference
analog — the reference never looks at event sequences). The classic
product-analytics question: of the users who did step 1, how many went
on to do step 2 AFTER it, then step 3 after that — optionally all
within a conversion window anchored at the first step (first-touch
attribution, the Amplitude/GA semantics).

Spark-first shape: one filtered min-aggregation per step, each joined
to the previous step's completion times — k steps cost k narrow
shuffles on the user key (and the per-step user table is orders of
magnitude smaller than the event log, so AQE broadcasts the join side
in practice). Earliest-occurrence greedy matching is EXACT for the
unwindowed funnel (if any ordered subsequence exists, the earliest
one does); with ``within`` it implements first-touch attribution —
completions anchored strictly at each user's FIRST step-1 event.

No window-function-over-user-partition formulation is used: a
sort-based window over the raw log shuffles every event, while this
shape reduces each step to (user, min_ts) before anything joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """Per-step funnel completion counts.

    Returns (step_idx long, step string, users long) with one row per
    step, users non-increasing. ``within`` is an INTERVAL string
    (e.g. ``'7 days'``) bounding every step's timestamp to the user's
    first step-1 event plus the interval."""
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts_col).alias("__t1"))
        .withColumn("__t", F.col("__t1"))
        .persist()
    )
    persisted = [cur]
    counts = [cur.count()]
    for step in steps[1:]:
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        cond = F.col("__ts") > F.col("__t")
        if within is not None:
            cond = cond & (
                F.col("__ts") <= F.col("__t1") + F.expr(f"INTERVAL {within}")
            )
        cur = (
            nxt.join(cur, on="__u")
            .filter(cond)
            .groupBy("__u", "__t1")
            .agg(F.min("__ts").alias("__t"))
            .persist()
        )
        persisted.append(cur)
        counts.append(cur.count())
    for df in persisted:
        df.unpersist()

    spark = events.sparkSession
    return spark.createDataFrame(
        [(i + 1, s, c) for i, (s, c) in enumerate(zip(steps, counts))],
        "step_idx long, step string, users long",
    )

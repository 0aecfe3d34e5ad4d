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

from nsl_kdd_spark.functions.scalar import ppm_of


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


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each (from_type, to_type) pair of CONSECUTIVE
    events of the same user, the transition count and its probability
    among all transitions leaving ``from_type`` (integer ppm — exact
    across engines).

    Ties in ``ts_col`` are broken by ``tiebreak_col`` (pass the event
    id for a total order; without it, same-timestamp transitions are
    engine-dependent and the result is only count-stable).

    Scale shape (100 TB of events): ONE window sort per user
    partition (the log shuffles once on the user key — unavoidable
    for sequence semantics), then a map-side-combined pair count; the
    per-from totals are a tiny table broadcast back. Heavy users skew
    the user-key shuffle — salt or sessionize first if one user is a
    measurable fraction of the log.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(user_col).orderBy(*order)
    # the pair table is |types|^2 rows; materialize it (eager
    # localCheckpoint, the q95 pattern) so the totals pass reads it
    # instead of re-sorting the full event log — Spark does not reuse
    # the window exchange across the two consumers, so without this
    # the 100 TB log would shuffle+sort TWICE (caught by the plan
    # gate: two Window nodes)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            "n_from",
            ppm_of("n", "n_from").alias("p_ppm"),
        )
        .orderBy("from_type", "to_type")
    )

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

from nsl_kdd_spark.functions.scalar import ppm_of

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
            ppm_of("n_users", "cohort_size").alias("retention_ppm"),
        )
        .orderBy("cohort", "offset")
    )


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    as_of: str | None = None,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation: per customer recency (days since last
    activity at ``as_of``), frequency (activity count) and monetary
    (exact-decimal total spend), each coded into ``n_tiles`` quantile
    tiers — the classic customer-value segmentation (``555`` = most
    recent / most frequent / highest spend).

    Output: (customer, recency_days, frequency, monetary, r_tile,
    f_tile, m_tile, rfm_code). Tiles come from exact percentile
    cutoffs computed on the per-customer table and broadcast back —
    no global NTILE sort over the fact table, so the plan is two
    map-side-combined aggregates + one broadcast join at any scale
    (the q52-verified percentile semantics; tile k = # cutoffs the
    value exceeds, so ties share a tile deterministically). Higher
    tile = better (more recent, more frequent, higher spend);
    ``as_of`` defaults to the max activity date in the data.

    Scale note: exact percentile over the CUSTOMER table (not the
    order log) — at 10^9 customers swap ``approx_percentile``, same
    plan shape.
    """
    from nsl_kdd_spark.functions.scalar import exact_sum

    if not 2 <= n_tiles <= 9:
        # rfm_code packs one decimal digit per dimension; a 10th tile
        # would collide (1,10,5) with (2,0,5) — review r06
        raise ValueError(f"n_tiles must be in [2, 9], got {n_tiles}")
    base = orders.groupBy(F.col(customer_col).alias("customer")).agg(
        F.max(ts_col).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        exact_sum(amount_col).alias("monetary"),
    )
    if as_of is None:
        anchor = base.agg(F.max("__last").alias("__asof"))
    else:
        anchor = orders.sparkSession.range(1).select(
            F.lit(as_of).cast("timestamp").alias("__asof")
        )
    base = base.crossJoin(F.broadcast(anchor)).select(
        "customer",
        F.datediff("__asof", "__last").cast("long").alias("recency_days"),
        "frequency",
        "monetary",
    )
    qs = [i / n_tiles for i in range(1, n_tiles)]
    cuts = base.agg(
        F.percentile(F.col("recency_days").cast("double"), F.array(*[F.lit(q) for q in qs])).alias("__rc"),
        F.percentile(F.col("frequency").cast("double"), F.array(*[F.lit(q) for q in qs])).alias("__fc"),
        F.percentile(F.col("monetary"), F.array(*[F.lit(q) for q in qs])).alias("__mc"),
    )

    def tile(value, cuts_col, invert=False):
        # tile = 1 + number of cutoffs strictly below the value
        # (invert: recency is better when SMALLER, so count cutoffs
        # strictly above)
        cmp = (
            (lambda c: (c > value).cast("int"))
            if invert
            else (lambda c: (value > c).cast("int"))
        )
        return (
            F.lit(1)
            + F.aggregate(
                F.transform(F.col(cuts_col), cmp),
                F.lit(0),
                lambda acc, x: acc + x,
            )
        ).cast("long")

    return (
        base.crossJoin(F.broadcast(cuts))
        .select(
            "customer",
            "recency_days",
            "frequency",
            "monetary",
            tile(F.col("recency_days").cast("double"), "__rc", invert=True).alias("r_tile"),
            tile(F.col("frequency").cast("double"), "__fc").alias("f_tile"),
            tile(F.col("monetary"), "__mc").alias("m_tile"),
        )
        .withColumn(
            "rfm_code",
            (F.col("r_tile") * 100 + F.col("f_tile") * 10 + F.col("m_tile")),
        )
        .orderBy("customer")
    )

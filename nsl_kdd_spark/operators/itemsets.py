"""Frequent-pair mining / association rules over basket data
(engine extension; the market-basket sibling of the co-purchase
graph ops q112/q122).

Spark-first shape: the pair explosion is bounded per basket
(k items -> k(k-1)/2 pairs, with an explicit basket-size cap so one
degenerate mega-basket cannot go quadratic), pair and item supports
are map-side-combined counts, and the rule metrics are integer-ppm
arithmetic — exact across engines. The classic a-priori pruning
(min_support BEFORE pairing) applies at the item level: items below
min support cannot appear in a frequent pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.scalar import ppm_of


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
    max_basket_size: int = 1000,
) -> DataFrame:
    """Association metrics for every item pair co-occurring in at
    least ``min_pair_support`` baskets:

        (item_a, item_b, n_ab, n_a, n_b, n_baskets,
         support_ppm   = n_ab / n_baskets,
         confidence_ppm = n_ab / n_a          (a => b rule),
         lift_ppm      = n_ab * n_baskets / (n_a * n_b))

    all ratios as integer ppm (exact, engine-stable); pairs are
    canonical (item_a < item_b) and duplicated items within a basket
    count once. Baskets larger than ``max_basket_size`` raise — a
    loud guard against the quadratic blowup a degenerate basket
    (e.g. a catch-all session) would cause; filter or sample such
    baskets explicitly first.

    Scale shape: one distinct (basket, item) projection feeds the
    per-basket item arrays; the pair explode is per-basket-bounded;
    pair/item supports aggregate map-side. The item-support table is
    vocabulary-sized and broadcasts onto the pair table.
    """
    # bi feeds THREE subtrees (item supports, basket arrays, basket
    # count) and item_n feeds three more (a-priori filter + both
    # support broadcasts) — without truncation each consumer re-runs
    # the corpus-sized distinct shuffle (no ReusedExchange across the
    # separate broadcast-build jobs; measured warm 2.1 s -> 1.8 s at
    # sf0.1 with the lazy checkpoints, optimization r13). Lazy form:
    # plan construction stays job-free, blocks materialize on first
    # use and are shared by every later consumer.
    bi = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_baskets = bi.select("__b").distinct()
    item_n = (
        bi.groupBy("__i")
        .agg(F.count(F.lit(1)).alias("n_item"))
        .localCheckpoint(eager=False)
    )
    # a-priori pruning: an item in fewer than min_pair_support baskets
    # cannot appear in a frequent pair — drop it BEFORE the quadratic
    # explode (lossless by pair-support monotonicity)
    frequent = item_n.filter(F.col("n_item") >= min_pair_support).select("__i")
    baskets = (
        bi.join(F.broadcast(frequent), "__i", "left_semi")
        .groupBy("__b")
        .agg(F.sort_array(F.collect_list("__i")).alias("__items"))
    )
    guarded = baskets.withColumn(
        "__items",
        F.when(
            F.size("__items") > max_basket_size,
            F.raise_error(
                F.concat(
                    F.lit("basket_pairs: basket exceeds max_basket_size: "),
                    F.size("__items").cast("string"),
                )
            ).cast(baskets.schema["__items"].dataType.simpleString()),
        ).otherwise(F.col("__items")),
    )
    pairs = (
        guarded.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("__items"),
                        lambda a, i: F.transform(
                            F.slice(
                                F.col("__items"), i + 2, F.size("__items")
                            ),
                            lambda b: F.struct(
                                a.alias("ia"), b.alias("ib")
                            ),
                        ),
                    )
                )
            ).alias("__p")
        )
        .groupBy(F.col("__p.ia").alias("item_a"), F.col("__p.ib").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_support)
    )
    na = item_n.select(F.col("__i").alias("item_a"), F.col("n_item").alias("n_a"))
    nb = item_n.select(F.col("__i").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .crossJoin(
            F.broadcast(
                n_baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
            )
        )
        .select(
            "item_a", "item_b", "n_ab", "n_a", "n_b", "n_baskets",
            ppm_of("n_ab", "n_baskets").alias("support_ppm"),
            ppm_of("n_ab", "n_a").alias("confidence_ppm"),
            F.when(
                # no-ANSI Spark would WRAP n_ab * n_baskets * 1e6 (or
                # the n_a * n_b denominator) past 2^63 while DuckDB
                # errors — fail loudly instead of diverging
                # (double-compare guard costs one branch)
                (
                    F.col("n_ab").cast("double")
                    * F.col("n_baskets").cast("double")
                    * 1e6
                    > 9.2e18
                )
                | (
                    F.col("n_a").cast("double") * F.col("n_b").cast("double")
                    > 9.2e18
                ),
                F.raise_error(
                    F.lit(
                        "basket_pairs: lift_ppm would overflow int64; "
                        "reduce basket count or compute lift downstream"
                    )
                ).cast("long"),
            )
            .otherwise(
                F.expr("(n_ab * n_baskets * 1000000) div (n_a * n_b)")
            )
            .alias("lift_ppm"),
        )
        .orderBy("item_a", "item_b")
    )

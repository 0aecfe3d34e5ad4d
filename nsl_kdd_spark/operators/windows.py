"""Window / sort / top-k operators (SURVEY.md §2.5).

The reference only sorts globally and takes top-k on the driver
(README.md:297,1169); the engine adds the distributed idioms its
extension operators (dedup keep-first, sessionization) are built on.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_global(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """``orderBy(...).limit(k)`` — Spark executes as TakeOrdered
    (per-partition top-k + merge), never a full global sort."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """row_number() per group, keep <=k. One shuffle on the partition
    keys; skewed groups are AQE's problem (skew-join/partition split)."""
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def with_lag(
    df: DataFrame,
    column: str,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    offset: int = 1,
    out_col: str | None = None,
) -> DataFrame:
    """Analytic lag — the building block for sessionization gaps."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out_col or f"{column}_lag{offset}", F.lag(column, offset).over(w))

"""Join operators (SURVEY.md §2.3).

The reference's only join shape is the inner equi-join on a synthetic
``id`` used ~12x for result assembly (README.md:1712). The engine
exposes that plus the standard relational family Spark gives for free
(semi/anti/outer), with explicit broadcast control for small
dimensions — the knob that matters at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join with an explicit broadcast hint for dimension tables.

    AQE usually picks broadcast-hash for small sides on its own, but a
    hint removes the dependence on statistics freshness — for the star
    schema (region/nation/customer dims vs lineitem fact) broadcast is
    always right."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS: rows of ``left`` with a match in ``right``; never
    duplicates left rows (unlike inner join + distinct)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS: rows of ``left`` without a match."""
    return left.join(right, on=on, how="left_anti")


def assemble(base: DataFrame, parts: Sequence[DataFrame], on: str = "id") -> DataFrame:
    """Result assembly (J1): fold score tables onto ``base`` by key.

    The reference re-joins and re-caches per model family
    (README.md:1712,1926,2245,...); folding in one expression lets AQE
    plan the whole chain (each probs table is tiny -> broadcast)."""
    return reduce(lambda acc, p: acc.join(p, on=on, how="inner"), parts, base)


def union_by_name(parts: Sequence[DataFrame]) -> DataFrame:
    """Iterative-union replacement (U1, README.md:1668-1685): the
    reference seeds from an empty DF and unions in a Python loop; a
    reduce over ``unionByName`` builds one n-way Union node instead —
    no empty-scan stage, schema aligned by name not position."""
    if not parts:
        raise ValueError("union_by_name needs at least one DataFrame")
    return reduce(lambda a, b: a.unionByName(b), parts)

"""Vector expressions over ``array<float>`` embedding columns
(SURVEY.md §2.13, §1.5).

The relational boundary type is ``array<float/double>`` (not ml
Vector): plain Catalyst higher-order functions (``zip_with`` +
``aggregate``) compute dot/norm/cosine JVM-side with sequential
(order-deterministic) accumulation — no UDF, no Arrow crossing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-sum dot product (deterministic accumulation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bits_hex(a: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one bit per plane (sign of the
    projection), packed into a long. ``planes`` is a small driver-side
    list (seeded), so the whole thing folds into one expression."""
    acc = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = dot(a, F.array(*[F.lit(float(x)) for x in p]))
        bit = F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        acc = acc + bit * F.lit(2 ** i).cast("long")
    return acc

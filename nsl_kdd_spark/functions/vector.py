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


def dot_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized inner product — the ``dot`` twin of
    :func:`cosine_arrow` (round-6 advisory: ``knn_bruteforce(metric=
    'dot', scorer='arrow')`` previously fell back to the fold
    silently). Same contract: numpy's vectorized reduction order
    differs from the fold's strict left-to-right order, so results
    are tolerance-equal, not hash-equal."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _dot(x, y):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        xa = np.stack(x.to_numpy())
        ya = np.stack(y.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", xa, ya))

    return _dot(a, b)


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine: the Pandas-UDF alternative to the
    ``cosine`` fold expression. Batches cross to a Python worker as
    Arrow arrays, numpy does one fused (batch x dim) multiply-reduce
    per batch — the pattern to reach for when scoring gets heavier
    than a dot product (learned rerankers, per-pair feature blocks),
    where a fold expression per output column stops being viable.
    For the plain dot product the JVM fold wins (no worker round-trip,
    stays inside whole-stage codegen); SCALE.md records the measured
    crossover. numpy's vectorized reduction order differs from the
    fold's strict left-to-right order by float-rounding only (~1e-16
    rel), so results are tolerance-equal, not hash-equal."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _cos(x, y):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        xa = np.stack(x.to_numpy())
        ya = np.stack(y.to_numpy())
        num = np.einsum("ij,ij->i", xa, ya)
        den = np.sqrt(np.einsum("ij,ij->i", xa, xa)) * np.sqrt(
            np.einsum("ij,ij->i", ya, ya)
        )
        return pd.Series(num / den)

    return _cos(a, b)

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


def sign_probe_buckets(
    a: Column, planes: list[list[float]], n_probe: int = 1
) -> Column:
    """Array of ``n_probe`` sign-LSH buckets for a vector: its own
    bucket plus the ``n_probe - 1`` single-flip buckets of its
    narrowest hyperplane margins (multi-probe LSH, round-7) — the
    buckets a true near neighbor most likely fell into, since a
    neighbor lands elsewhere exactly when it crosses a plane the
    vector sits close to. ``n_probe=1`` reduces to ``[bucket]``.
    Shared by ``similarity.knn_lsh`` and the streaming embedding
    registry (``streaming/vector_ingest.py``); bit masks come from an
    exact literal long array indexed by the sorted plane id
    (shiftleft's Python wrapper only takes constant shifts)."""
    if not 1 <= n_probe <= 2 ** len(planes):
        raise ValueError(
            f"n_probe must be in [1, 2^n_planes], got {n_probe}"
        )
    projs = [
        dot(a, F.array(*[F.lit(float(x)) for x in p])) for p in planes
    ]
    base = F.lit(0).cast("long")
    for i, proj in enumerate(projs):
        bit = F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        base = base + bit * F.lit(2 ** i).cast("long")
    if n_probe == 1:
        return F.array(base)
    margins = F.array(*[
        F.struct(F.abs(proj).alias("m"), F.lit(i).alias("i"))
        for i, proj in enumerate(projs)
    ])
    powers = F.array(*[F.lit(2 ** i).cast("long") for i in range(len(planes))])
    flips = F.transform(
        F.slice(F.array_sort(margins), 1, n_probe - 1),
        lambda s: base.bitwiseXOR(F.element_at(powers, s["i"] + 1)),
    )
    return F.concat(F.array(base), flips)


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

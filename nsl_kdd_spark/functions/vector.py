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


def cosine_prenorm(
    a: Column, b: Column, norm_a: Column, norm_b: Column
) -> Column:
    """:func:`cosine` with both norms precomputed per VECTOR:
    ``dot(a, b) / (norm_a * norm_b)``. Pass ``norm_a``/``norm_b``
    columns built with :func:`norm` in the pre-join projections so a
    candidate pair costs ONE array fold (the dot) instead of three —
    the norm folds run once per vector below the join, not once per
    pair above it. The value is bit-identical to ``cosine(a, b)``:
    same sequential dot fold, same sqrt, same multiply/divide order
    (the q94 semantic_dedup precedent, extended engine-wide in
    optimization r13), so NaN-on-zero-norm semantics are unchanged."""
    return dot(a, b) / (norm_a * norm_b)


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
    """Array of ``n_probe`` sign-LSH buckets for a vector, best-first:
    its own bucket, then the buckets a true near neighbor most likely
    fell into — a neighbor lands elsewhere exactly when it crosses
    planes the vector sits close to, so buckets are ranked by the sum
    of the flipped planes' |projection| margins (multi-probe LSH,
    round-7). ``n_probe=1`` reduces to ``[bucket]``. Shared by
    ``similarity.knn_lsh`` and the streaming embedding registry
    (``streaming/vector_ingest.py``).

    Two probe generators, same contract (probes[0] = base bucket,
    pairwise distinct):

    - ``n_probe <= n_planes + 1`` — the fast path: base plus the
      ``n_probe - 1`` SINGLE-flip buckets of the narrowest margins
      (one k-entry sort per row). Covers every 1-plane miss.
    - larger ``n_probe`` — exhaustive perturbation ordering: all
      ``2^n_planes`` flip masks scored by their total flipped margin,
      sorted, first ``n_probe`` taken (a ``2^k``-entry sort per row —
      requires ``n_planes <= 12``; the registry/corpus side never
      pays this, only the probing side). This is the true best-first
      multi-probe order (a two-narrow-margin double flip can outrank
      a wide single flip), and ``n_probe = 2^n_planes`` enumerates
      every bucket — exact recall. (Round-7 review: the single-flip
      path alone cannot reach multi-flip buckets, so it silently
      capped coverage at ``n_planes + 1`` probes.)"""
    k = len(planes)
    if not 1 <= n_probe <= 2 ** k:
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
    if n_probe <= k + 1:
        # single-flip fast path; exact bit masks as a literal long
        # array indexed by the sorted plane id (shiftleft's Python
        # wrapper only takes constant shifts)
        margins = F.array(*[
            F.struct(F.abs(proj).alias("m"), F.lit(i).alias("i"))
            for i, proj in enumerate(projs)
        ])
        powers = F.array(*[F.lit(2 ** i).cast("long") for i in range(k)])
        flips = F.transform(
            F.slice(F.array_sort(margins), 1, n_probe - 1),
            lambda s: base.bitwiseXOR(F.element_at(powers, s["i"] + 1)),
        )
        return F.concat(F.array(base), flips)
    if k > 12:
        raise ValueError(
            f"n_probe > n_planes + 1 enumerates 2^n_planes flip masks "
            f"per row; need n_planes <= 12, got {k}"
        )
    abs_projs = [F.abs(p) for p in projs]
    entries = []
    for mask in range(2 ** k):
        cost: Column | None = None
        for i in range(k):
            if (mask >> i) & 1:
                cost = abs_projs[i] if cost is None else cost + abs_projs[i]
        entries.append(
            F.struct(
                (F.lit(0.0) if cost is None else cost).alias("m"),
                F.lit(mask).alias("i"),
            )
        )
    ranked = F.array_sort(F.array(*entries))
    return F.transform(
        F.slice(ranked, 1, n_probe),
        lambda s: base.bitwiseXOR(s["i"].cast("long")),
    )


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

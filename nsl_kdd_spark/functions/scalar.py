"""Scalar expression helpers (SURVEY.md §2.7).

Includes the engine's *exact aggregation* idiom: business numerics with
known decimal precision (money = 2dp) are cast to DECIMAL before SUM so
the aggregate is integer-scaled — order-independent and bit-identical
across engines and across partitionings/retries. Double summation is
order-dependent, so a plain ``SUM(double)`` is not reproducible between
runs of the *same* plan at different parallelism, let alone against an
external oracle. Derived stats (mean/variance) are then computed from
the exact sums in double — deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str, as_type: str = "long") -> Column:
    """Epoch seconds from any timestamp flavor (or numeric passthrough).

    Spark 4 forbids a direct TIMESTAMP_NTZ -> numeric cast, and the
    driver's parquet fixtures carry ``events.ts`` as NTZ. Routing
    through TIMESTAMP first is a no-op for TIMESTAMP/LTZ inputs and
    reinterprets NTZ wall-clock in the session timezone — pinned UTC in
    session.py — which is exactly DuckDB's ``epoch(ts)``.

    Numeric inputs: integral types round-trip unchanged; a DOUBLE
    input with ``as_type='long'`` goes double -> timestamp -> long and
    TRUNCATES sub-second fractions (ADVICE r02) — cast fractional
    epochs yourself if you need rounding semantics. The numeric <->
    timestamp casts rely on session.py pinning ansi.enabled=false; an
    ANSI-on session would reject them."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast(as_type)


def exact_sum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM: cast to decimal(precision, scale), sum,
    return as double (exact conversion for business magnitudes)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def exact_avg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Mean from an exact decimal sum; division done in double so the
    result type/rounding is engine-agnostic."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, scale, precision) / F.count(c)


def exact_stddev(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Sample stddev from exact decimal sums of x and x*x.

    x has ``scale`` decimals -> x*x has exactly 2*scale decimals, so
    both sums are exact; the final combine+sqrt runs in double and is
    deterministic (unlike streaming-variance accumulation order)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s = exact_sum(c, scale, precision)
    sq = F.sum(
        (c.cast(f"decimal({precision},{scale})") * c.cast(f"decimal({precision},{scale})"))
        .cast(f"decimal({min(precision * 2, 38)},{scale * 2})")
    ).cast("double")
    return F.sqrt((sq - s * s / n) / (n - F.lit(1.0)))


def zscore(col: Column | str, mean: Column, stddev: Column) -> Column:
    """(x - mu) / sigma — the reference's manual standardizer expression
    (README.md:1322-1337, F3)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c - mean) / stddev


def threshold(col: Column | str, e: float) -> Column:
    """Probability -> 0/1 prediction at threshold ``e`` — replaces the
    reference's curried row UDF ``getPrediction`` (README.md:1450, D3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c >= F.lit(e), F.lit(1.0)).otherwise(F.lit(0.0))


def soft_vote(*cols: Column | str, weights: list[float] | None = None) -> Column:
    """(Weighted) mean of probability columns — the reference's linear
    blends (README.md:3113,3266, F4/F5)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if weights is None:
        weights = [1.0] * len(cs)
    num = cs[0] * F.lit(weights[0])
    for c, w in zip(cs[1:], weights[1:]):
        num = num + c * F.lit(w)
    return num / F.lit(float(sum(weights)))


def hard_vote_or(*cols: Column | str) -> Column:
    """Bitwise-OR of 0/1 prediction columns (README.md:3142, F6)."""
    cs = [(F.col(c) if isinstance(c, str) else c).cast("int") for c in cols]
    out = cs[0]
    for c in cs[1:]:
        out = out.bitwiseOR(c)
    return out.cast("double")


def safe_ratio(num: Column, den: Column, sentinel: float | None = None) -> Column:
    """num/den with explicit divide-by-zero policy. The reference fills
    the resulting nulls with a 1000.0 sentinel (README.md:1164, P10);
    pass ``sentinel`` to reproduce, else nulls propagate."""
    ratio = F.when(den != F.lit(0), num / den)
    if sentinel is not None:
        ratio = F.coalesce(ratio, F.lit(float(sentinel)))
    return ratio


def exact_corr(x: Column | str, y: Column | str, scale: int = 2,
               precision: int = 18) -> Column:
    """Pearson correlation from exact decimal sums (order-independent,
    unlike F.corr's streaming covariance): r = (nSxy - SxSy) /
    sqrt((nSxx - Sx^2)(nSyy - Sy^2)), final combine in double."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    dx = cx.cast(f"decimal({precision},{scale})")
    dy = cy.cast(f"decimal({precision},{scale})")
    p2 = min(precision * 2, 38)
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(dx).cast("double")
    sy = F.sum(dy).cast("double")
    sxx = F.sum((dx * dx).cast(f"decimal({p2},{scale * 2})")).cast("double")
    syy = F.sum((dy * dy).cast(f"decimal({p2},{scale * 2})")).cast("double")
    sxy = F.sum((dx * dy).cast(f"decimal({p2},{scale * 2})")).cast("double")
    return (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )


def ppm_of(numer: str, denom: str) -> Column:
    """Integer parts-per-million ratio ``(numer * 1e6) div denom``
    with an int64 overflow guard: with ANSI off (session default,
    pinned for oracle cast parity) a count past ~9.2e12 would WRAP
    the product silently while DuckDB errors — the double-compare
    guard (one branch) raises instead, the itemsets-lift pattern
    applied to every count-based ppm site. ``numer``/``denom`` are
    engine-internal column names, interpolated verbatim."""
    return F.expr(
        f"CASE WHEN CAST({numer} AS DOUBLE) * 1000000 > 9.2e18 "
        f"THEN CAST(raise_error(CONCAT('ppm overflow: {numer} = ', "
        f"CAST({numer} AS STRING))) AS BIGINT) "
        f"ELSE ({numer} * 1000000) div {denom} END"
    )

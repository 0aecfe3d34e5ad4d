"""Z-order (Morton) layout keys for multi-column data skipping
(engine extension; no reference analog — the reference reads one flat
CSV, ``SURVEY.md §2.1``).

Why this exists at 100 TB: parquet min/max pruning only skips files
for predicates on the SORT column. Sorting by the interleaved-bit
z-value of several columns gives every interleaved column locality in
the file layout, so ``WHERE custkey = ? AND orderdate BETWEEN ...``
prunes on BOTH dimensions from one layout. Pair with
``sources/compact.py``: compact cold partitions INTO z-order
(``df.repartitionByRange(n, zvalue).sortWithinPartitions(zvalue)``)
and each output file covers a small hyper-rectangle of the key space.

The z-value is a pure bit-interleave EXPRESSION (shift/and/multiply —
whole-stage codegen, no UDF), so it costs one projection and is
reproducible everywhere, DuckDB included (the q96 oracle replays the
same 2*bits-term arithmetic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton z-value: interleave the low ``bits`` bits of each column.

    Inputs must be non-negative integers; values are masked to
    ``bits`` bits (callers scale/offset real domains first — e.g.
    days-since-epoch for dates, range-quantile rank for skewed keys).
    Bit b of column j lands at output position ``b * len(cols) + j``,
    so ``len(cols) * bits`` must stay <= 63.
    """
    ncols = len(cols)
    if ncols * bits > 63:
        raise ValueError(f"zvalue: {ncols} cols x {bits} bits > 63")
    acc = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(
            F.lit((1 << bits) - 1)
        )
        for b in range(bits):
            acc = acc + F.shiftright(cc, b).bitwiseAND(F.lit(1)) * F.lit(
                1 << (b * ncols + j)
            )
    return acc


def zvalue_oracle_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The identical interleave as portable SQL (oracle twin)."""
    ncols = len(cols)
    terms = []
    for j, c in enumerate(cols):
        mask = (1 << bits) - 1
        for b in range(bits):
            terms.append(f"((({c} & {mask}) >> {b}) & 1) * {1 << (b * ncols + j)}")
    return " + ".join(terms)


def zorder_sort(df: DataFrame, cols: Sequence[Column | str], bits: int = 16,
                num_partitions: int | None = None) -> DataFrame:
    """Lay ``df`` out in z-order: range-partition then sort by the
    z-value — the write-side layout step (each output file then covers
    a compact hyper-rectangle; parquet min/max on the ORIGINAL columns
    becomes selective for multi-dimensional predicates)."""
    z = zvalue(cols, bits).alias("__z")
    out = df.withColumn("__z", z)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "__z")
    return out.sortWithinPartitions("__z").drop("__z")


def skipping_stats(
    df: DataFrame,
    dim_cols: Sequence[str],
    sort_col: Column,
    probes: dict[str, dict[str, tuple[int, int]]],
    n_files: int = 64,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Quantify data-skipping for a candidate layout BEFORE writing
    it: simulate cutting ``df`` into ``n_files`` equal files in
    ``sort_col`` order, collect per-file min/max of each dimension
    (exactly what parquet footers store), and count how many files
    each box predicate in ``probes = {name: {dim: (lo, hi)}}`` must
    scan. Output one row per probe: (probe, n_files, files_scanned,
    scan_ppm) — integers, so layouts compare exactly. ALL probes ride
    one aggregation over one simulated layout, so adding a probe adds
    a column, not a repeat of the sort (review r05).

    DIAGNOSTIC operator: the file assignment is a global ``ntile``
    (single-partition sort) — run it on a sample or one partition's
    worth of data, not the full 100 TB table; the real layout is
    written by ``zorder_sort``/``repartitionByRange`` which scale
    properly. ``tiebreak`` columns make the ntile order total so the
    simulation is deterministic and oracle-checkable.
    """
    from pyspark.sql import Window

    if not probes:
        raise ValueError("skipping_stats needs at least one probe")
    w = Window.orderBy(sort_col, *[F.col(c) for c in tiebreak])
    files = (
        df.withColumn("__f", F.ntile(n_files).over(w))
        .groupBy("__f")
        .agg(
            *[F.min(c).alias(f"__min_{c}") for c in dim_cols],
            *[F.max(c).alias(f"__max_{c}") for c in dim_cols],
        )
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, box in enumerate(probes.values()):
        overlap = F.lit(True)
        for c, (lo, hi) in box.items():
            overlap = overlap & (F.col(f"__min_{c}") <= hi) & (
                F.col(f"__max_{c}") >= lo
            )
        aggs.append(F.sum(overlap.cast("long")).alias(f"__s{i}"))
    one = files.agg(*aggs)
    stack = ", ".join(
        "'" + name.replace("\\", "\\\\").replace("'", "\\'") + f"', __s{i}"
        for i, name in enumerate(probes)
    )
    return (
        one.selectExpr(
            "__n",
            f"stack({len(probes)}, {stack}) AS (probe, files_scanned)",
        )
        .select(
            "probe",
            F.col("__n").alias("n_files"),
            "files_scanned",
            F.expr("(files_scanned * 1000000) div __n").alias("scan_ppm"),
        )
        .orderBy("probe")
    )

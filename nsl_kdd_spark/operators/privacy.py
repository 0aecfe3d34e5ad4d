"""Privacy-preserving release operators.

The relational half of the engine's privacy tier: ``functions/pii.py``
scrubs identifiers INSIDE text; this module enforces k-anonymity
(Sweeney 2002, "k-Anonymity: A Model for Protecting Privacy") on the
RELATIONAL side — a released table is k-anonymous iff every
quasi-identifier combination (the columns an adversary can link on)
is shared by at least k rows. The published mechanism is
generalization (coarsen values) + suppression (drop rows whose
group stays under k); both are here, as one grouped count and one
scan-stage binning expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def generalize_bin(col: Column | str, width: float) -> Column:
    """The classic numeric generalization step: replace a value by
    the lower edge of its ``width``-sized bin (``floor(v / width) *
    width``) so quasi-identifier groups coarsen deterministically.
    IEEE double division + floor evaluate identically across
    engines, so oracles replay it bit-exactly. Integral widths give
    long bin edges; fractional widths give doubles (review r11: the
    earlier int(width) multiplier silently zeroed every bin for
    width < 1 and mis-edged fractional widths)."""
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    c = F.col(col) if isinstance(col, str) else col
    b = F.floor(c / F.lit(float(width)))
    if float(width).is_integer():
        return (b * F.lit(int(width))).cast("long")
    return (b.cast("double") * F.lit(float(width))).cast("double")


def l_diversify(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,
    mode: str = "suppress",
    distinct_col: str = "qid_distinct_sensitive",
    flag_col: str = "l_diverse",
) -> DataFrame:
    """Enforce (or audit) distinct l-diversity (Machanavajjhala et
    al. 2007, "l-Diversity: Privacy Beyond k-Anonymity"): k-anonymity
    stops identity linkage but not ATTRIBUTE disclosure — if every
    row in a quasi-identifier group shares one sensitive value, the
    adversary learns it without re-identifying anyone. A group is
    l-diverse iff its ``sensitive_col`` carries at least ``l``
    distinct values; ``mode="suppress"`` keeps only diverse groups,
    ``mode="flag"`` annotates every row with ``(distinct_col,
    flag_col)`` for the release audit.

    NULL sensitive values count as one value (an unknown diagnosis
    is still a disclosure class); NULL quasi-identifiers group
    together, as in :func:`k_anonymize`.

    Scale shape: ONE map-side-combined groupBy computing
    count_distinct over the quasi-identifier columns + one null-safe
    join back — the :func:`k_anonymize` plan with a countDistinct
    (internally a two-phase partial aggregate) in place of the
    count. No window.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    if mode not in ("suppress", "flag"):
        raise ValueError(f"mode must be suppress|flag, got {mode!r}")
    sizes = (
        df.groupBy(*quasi_cols)
        .agg(
            F.size(
                F.collect_set(
                    # collect_set drops NULLs; fold them into one
                    # sentinel class first
                    F.coalesce(
                        F.col(sensitive_col).cast("string"),
                        F.lit("\x00null"),
                    )
                )
            ).cast("long").alias(distinct_col)
        )
        .withColumnsRenamed({c: f"__q_{c}" for c in quasi_cols})
    )
    cond = None
    for c in quasi_cols:
        eq = df[c].eqNullSafe(sizes[f"__q_{c}"])
        cond = eq if cond is None else cond & eq
    out = df.join(sizes, cond).drop(
        *[f"__q_{c}" for c in quasi_cols]
    )
    if mode == "suppress":
        return out.filter(F.col(distinct_col) >= l).drop(distinct_col)
    return out.withColumn(flag_col, F.col(distinct_col) >= l)


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_ppm: int,
    mode: str = "flag",
    emd_col: str = "qid_emd_ppm",
    flag_col: str = "t_close",
) -> DataFrame:
    """Distinct t-closeness (Li, Li & Venkatasubramanian 2007,
    "t-Closeness: Privacy Beyond k-Anonymity and l-Diversity"):
    l-diversity still leaks when a group's sensitive DISTRIBUTION
    skews far from the table's (the skewness attack) — a group is
    t-close iff the earth-mover's distance between its sensitive
    distribution and the global one is <= t. For categorical
    attributes under the paper's equal ground distance, EMD is the
    total-variation distance ``1/2 * sum_i |p_i - q_i|``, which this
    operator evaluates in EXACT integer arithmetic: with group size
    n, table size N, group counts c_i and global counts C_i,

        2 * n * N * EMD = n*N + sum_{i in group}(|c_i*N - C_i*n|
                                                 - C_i*n)

    (values absent from the group fold into the constant n*N term,
    so only the group's PRESENT values are ever joined — no dense
    group x value matrix). The report column is the integer-ppm EMD
    ``(1e6 * that) div (2*n*N)`` compared against ``t_ppm`` — the
    engine's fixed-point doctrine, bit-identical in any engine.
    Counts are longs; c_i*N needs BIGINT headroom (fine to ~3e9
    rows; past that, cast the products to DECIMAL(38,0) — the q158
    precedent).

    ``mode="flag"`` annotates every row with ``(emd_col, flag_col)``;
    ``mode="suppress"`` keeps only t-close groups.

    Scale shape: everything computes on the DISTINCT (group,
    sensitive-value) table — one map-side-combined groupBy of the
    corpus, then group-level and global aggregates over that small
    table (global distribution broadcast) and one join back. No
    window, no dense cross join.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if not 0 <= t_ppm <= 1_000_000:
        raise ValueError(f"t_ppm must be in [0, 1e6], got {t_ppm}")
    if mode not in ("suppress", "flag"):
        raise ValueError(f"mode must be suppress|flag, got {mode!r}")
    sv = F.coalesce(
        F.col(sensitive_col).cast("string"), F.lit("\x00null")
    )
    cells = df.groupBy(
        *quasi_cols, sv.alias("__sv")
    ).agg(F.count(F.lit(1)).alias("__c"))
    # the global sensitive distribution is domain-bounded (a handful
    # of disclosure classes), so it materializes driver-side — the
    # pack_best_fit histogram precedent — and re-enters as a LITERAL
    # MAP (the D-tier map-literal technique): the per-value global
    # count becomes element_at(map, __sv), no second join at all.
    # Naming note: Spark resolves column names CASE-INSENSITIVELY by
    # default, so the global count is `__gcnt`, never `__C` — a `__C`
    # column silently replaces/collides with the cell count `__c`.
    glob_rows = (
        cells.groupBy("__sv").agg(F.sum("__c").alias("__gcnt")).collect()
    )
    n_total = int(sum(r["__gcnt"] for r in glob_rows))
    c_map = F.create_map(
        *[
            x
            for r in glob_rows
            for x in (F.lit(r["__sv"]), F.lit(int(r["__gcnt"])))
        ]
    )
    # the |c*N - C*n| term needs the group's n; attach it per cell
    sizes = (
        cells.groupBy(*quasi_cols)
        .agg(F.sum("__c").alias("__n"))
        .withColumnsRenamed({c: f"__s_{c}" for c in quasi_cols})
    )
    scond = None
    for c in quasi_cols:
        eq = cells[c].eqNullSafe(sizes[f"__s_{c}"])
        scond = eq if scond is None else scond & eq
    big_n = F.lit(n_total).cast("long")
    terms = (
        cells.join(sizes, scond)
        .withColumn(
            "__gcnt", F.element_at(c_map, F.col("__sv")).cast("long")
        )
        .withColumn(
            "__term",
            F.abs(F.col("__c") * big_n - F.col("__gcnt") * F.col("__n"))
            - F.col("__gcnt") * F.col("__n"),
        )
        .groupBy(*quasi_cols)
        .agg(
            F.max("__n").alias("__n"),
            F.sum("__term").alias("__tsum"),
        )
        .withColumn(
            emd_col,
            F.expr(
                f"(1000000 * (__n * {n_total} + __tsum))"
                f" div (2 * __n * {n_total})"
            ),
        )
        .withColumnsRenamed({c: f"__q_{c}" for c in quasi_cols})
        .select(
            *[f"__q_{c}" for c in quasi_cols], emd_col
        )
    )
    cond = None
    for c in quasi_cols:
        eq = df[c].eqNullSafe(terms[f"__q_{c}"])
        cond = eq if cond is None else cond & eq
    out = df.join(terms, cond).drop(
        *[f"__q_{c}" for c in quasi_cols]
    )
    if mode == "suppress":
        return out.filter(F.col(emd_col) <= t_ppm).drop(emd_col)
    return out.withColumn(flag_col, F.col(emd_col) <= t_ppm)


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    mode: str = "suppress",
    size_col: str = "qid_group_size",
    flag_col: str = "k_anonymous",
) -> DataFrame:
    """Enforce (or audit) k-anonymity over ``quasi_cols``.

    ``mode="suppress"`` (the published remedy) returns only the rows
    whose quasi-identifier group has >= k members; ``mode="flag"``
    returns every row annotated with ``(size_col, flag_col)`` — the
    audit view a release pipeline inspects to pick k or to decide
    which generalization (:func:`generalize_bin`) to apply before
    suppressing.

    NULL quasi-identifier values group together (two unknown ZIPs
    are the SAME linkage class — the conservative reading), so the
    join back is null-safe.

    Scale shape (100 TB): ONE map-side-combined groupBy over the
    quasi-identifier columns (output = distinct-combination count,
    typically orders of magnitude under the row count) + one
    null-safe equi-join back. No window — a quasi-identifier group
    can be corpus-sized (every row sharing one coarse bin), exactly
    the single-task shape the engine bans; the aggregate absorbs it
    map-side instead.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if mode not in ("suppress", "flag"):
        raise ValueError(f"mode must be suppress|flag, got {mode!r}")
    sizes = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias(size_col))
        .withColumnsRenamed({c: f"__q_{c}" for c in quasi_cols})
    )
    cond = None
    for c in quasi_cols:
        eq = df[c].eqNullSafe(sizes[f"__q_{c}"])
        cond = eq if cond is None else cond & eq
    out = df.join(sizes, cond).drop(
        *[f"__q_{c}" for c in quasi_cols]
    )
    if mode == "suppress":
        return out.filter(F.col(size_col) >= k).drop(size_col)
    return out.withColumn(flag_col, F.col(size_col) >= k)

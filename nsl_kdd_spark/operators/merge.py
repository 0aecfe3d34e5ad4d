"""Merge / upsert / CDC-apply (engine extension; no reference analog —
the reference is read-only batch, ``SURVEY.md §2.1 S7``). A training-
data pipeline needs MERGE semantics to maintain incrementally-updated
tables (dedup registries, document stores) without a transactional
table format.

Spark-first shape: MERGE = anti-join (drop target rows whose key
appears in the change set) + unionByName (append the surviving new
images). One shuffle on the merge keys — Spark broadcasts the change
set when small, which is the common CDC case — and no full-outer join,
whose coalesce-every-column plan is strictly worse.

Duplicate key images in one batch (ADVICE r01): the one-image-per-key
contract is enforced, not assumed. ``seq_col`` resolves duplicates
deterministically (greatest sequence/timestamp image wins — one
window over the CHANGE SET only, never the target); without it the
default validates key uniqueness with one aggregation job over the
change-set keys and raises on violation. ``validate=False`` restores
the zero-extra-work path for callers that own the contract upstream
(the check costs one narrow agg on the change keys — trivial next to
the merge shuffle for normal CDC batch sizes, but it IS an extra
Spark job, so hot loops can opt out).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _one_image_per_key(
    df: DataFrame,
    keys: Sequence[str],
    seq_col: str | None,
    validate: bool,
    what: str,
) -> DataFrame:
    if seq_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if validate:
        dups = (
            df.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(5)
            .collect()
        )
        if dups:
            sample = [tuple(r[k] for k in keys) for r in dups]
            raise ValueError(
                f"{what}: multiple images per key in one batch (e.g. "
                f"{sample}); pass seq_col= to resolve last-writer-wins, "
                "or dedupe upstream and pass validate=False"
            )
    return df


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    seq_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """Keyed upsert: source rows win on key collision, all other
    target rows survive. Column sets must match (checked; ``seq_col``
    may exist only on the source side — it is consumed by duplicate
    resolution and dropped before the union if the target lacks it)."""
    src_cols = set(source.columns)
    tgt_cols = set(target.columns)
    extra = {seq_col} if seq_col is not None and seq_col not in tgt_cols else set()
    if tgt_cols != src_cols - extra:
        raise ValueError(
            f"upsert: column mismatch {sorted(tgt_cols)} vs "
            f"{sorted(src_cols - extra)}"
        )
    source = _one_image_per_key(source, keys, seq_col, validate, "upsert")
    if extra:
        source = source.drop(seq_col)
    keep = target.join(source.select(*keys).distinct(), list(keys), "left_anti")
    return keep.unionByName(source)


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
    seq_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """CDC merge: ``changes`` carries full row images plus an ``op``
    column; ``op == delete_op`` deletes the key, anything else
    upserts. ``seq_col`` (e.g. a log sequence number) picks the
    winning image per key — the WHOLE change row with the greatest
    sequence, so a late upsert beats an early delete and vice versa;
    it is dropped from the output unless the target carries it as a
    real column."""
    if op_col not in changes.columns:
        raise ValueError(f"apply_changes: missing op column {op_col!r}")
    changes = _one_image_per_key(changes, keys, seq_col, validate, "apply_changes")
    keep = target.join(changes.select(*keys).distinct(), list(keys), "left_anti")
    upserts = changes.filter(F.col(op_col) != delete_op).drop(op_col)
    if seq_col is not None and seq_col not in target.columns:
        upserts = upserts.drop(seq_col)
    return keep.unionByName(upserts)

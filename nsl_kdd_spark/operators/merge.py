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
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keyed upsert: source rows win on key collision, all other
    target rows survive. Column sets must match (checked)."""
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"upsert: column mismatch {sorted(target.columns)} vs "
            f"{sorted(source.columns)}"
        )
    keep = target.join(source.select(*keys).distinct(), list(keys), "left_anti")
    return keep.unionByName(source)


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """CDC merge: ``changes`` carries full row images plus an ``op``
    column; ``op == delete_op`` deletes the key, anything else
    upserts. Last-writer-wins within a batch is the caller's contract
    (one image per key) — enforced cheaply via distinct on keys for
    the tombstone side only."""
    if op_col not in changes.columns:
        raise ValueError(f"apply_changes: missing op column {op_col!r}")
    keep = target.join(changes.select(*keys).distinct(), list(keys), "left_anti")
    upserts = changes.filter(F.col(op_col) != delete_op).drop(op_col)
    return keep.unionByName(upserts)

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
    # no distinct on the anti key set (optimization r14, guide §2.4):
    # _one_image_per_key already guarantees one row per key, and a
    # left_anti join is EXISTS-semantics anyway — the distinct was a
    # full extra exchange+aggregate deduplicating already-unique keys
    keep = target.join(source.select(*keys), list(keys), "left_anti")
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
    # same as upsert: keys are unique post-_one_image_per_key and
    # left_anti ignores duplicates — distinct removed (r14)
    keep = target.join(changes.select(*keys), list(keys), "left_anti")
    upserts = changes.filter(F.col(op_col) != delete_op).drop(op_col)
    if seq_col is not None and seq_col not in target.columns:
        upserts = upserts.drop(seq_col)
    return keep.unionByName(upserts)


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log.

    Collapses an append-only event/change stream into versioned
    dimension rows: consecutive events whose ``attr_cols`` are all
    unchanged fold into one row; each surviving version carries
    ``effective_from`` (its first event's timestamp), ``effective_to``
    (the NEXT version's start, NULL for the open version) and
    ``is_current``. The standard warehouse primitive for "what did
    this entity look like at time T" — pair with a range/as-of join
    (operators/asof.py) to resolve point-in-time lookups.

    Change detection compares each event to its predecessor
    null-safely (``eqNullSafe``: NULL -> NULL is "no change",
    NULL <-> value is a change). ``tiebreak_col`` makes same-timestamp
    orderings deterministic.

    Scale shape (100 TB): two stacked windows over the SAME
    (keys x order) partitioning — Catalyst plans one Exchange + one
    Sort and runs both WindowExecs on it, so the log shuffles once.
    No self-join, no collect.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        changed = changed | ~prev.eqNullSafe(F.col(a))
    first = F.row_number().over(w) == 1
    versions = df.withColumn("__new_version", first | changed).filter(
        F.col("__new_version")
    )
    return (
        versions.withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("effective_to").isNull())
        .drop("__new_version")
    )


def scd2_apply_batch(
    history: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Incrementally maintain a ``scd2_history`` table from a new
    micro-batch of change events.

    Only the entities TOUCHED by the batch are recomputed: their
    existing history rows convert back to change events (one event per
    version, at ``effective_from``), union with the batch's events,
    and rebuild through ``scd2_history``; untouched entities pass
    through by anti-join. Cost scales with the batch's key footprint,
    not the history size — the O(batch) contract the dedup registry
    tier establishes (``operators/registry.py``), applied to
    dimension maintenance. Invariant (pinned by test): replaying any
    split of an event log through this function equals the one-shot
    ``scd2_history`` of the whole log for splits that arrive in
    non-decreasing per-key event time: folded (unchanged-attribute)
    events never influence later versions, so replaying version
    STARTS + newer events reconstructs the timeline exactly. LATE
    events are still applied — the touched key rebuilds from its full
    retained timeline — but the result is the best reconstruction
    from retained version starts, NOT always the one-shot answer: a
    late event landing inside a span whose unchanged repeats were
    folded away cannot resurrect those repeats (SCD2 is lossy
    compression; keep the raw log if exact late replay matters). Two
    further caveats: replayed versions carry a NULL tiebreak, so
    same-(key, ts) events split ACROSS batches may order differently
    than one-shot (keep same-ts events in one batch, or make ts
    unique); and retention-trimmed history cannot replay what it no
    longer holds.

    ``history`` may be empty (bootstrap) but must carry exactly the
    q93 projection of ``scd2_history``'s output: ``keys + attr_cols +
    effective_from/effective_to/is_current`` (extra payload columns
    would be lost through the version->event replay — project them
    out or carry them as attrs). The usual deployment is
    ``foreachBatch`` with this function writing back per-key
    partitions (see ``streaming/ingest.py`` for the idempotent
    overwrite pattern).
    """
    keylist = list(keys)
    touched = batch.select(*keylist).distinct()
    keep = history.join(touched, keylist, "left_anti")
    affected_hist = history.join(touched, keylist, "inner")
    # versions -> change events: one event per version at its start
    replay_cols = [*keylist, *attr_cols]
    tb_type = (
        batch.schema[tiebreak_col].dataType
        if tiebreak_col and tiebreak_col not in replay_cols
        else None
    )
    as_events = affected_hist.select(
        *replay_cols, F.col("effective_from").alias(ts_col),
        *([F.lit(None).cast(tb_type).alias(tiebreak_col)] if tb_type else []),
    )
    batch_events = batch.select(*as_events.columns)
    rebuilt = scd2_history(
        as_events.unionByName(batch_events),
        keylist, ts_col, attr_cols, tiebreak_col=tiebreak_col,
    ).select(*keep.columns)
    return keep.unionByName(rebuilt)

"""Sequence packing for training-data pipelines: distributed prefix
sums and token-budget binning.

Pre-training dataloaders consume fixed-size token windows; the corpus
prep step must therefore assign every document a position in a packed
token stream (concat-and-chunk, the GPT-style approach — documents may
straddle window boundaries) or a whole-document bin (next-fit, for
no-truncation fine-tuning sets).

The primitive under both is a GLOBAL running total. A bare
``Window.orderBy(...)`` computes it by moving every row to ONE
partition (Spark warns exactly this), which is the single most common
100 TB scale trap. ``with_global_cumsum`` instead does the classic
two-phase distributed prefix sum:

1. range-repartition by the order key (range partition i holds keys
   sorted before partition i+1's — RangePartitioner is
   order-preserving);
2. per-partition window cumsum (parallel, partition-local);
3. per-partition totals — numPartitions rows — prefix-summed on the
   driver and joined back broadcast.

Cost: one range shuffle + one broadcast join, fully parallel; the same
shape DuckDB/Trino use for large window frames.

No reference-notebook counterpart (the reference has no packing tier);
this extends SURVEY.md §2.13's training-data mandate. Oracle parity:
q82 checks the whole pipeline against DuckDB's native
``SUM(...) OVER (ORDER BY ...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
    total_col: str | None = None,
    materialize: str = "checkpoint",
) -> DataFrame:
    """Running SUM(value_col) over rows globally ordered by
    ``order_col`` (INCLUSIVE of the current row), without a
    single-partition window sort.

    ``order_col`` must be unique: rows tying on the order key may land
    in different range partitions, which would make their relative
    order — and therefore their cumsum — partitioning-dependent.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # materialization is CORRECTNESS here, not caching:
    # repartitionByRange samples its boundaries and
    # spark_partition_id is nondeterministic, so the totals pass and
    # the cumsum pass must observe the SAME materialized partitioning.
    # materialize="checkpoint" (default): eager localCheckpoint —
    # blocks release via the ContextCleaner when the caller drops the
    # result, while persist() pins CacheManager entries with no safe
    # unpersist site in a function returning a lazy frame (one leaked
    # input copy PER CALL, review r03). The trade: checkpoint blocks
    # are not lineage-recoverable, so an executor loss afterwards
    # fails the downstream action instead of recomputing — on
    # high-churn clusters (spot nodes, dynamic allocation) pass
    # materialize="persist" and unpersist via spark.catalog.clearCache
    # between pipeline stages, or stage the frame to storage yourself.
    base = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    if materialize == "persist":
        part = base.persist()
        part.count()
    elif materialize == "checkpoint":
        part = base.localCheckpoint()
    else:
        raise ValueError(f"materialize must be checkpoint|persist, got {materialize!r}")
    # numPartitions rows: driver-side prefix sum is control flow, not data
    totals = {
        r["__pid"]: r["__t"]
        for r in part.groupBy("__pid").agg(F.sum(value_col).alias("__t")).collect()
    }
    offsets, run = {}, 0
    for pid in sorted(totals):
        offsets[pid] = run
        run += totals[pid] or 0
    w = Window.partitionBy("__pid").orderBy(order_col)
    off = (
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[
            F.col("__pid")
        ]
        if offsets
        else F.lit(0)  # empty input: typed no-op (map() has VOID keys)
    )
    out = part.withColumn(
        out_col, F.sum(F.col(value_col)).over(w) + off
    ).drop("__pid")
    if total_col is not None:
        # the grand total fell out of the totals pass for free —
        # expose it so callers don't pay a separate count()/sum() scan
        out = out.withColumn(total_col, F.lit(run).cast("long"))
    return out


def pack_chunks(
    df: DataFrame,
    order_col: str,
    size_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: lay documents end-to-end in
    ``order_col`` order and cut the stream every ``budget`` units.

    Adds:
      - ``stream_end``: running total of ``size_col`` (position just
        past this doc in the packed stream),
      - ``first_bin`` / ``last_bin``: 0-based chunk ids this doc
        touches (docs may straddle boundaries — the zero-waste
        pre-training layout),
      - ``n_bins``: chunks spanned,
      - ``offset_in_first``: start position inside ``first_bin``.

    Zero-size docs attach to the chunk they fall on (first_bin ==
    last_bin, n_bins == 1).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    out = with_global_cumsum(
        df, order_col, size_col, out_col="stream_end", num_partitions=num_partitions
    )
    start = F.col("stream_end") - F.col(size_col)
    first = F.floor(start / budget).cast("long")
    last = F.greatest(
        first, F.floor((F.col("stream_end") - 1) / budget).cast("long")
    )
    return (
        out.withColumn("first_bin", first)
        .withColumn("last_bin", last)
        .withColumn("n_bins", (F.col("last_bin") - F.col("first_bin") + 1))
        .withColumn("offset_in_first", (start % budget).cast("long"))
    )


def explode_chunks(
    df: DataFrame,
    order_col: str,
    text_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Materialize concat-and-chunk windows: one output row per
    (document, chunk it touches), carrying the substring of the doc
    that lands in that chunk. Chunk ``bin_id``'s full text is the
    concatenation of its pieces in ``order_col`` order — downstream
    writers group by ``bin_id`` and ``array_join`` without ever
    holding more than one chunk per task.

    Sizes are measured in characters of ``text_col`` (token-exact
    packing passes a token array instead; same arithmetic). Built on
    ``pack_chunks``: the 1->N fan-out is a ``sequence`` explode, the
    piece extraction plain substring arithmetic — all JVM-side.
    """
    # zero-size docs contribute 0 to the cumsum, so dropping them
    # BEFORE the pack changes nothing downstream (every other doc's
    # stream_end/bins are identical) and skips their window+explode
    # work (review r03)
    sized = df.withColumn("__sz", F.length(F.col(text_col))).filter(
        F.col("__sz") > 0
    )
    packed = pack_chunks(sized, order_col, "__sz", budget, num_partitions)
    start = F.col("stream_end") - F.col("__sz")
    piece_from = F.greatest(F.col("__bin") * budget, start)
    piece_to = F.least((F.col("__bin") + 1) * budget, F.col("stream_end"))
    return (
        packed.withColumn(
            "__bin", F.explode(F.sequence("first_bin", "last_bin"))
        )
        .select(
            F.col(order_col),
            F.col("__bin").alias("bin_id"),
            F.substring(
                F.col(text_col),
                (piece_from - start + 1).cast("int"),
                (piece_to - piece_from).cast("int"),
            ).alias("piece"),
            (piece_from - start).alias("piece_offset_in_doc"),
            (piece_from - F.col("__bin") * budget).alias("piece_offset_in_bin"),
        )
    )


def assemble_bins(pieces: DataFrame, budget: int | None = None) -> DataFrame:
    """Collapse ``explode_chunks`` output into one row per chunk:
    (bin_id, text, n_docs, n_chars). Pieces concatenate in
    ``piece_offset_in_bin`` order inside a single grouped agg — one
    shuffle keyed by bin_id, each task holds one chunk's pieces (a
    chunk is at most ``budget`` chars by construction, so per-group
    memory is bounded regardless of corpus size)."""
    out = (
        pieces.groupBy("bin_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("piece_offset_in_bin", "piece"))
                    ),
                    lambda s: s["piece"],
                ),
            ).alias("text"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("piece")).alias("n_chars"),
        )
    )
    if budget is not None:
        # every chunk except the stream's last must be exactly full
        out = out.withColumn("full", F.col("n_chars") == budget)
    return out


def pack_next_fit(
    df: DataFrame,
    order_col: str,
    size_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Whole-document next-fit packing: walk docs in ``order_col``
    order, open a new bin whenever the current doc would overflow
    ``budget``; docs are never split (fine-tuning sets, eval shards).

    Next-fit is inherently sequential, so it runs per RANGE PARTITION
    via ``applyInPandas`` — bins never span partitions, which wastes at
    most one partial bin per partition (negligible when each partition
    carries many bins) and keeps the operator embarrassingly parallel.
    Bin ids are ``(partition << 32) | local_bin`` longs: globally
    unique with no coordination (stable across runs insofar as the
    range partitioner draws the same boundaries for the same input,
    which holds for Spark's seed-fixed boundary sampling; persist or
    write the result when downstream stages must see one fixed
    assignment).

    Docs larger than ``budget`` get a bin of their own (oversized, the
    caller decides whether to truncate or drop).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    import pandas as pd

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    schema_out = part.drop("__pid").schema.add("bin_id", "long").add("bin_fill", "long")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        pid = int(pdf["__pid"].iloc[0])
        bins, fills = [], []
        local_bin, fill = 0, 0
        for size in pdf[size_col]:
            size = int(size)
            if fill > 0 and fill + size > budget:
                local_bin += 1
                fill = 0
            fill += size
            bins.append((pid << 32) | local_bin)
            fills.append(fill)
        out = pdf.drop(columns=["__pid"])
        out["bin_id"] = pd.Series(bins, dtype="int64")
        out["bin_fill"] = pd.Series(fills, dtype="int64")
        return out

    return part.groupBy("__pid").applyInPandas(pack, schema=schema_out)


def sliding_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    stride: int | None = None,
) -> DataFrame:
    """Per-document sliding windows with overlap — the RAG/embedding
    chunker (``explode_chunks`` packs a cross-document token stream;
    this one never crosses document boundaries). Chunk k covers
    ``[k*stride, k*stride + size)`` characters; the last chunk may be
    shorter; ``stride < size`` yields overlapping chunks so no
    boundary-spanning span is ever split across all chunks. Documents
    with empty text emit nothing.

    Output: (id, chunk_id, n_chunks, chunk_offset, chunk) — one row
    per (doc, chunk), everything substring arithmetic on a
    ``sequence`` explode: JVM-side, no shuffle at all (the fan-out is
    per-row). ``stride`` defaults to ``size`` (disjoint chunks).
    """
    stride = size if stride is None else stride
    if size < 1 or stride < 1:
        raise ValueError(f"size and stride must be >= 1, got {size}, {stride}")
    ln = F.length(F.col(text_col))
    # 1 chunk when len <= size, else ceil((len - size) / stride) + 1
    n_chunks = F.when(ln <= size, F.lit(1)).otherwise(
        F.ceil((ln - F.lit(size)).cast("double") / F.lit(stride)).cast("int")
        + 1
    )
    return (
        df.filter(ln > 0)
        .withColumn("__n", n_chunks)
        .withColumn("__k", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .select(
            F.col(id_col),
            F.col("__k").alias("chunk_id"),
            F.col("__n").alias("n_chunks"),
            (F.col("__k") * stride).alias("chunk_offset"),
            F.substring(
                F.col(text_col), (F.col("__k") * stride + 1).cast("int"), size
            ).alias("chunk"),
        )
    )


def spfhp_strategies(
    hist: dict[int, int], budget: int
) -> list[tuple[tuple[int, ...], int]]:
    """Shortest-pack-first histogram-packing (SPFHP) — Krell et al.
    2021, "Efficient Sequence Packing without Cross-contamination",
    Algorithm 1: the driver-side solve of :func:`pack_best_fit`.
    Operates on the LENGTH HISTOGRAM (counts per size), never on
    rows: walking sizes longest-first, each count is placed in bulk
    into the open pack group with the SMALLEST remaining space that
    still fits (splitting the group when only part of its packs are
    needed), else a new group opens. The bulk placement follows the
    paper's one-sequence-at-a-time greedy: a chosen pack keeps
    absorbing copies of the size until its remaining space drops
    below it (it stays the smallest fitting pack while it fits), so
    every placement stacks ``t = remaining div size`` copies per
    pack, and a fresh pack opened for a size takes ``budget div
    size`` copies before the next one opens — uniform same-size
    corpora pack densely instead of one-per-pack (review r11: the
    earlier dump-all-as-singletons branch was NOT SPFHP and lost to
    next-fit on uniform lengths). Guarantee (what the pytest
    reference pins): deterministic output, and the SAME pack count
    and total waste as the serial greedy; pack COMPOSITIONS may
    differ from the serial walk when several open packs tie on
    remaining space, because group splits lose pack-creation order
    inside a group (advice r11). Ties on remaining space break by
    group creation order.

    Sizes >= budget form single-document packs (remaining space 0) —
    the pack_next_fit oversize rule.

    Returns ``[(lengths_tuple, n_packs), ...]`` in creation order;
    ``sum(n * len(t))`` counts every histogram entry exactly once.
    Complexity is quadratic in the number of DISTINCT sizes (bounded
    by ``budget``), independent of the corpus row count.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # [remaining, n_packs, lengths_tuple], creation-ordered
    groups: list[list] = []
    for size in sorted(hist, reverse=True):
        if size <= 0:
            raise ValueError(f"sizes must be positive, got {size}")
        c = int(hist[size])
        if c <= 0:
            continue
        if size >= budget:
            groups.append([0, c, (size,)])
            continue
        while c > 0:
            best = None
            for gi, g in enumerate(groups):
                if size <= g[0] and (best is None or g[0] < groups[best][0]):
                    best = gi
            if best is None:
                # fresh packs each take budget div size copies (the
                # per-sequence greedy keeps stacking the pack it just
                # opened while the size still fits)
                k = budget // size
                n_full = c // k
                if n_full:
                    groups.append(
                        [budget - k * size, n_full, (size,) * k]
                    )
                rem = c % k
                if rem:
                    groups.append(
                        [budget - rem * size, 1, (size,) * rem]
                    )
                c = 0
                continue
            g = groups[best]
            # each pack of this group absorbs t copies before its
            # remaining space drops below the size
            t = g[0] // size
            use = min(c, g[1] * t)
            n_full = use // t
            rem = use % t
            if n_full == g[1] and rem == 0:
                g[0] -= t * size
                g[2] = g[2] + (size,) * t
            else:
                g[1] -= n_full + (1 if rem else 0)
                if n_full:
                    groups.append(
                        [g[0] - t * size, n_full, g[2] + (size,) * t]
                    )
                if rem:
                    groups.append(
                        [g[0] - rem * size, 1, g[2] + (size,) * rem]
                    )
                if g[1] == 0:
                    # del by index: two groups can compare equal, and
                    # list.remove would take the first equal one
                    del groups[best]
            c -= use
    return [(tuple(t), n) for _, n, t in groups]


def pack_best_fit(
    df: DataFrame,
    size_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Whole-document histogram packing (Krell et al. 2021 SPFHP):
    the published upgrade over :func:`pack_next_fit` — near-optimal
    bin fills (the paper reports < 1% padding where next-fit wastes
    the tail of every bin) with NO sequential row walk.

    Distributed shape (100 TB): the only data-dependent state is the
    size histogram — ONE map-side-combined aggregate whose output is
    bounded by ``budget`` distinct sizes plus the oversized tail,
    collected and solved driver-side on COUNTS (quadratic in distinct
    sizes, independent of row count; the with_global_cumsum
    driver-prefix-sum precedent). Assignment back is arithmetic, not
    iteration: each document takes its dense per-size rank (the
    grouped_rank_bins distributed rank — a size class can be
    corpus-sized, so no per-size window) and one broadcast equi-join
    on size maps rank ranges to pack ids:
    ``pack = base + (rank - rank_start) div per_pack``. Bins never
    straddle executors, every re-run assigns identically, and the
    result is a pure function of (table, budget).

    Output: input columns + ``(pack_id, pack_fill)`` where packs are
    numbered 0..n_packs-1 in strategy-creation order and
    ``pack_fill`` is the pack's total size (<= budget except
    single-document oversize packs).
    """
    from collections import Counter

    from nsl_kdd_spark.operators.relational import grouped_rank_bins

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    hist = {
        int(r["__s"]): int(r["__c"])
        for r in df.groupBy(F.col(size_col).alias("__s"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    }
    strategies = spfhp_strategies(hist, budget)
    rows = []
    next_rank: dict[int, int] = {}
    base = 0
    for lengths, n in strategies:
        fill = sum(lengths)
        for size, m in sorted(Counter(lengths).items()):
            start = next_rank.get(size, 1)
            rows.append((size, start, m, base, n, fill))
            next_rank[size] = start + n * m
        base += n
    spark = df.sparkSession
    ranges = spark.createDataFrame(
        rows,
        "__s long, __start long, __per long, __base long,"
        " __n long, pack_fill long",
    )
    ranked = grouped_rank_bins(
        df, size_col, id_col, id_col, n_bins=1, rank_col="__rk"
    ).drop("bin")
    return (
        ranked.join(
            F.broadcast(ranges),
            (F.col(size_col).cast("long") == F.col("__s"))
            & (F.col("__rk") >= F.col("__start"))
            & (
                F.col("__rk")
                < F.col("__start") + F.col("__n") * F.col("__per")
            ),
        )
        .withColumn(
            "pack_id",
            F.expr("__base + ((__rk - __start) div __per)"),
        )
        .drop("__s", "__start", "__per", "__base", "__n", "__rk")
    )

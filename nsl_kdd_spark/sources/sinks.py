"""Writers (SURVEY.md §2.1 S7 — the reference never persists results;
the engine adds first-class sinks).

At 100 TB the write layout IS the read performance of every downstream
job: ``write_parquet`` exposes partition-by (coarse pruning key),
optional sort-within-partitions (row-group clustering for min/max
skipping), and target file sizing via repartition before write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    sort_within_partitions: Sequence[str] | None = None,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    out = df
    if n_files is not None:
        out = out.repartition(n_files, *(partition_by or [])) if partition_by \
            else out.repartition(n_files)
    if sort_within_partitions:
        out = out.sortWithinPartitions(*sort_within_partitions)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    salt: str = "",
    mode: str = "overwrite",
) -> None:
    """Deterministic shard layout: shard = 16-bit md5 bucket of
    (salt, key) mod ``n_shards``, written as ``shard=<i>/`` partition
    directories. Assignment is a pure function of (salt, key) — the
    same document lands in the same shard on every re-run and every
    engine, so incremental re-ingests append to stable shards and
    training jobs can address shards by name. Bucket-mod keeps shard
    populations near-even (multinomial balance) without any global
    count or sort; one shuffle on the shard key co-locates each
    shard's rows before the write."""
    from pyspark.sql import functions as F

    from nsl_kdd_spark.operators.relational import md5_bucket16

    # NULL keys would hash to NULL and land in the writer's
    # __HIVE_DEFAULT_PARTITION__ escape dir, off the shard=<0..n-1>
    # address space — route them through the empty-string key instead
    # (deterministic like everything else here)
    keyed = df.withColumn(
        "__sk", F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    )
    out = keyed.withColumn(
        "shard", md5_bucket16("__sk", salt) % n_shards
    ).drop("__sk")
    out.repartition(n_shards, "shard").write.mode(mode).partitionBy(
        "shard"
    ).parquet(path)

"""ORC source/sink (engine extension; the reference reads only its
CSV-ish text format, ``SURVEY.md §2.1``). ORC is the other columnar
format large warehouses standardize on (Hive/Trino estates); Spark
ships the reader/writer natively, with the same pushdown machinery as
parquet: predicate pushdown into stripe/row-group min-max indexes,
column pruning via ReadSchema, partition pruning on directory keys,
and optional bloom filters per column.

Contract mirrors ``sources/parquet.py`` + ``sources/sinks.py`` so a
pipeline can switch formats by swapping one call: explicit schema
handling, partitioned/sorted/sized writes, round-trip tested.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_orc(
    spark: SparkSession,
    path: str,
    columns: Sequence[str] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read ORC; ``columns`` prunes eagerly (the scan's ReadSchema
    carries only what downstream needs even before Catalyst pruning),
    ``merge_schema`` opts into the slower union-of-shard-schemas scan
    for evolved tables (same contract as the parquet loader)."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.orc(path)
    return df.select(*columns) if columns else df


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    sort_within_partitions: Sequence[str] | None = None,
    n_files: int | None = None,
    bloom_filter_columns: Sequence[str] | None = None,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Write ORC with the same layout levers as ``write_parquet``:
    partition-by for coarse pruning, sort-within-partitions for
    stripe-level min/max skipping, ``n_files`` for target sizing.
    ``bloom_filter_columns`` adds per-column bloom indexes — the ORC
    native answer to point-lookup pruning on high-cardinality keys."""
    out = df
    if n_files is not None:
        out = out.repartition(n_files, *(partition_by or [])) if partition_by \
            else out.repartition(n_files)
    if sort_within_partitions:
        out = out.sortWithinPartitions(*sort_within_partitions)
    writer = out.write.mode(mode).option("compression", compression)
    if bloom_filter_columns:
        writer = writer.option("orc.bloom.filter.columns", ",".join(bloom_filter_columns))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)

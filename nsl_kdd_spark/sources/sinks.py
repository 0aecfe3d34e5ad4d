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

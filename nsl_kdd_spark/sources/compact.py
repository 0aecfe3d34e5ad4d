"""Small-file compaction (engine extension — operational maintenance
for the ``sources/sinks.py`` layouts). Streaming sinks, incremental
CDC merges, and per-batch appends all accrete small files; at 100 TB
the file count, not the byte count, becomes the scheduler/namenode
bottleneck (one Spark task per file floor, metadata round-trips per
file). Compaction = read partition, coalesce to size-targeted file
count, rewrite atomically.

Spark-first: the byte size comes from the FILESYSTEM LISTING (driver
metadata call — no data read), the rewrite is one narrow
``repartition(n)`` job per table, and partition columns are preserved
by writing back through the same partitioned writer. Atomicity here is
write-to-temp + swap; a real lakehouse deployment swaps via its table
format's commit (Delta/Iceberg), which this operator deliberately does
not depend on.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def table_file_stats(spark: SparkSession, path: str) -> dict:
    """File count / byte size from the driver-side filesystem listing
    (recursive, skips _SUCCESS/hidden) — no executor jobs."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    n, total = 0, 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        total += f.getLen()
    return {"n_files": n, "total_bytes": total}


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 8,
) -> dict:
    """Decide whether ``path`` needs compaction and into how many
    files. Returns {needed, n_files, total_bytes, target_files}."""
    stats = table_file_stats(spark, path)
    target_files = max(1, math.ceil(stats["total_bytes"] / target_file_bytes))
    needed = (
        stats["n_files"] >= min_files_to_compact
        and stats["n_files"] > 2 * target_files
    )
    return {**stats, "target_files": target_files, "needed": needed}


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 8,
    partition_by: list[str] | None = None,
) -> dict:
    """Compact a parquet table in place when fragmented. Reads the
    current layout, repartitions to the size-targeted file count, and
    swaps directories (temp write + rename — the non-transactional
    stand-in for a table-format commit). No-op (and no data read) when
    the layout is already healthy."""
    plan = plan_compaction(spark, path, target_file_bytes, min_files_to_compact)
    if not plan["needed"]:
        return {**plan, "compacted": False}

    df: DataFrame = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    out = (
        df.repartition(plan["target_files"], *partition_by)
        if partition_by else df.repartition(plan["target_files"])
    )
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    old = path.rstrip("/") + "__compact_old"
    assert fs.rename(jvm.org.apache.hadoop.fs.Path(path),
                     jvm.org.apache.hadoop.fs.Path(old))
    assert fs.rename(jvm.org.apache.hadoop.fs.Path(tmp),
                     jvm.org.apache.hadoop.fs.Path(path))
    fs.delete(jvm.org.apache.hadoop.fs.Path(old), True)
    return {**plan, "compacted": True}

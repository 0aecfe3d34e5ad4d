"""JSON-Lines source/sink (engine extension; reference reads only its
CSV-ish text format, ``SURVEY.md §2.1``). JSONL is the interchange
format of training-data pipelines, so the engine treats it as a
first-class source: explicit-schema reads (schema inference is a full
extra pass over the data — never at 100 TB), JVM-native parse (no
Python boundary), and compressed partitioned writes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read JSONL with a REQUIRED schema. ``mode`` is Spark's parse
    mode (PERMISSIVE / DROPMALFORMED / FAILFAST); pass ``corrupt_col``
    to capture malformed lines in a column instead of nulling them
    silently (the auditable default for corpus ingestion)."""
    reader = spark.read.schema(schema).option("mode", mode)
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    compression: str | None = "gzip",
    max_records_per_file: int | None = None,
) -> None:
    """Write JSONL, gzip by default (text JSON is ~10x parquet's
    size uncompressed). ``max_records_per_file`` bounds shard size so
    downstream loaders parallelize regardless of upstream partition
    count."""
    w = df.write.mode("overwrite")
    if compression is not None:
        w = w.option("compression", compression)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)

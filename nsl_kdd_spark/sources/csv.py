"""NSL-KDD CSV source.

The reference reads with ``sc.textFile(path, 8).map(split(','))`` then
lifts through ``toDF`` + 42 casts (reference README.md:114-160) — two
Python boundary crossings per row. The engine pushes parsing into the
JVM CSV datasource with an explicit schema: one scan, predicate/column
pruning intact, no Python worker in the path (SURVEY.md §2.1 S1-S4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nsl_kdd_spark.schema import nsl_kdd_schema


def load_nsl_kdd(
    spark: SparkSession,
    path: str,
    keep_difficulty: bool = False,
) -> DataFrame:
    """Load a raw NSL-KDD file (43 comma-separated fields, headerless).

    The raw files carry a trailing *difficulty* field that the
    reference's loader silently discards (README.md:91-100: 42-name
    array over 43 fields). That behavior is the default here;
    ``keep_difficulty=True`` retains it as an int column.
    """
    df = spark.read.csv(path, schema=nsl_kdd_schema(include_difficulty=True), header=False)
    if not keep_difficulty:
        df = df.drop("difficulty")
    return df

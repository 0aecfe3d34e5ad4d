"""Parquet catalog over the synthetic testdata star schema (TESTDATA.md).

Plain ``spark.read.parquet`` — the native reader gives column pruning
and predicate pushdown for free; the catalog just centralizes paths and
registers temp views so both the DataFrame and SQL surfaces see the
same tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from nsl_kdd_spark.schema import TESTDATA_TABLES


class Tables:
    """Lazy table accessor: ``Tables(spark, sf_dir).lineitem``."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = self._spark.read.parquet(
                os.path.join(self._dir, f"{name}.parquet")
            )
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TESTDATA_TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Expose every table as a temp view for ``spark.sql``."""
        for name in TESTDATA_TABLES:
            self.table(name).createOrReplaceTempView(name)


def load_tables(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark, sf_dir)

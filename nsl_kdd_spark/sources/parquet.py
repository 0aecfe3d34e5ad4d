"""Parquet catalog over the synthetic testdata star schema (TESTDATA.md).

Plain ``spark.read.parquet`` — the native reader gives column pruning
and predicate pushdown for free; the catalog just centralizes paths and
registers temp views so both the DataFrame and SQL surfaces see the
same tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nsl_kdd_spark.schema import TESTDATA_TABLES


class Tables:
    """Lazy table accessor: ``Tables(spark, sf_dir).lineitem``."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        # timestamp semantics (year()/window() etc.) must not depend on
        # the caller's host timezone — pin UTC like the oracle's naive
        # timestamps (runtime-settable conf)
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            path = os.path.join(self._dir, f"{name}.parquet")
            if name == "events":
                # events.parquet stores TIMESTAMP(NANOS), which the
                # Spark 4 parquet reader rejects; read nanos as long
                # (legacy conf, runtime-settable) and truncate to a
                # microsecond timestamp — the same ns->us conversion
                # DuckDB applies, so oracle comparisons line up.
                self._spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                df = self._spark.read.parquet(path)
                if dict(df.dtypes).get("ts") == "bigint":
                    # integer `div`, not `/`: double division loses
                    # sub-microsecond bits on epoch-nano magnitudes
                    df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
                self._cache[name] = df
            else:
                self._cache[name] = self._spark.read.parquet(path)
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

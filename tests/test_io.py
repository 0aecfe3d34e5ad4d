"""Source/sink round-trips (SURVEY §2.1): the engine must read back
exactly what it wrote, and partitioned layouts must prune."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from nsl_kdd_spark.sources.parquet import load_tables
from nsl_kdd_spark.sources.sinks import write_parquet
from tests.conftest import SF_SMOKE


def test_parquet_roundtrip(spark):
    orders = load_tables(spark, SF_SMOKE).orders
    with tempfile.TemporaryDirectory() as d:
        write_parquet(orders, f"{d}/orders")
        back = spark.read.parquet(f"{d}/orders")
        assert back.count() == orders.count()
        assert sorted(back.columns) == sorted(orders.columns)


def test_partitioned_write_prunes(spark):
    orders = load_tables(spark, SF_SMOKE).orders
    with tempfile.TemporaryDirectory() as d:
        write_parquet(orders, f"{d}/orders", partition_by=["o_orderstatus"])
        back = spark.read.parquet(f"{d}/orders")
        q = back.filter(F.col("o_orderstatus") == "F")
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
        # partition filter must prune directories, not scan+filter
        assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
        want = orders.filter(F.col("o_orderstatus") == "F").count()
        assert q.count() == want


def test_sorted_write_roundtrip(spark):
    li = load_tables(spark, SF_SMOKE).lineitem
    with tempfile.TemporaryDirectory() as d:
        write_parquet(
            li, f"{d}/li", n_files=4, sort_within_partitions=["l_shipdate"]
        )
        back = spark.read.parquet(f"{d}/li")
        assert back.count() == li.count()

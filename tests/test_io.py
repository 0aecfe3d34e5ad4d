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


def test_dynamic_partition_pruning_on_dim_filtered_join(spark):
    """The 100 TB fact-scan lever: joining a partitioned fact to a
    FILTERED dim must prune fact partitions at runtime (DPP) — the
    plan carries a dynamicpruningexpression on the partition column,
    and results match the statically-filtered equivalent."""
    t = load_tables(spark, SF_SMOKE)
    with tempfile.TemporaryDirectory() as d:
        write_parquet(t.orders, f"{d}/orders", partition_by=["o_orderstatus"])
        fact = spark.read.parquet(f"{d}/orders")
        # DPP preconditions: the filtering side must be a scan with its
        # own selective predicate (a literal in-memory dim won't do)
        write_parquet(
            t.orders.select("o_orderstatus", "o_orderpriority").distinct(),
            f"{d}/dim",
        )
        dim = spark.read.parquet(f"{d}/dim").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = fact.join(dim, on="o_orderstatus")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "dynamicpruningexpression" in plan.lower()
        want = (
            t.orders.join(
                t.orders.select("o_orderstatus", "o_orderpriority").distinct()
                .filter(F.col("o_orderpriority") == "1-URGENT"),
                on="o_orderstatus",
            ).count()
        )
        assert j.count() == want


def test_jsonl_roundtrip_with_schema_and_corrupt_capture(spark):
    from nsl_kdd_spark.sources.jsonl import read_jsonl, write_jsonl

    docs = load_tables(spark, SF_SMOKE).documents
    with tempfile.TemporaryDirectory() as d:
        write_jsonl(docs, f"{d}/docs", partition_by=["lang"], compression="gzip")
        schema = docs.schema
        back = read_jsonl(spark, f"{d}/docs", schema)
        assert back.count() == docs.count()
        a = docs.select("doc_id", "text").subtract(back.select("doc_id", "text"))
        assert a.count() == 0

        # malformed lines land in the corrupt column, not silently null
        with open(f"{d}/bad.jsonl", "w") as f:
            f.write('{"doc_id": 1, "text": "ok"}\n')
            f.write("{not json at all\n")
        from pyspark.sql.types import LongType, StringType, StructField, StructType
        s = StructType([
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("_bad", StringType()),
        ])
        got = read_jsonl(spark, f"{d}/bad.jsonl", s, corrupt_col="_bad")
        rows = {r.doc_id: r for r in got.collect()}
        assert rows[1]._bad is None and rows[1].text == "ok"
        bad = [r for r in got.collect() if r.doc_id is None]
        assert len(bad) == 1 and bad[0]._bad.startswith("{not json")


def test_parquet_schema_evolution_merge(spark):
    """Corpus shards evolve (a new column appears mid-pipeline):
    mergeSchema read must union the schemas, null-filling the old
    shards — and a plain read of new-schema shards must still prune
    to requested columns."""
    t = load_tables(spark, SF_SMOKE)
    with tempfile.TemporaryDirectory() as d:
        old = t.documents.select("doc_id", "text")
        new = t.documents.select("doc_id", "text").withColumn(
            "quality", F.length("text").cast("double")
        )
        old.write.parquet(f"{d}/c/batch=1")
        new.write.parquet(f"{d}/c/batch=2")
        merged = spark.read.option("mergeSchema", "true").parquet(f"{d}/c")
        assert set(merged.columns) == {"doc_id", "text", "quality", "batch"}
        assert merged.count() == 2 * t.documents.count()
        nulls = merged.filter(F.col("quality").isNull())
        assert nulls.count() == t.documents.count()
        assert {r.batch for r in nulls.select("batch").distinct().collect()} == {1}


def test_orc_roundtrip_partitioned_and_pruned(spark):
    from nsl_kdd_spark.sources.orc import read_orc, write_orc

    orders = load_tables(spark, SF_SMOKE).orders
    with tempfile.TemporaryDirectory() as d:
        write_orc(orders, f"{d}/orders", partition_by=["o_orderstatus"],
                  sort_within_partitions=["o_orderdate"])
        back = read_orc(spark, f"{d}/orders")
        assert back.count() == orders.count()
        assert sorted(back.columns) == sorted(orders.columns)
        # values survive the round trip (spot-check an aggregate)
        want = orders.agg(F.sum("o_orderkey")).first()[0]
        assert back.agg(F.sum("o_orderkey")).first()[0] == want
        # partition pruning works on the ORC layout too
        q = back.filter(F.col("o_orderstatus") == "F")
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
        assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_orc_predicate_pushdown_and_column_pruning(spark):
    from nsl_kdd_spark.sources.orc import read_orc, write_orc

    li = load_tables(spark, SF_SMOKE).lineitem
    with tempfile.TemporaryDirectory() as d:
        write_orc(li, f"{d}/li", bloom_filter_columns=["l_orderkey"])
        back = read_orc(spark, f"{d}/li", columns=["l_orderkey", "l_quantity"])
        q = back.filter(F.col("l_quantity") < 5)
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
        # filter reaches the ORC scan; schema carries only 2 columns
        assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity" in plan
        read_schema = plan.split("ReadSchema")[1].split("\n")[0]
        assert "l_orderkey" in read_schema and "l_quantity" in read_schema
        assert "l_extendedprice" not in read_schema
        want = li.filter(F.col("l_quantity") < 5).count()
        assert q.count() == want


def test_compaction_merges_fragmented_table(spark):
    from nsl_kdd_spark.sources.compact import (
        compact_parquet, plan_compaction, table_file_stats,
    )

    orders = load_tables(spark, SF_SMOKE).orders
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders"
        # fragment: 64 shards of a small table
        orders.repartition(64).write.parquet(path)
        before = table_file_stats(spark, path)
        assert before["n_files"] == 64
        want_sum = orders.agg(F.sum("o_orderkey")).first()[0]

        res = compact_parquet(spark, path, target_file_bytes=1 << 30)
        assert res["compacted"] and res["target_files"] == 1
        after = table_file_stats(spark, path)
        assert after["n_files"] == 1
        # data survives byte-for-byte (count + checksum)
        back = spark.read.parquet(path)
        assert back.count() == orders.count()
        assert back.agg(F.sum("o_orderkey")).first()[0] == want_sum
        # second run is a no-op: layout already healthy
        res2 = compact_parquet(spark, path, target_file_bytes=1 << 30)
        assert not res2["compacted"]
        # healthy layouts are never touched even when small
        assert not plan_compaction(spark, path, 1 << 30)["needed"]


def test_write_shards_stable_and_balanced(spark, tmp_path):
    from nsl_kdd_spark.sources.sinks import write_shards

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    out = str(tmp_path / "shards")
    write_shards(df, out, n_shards=8, key_col="k")
    back = spark.read.parquet(out)
    counts = {r["shard"]: r["n"] for r in
              back.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(8))
    assert min(counts.values()) > 60  # multinomial balance, 1000/8=125
    # same key -> same shard on rewrite with different layout
    write_shards(df.repartition(13), out + "2", n_shards=8, key_col="k")
    m1 = {r["k"]: r["shard"] for r in back.collect()}
    m2 = {r["k"]: r["shard"]
          for r in spark.read.parquet(out + "2").collect()}
    assert m1 == m2

"""Grouped Arrow training + custom stateful streaming operator."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from nsl_kdd_spark.ml.grouped import train_score_grouped
from nsl_kdd_spark.sources.parquet import load_tables
from nsl_kdd_spark.streaming.stateful import running_user_stats
from tests.conftest import SF_SMOKE


def test_grouped_training_separates_classes(spark):
    # embeddings: per-label-parity group, learn to separate high/low
    # labels from the first 4 dims — grouped fit must beat chance
    e = load_tables(spark, SF_SMOKE).embeddings
    df = e.select(
        F.col("vec_id").alias("id"),
        (F.col("label") % 2).cast("long").alias("grp"),
        F.when(F.col("label") >= 5, 1.0).otherwise(0.0).alias("y"),
        *[F.col("embedding")[i].cast("double").alias(f"f{i}") for i in range(8)],
    )
    scored = train_score_grouped(
        df, group_col="grp", feature_cols=[f"f{i}" for i in range(8)],
        label_col="y", id_col="id",
    )
    joined = df.select("id", "y").join(scored, on="id")
    m = joined.groupBy("y").agg(F.avg("prob").alias("m")).collect()
    means = {r["y"]: r["m"] for r in m}
    assert means[1.0] > means[0.0]
    assert scored.count() == df.count()  # every row scored once


def test_grouped_training_handles_pure_groups(spark):
    rows = [(i, 0, 1.0, float(i)) for i in range(10)]  # group 0: all positive
    rows += [(i + 10, 1, float(i % 2), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, grp long, y double, f0 double")
    scored = train_score_grouped(df, "grp", ["f0"], "y", "id")
    g0 = scored.filter(F.col("grp") == 0).select("prob").distinct().collect()
    assert [r["prob"] for r in g0] == [1.0]  # pure group -> class prior


def test_stateful_running_counts_across_microbatches(spark):
    # stage events as 3 files -> maxFilesPerTrigger=1 forces 3
    # micro-batches -> state must carry counts across batches
    events = load_tables(spark, SF_SMOKE).events.select("user_id", "value", "event_id")
    with tempfile.TemporaryDirectory() as d:
        events.repartition(3).write.parquet(f"{d}/in")
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/in")
        )
        q = (
            running_user_stats(stream)
            .writeStream.format("memory").queryName("t_state")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(180)
        # last emitted row per user = final running total
        final = spark.sql("""
            SELECT user_id, n_events, total_value FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
              FROM t_state) WHERE rn = 1
        """)
        want = events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
        )
        got = {r["user_id"]: r["n_events"] for r in final.collect()}
        exp = {r["user_id"]: r["n_events"] for r in want.collect()}
        assert got == exp

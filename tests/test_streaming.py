"""Structured Streaming path: the SAME windowing operators used by the
batch oracle queries, executed as a real stream (availableNow trigger,
memory sink), must produce the batch answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsl_kdd_spark.functions.scalar import exact_sum
from nsl_kdd_spark.sources.parquet import load_tables
from nsl_kdd_spark.streaming.events import (
    dedup_stream,
    read_events_stream,
    tumbling_agg,
)
from tests.conftest import SF_SMOKE


def _run_to_memory(stream_df, name: str, spark):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_tumbling_equals_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    agg_args = dict(
        ts_col="ts", duration="1 day", keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n"), exact_sum("value").alias("total_value")],
    )
    got = _run_to_memory(
        tumbling_agg(stream, watermark="1 hour", **agg_args), "t_tumble", spark
    )
    want = tumbling_agg(load_tables(spark, SF_SMOKE).events, **agg_args)
    cols = ["window_start", "window_end", "event_type", "n", "total_value"]
    assert sorted(map(tuple, got.select(cols).collect())) == \
           sorted(map(tuple, want.select(cols).collect()))


def test_streaming_dedup_drops_duplicates(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    # events are unique by event_id; dedup by user_id keeps 1 per user
    deduped = dedup_stream(stream, ["user_id"], "ts", watermark="90 days")
    q = (
        deduped.writeStream.format("memory").queryName("t_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(distinct user_id) AS u FROM t_dedup").first()
    n_users = load_tables(spark, SF_SMOKE).events.select("user_id").distinct().count()
    assert got["n"] == got["u"] == n_users

"""Streaming corpus ingest: the continuous version of the day-2
registry flow (``operators/registry.py``) — documents arrive as JSONL
shards, every micro-batch dedups against the standing signature
registry and itself, survivors append to the corpus and their
signatures to the registry.

Exactly-once layout (same contract as
``events.write_stream_foreach_batch``): each batch writes its corpus
rows AND registry signatures into its own ``__batch_id=N`` partition
with dynamic partition overwrite, so a replayed batch overwrites its
own output instead of duplicating — idempotent on top of the
checkpoint's at-least-once replay. The registry is APPEND-ONLY (one
signature shard per batch, never rewritten); fragmentation is the
compactor's job (``sources/compact.py``), not the ingest path's.

Consistency note: batch N+1 reads the registry as of batch N — within-
batch dups are caught by the self-tier, so no accepted duplicate can
slip between consecutive batches of one stream (micro-batches are
serial). Two INDEPENDENT writers racing on one registry would need a
table-format commit protocol; single-stream ingest (the common case)
does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from nsl_kdd_spark.operators.registry import build_registry, dedup_batch


def _write_partition(df: DataFrame, path: str, batch_id: int) -> None:
    s = df.sparkSession
    prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("__batch_id")
            .parquet(path)
        )
    finally:
        s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Corpus/registry tables written by the ingest stream, with the
    bookkeeping partition column dropped."""
    return spark.read.parquet(path).drop("__batch_id")


def ingest_documents_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType | str,
    corpus_path: str,
    registry_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 4,
    threshold: float = 0.7,
    shingle_n: int = 3,
):
    """Start (availableNow) the deduplicating ingest stream over a
    JSONL drop directory. Returns the started StreamingQuery; await
    ``.awaitTermination()`` to drain. Registry verification runs in
    signature-estimate mode — historical text is never re-read, so
    per-batch cost is O(batch x collision rate) regardless of corpus
    age."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        try:
            registry = read_corpus(s, registry_path)
        except Exception:  # first batch: no registry yet
            registry = build_registry(
                batch_df.limit(0), id_col, text_col, num_hashes, shingle_n
            )
        res = dedup_batch(
            batch_df, registry,
            id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, band_size=band_size,
            threshold=threshold, shingle_n=shingle_n,
        )
        accepted = res.accepted.persist()
        try:
            _write_partition(accepted, corpus_path, batch_id)
            _write_partition(res.accepted_signatures, registry_path, batch_id)
        finally:
            accepted.unpersist()
            res.cleanup()  # drop per-batch signature/shingle caches

    stream = (
        spark.readStream.schema(schema)
        .json(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

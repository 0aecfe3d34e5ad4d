"""Incremental near-dup registry (engine extension; reference is
single-shot batch — ``SURVEY.md §2.13``). The production dedup shape
at 100 TB is not "all pairs over the whole corpus each run": it's a
standing REGISTRY of accepted documents' minhash signatures, and each
ingest batch deduped (a) against the registry and (b) within itself,
then appended. Cost per batch is O(batch x collision rate), never a
recompute over the accumulated corpus.

Spark-first shape: signatures reuse ``dedup.minhash_signatures`` (one
explode + one grouped agg); candidate generation is a band-bucket
EQUI-join of new-batch bands against registry bands (shuffle keyed on
the bucket, broadcastable when the batch is small) — never a self-join
over the whole registry. Verification is either exact jaccard (needs
the text of both sides) or the signature-overlap estimate (registry
stores signatures only — the shape that lets the registry stay tiny:
k hex strings per accepted doc).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.dedup import (
    _cap_buckets,
    distinct_tokens,
    minhash_signatures,
    word_shingles,
)


@dataclass
class DedupBatchResult:
    accepted: DataFrame           # new rows that survived both dedup tiers
    dup_vs_registry: DataFrame    # (new_id, registry_id, score)
    dup_within_batch: DataFrame   # (kept_id, dropped_id, score)
    updated_registry: DataFrame   # registry ∪ accepted signatures
    accepted_signatures: DataFrame  # just the accepted rows' signatures
    # (append-only registry maintenance: write accepted_signatures as a
    # new shard instead of rewriting updated_registry — the streaming
    # ingest path in streaming/ingest.py does exactly that)
    _persisted: tuple = ()

    def cleanup(self) -> None:
        """Release the internal persists once outputs are consumed.
        Long-lived callers (streaming ingest: one dedup_batch per
        micro-batch) must call this or cached signature/shingle
        tables accumulate until LRU eviction."""
        for df in self._persisted:
            df.unpersist()


def _bands(sigs: DataFrame, num_hashes: int, band_size: int) -> DataFrame:
    n_bands = num_hashes // band_size
    return sigs.select(
        "__id",
        F.explode(
            F.array(*[
                F.concat_ws(
                    "|",
                    F.lit(str(bi)),
                    *[F.col(f"mh{bi * band_size + j}") for j in range(band_size)],
                )
                for bi in range(n_bands)
            ])
        ).alias("__bucket"),
    )


def _sig_estimate(num_hashes: int) -> F.Column:
    """Jaccard estimate = fraction of agreeing minhash slots."""
    agree = sum(
        (F.col(f"a.mh{i}") == F.col(f"b.mh{i}")).cast("int") for i in range(num_hashes)
    )
    return (agree / F.lit(num_hashes)).alias("score")


def build_registry(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Signatures table for an existing corpus: (doc_id, mh0..mhk-1).
    Persist this once (parquet, partitioned however ingest shards);
    each batch appends its accepted rows' signatures."""
    return minhash_signatures(df, id_col, text_col, num_hashes, shingle_n) \
        .withColumnRenamed("__id", "doc_id")


def dedup_batch(
    new_docs: DataFrame,
    registry: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 4,
    threshold: float = 0.7,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
    corpus_text: DataFrame | None = None,
) -> DedupBatchResult:
    """Dedup one ingest batch against the registry and itself.

    ``corpus_text`` (id_col, text_col of already-accepted docs) opts
    into EXACT jaccard verification of new-vs-registry candidates;
    without it the minhash signature-overlap estimate decides — the
    registry-only mode where no historical text is re-read. Batch-
    internal duplicates always verify exactly (the batch's text is in
    hand); the kept doc is the smallest id (keep-first, matching
    ``dedup.dedup_exact``).
    """
    new_sigs = minhash_signatures(
        new_docs, id_col, text_col, num_hashes, shingle_n
    ).persist()

    reg_sigs = registry.withColumnRenamed("doc_id", "__id")
    nb = _cap_buckets(_bands(new_sigs, num_hashes, band_size),
                      ["__bucket"], max_bucket_size)
    rb = _cap_buckets(_bands(reg_sigs, num_hashes, band_size),
                      ["__bucket"], max_bucket_size)

    # --- tier 1: new vs registry (band equi-join, never a self-join) ---
    cross_cand = (
        nb.select(F.col("__id").alias("new_id"), "__bucket")
        .join(rb.select(F.col("__id").alias("registry_id"), "__bucket"), "__bucket")
        .select("new_id", "registry_id")
        .distinct()
    )
    if corpus_text is not None:
        shingle = (
            word_shingles(text_col, shingle_n) if shingle_n > 1
            else distinct_tokens(text_col)
        )
        new_ts = new_docs.select(
            F.col(id_col).alias("new_id"), shingle.alias("__ta")
        )
        old_ts = corpus_text.select(
            F.col(id_col).alias("registry_id"), shingle.alias("__tb")
        )
        # |A∪B| = |A| + |B| - |A∩B| (shingle arrays are distinct by
        # construction): one hash-set pass per pair, not two
        # (optimization r13, the dedup-module pattern)
        inter_x = F.size(F.array_intersect("__ta", "__tb"))
        dup_vs_registry = (
            cross_cand.join(new_ts, "new_id").join(old_ts, "registry_id")
            .select(
                "new_id", "registry_id",
                (
                    inter_x.cast("double")
                    / (F.size("__ta") + F.size("__tb") - inter_x)
                ).alias("score"),
            )
        )
    else:
        dup_vs_registry = (
            cross_cand
            .join(new_sigs.alias("a"), cross_cand.new_id == F.col("a.__id"))
            .join(reg_sigs.alias("b"), cross_cand.registry_id == F.col("b.__id"))
            .select("new_id", "registry_id", _sig_estimate(num_hashes))
        )
    dup_vs_registry = dup_vs_registry.filter(F.col("score") >= threshold)

    # --- tier 2: within-batch (self band join, exact verify) ---
    self_cand = (
        nb.alias("x").join(nb.alias("y"), "__bucket")
        .filter(F.col("x.__id") < F.col("y.__id"))
        .select(F.col("x.__id").alias("kept_id"), F.col("y.__id").alias("dropped_id"))
        .distinct()
    )
    shingle = (
        word_shingles(text_col, shingle_n) if shingle_n > 1
        else distinct_tokens(text_col)
    )
    ts = new_docs.select(F.col(id_col).alias("__id"), shingle.alias("__ts")).persist()
    inter_w = F.size(F.array_intersect("__ta", "__tb"))
    dup_within = (
        self_cand
        .join(ts.select(F.col("__id").alias("kept_id"),
                        F.col("__ts").alias("__ta")), "kept_id")
        .join(ts.select(F.col("__id").alias("dropped_id"),
                        F.col("__ts").alias("__tb")), "dropped_id")
        .select(
            "kept_id", "dropped_id",
            (
                inter_w.cast("double")
                / (F.size("__ta") + F.size("__tb") - inter_w)
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )

    # --- accepted = not a dup of registry, not a later-duplicate ---
    drop_ids = (
        dup_vs_registry.select(F.col("new_id").alias(id_col))
        .unionByName(dup_within.select(F.col("dropped_id").alias(id_col)))
        .distinct()
    )
    accepted = new_docs.join(drop_ids, id_col, "left_anti")

    accepted_sigs = (
        new_sigs.withColumnRenamed("__id", "doc_id")
        .join(accepted.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi")
    )
    return DedupBatchResult(
        accepted=accepted,
        dup_vs_registry=dup_vs_registry,
        dup_within_batch=dup_within,
        updated_registry=registry.unionByName(accepted_sigs),
        accepted_signatures=accepted_sigs,
        _persisted=(new_sigs, ts),
    )

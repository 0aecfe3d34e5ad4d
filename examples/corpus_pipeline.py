"""End-to-end training-data preparation over the documents table —
the engine's north-star flow (BASELINE.json extensions) in one file:

    clean (exact -> fingerprint -> near-dup -> quality)
    -> language filter
    -> deterministic train/val/test split (md5 buckets)
    -> per-split TF-IDF top terms
    -> JSONL shards per split

    python examples/corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from nsl_kdd_spark.ml.text_features import tfidf_top_terms  # noqa: E402
from nsl_kdd_spark.operators.corpus import corpus_clean  # noqa: E402
from nsl_kdd_spark.operators.relational import hash_split  # noqa: E402
from nsl_kdd_spark.session import get_session  # noqa: E402
from nsl_kdd_spark.sources.jsonl import write_jsonl  # noqa: E402
from nsl_kdd_spark.sources.parquet import load_tables  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="corpus_out_"
    )
    spark = get_session(master="local[8]", shuffle_partitions=16)
    docs = load_tables(spark, sf_dir).documents

    cleaned = corpus_clean(docs)
    print("funnel:", cleaned["funnel"].collect()[0].asDict())

    kept = cleaned["kept"].filter(F.col("lang").isin("en", "de", "fr"))
    split = hash_split(kept, "doc_id")
    print("splits:", {
        r.split: r["count"] for r in split.groupBy("split").count().collect()
    })

    terms = tfidf_top_terms(split.filter(F.col("split") == "train"), k=3)
    print("sample train top-terms:")
    terms.show(9, truncate=False)

    write_jsonl(split, f"{out_dir}/docs", partition_by=["split"])
    print(f"wrote JSONL shards to {out_dir}/docs (partitioned by split)")

    # --- day 2: incremental ingest against the standing registry ---
    # (operators/registry.py: new batch dedups against accumulated
    # signatures + itself, never recomputing over the corpus)
    from nsl_kdd_spark.operators.registry import build_registry, dedup_batch

    registry = build_registry(kept, "doc_id", "text")
    redeliveries = kept.limit(100).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
    )
    novel = kept.limit(100).select(
        (F.col("doc_id") + 2_000_000_000).alias("doc_id"),
        F.array_join(
            F.transform(F.split("text", " "), lambda t: F.concat(F.lit("v2_"), t)),
            " ",
        ).alias("text"),
    )
    batch = redeliveries.unionByName(novel)
    res = dedup_batch(batch, registry, corpus_text=kept, threshold=0.7)
    print(
        "day-2 ingest:",
        {
            "batch": batch.count(),
            "dup_vs_registry": res.dup_vs_registry.count(),
            "dup_within_batch": res.dup_within_batch.count(),
            "accepted": res.accepted.count(),
            "registry_size": res.updated_registry.count(),
        },
    )

    # --- layout maintenance: compact the fragmented parquet store ---
    from nsl_kdd_spark.sources.compact import compact_parquet

    corpus_now = kept.select("doc_id", "text").unionByName(
        res.accepted.select("doc_id", "text")
    )
    corpus_now.repartition(64).write.mode("overwrite").parquet(
        f"{out_dir}/corpus_parquet"
    )
    stats = compact_parquet(spark, f"{out_dir}/corpus_parquet")
    print("compaction:", stats)


if __name__ == "__main__":
    main()

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


if __name__ == "__main__":
    main()

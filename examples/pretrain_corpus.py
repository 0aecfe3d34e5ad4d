"""End-to-end pre-training corpus preparation: the round-3 tiers
chained in production order over the documents table.

    scrub PII -> quality gate (heuristic + unigram-LM NLL)
    -> exact + span + near dedup -> decontaminate
    -> deterministic split/sample -> pack into token windows
    -> tokenize -> epoch-shuffle -> stable shards

Every stage is a pure DataFrame transform from the library; the chain
is one lazy plan per materialization point, so Catalyst prunes and
pushes across stage boundaries. The summary counts at the end each
cost an action (count / read-back) — fine for a demo; a production
run would attach ``operators/quality.observe_quality`` counters to
the writes instead so the stats ride the existing jobs.

Usage: python examples/pretrain_corpus.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nsl_kdd_spark.functions.pii import redact_pii
from nsl_kdd_spark.functions.text import quality_score
from nsl_kdd_spark.ml.text_features import (
    build_vocab,
    encode_tokens,
    unigram_logprob,
)
from nsl_kdd_spark.operators.dedup import (
    dedup_exact,
    dedup_spans,
    minhash_lsh_pairs,
)
from nsl_kdd_spark.operators.decontam import decontaminate
from nsl_kdd_spark.operators.packing import assemble_bins, explode_chunks
from nsl_kdd_spark.operators.relational import (
    hash_split,
    sample_hash_weighted,
    shuffle_deterministic,
)
from nsl_kdd_spark.sources.sinks import write_shards
from nsl_kdd_spark.session import get_session
from nsl_kdd_spark.sources.parquet import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="pretrain_corpus_"
    )
    spark = get_session(app_name="pretrain-corpus", master="local[8]",
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    docs = t.documents
    n0 = docs.count()

    # 1. PII scrub: redaction is a projection — runs at scan speed
    scrubbed = docs.withColumn("text", redact_pii("text"))

    # 2. quality gate + weighted keep: hard floor, then keep docs with
    #    probability = quality score (deterministic by doc_id)
    scored = scrubbed.withColumn("q", quality_score("text"))
    gated = scored.filter(F.col("q") >= 0.2)
    kept = sample_hash_weighted(gated, "doc_id", F.col("q"), salt="curation")

    # 2b. LM-score gate: drop the most perplexing 5% (rare-token noise)
    #     — the cutoff comes from a mergeable sketch, not a global sort
    nll = unigram_logprob(kept, "doc_id", "text")
    p95 = nll.agg(F.percentile_approx("avg_nll", 0.95, 10_000)).first()[0]
    kept = kept.join(
        nll.filter(F.col("avg_nll") <= p95).select("doc_id"), "doc_id"
    )

    # 3. dedup: exact tier first (cheap), then C4-style duplicated-span
    #    removal, then minhash near-dup pairs -> drop the higher id of
    #    each verified pair
    exact = dedup_exact(kept, "text", "doc_id")
    spans = dedup_spans(exact, "doc_id", "text", span_words=10)
    exact = exact.drop("text").join(
        spans.filter(F.length("clean_text") > 0)
        .select("doc_id", F.col("clean_text").alias("text")),
        "doc_id",
    )
    pairs = minhash_lsh_pairs(exact, "doc_id", "text",
                              num_hashes=8, band_size=4, threshold=0.8)
    dupes = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = exact.join(dupes, "doc_id", "left_anti")

    # 4. decontamination vs the "benchmark" (here: 50 eval docs)
    eval_set = docs.orderBy("doc_id").limit(50).select(
        F.col("doc_id").alias("eval_id"), F.col("text").alias("eval_text")
    )
    clean = decontaminate(
        deduped, eval_set, "doc_id", "text", "eval_id", "eval_text", n=8
    )

    # 5. deterministic split; training split packs + tokenizes
    split = hash_split(clean, "doc_id")
    train = split.filter(F.col("split") == "train").persist()
    n_train = train.count()

    # 6. pack into 2048-char windows, assemble window text
    pieces = explode_chunks(train, "doc_id", "text", budget=2048)
    windows = assemble_bins(pieces, budget=2048)

    # 7. tokenize the training split with a corpus-derived vocab
    vocab = build_vocab(train, "text", size=5000)
    encoded = encode_tokens(train, "doc_id", "text", vocab)

    # 8. reproducible training order + stable shard layout
    ordered = shuffle_deterministic(encoded, "doc_id", salt="epoch0")

    windows.write.mode("overwrite").parquet(f"{out_dir}/windows")
    write_shards(ordered, f"{out_dir}/token_ids", n_shards=4,
                 key_col="doc_id")

    n_windows = spark.read.parquet(f"{out_dir}/windows").count()
    sharded = spark.read.parquet(f"{out_dir}/token_ids")
    n_encoded = sharded.count()
    n_shards = sharded.select("shard").distinct().count()
    print(f"documents        {n0}")
    print(f"train after funnel  {n_train}")
    print(f"packed windows   {n_windows}")
    print(f"tokenized docs   {n_encoded} in {n_shards} shards")
    print(f"output           {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()

"""MLlib LSH parity wrappers: recall checked against the engine's
exact operators (MLlib hashes are Spark-seeded, not portable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsl_kdd_spark.ml.lsh import brp_lsh_neighbors, minhash_lsh_join
from nsl_kdd_spark.operators.similarity import knn_bruteforce
from nsl_kdd_spark.sources.parquet import load_tables
from tests.conftest import SF_SMOKE


def test_minhash_lsh_join_finds_token_set_neardups(spark):
    docs = load_tables(spark, SF_SMOKE).documents
    pairs = minhash_lsh_join(docs, max_distance=0.1, num_hash_tables=8)
    rows = pairs.collect()
    assert len(rows) > 0
    assert all(r["jaccard_distance"] <= 0.1 for r in rows)
    # the corpus's token-permutation duplicates (distance 0) must appear
    assert any(r["jaccard_distance"] == 0.0 for r in rows)


def test_brp_neighbors_recall_vs_exact(spark):
    e = load_tables(spark, SF_SMOKE).embeddings
    queries = e.filter(F.col("vec_id") < 5)
    exact = knn_bruteforce(e, queries, k=5)
    approx = brp_lsh_neighbors(e, queries, k=5, bucket_length=4.0, num_hash_tables=4)
    want, got = {}, {}
    for r in exact.collect():
        want.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(want[q] & got.get(q, set())) for q in want)
    # cosine-topk vs euclidean-topk differ; require meaningful overlap
    assert hits / sum(len(v) for v in want.values()) >= 0.3

"""pyspark.ml LSH parity surface (SURVEY.md §2.13 table: MinHashLSH /
BucketedRandomProjectionLSH).

The engine-native paths (``operators/dedup.py``, ``operators/
similarity.py``) are primary — expression-based and DuckDB-oracle-
checkable. These wrappers expose the MLlib estimators for users
porting code that already speaks ``approxSimilarityJoin`` /
``approxNearestNeighbors``; results are Spark-hash-seeded, so tests
check recall against the engine-native exact operators rather than
fixed outputs.
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    CountVectorizer,
    MinHashLSH,
    RegexTokenizer,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minhash_lsh_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hash_tables: int = 8,
    max_distance: float = 0.3,
    seed: int = 42,
) -> DataFrame:
    """MLlib MinHashLSH approxSimilarityJoin over token-set vectors.

    Returns (id_a, id_b, jaccard_distance) with id_a < id_b. Distance
    is 1 - jaccard, so ``max_distance=0.3`` ~ jaccard >= 0.7."""
    tokenizer = RegexTokenizer(inputCol=text_col, outputCol="__toks", pattern="\\s+")
    cv = CountVectorizer(inputCol="__toks", outputCol="__vec", binary=True)
    toks = tokenizer.transform(df)
    model_cv = cv.fit(toks)
    vecs = model_cv.transform(toks).select(id_col, "__vec")
    mh = MinHashLSH(
        inputCol="__vec", outputCol="__hashes",
        numHashTables=num_hash_tables, seed=seed,
    ).fit(vecs)
    joined = mh.approxSimilarityJoin(vecs, vecs, max_distance, distCol="jaccard_distance")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            "jaccard_distance",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .orderBy("id_a", "id_b")
    )


def brp_lsh_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """BucketedRandomProjectionLSH approxNearestNeighbors per query
    (euclidean). Returns (query_id, vec_id, dist)."""
    vecs = corpus.select(id_col, array_to_vector(vec_col).alias("__vec"))
    model = BucketedRandomProjectionLSH(
        inputCol="__vec", outputCol="__hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    ).fit(vecs)
    out = []
    for row in queries.select(id_col, array_to_vector(vec_col).alias("__vec")).collect():
        nn = model.approxNearestNeighbors(vecs, row["__vec"], k + 1, distCol="dist")
        out.append(
            nn.filter(F.col(id_col) != row[id_col])
            .limit(k)
            .select(
                F.lit(row[id_col]).alias("query_id"),
                F.col(id_col),
                "dist",
            )
        )
    from nsl_kdd_spark.operators.joins import union_by_name

    return union_by_name(out).orderBy("query_id", "dist")

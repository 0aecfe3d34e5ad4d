"""pyspark.ml text-feature surface (SURVEY.md §2.13): tokenize ->
stopword-filter -> n-grams -> TF(-IDF) vectors, as thin seed-free
wrappers plus a TF-IDF cosine retrieval flow.

These complement ``functions/text.py``: the expression layer is for
scan-speed scoring/dedup; this layer produces ml Vectors for
downstream estimators (clustering documents, training classifiers on
text). CountVectorizer carries a real vocabulary (invertible);
HashingTF is the fixed-memory scale default.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    HashingTF,
    NGram,
    RegexTokenizer,
    StopWordsRemover,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.vector import cosine


def tfidf_pipeline(
    text_col: str = "text",
    n_features: int = 1 << 14,
    ngram: int | None = None,
    use_count_vectorizer: bool = False,
    min_df: float = 1.0,
) -> Pipeline:
    """Tokenizer -> StopWordsRemover -> [NGram] -> TF -> IDF."""
    stages = [
        RegexTokenizer(inputCol=text_col, outputCol="__tokens", pattern="\\s+"),
        StopWordsRemover(inputCol="__tokens", outputCol="__filtered"),
    ]
    feat_in = "__filtered"
    if ngram is not None:
        stages.append(NGram(n=ngram, inputCol="__filtered", outputCol="__ngrams"))
        feat_in = "__ngrams"
    if use_count_vectorizer:
        stages.append(
            CountVectorizer(inputCol=feat_in, outputCol="__tf", minDF=min_df)
        )
    else:
        stages.append(
            HashingTF(inputCol=feat_in, outputCol="__tf", numFeatures=n_features)
        )
    stages.append(IDF(inputCol="__tf", outputCol="tfidf"))
    return Pipeline(stages=stages)


def fit_tfidf(df: DataFrame, **kwargs) -> PipelineModel:
    return tfidf_pipeline(**kwargs).fit(df)


def tfidf_similarity(
    model: PipelineModel,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF cosine retrieval: transform both sides, broadcast
    the query vectors, per-query top-k — same plan shape as
    ``similarity.knn_bruteforce`` (corpus never shuffles)."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import Window

    c = model.transform(corpus).select(
        F.col(id_col), vector_to_array("tfidf").alias("__cv")
    )
    q = model.transform(queries).select(
        F.col(id_col).alias("query_id"), vector_to_array("tfidf").alias("__qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", id_col,
            cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )

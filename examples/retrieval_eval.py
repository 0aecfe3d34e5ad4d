"""End-to-end retrieval + evaluation over the fixture tables — the
round-4 tier composed in one file:

    corpus stats (inverted index)
    -> lexical ranking (Okapi BM25, fixed-point scores)
    -> dense retrieval (int8-quantized ANN + exact re-rank)
    -> hybrid fusion (RRF of the dense + exact cosine runs)
    -> NDCG@k / MRR evaluation of dense vs fused rankings
       (relevance = label agreement)

    python examples/retrieval_eval.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from nsl_kdd_spark.ml.metrics import ranking_metrics  # noqa: E402
from nsl_kdd_spark.ml.text_features import (  # noqa: E402
    bm25_scores,
    inverted_index,
)
from nsl_kdd_spark.operators.similarity import (  # noqa: E402
    knn_bruteforce,
    knn_quantized,
    quantize_embeddings,
    rrf_fuse,
)
from nsl_kdd_spark.session import get_session  # noqa: E402
from nsl_kdd_spark.sources.parquet import load_tables  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="retrieval-eval", master="local[8]",
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)

    print("== inverted index (top terms by document frequency) ==")
    inverted_index(t.documents, min_df=5).orderBy(
        F.desc("df_count"), "token"
    ).show(5, truncate=60)

    print("== BM25 relevance vs a query bag ==")
    bm25_scores(t.documents, ["spark", "vector", "stream"]).orderBy(
        F.desc("bm25_u"), "doc_id"
    ).show(5)

    print("== int8-quantized ANN with exact re-rank ==")
    qz = quantize_embeddings(t.embeddings)
    queries = t.embeddings.filter(F.col("vec_id") < 5)
    # persist: three consumers below (show, rrf_fuse, ranking_metrics)
    # would otherwise each re-run the quantized scan (round-9 verdict)
    hits = knn_quantized(
        qz, queries, k=5, rerank=15, exact=t.embeddings
    ).persist()
    hits.show(10)

    print("== hybrid fusion: RRF of quantized-ANN + exact cosine runs ==")
    exact_run = knn_bruteforce(t.embeddings, queries, k=5)
    fused = rrf_fuse([hits.select("query_id", "vec_id", "rank"),
                      exact_run.select("query_id", "vec_id", "rank")],
                     top_n=5).persist()
    fused.show(10)

    print("== NDCG@5 / MRR (relevance = label agreement) ==")
    clab = t.embeddings.select("vec_id", F.col("label").alias("clabel"))
    qlab = t.embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )

    def rel(run, rank_col):
        return (
            run.join(clab, "vec_id")
            .join(F.broadcast(qlab), "query_id")
            .select(
                "query_id", F.col(rank_col).alias("rank"),
                (F.col("clabel") == F.col("qlabel")).cast("int").alias("rel"),
            )
        )

    print("dense run:")
    ranking_metrics(rel(hits, "rank"), k=5).show()
    print("fused run:")
    ranking_metrics(rel(fused, "fused_rank"), k=5).show()


if __name__ == "__main__":
    main()

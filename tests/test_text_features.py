"""pyspark.ml text-feature layer: TF-IDF vectors + retrieval."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsl_kdd_spark.ml.text_features import fit_tfidf, tfidf_similarity
from nsl_kdd_spark.sources.parquet import load_tables
from tests.conftest import SF_SMOKE


def test_tfidf_vectors_and_retrieval(spark):
    docs = load_tables(spark, SF_SMOKE).documents
    model = fit_tfidf(docs, n_features=1 << 12)
    out = model.transform(docs)
    assert "tfidf" in out.columns
    assert out.count() == docs.count()

    queries = docs.filter(F.col("doc_id") < 3)
    top = tfidf_similarity(model, docs, queries, k=5)
    rows = top.collect()
    assert len(rows) == 15  # 3 queries x 5
    # ranked descending per query, self excluded
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["doc_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r["cos_sim"])
    for sims in by_q.values():
        assert sims == sorted(sims, reverse=True)


def test_count_vectorizer_and_ngrams(spark):
    docs = load_tables(spark, SF_SMOKE).documents
    model = fit_tfidf(docs, use_count_vectorizer=True, ngram=2)
    cv = [s for s in model.stages if type(s).__name__ == "CountVectorizerModel"][0]
    assert len(cv.vocabulary) > 10  # real bigram vocabulary
    assert all(" " in term for term in cv.vocabulary[:10])  # bigrams

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


def test_tfidf_top_terms_exact(spark):
    from nsl_kdd_spark.ml.text_features import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles Data; spark broadcasts"),
            (2, "data data everywhere"),
            (3, "the spark engine"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, k=2)
    rows = {(r.doc_id, r.rnk): r for r in out.collect()}
    # doc 1: "spark" tf=2 but df=2; exclusive terms (broadcasts,
    # shuffles, df=1) score ln(2) each = 0.693147; spark scores
    # 2*ln(4/3) = 0.575364 -> alphabetical tie-break wins
    assert rows[(1, 1)].token == "broadcasts"
    assert rows[(1, 2)].token == "shuffles"
    assert rows[(1, 1)].score == 0.693147
    # doc 2: "everywhere" (df=1) beats "data" tf=2 df=2 (2*ln(4/3))
    assert rows[(2, 1)].token == "everywhere"
    assert rows[(2, 2)].token == "data"
    assert rows[(2, 2)].score == round(2 * 0.2876820724517809, 6)
    # per-doc cap respected, case folded + punctuation split
    assert out.count() == 6
    assert out.filter(F.col("token") == "Data").count() == 0

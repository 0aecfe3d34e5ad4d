"""fastText-style linear classifier inference (round-10 growth item;
ml/linear_text.py): hashed word-n-gram bucketing, division-free
fixed-point margins, argmax with label tie-break — pinned against a
pure-Python md5 reference. Oracle parity is held by q157 + the
linear_text fuzz family; these tests pin the arithmetic itself."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.ml.linear_text import (
    classify_text,
    demo_weights,
    linear_text_scores,
    word_ngram_array,
)

LABELS = ("keep", "toss")


def _bucket(gram: str, n_buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:4], 16) % n_buckets


def _py_grams(text: str, word_ngrams: int) -> list[str]:
    tk = text.split(" ")
    out = []
    for n in range(1, word_ngrams + 1):
        out += [" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)]
    return out


def _py_weight(bucket: int, i: int, seed: int = 0) -> int:
    return (
        bucket * 1103515245 + i * 2654435761 + seed * 97 + 12345
    ) % 2001 - 1000


def _py_bias(i: int, seed: int = 0) -> int:
    return (i * 997 + seed * 31) % 401 - 200


def _py_margins(
    text: str, labels, word_ngrams: int, n_buckets: int, seed: int = 0
) -> dict[str, int]:
    grams = _py_grams(text, word_ngrams)
    out = {}
    for i, lbl in enumerate(sorted(labels)):
        sw = sum(_py_weight(_bucket(g, n_buckets), i, seed) for g in grams)
        out[lbl] = len(grams) * _py_bias(i, seed) + sw
    return out


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "high quality prose with varied words and structure"),
            (2, "buy now buy now buy now buy now"),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )


def test_word_ngram_array_matches_python(spark):
    row = (
        spark.createDataFrame([("a b c d",)], "t string")
        .select(word_ngram_array(F.split("t", " "), 3).alias("g"))
        .first()
    )
    assert row.g == _py_grams("a b c d", 3)
    # short doc: trigrams/bigrams impossible, unigrams remain
    row1 = (
        spark.createDataFrame([("x",)], "t string")
        .select(word_ngram_array(F.split("t", " "), 3).alias("g"))
        .first()
    )
    assert row1.g == ["x"]


@pytest.mark.parametrize("word_ngrams,n_buckets", [(1, 64), (2, 4096)])
def test_margins_match_python_reference(spark, word_ngrams, n_buckets):
    docs = _docs(spark)
    w, b = demo_weights(spark, LABELS, n_buckets=n_buckets)
    got = {
        (r.doc_id, r.label): r.margin_u
        for r in linear_text_scores(
            docs, "doc_id", "text", w, b,
            word_ngrams=word_ngrams, n_buckets=n_buckets,
        ).collect()
    }
    for doc_id, text in [(r.doc_id, r.text) for r in docs.collect()]:
        exp = _py_margins(text, LABELS, word_ngrams, n_buckets)
        for lbl in LABELS:
            assert got[(doc_id, lbl)] == exp[lbl], (doc_id, lbl)


def test_classify_picks_argmax_with_label_tiebreak(spark):
    docs = _docs(spark)
    w, b = demo_weights(spark, LABELS, n_buckets=4096)
    pred = {
        r.doc_id: (r.label, r.margin_u)
        for r in classify_text(
            docs, "doc_id", "text", w, b, n_buckets=4096
        ).collect()
    }
    assert len(pred) == 3
    for doc_id, text in [(r.doc_id, r.text) for r in docs.collect()]:
        exp = _py_margins(text, LABELS, 2, 4096)
        best = min(sorted(exp), key=lambda l: (-exp[l], l))
        assert pred[doc_id] == (best, exp[best]), doc_id


def test_sparse_weights_missing_pairs_contribute_zero(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"
    )
    # weight only for the 'alpha' unigram bucket under label keep
    bkt = _bucket("alpha", 65536)
    w = spark.createDataFrame(
        [(bkt, "keep", 500)], "bucket int, label string, w_u long"
    )
    b = spark.createDataFrame(
        [("keep", 10), ("toss", 7)], "label string, bias_u long"
    )
    got = {
        (r.label): r.margin_u
        for r in linear_text_scores(
            docs, "doc_id", "text", w, b, word_ngrams=2
        ).collect()
    }
    # 3 grams (alpha, beta, "alpha beta"); only one carries weight
    assert got["keep"] == 3 * 10 + 500
    assert got["toss"] == 3 * 7


def test_gramless_class_frame_still_scores_every_label(spark):
    # a doc whose grams hit NO weight rows still gets k bias rows
    docs = spark.createDataFrame(
        [(1, "zzz")], "doc_id long, text string"
    )
    w = spark.createDataFrame(
        [], "bucket int, label string, w_u long"
    )
    b = spark.createDataFrame(
        [("keep", -5), ("toss", 3)], "label string, bias_u long"
    )
    got = {
        r.label: r.margin_u
        for r in linear_text_scores(
            docs, "doc_id", "text", w, b, word_ngrams=1
        ).collect()
    }
    assert got == {"keep": -5, "toss": 3}


def test_invalid_args_raise(spark):
    docs = _docs(spark)
    w, b = demo_weights(spark, LABELS, n_buckets=64)
    with pytest.raises(ValueError, match="word_ngrams"):
        linear_text_scores(docs, "doc_id", "text", w, b, word_ngrams=0)
    with pytest.raises(ValueError, match="n_buckets"):
        linear_text_scores(docs, "doc_id", "text", w, b, n_buckets=0)


def test_plan_broadcasts_model_and_single_big_shuffle(spark):
    """100 TB shape: the weight table joins as a BROADCAST (no
    exchange below the gram stream), the per-(doc,label) sum is the
    one map-side-combined big shuffle, biases attach broadcast-tiny,
    and nothing is Python."""
    from tests.test_plan_quality import plan_of

    docs = _docs(spark)
    w, b = demo_weights(spark, LABELS, n_buckets=4096)
    plan = plan_of(
        linear_text_scores(docs, "doc_id", "text", w, b)
    )
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree  # weights lookup
    assert "CartesianProduct" not in tree
    assert "EvalPython" not in plan


def test_classify_matches_scores_plus_rank_form(spark):
    """The r13 classify_text (wide-weight single aggregate, argmax in
    the projection) must return EXACTLY what ranking
    linear_text_scores per document returns — including NULL-text
    docs (all-NULL margins -> smallest label, NULL margin), ties, and
    sparse weights."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha"),
            (2, "beta gamma"),
            (3, None),
            (4, ""),
            (5, "delta delta delta delta"),
        ],
        "doc_id long, text string",
    )
    labels = ("keep", "mid", "toss")
    # sparse model: only some buckets carry weight, one label absent
    # from the weight table entirely (contributes bias only)
    bkt_a = _bucket("alpha", 4096)
    bkt_b = _bucket("beta", 4096)
    w = spark.createDataFrame(
        [(bkt_a, "keep", 500), (bkt_b, "toss", 700), (bkt_a, "mid", 500)],
        "bucket int, label string, w_u long",
    )
    b = spark.createDataFrame(
        [("toss", 7), ("keep", 10), ("mid", 10)],
        "label string, bias_u long",
    )
    scores = {
        (r.doc_id, r.label): r.margin_u
        for r in linear_text_scores(
            docs, "doc_id", "text", w, b, n_buckets=4096
        ).collect()
    }
    expected = {}
    for doc_id in (1, 2, 3, 4, 5):
        per = {l: scores[(doc_id, l)] for l in labels}
        if all(m is None for m in per.values()):
            lbl = min(labels)
            expected[doc_id] = (lbl, None)
        else:
            lbl = min(sorted(per), key=lambda l: (-per[l], l))
            expected[doc_id] = (lbl, per[lbl])
    got = {
        r.doc_id: (r.label, r.margin_u)
        for r in classify_text(
            docs, "doc_id", "text", w, b, n_buckets=4096
        ).collect()
    }
    assert got == expected

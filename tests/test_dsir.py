"""DSIR importance resampling (round-11; ml/dsir.py — Xie et al.
2023). Oracle parity is held by q162 + the dsir fuzz family; these
tests pin the fixed-point weight/importance arithmetic against a
pure-Python md5+ln reference, the known-distribution behavior (a
target-like document outscores and outsurvives a raw-like one), and
the 100 TB plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.ml.dsir import (
    dsir_log_importance,
    dsir_select,
    dsir_weights,
    ngram_bucket_counts,
)

SCALE = 1_000_000


def _bucket16(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:4], 16)


def _bucket32(key, salt: str = "") -> int:
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16)


def _lnu(x: float) -> int:
    # python round() is banker's; the engines' round() is HALF_UP on
    # positive values — emulate HALF_UP exactly
    v = math.log(x) * SCALE
    return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)


def _grams(text: str, word_ngrams: int) -> list[str]:
    tk = text.split(" ")
    out = list(tk)
    for n in range(2, word_ngrams + 1):
        out += [" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)]
    return out


def _py_counts(texts, word_ngrams, n_buckets):
    cnt: dict[int, int] = {}
    for t in texts:
        for g in _grams(t, word_ngrams):
            b = _bucket16(g) % n_buckets
            cnt[b] = cnt.get(b, 0) + 1
    return cnt


def _py_model(target_texts, raw_texts, word_ngrams, n_buckets):
    tc = _py_counts(target_texts, word_ngrams, n_buckets)
    rc = _py_counts(raw_texts, word_ngrams, n_buckets)
    w = {
        b: _lnu(tc.get(b, 0) + 1) - _lnu(rc.get(b, 0) + 1)
        for b in set(tc) | set(rc)
    }
    bias = _lnu(sum(rc.values()) + n_buckets) - _lnu(
        sum(tc.values()) + n_buckets
    )
    return w, bias


def _py_importance(doc_text, w, bias, word_ngrams, n_buckets):
    gs = _grams(doc_text, word_ngrams)
    return len(gs) * bias + sum(
        w.get(_bucket16(g) % n_buckets, 0) for g in gs
    )


TARGET = [
    "alpha beta gamma alpha",
    "alpha gamma delta",
    "beta alpha alpha gamma",
]
RAW = [
    (0, "alpha beta gamma delta"),     # target-like
    (1, "zulu yankee xray whiskey"),   # raw-only vocabulary
    (2, "alpha alpha beta gamma"),     # very target-like
    (3, "victor uniform tango zulu"),
    (4, "gamma alpha"),
    (5, "sierra quebec papa oscar november"),
]


def _frames(spark):
    tgt = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TARGET)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(list(RAW), "doc_id long, text string")
    return tgt, raw


@pytest.mark.parametrize("word_ngrams,n_buckets", [(1, 64), (2, 256)])
def test_weights_match_python_reference(spark, word_ngrams, n_buckets):
    tgt, raw = _frames(spark)
    w_df, b_df = dsir_weights(
        tgt, raw, "text", word_ngrams=word_ngrams, n_buckets=n_buckets
    )
    w_ref, bias_ref = _py_model(
        TARGET, [t for _, t in RAW], word_ngrams, n_buckets
    )
    got = {r.bucket: r.w_u for r in w_df.collect()}
    assert got == w_ref
    assert b_df.first().bias_u == bias_ref


@pytest.mark.parametrize("word_ngrams,n_buckets", [(1, 64), (2, 256)])
def test_importance_matches_python_reference(
    spark, word_ngrams, n_buckets
):
    tgt, raw = _frames(spark)
    w_df, b_df = dsir_weights(
        tgt, raw, "text", word_ngrams=word_ngrams, n_buckets=n_buckets
    )
    imp = {
        r.doc_id: r.log_w_u
        for r in dsir_log_importance(
            raw, "doc_id", "text", w_df, b_df,
            word_ngrams=word_ngrams, n_buckets=n_buckets,
        ).collect()
    }
    w_ref, bias_ref = _py_model(
        TARGET, [t for _, t in RAW], word_ngrams, n_buckets
    )
    for doc_id, text in RAW:
        assert imp[doc_id] == _py_importance(
            text, w_ref, bias_ref, word_ngrams, n_buckets
        ), doc_id


def test_known_distribution_orders_docs_by_target_likeness(spark):
    """The semantic pin: documents built from target vocabulary must
    out-score documents built from raw-only vocabulary — DSIR's
    entire point."""
    tgt, raw = _frames(spark)
    w_df, b_df = dsir_weights(tgt, raw, "text", 2, n_buckets=256)
    imp = {
        r.doc_id: r.log_w_u
        for r in dsir_log_importance(
            raw, "doc_id", "text", w_df, b_df, 2, 256
        ).collect()
    }
    target_like = {0, 2, 4}
    raw_like = {1, 3, 5}
    assert min(imp[d] for d in target_like) > max(
        imp[d] for d in raw_like
    )


def test_select_matches_python_acceptance(spark):
    tgt, raw = _frames(spark)
    w_df, b_df = dsir_weights(tgt, raw, "text", 2, n_buckets=256)
    w_ref, bias_ref = _py_model(TARGET, [t for _, t in RAW], 2, 256)
    tau = -5_000_000
    salt = "s"
    kept = {
        r.doc_id
        for r in dsir_select(
            raw, "doc_id", "text", w_df, b_df,
            tau_u=tau, salt=salt, word_ngrams=2, n_buckets=256,
        ).collect()
    }
    expected = set()
    for doc_id, text in RAW:
        logw = _py_importance(text, w_ref, bias_ref, 2, 256)
        lu = _lnu((_bucket32(doc_id, salt) + 1) / 2**32)
        if lu < logw - tau:
            expected.add(doc_id)
    assert kept == expected
    assert 0 < len(kept) < len(RAW)  # non-degenerate draw


def test_select_is_salt_deterministic_and_monotone_in_tau(spark):
    tgt, raw = _frames(spark)
    w_df, b_df = dsir_weights(tgt, raw, "text", 2, n_buckets=256)

    def kept(tau, salt=""):
        return {
            r.doc_id
            for r in dsir_select(
                raw, "doc_id", "text", w_df, b_df,
                tau_u=tau, salt=salt, word_ngrams=2, n_buckets=256,
            ).collect()
        }

    assert kept(-5_000_000) == kept(-5_000_000)  # reproducible
    # raising tau can only shrink the kept set (acceptance is a
    # threshold on the same per-doc statistic)
    assert kept(-2_000_000) <= kept(-8_000_000)


def test_empty_target_corpus_is_uniformly_repellent(spark):
    """T = 0: every bucket weight is -ln(r_b + 1) <= 0 and the bias
    is ln(R+B) - ln(B) >= 0 — the model runs (no div-by-zero) and
    scores every doc; nothing is NULL."""
    tgt, raw = _frames(spark)
    w_df, b_df = dsir_weights(
        tgt.filter(F.lit(False)), raw, "text", 1, n_buckets=64
    )
    imp = dsir_log_importance(
        raw, "doc_id", "text", w_df, b_df, 1, 64
    ).collect()
    assert len(imp) == len(RAW)
    assert all(r.log_w_u is not None for r in imp)


def test_bucket_counts_histogram(spark):
    tgt, _ = _frames(spark)
    got = {
        r.bucket: r.cnt
        for r in ngram_bucket_counts(
            tgt, "text", word_ngrams=2, n_buckets=64
        ).collect()
    }
    assert got == _py_counts(TARGET, 2, 64)


def test_invalid_args_raise(spark):
    tgt, raw = _frames(spark)
    with pytest.raises(ValueError, match="word_ngrams"):
        ngram_bucket_counts(tgt, "text", word_ngrams=0)
    with pytest.raises(ValueError, match="n_buckets"):
        ngram_bucket_counts(tgt, "text", n_buckets=70000)


def test_fit_select_equals_compositional_path(spark):
    """dsir_fit_select (one persisted raw-gram pass) must return the
    IDENTICAL rows as dsir_weights -> dsir_select, across parameter
    draws — same weights layout via the shared helper, same
    acceptance arithmetic."""
    from nsl_kdd_spark.ml.dsir import dsir_fit_select

    tgt, raw = _frames(spark)
    for ngrams, buckets, tau, salt in (
        (2, 256, -5_000_000, "s"),
        (1, 64, 0, ""),
    ):
        w_df, b_df = dsir_weights(
            tgt, raw, "text", word_ngrams=ngrams, n_buckets=buckets
        )
        via_comp = sorted(
            (r.doc_id, r.log_w_u)
            for r in dsir_select(
                raw, "doc_id", "text", w_df, b_df, tau_u=tau,
                salt=salt, word_ngrams=ngrams, n_buckets=buckets,
            ).collect()
        )
        via_fused = sorted(
            (r.doc_id, r.log_w_u)
            for r in dsir_fit_select(
                tgt, raw, "doc_id", "text", tau_u=tau, salt=salt,
                word_ngrams=ngrams, n_buckets=buckets,
            ).collect()
        )
        assert via_fused == via_comp, (ngrams, buckets, tau, salt)


def test_fit_select_plan_has_single_gram_lineage(spark):
    from tests.test_plan_quality import plan_of
    from nsl_kdd_spark.ml.dsir import dsir_fit_select

    tgt, raw = _frames(spark)
    df = dsir_fit_select(tgt, raw, "doc_id", "text", n_buckets=256)
    plan = plan_of(df)
    assert "EvalPython" not in plan
    # the persisted raw-gram table serves both consumers: the plan
    # must read it from cache, not rebuild the gram explode twice
    assert plan.count("InMemoryTableScan") >= 2


def test_importance_plan_shape(spark):
    """100 TB shape: the weight join is broadcast, the margin is ONE
    map-side-combined aggregate, no window on the corpus side, no
    Python anywhere (linear_text's audited plan, reused)."""
    from tests.test_plan_quality import plan_of

    tgt, raw = _frames(spark)
    w_df, b_df = dsir_weights(tgt, raw, "text", 2, n_buckets=256)
    df = dsir_select(
        raw, "doc_id", "text", w_df, b_df, tau_u=0, word_ngrams=2,
        n_buckets=256,
    )
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree

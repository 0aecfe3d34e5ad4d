"""Edge cases for the text/dedup/similarity operators: empty strings,
short docs, unicode, null handling — the places expression guards
(e.g. the sequence(1,0) shingle guard) earn their keep."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsl_kdd_spark.functions.text import (
    avg_token_length,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from nsl_kdd_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
    word_shingles,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_short_docs_produce_empty_shingles(spark):
    df = _docs(spark, ["one", "two words", "three words here", ""])
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", word_shingles("text", 3).alias("s")).collect()
    }
    assert got[0] == []            # 1 token < n
    assert got[1] == []            # 2 tokens < n
    assert got[2] == ["three words here"]
    assert got[3] == []            # empty text


def test_pairwise_ops_survive_degenerate_corpus(spark):
    # all docs too short for shingles -> no pairs, no crash
    df = _docs(spark, ["a", "b", "c d"])
    assert jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).count() == 0
    assert minhash_lsh_pairs(df, "doc_id", "text", shingle_n=3).count() == 0


def test_identical_docs_found_by_every_tier(spark):
    dup = "alpha beta gamma delta epsilon zeta"
    df = _docs(spark, [dup, dup, "totally different text entirely now"])
    jp = jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in jp] == [(0, 1)]
    mh = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in mh] == [(0, 1)]
    sh = {r["doc_id"]: r["simhash"] for r in simhash(df, "doc_id", "text").collect()}
    assert sh[0] == sh[1] != sh[2]


def test_unicode_text_roundtrips(spark):
    df = _docs(spark, ["héllo wörld ünicode", "中文 文本 处理 测试", "emoji 🎉 text"])
    rows = df.select(
        "doc_id",
        token_count("text").alias("n"),
        fingerprint("text").alias("fp"),
        quality_score("text").alias("q"),
    ).collect()
    assert [r["n"] for r in rows] == [3, 4, 3]
    assert len({r["fp"] for r in rows}) == 3
    assert all(r["q"] is not None for r in rows)


def test_lang_id_zh_markers(spark):
    df = _docs(spark, ["的 是 不 在 有", "the of and to in", "xyzzy qwerty"])
    got = [r["l"] for r in df.select(lang_id("text").alias("l")).collect()]
    assert got == ["zh", "en", "und"]


def test_avg_token_length_single_token(spark):
    df = _docs(spark, ["hello"])
    assert df.select(avg_token_length("text").alias("a")).first()["a"] == 5.0


def test_null_text_does_not_crash_stats(spark):
    df = spark.createDataFrame([(0, None), (1, "some text")], "doc_id long, text string")
    rows = df.select("doc_id", token_count("text").alias("n")).collect()
    got = {r["doc_id"]: r["n"] for r in rows}
    assert got[1] == 2
    # null text -> null count (not a crash); callers filter or fillna
    assert got[0] is None or got[0] == -1


def test_asof_join_tolerance_and_ties(spark):
    from datetime import datetime as d

    from nsl_kdd_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, d(2024, 1, 1, 10, 0)), (2, d(2024, 1, 1, 12, 0)),
         (3, d(2024, 1, 1, 9, 0))],
        "lid long, lts timestamp",
    ).withColumn("k", F.lit(1))
    right = spark.createDataFrame(
        [(100, d(2024, 1, 1, 10, 0)), (200, d(2024, 1, 1, 11, 0))],
        "rid long, rts timestamp",
    ).withColumn("k", F.lit(1))

    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    right_values=["rid"])
    got = {r["lid"]: r["rid"] for r in out.collect()}
    assert got == {1: 100, 2: 200, 3: None}  # tie at 10:00 matches

    tol = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    right_values=["rid"], tolerance_seconds=1800)
    got_tol = {r["lid"]: r["rid"] for r in tol.collect()}
    assert got_tol == {1: 100, 2: None, 3: None}  # 12:00 match is 1h stale


def test_corpus_funnel_stages_monotonic(spark):
    from nsl_kdd_spark.operators.corpus import corpus_clean
    from nsl_kdd_spark.sources.parquet import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE).documents
    out = corpus_clean(docs)
    f = out["funnel"].first()
    # monotone funnel, every tier sees only survivors
    assert f["n_raw"] >= f["n_after_exact"] >= f["n_after_fingerprint"] \
           >= f["n_after_neardup"] >= f["n_kept"] > 0
    assert out["kept"].count() == f["n_kept"]
    # kept docs are unique by fingerprint
    from nsl_kdd_spark.functions.text import fingerprint as fp

    n_fp = out["kept"].select(fp("text").alias("f")).distinct().count()
    assert n_fp == f["n_kept"]


def test_simhash_banded_lossless_vs_bruteforce(spark):
    """Pigeonhole guarantee: bands >= max_hamming + 1 makes banded
    candidate generation exact (same pairs as the all-pairs join)."""
    from nsl_kdd_spark.operators.dedup import simhash_pairs

    rows = [
        (i, f"alpha beta gamma delta epsilon zeta token{i % 7} word{i % 3} tail{i % 5}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    brute = sorted(map(tuple, simhash_pairs(df, "doc_id", "text", 4, bits=32).collect()))
    banded = sorted(
        map(tuple, simhash_pairs(df, "doc_id", "text", 4, bits=32, bands=5).collect())
    )
    assert brute == banded and len(brute) > 0


def test_simhash_bands_guard_rejects_lossy_config(spark):
    import pytest

    from nsl_kdd_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bands"):
        simhash_pairs(df, "doc_id", "text", max_hamming=4, bits=32, bands=4)


def test_minhash_bucket_cap_drops_template_cluster_only(spark):
    """max_bucket_size bounds join fan-out: a 20-doc identical-template
    cluster (quadratic true pairs) is skipped, a genuine near-dup pair
    in a small bucket is still found."""
    from nsl_kdd_spark.operators.dedup import minhash_lsh_pairs

    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(20)]
    rows += [
        (100, "completely different unique sentence about spark shuffles at scale"),
        (101, "completely different unique sentence about spark shuffles at scales"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # band_size=1 (8 singleton bands): candidate recall for a 0.78-
    # jaccard pair is near-certain for any hash family, so the test
    # exercises the CAP semantics, not band-collision luck
    uncapped = minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.5, band_size=1
    )
    capped = minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.5, band_size=1, max_bucket_size=5
    )
    un = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cp = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in un and (100, 101) in cp
    assert any(a < 20 and b < 20 for a, b in un)       # template pairs present
    assert not any(a < 20 and b < 20 for a, b in cp)   # ...and capped away
    assert cp <= un

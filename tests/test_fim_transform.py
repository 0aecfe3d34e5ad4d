"""Fill-in-the-middle transform (round-10;
operators/corpus.fim_transform — Bavarian et al. 2022 FIM
preprocessing). Oracle parity is held by q159 + the fim fuzz family;
these tests pin the split arithmetic against a pure-Python md5
reference, the token-conservation invariant, and the zero-shuffle
plan shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.corpus import fim_transform


def _bucket(doc_id, salt: str = "") -> int:
    return int(
        hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:4], 16
    )


def _bucket32(doc_id, salt: str = "") -> int:
    return int(
        hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16
    )


def _py_fim(doc_id: int, text: str, rate: float, salt: str, mode: str):
    # apply decision: 16-bit (the sample_hash cut convention);
    # split points: 32-bit (round-11 — long-doc reachability)
    applied = _bucket(doc_id, salt) < int(rate * 65536)
    if not applied:
        return False, text
    tk = text.split(" ")
    L = len(tk)
    c1 = _bucket32(doc_id, salt + "a") % (L + 1)
    c2 = _bucket32(doc_id, salt + "b") % (L + 1)
    lo, hi = min(c1, c2), max(c1, c2)
    prefix, middle, suffix = tk[:lo], tk[lo:hi], tk[hi:]
    if mode == "psm":
        parts = ["<PRE>", *prefix, "<SUF>", *suffix, "<MID>", *middle]
    else:
        parts = ["<SUF>", *suffix, "<PRE>", *prefix, "<MID>", *middle]
    return True, " ".join(parts)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot"),
            (2, "one two three"),
            (3, "solo"),
            (4, "the quick brown fox jumps over the lazy dog today"),
            (5, "x y"),
        ],
        "doc_id long, text string",
    )


@pytest.mark.parametrize("mode", ["psm", "spm"])
@pytest.mark.parametrize("rate,salt", [(1.0, ""), (0.5, "s1")])
def test_matches_python_reference(spark, rate, salt, mode):
    docs = _docs(spark)
    got = {
        r.doc_id: (r.fim_applied, r.text_fim)
        for r in fim_transform(
            docs, "doc_id", "text", rate=rate, salt=salt, mode=mode
        ).collect()
    }
    for r in docs.collect():
        assert got[r.doc_id] == _py_fim(
            r.doc_id, r.text, rate, salt, mode
        ), r.doc_id


def test_rate_zero_is_pure_passthrough(spark):
    docs = _docs(spark)
    out = fim_transform(docs, "doc_id", "text", rate=0.0).collect()
    for r in out:
        assert not r.fim_applied and r.text_fim == r.text


def test_tokens_conserved_plus_three_sentinels(spark):
    # FIM permutes segments; it must never drop or invent tokens
    docs = _docs(spark)
    out = fim_transform(docs, "doc_id", "text", rate=1.0).collect()
    for r in out:
        orig = sorted(r.text.split(" "))
        fim = sorted(r.text_fim.split(" "))
        assert fim == sorted(orig + ["<PRE>", "<SUF>", "<MID>"]), r.doc_id


def test_decision_matches_sample_hash_cut(spark):
    """The FIM doc set under (rate, salt) is exactly the
    sample_hash(rate, salt) doc set — one shared truncation
    convention across every deterministic sampler."""
    from nsl_kdd_spark.operators.relational import sample_hash

    docs = _docs(spark)
    fim_ids = {
        r.doc_id
        for r in fim_transform(
            docs, "doc_id", "text", rate=0.5, salt="z"
        ).filter("fim_applied").collect()
    }
    sample_ids = {
        r.doc_id
        for r in sample_hash(docs, "doc_id", 0.5, salt="z").collect()
    }
    assert fim_ids == sample_ids


def test_custom_sentinels_and_out_col(spark):
    docs = _docs(spark).filter("doc_id = 3")
    r = fim_transform(
        docs, "doc_id", "text", rate=1.0,
        pre_tok="<|p|>", suf_tok="<|s|>", mid_tok="<|m|>",
        out_col="fim",
    ).first()
    assert "<|p|>" in r.fim and "<|s|>" in r.fim and "<|m|>" in r.fim
    assert "text_fim" not in r.asDict()


def test_invalid_args_raise(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="rate"):
        fim_transform(docs, "doc_id", "text", rate=1.5)
    with pytest.raises(ValueError, match="mode"):
        fim_transform(docs, "doc_id", "text", mode="msp")


def test_long_doc_split_points_reach_past_65536(spark):
    """Round-10 verdict finding: 16-bit split points made every
    position >= 65,536 UNREACHABLE — a 100k-token file never split
    in its tail. Drive a real 70,001-token doc through the engine
    with an id whose 32-bit bucket lands past the old ceiling and
    assert the prefix length (lo, recoverable from the PSM layout)
    exceeds 65,535."""
    L = 70_000
    # find ids whose BOTH split draws land past the 16-bit ceiling
    # (lo = min(c1, c2) must exceed 65535)
    doc_id = next(
        i for i in range(1, 10_000)
        if _bucket32(i, "a") % (L + 1) > 65535
        and _bucket32(i, "b") % (L + 1) > 65535
    )
    text = " ".join(f"t{j}" for j in range(L))
    docs = spark.createDataFrame(
        [(doc_id, text)], "doc_id long, text string"
    )
    r = fim_transform(docs, "doc_id", "text", rate=1.0).first()
    body = r.text_fim.split(" ")
    assert body[0] == "<PRE>"
    lo = body.index("<SUF>") - 1  # prefix token count == lo
    expected_lo = min(
        _bucket32(doc_id, "a") % (L + 1),
        _bucket32(doc_id, "b") % (L + 1),
    )
    assert lo == expected_lo
    assert lo > 65535  # unreachable at 16 bits, reachable now


def test_split_point_histogram_exact_at_small_L(spark):
    """Distribution pin (round-10 verdict): at small L the split
    points must hit EVERY position 0..L with near-uniform mass —
    the exact histogram over a large id draw equals the pure-Python
    32-bit reference, and no position is starved below 60% of the
    uniform expectation (the 16-bit mod's 2:1 bias class would
    trip this at large L; at 32 bits the bias is ~L/2^32)."""
    import collections

    L = 7
    n_ids = 4096
    expected = collections.Counter(
        _bucket32(i, "a") % (L + 1) for i in range(n_ids)
    )
    text = " ".join(f"t{j}" for j in range(L))
    docs = spark.createDataFrame(
        [(i, text) for i in range(n_ids)], "doc_id long, text string"
    )
    out = fim_transform(docs, "doc_id", "text", rate=1.0).collect()
    got = collections.Counter()
    for r in out:
        body = r.text_fim.split(" ")
        lo = body.index("<SUF>") - 1
        hi = lo + (len(body) - body.index("<MID>") - 1)
        a = _bucket32(r.doc_id, "a") % (L + 1)
        b = _bucket32(r.doc_id, "b") % (L + 1)
        assert {lo, hi} == {a, b}, r.doc_id
        got[a] += 1
    assert got == expected
    floor_mass = 0.6 * n_ids / (L + 1)
    assert all(expected[p] > floor_mass for p in range(L + 1))


def test_plan_is_pure_scan_projection(spark):
    """100 TB shape: the whole transform is scan-stage expressions —
    no exchange, no join, no window, no Python."""
    from tests.test_plan_quality import plan_of

    df = fim_transform(_docs(spark), "doc_id", "text", rate=0.5)
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "Join" not in tree and "Window" not in tree
    assert "EvalPython" not in plan

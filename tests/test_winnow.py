"""Winnowing fingerprints (operators/winnow.py): pure-Python pin of
the selection algorithm (Schleimer et al. SIGMOD 2003), the rightmost
tie rule, the short/empty/NULL doc edges, the match guarantee the
paper proves, and the stop-fingerprint join guard."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nsl_kdd_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def py_winnow(text: str, k: int, w: int) -> set[tuple[int, str]]:
    """Reference implementation: every window's rightmost-min, 1-based
    gram positions, 16-hex-char md5 prefixes."""
    tk = text.split(" ")
    if len(tk) < k + w - 1:
        return set()
    h = [
        hashlib.md5(" ".join(tk[i : i + k]).encode()).hexdigest()[:16]
        for i in range(len(tk) - k + 1)
    ]
    sel: set[tuple[int, str]] = set()
    for j in range(len(h) - w + 1):
        best, bi = "g", -1
        for x in range(j, j + w):
            if h[x] <= best:
                best, bi = h[x], x
        sel.add((bi + 1, best))
    return sel


DOCS = [
    (1, "a b c d e f g h i j"),
    (2, "a b c d e f g h i j"),  # exact dup of 1
    (3, "x y z a b c d e f g h q r s"),  # contains doc 1's prefix span
    (4, "short doc here"),  # < k+w-1 tokens -> no fingerprints
    (5, "t t t t t t t t t t t t"),  # all-equal hashes (tie rule)
    (6, ""),  # one empty token -> too short
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_winnow_matches_python_reference(spark):
    got = {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(
            _docs_df(spark), "doc_id", "text", k=4, w=4
        ).collect()
    }
    want = {(d, p, h) for d, t in DOCS for (p, h) in py_winnow(t, 4, 4)}
    assert got == want and got  # non-trivial and bit-identical


def test_winnow_null_text_produces_no_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a b c d e f g h")], "doc_id int, text string"
    )
    rows = winnow_fingerprints(df, "doc_id", "text", k=4, w=4).collect()
    assert {r.doc_id for r in rows} == {2}


def test_winnow_tie_rule_selects_rightmost(spark):
    # doc 5: every k-gram hash identical, so each window's rightmost
    # element is selected -> exactly positions w..m (m = n-k+1)
    rows = winnow_fingerprints(
        _docs_df(spark).filter("doc_id = 5"), "doc_id", "text", k=4, w=4
    ).collect()
    m = 12 - 4 + 1
    assert sorted(r.pos for r in rows) == list(range(4, m + 1))
    assert len({r.fp for r in rows}) == 1


def test_winnow_guarantee_every_window_covered(spark, sf_smoke_docs=None):
    # the paper's density/coverage property on real fixture text:
    # every window [j, j+w-1] contains at least one selected position
    from nsl_kdd_spark.sources.parquet import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE).documents.limit(50)
    k, w = 4, 4
    fps = winnow_fingerprints(docs, "doc_id", "text", k=k, w=w)
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    ).collect()
    by_doc: dict[int, list[int]] = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    for t in toks:
        m = t.n - k + 1
        if t.n < k + w - 1:
            assert t.doc_id not in by_doc
            continue
        pos = sorted(by_doc[t.doc_id])
        for j in range(1, m - w + 2):
            assert any(j <= p <= j + w - 1 for p in pos), (t.doc_id, j)


def test_winnow_overlap_guarantee_on_planted_span(spark):
    # docs 1/2 identical and doc 3 embeds a >= w+k-1 = 7-token span of
    # doc 1 -> the winnowing guarantee promises >= 1 shared fingerprint
    pairs = {
        (r.id_a, r.id_b): r.shared
        for r in winnow_overlap_pairs(
            _docs_df(spark), "doc_id", "text", k=4, w=4,
            min_shared=1, max_fp_df=None,
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    # identical docs share their whole fingerprint set
    n1 = len(py_winnow(DOCS[0][1], 4, 4))
    assert pairs[(1, 2)] == len({h for _, h in py_winnow(DOCS[0][1], 4, 4)})
    assert n1 >= pairs[(1, 2)]


def test_winnow_max_fp_df_guard_drops_boilerplate(spark):
    # one boilerplate sentence shared by ALL docs + a unique tail;
    # with max_fp_df below the doc count the boilerplate fingerprints
    # fall out and only genuine (here: none) overlaps remain
    boiler = "terms of service apply to all content here"
    docs = [(i, f"{boiler} unique{i} tail{i} word{i} extra{i}") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    unguarded = winnow_overlap_pairs(
        df, "doc_id", "text", k=4, w=4, min_shared=1, max_fp_df=None
    ).count()
    guarded = winnow_overlap_pairs(
        df, "doc_id", "text", k=4, w=4, min_shared=1, max_fp_df=10
    ).count()
    assert unguarded == 20 * 19 // 2  # boilerplate pairs everyone
    assert guarded == 0


def test_winnow_fingerprint_extraction_is_shuffle_free(spark):
    # the selection stage is one JVM projection: no Exchange, no
    # Python workers before the explode
    from tests.test_plan_quality import plan_of

    df = winnow_fingerprints(
        _docs_df(spark), "doc_id", "text", k=4, w=4
    )
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "EvalPython" not in plan

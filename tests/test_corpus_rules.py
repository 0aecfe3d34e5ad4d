"""Gopher document-quality rules + C4 line-level cleaning (round-11;
operators/gopher.py, operators/c4.py — Rae et al. 2021 table A1 /
Raffel et al. 2020 §2.2). Oracle parity is held by q163/q164 + the
gopher/c4 fuzz families; these tests pin the rule arithmetic against
pure-Python references, each rule's specific trigger, and the
zero-shuffle plan shape of both gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.c4 import c4_clean, c4_clean_filter
from nsl_kdd_spark.operators.gopher import (
    GOPHER_STOPWORDS,
    gopher_quality_filter,
    gopher_quality_stats,
)


def _py_gopher_counters(text: str, stopwords=GOPHER_STOPWORDS):
    tk = text.split(" ")
    lines = text.split("\n")
    return {
        "n_words": len(tk),
        "n_lines": len(lines),
        "n_chars_in_words": sum(len(t) for t in tk),
        "hash_count": text.count("#"),
        "ellipsis_count": text.count("..."),  # non-overlapping, same
        "bullet_lines": sum(
            1 for l in lines
            if l.startswith(("- ", "* ", "•"))
        ),
        "ellipsis_lines": sum(1 for l in lines if l.endswith("...")),
        "alpha_words": sum(
            1 for t in tk if any(ch.isascii() and ch.isalpha() for ch in t)
        ),
        "stop_hits": sum(1 for w in stopwords if w in tk),
    }


GOOD = ("the quick brown fox and that dog have fun with it all day "
        "long while we watch them play games ") * 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_counters_match_python_reference(spark):
    rows = [
        (1, GOOD),
        (2, "short doc"),
        (3, "- bullet one\n- bullet two\nplain line here now ok"),
        (4, "trail off...\nand again...\n" + GOOD),
        (5, "## #tags# everywhere # " + GOOD),
        (6, ("1 2 3 4 5 6 7 8 9 10 " * 6) + "the of"),
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_stats(
            _docs(spark, rows), "doc_id", "text"
        ).collect()
    }
    for doc_id, text in rows:
        ref = _py_gopher_counters(text)
        for k, v in ref.items():
            assert got[doc_id][k] == v, (doc_id, k)


def test_gopher_each_rule_has_a_specific_trigger(spark):
    """One document per rule, failing exactly that rule."""
    cases = {
        "r_word_count": "too short to pass the floor",
        # 62 one-char words: word count ok, mean length 1 < 3
        "r_mean_word_len": ("a " * 60) + "the with",
        "r_hash_ratio": GOOD + (" #" * 20),
        "r_ellipsis_ratio": GOOD + (" ..." * 20),
        "r_bullet_lines": "- " + GOOD,  # 1 line, bullet => 100% > 90%
        "r_ellipsis_lines": GOOD + "...",  # 1 line ending ...
        # enough words, none alphabetic beyond 80%... build 60 digit
        # words + a few stopwords
        "r_alpha_words": ("1 " * 58) + "the of and that",
        "r_stopwords": "word " * 60,
    }
    rows = [(i, t) for i, t in enumerate(cases.values())]
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_stats(
            _docs(spark, rows), "doc_id", "text"
        ).collect()
    }
    for i, rule in enumerate(cases):
        assert got[i][rule] is False, (rule, got[i])
        assert got[i]["gopher_pass"] is False, rule
    # and the good doc passes everything
    good = gopher_quality_stats(
        _docs(spark, [(99, GOOD)]), "doc_id", "text"
    ).first()
    assert good.gopher_pass is True, good.asDict()


def test_gopher_filter_matches_stats_conjunction(spark):
    rows = [(i, t) for i, t in enumerate(
        [GOOD, "short", "- " + GOOD, GOOD + " # # # # # # # #"]
    )]
    df = _docs(spark, rows)
    via_stats = {
        r.doc_id
        for r in gopher_quality_stats(df, "doc_id", "text")
        .filter("gopher_pass").collect()
    }
    via_filter = {
        r.doc_id
        for r in gopher_quality_filter(df, "doc_id", "text").collect()
    }
    assert via_filter == via_stats
    # the gate preserves every input column
    assert set(gopher_quality_filter(df, "doc_id", "text").columns) == {
        "doc_id", "text"
    }


def test_gopher_invalid_args_raise(spark):
    df = _docs(spark, [(1, GOOD)])
    with pytest.raises(ValueError, match="min_words"):
        gopher_quality_stats(df, "doc_id", "text", min_words=10,
                             max_words=5)
    with pytest.raises(ValueError, match="mean_word_len"):
        gopher_quality_stats(df, "doc_id", "text",
                             min_mean_word_len=5, max_mean_word_len=2)


def test_gopher_filter_plan_is_pure_scan(spark):
    from tests.test_plan_quality import plan_of

    df = gopher_quality_filter(
        _docs(spark, [(1, GOOD)]), "doc_id", "text"
    )
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "Join" not in tree and "Window" not in tree
    assert "EvalPython" not in plan


PAGE = ("first sentence has five words.\n"
        "second one also has five words!\n"
        "is this a real question?\n"
        "no punctuation on this line\n"
        "tiny line.\n"
        "last line ends with a quote\"")


def _py_c4(text, min_words_per_line=5, min_lines=3):
    kept = [
        l for l in text.split("\n")
        if l.endswith((".", "!", "?", '"'))
        and len(l.split(" ")) >= min_words_per_line
        and "javascript" not in l.lower()
    ]
    page_ok = ("lorem ipsum" not in text.lower()) and ("{" not in text)
    return "\n".join(kept), len(kept), page_ok, page_ok and len(kept) >= min_lines


def test_c4_matches_python_reference(spark):
    rows = [
        (1, PAGE),
        (2, PAGE + "\nenable JavaScript to view this content."),
        (3, PAGE + "\nlorem ipsum dolor sit amet."),
        (4, PAGE.replace("question", "q { uestion")),
        (5, "one good sentence with punctuation."),
        (6, ""),
    ]
    got = {
        r.doc_id: (r.text_clean, r.n_lines_kept, r.page_ok, r.c4_keep)
        for r in c4_clean(_docs(spark, rows), "doc_id", "text").collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_c4(text), doc_id


def test_c4_line_rules_bite_individually(spark):
    r = c4_clean(_docs(spark, [(1, PAGE)]), "doc_id", "text").first()
    kept = r.text_clean.split("\n")
    assert len(kept) == 4  # the unpunctuated + short lines dropped
    assert "no punctuation on this line" not in kept
    assert "tiny line." not in kept
    assert r.c4_keep is True


def test_c4_javascript_line_dropped_case_insensitively(spark):
    text = PAGE + "\nthis line mentions JAVASCRIPT cookies today."
    r = c4_clean(_docs(spark, [(1, text)]), "doc_id", "text").first()
    assert "JAVASCRIPT" not in r.text_clean
    assert r.page_ok is True  # line rule, not page rule


def test_c4_page_blockers_kill_the_page_even_in_dropped_lines(spark):
    # the '{' sits on a line the LINE rules would drop anyway — the
    # page must still die (the filter-before-project regression)
    text = PAGE + "\n{"
    r = c4_clean(_docs(spark, [(1, text)]), "doc_id", "text").first()
    assert r.page_ok is False and r.c4_keep is False
    out = c4_clean_filter(
        _docs(spark, [(1, text)]), "doc_id", "text"
    ).collect()
    assert out == []


def test_c4_filter_replaces_text_and_keeps_columns(spark):
    df = _docs(spark, [(1, PAGE), (2, "no punct here")]).withColumn(
        "lang", F.lit("en")
    )
    out = c4_clean_filter(df, "doc_id", "text").collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].lang == "en"
    assert out[0].text == _py_c4(PAGE)[0]


def test_c4_invalid_args_raise(spark):
    df = _docs(spark, [(1, PAGE)])
    with pytest.raises(ValueError, match="min_words_per_line"):
        c4_clean(df, "doc_id", "text", min_words_per_line=0)
    with pytest.raises(ValueError, match="min_lines"):
        c4_clean(df, "doc_id", "text", min_lines=-1)


def test_c4_filter_plan_is_pure_scan(spark):
    from tests.test_plan_quality import plan_of

    df = c4_clean_filter(_docs(spark, [(1, PAGE)]), "doc_id", "text")
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "Join" not in tree and "Window" not in tree
    assert "EvalPython" not in plan

"""Exact-substring dedup (round-9; operators/substr_dedup.py — Lee
et al. 2022 ExactSubstr semantics): duplicated >= L token runs via
L-gram hash counting, maximal island merge, keep-none/keep-first
modes, and the strip (curation) output. Oracle parity is held by
q152/q153 + the substr_spans fuzz family; these tests pin the
semantics on handcrafted corpora and the 100 TB plan shape."""

from __future__ import annotations

import pytest

from nsl_kdd_spark.operators.substr_dedup import (
    duplicated_spans,
    strip_duplicate_spans,
)

RUN = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "intro one two " + RUN + " tail xyz"),
            (2, "prefix " + RUN + " suffix here now"),
            (3, "unique words only nothing shared at all here today"),
            (4, RUN + " " + RUN),  # back-to-back within-doc repeat
        ],
        "doc_id long, text string",
    )


def test_duplicated_spans_remove_all(spark):
    got = sorted(
        tuple(r) for r in duplicated_spans(
            _docs(spark), "doc_id", "text", min_tokens=8
        ).collect()
    )
    # every occurrence reported; doc 4's two copies share the L-gram
    # at pos 1 and pos 9 (9 <= 1 + 8), so they merge into ONE maximal
    # 16-token span — the island rule under test
    assert got == [(1, 4, 11, 8), (2, 2, 9, 8), (4, 1, 16, 16)]


def test_duplicated_spans_keep_first_exempts_canonical(spark):
    got = sorted(
        tuple(r) for r in duplicated_spans(
            _docs(spark), "doc_id", "text", min_tokens=8, keep="first"
        ).collect()
    )
    # the corpus-first occurrence (doc 1, pos 4) survives; every
    # other copy — including BOTH halves of doc 4 — is reported
    assert got == [(2, 2, 9, 8), (4, 1, 16, 16)]


def test_within_doc_repeat_counts_as_duplicated(spark):
    # a run repeated only WITHIN one doc is still duplicated (the
    # paper counts occurrences corpus-wide, including same-doc)
    solo = spark.createDataFrame(
        [(7, RUN + " mid point filler words here " + RUN)],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in duplicated_spans(
        solo, "doc_id", "text", min_tokens=8
    ).collect()]
    # two copies, gap > L between starts -> two separate spans
    assert got == [(7, 1, 8, 8), (7, 14, 21, 8)]


def test_short_docs_produce_no_spans(spark):
    short = spark.createDataFrame(
        [(1, "only seven tokens in this doc here"),
         (2, "only seven tokens in this doc here")],
        "doc_id long, text string",
    )
    assert duplicated_spans(short, "doc_id", "text", min_tokens=8
                            ).count() == 0


def test_strip_keep_first(spark):
    got = {
        r.doc_id: (r.text_clean, r.removed_tokens)
        for r in strip_duplicate_spans(
            _docs(spark), "doc_id", "text", min_tokens=8, keep="first"
        ).collect()
    }
    assert got[1] == ("intro one two " + RUN + " tail xyz", 0)
    assert got[2] == ("prefix suffix here now", 8)
    assert got[3][1] == 0
    assert got[4] == ("", 16)  # fully duplicated doc -> empty


def test_strip_remove_all_strips_every_copy(spark):
    got = {
        r.doc_id: r.removed_tokens
        for r in strip_duplicate_spans(
            _docs(spark), "doc_id", "text", min_tokens=8, keep="none"
        ).collect()
    }
    assert got == {1: 8, 2: 8, 3: 0, 4: 16}


def test_invalid_args_raise(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="keep"):
        duplicated_spans(docs, "doc_id", "text", keep="last")
    with pytest.raises(ValueError, match="min_tokens"):
        duplicated_spans(docs, "doc_id", "text", min_tokens=0)


def test_plan_shape_linear_no_pairs(spark):
    """The 100 TB claim in the plan (round-10 de-skewed shape): gram
    hashing is a projection; duplicate detection is a map-side-partial
    groupBy(gram) aggregate — a partial/final HashAggregate pair
    around its exchange, so a hot boilerplate gram is absorbed in
    map-side combine instead of buffering in one WindowExec task —
    joined back on the gram hash (sort-merge against a one-row-per-key
    table: no fan-out, AQE-skew-splittable); island merge is ONE
    doc-partitioned window whose groupBy reuses its exchange. 3
    exchanges, exactly one equi-join, no gram-partitioned window, no
    Python."""
    from tests.test_plan_quality import plan_of

    df = duplicated_spans(_docs(spark), "doc_id", "text", min_tokens=8)
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 3
    # exactly one join: the no-fan-out probe of the gram aggregate
    assert tree.count("SortMergeJoin") + tree.count(
        "BroadcastHashJoin"
    ) == 1
    assert "CartesianProduct" not in tree
    assert "NestedLoop" not in tree
    # the island merge's doc window is the ONLY window left — the
    # gram-partitioned count/rank window (hot-key buffering) is gone
    assert tree.count("Window") == 2  # lag + running-sum share a pane
    # partial/final aggregate pair => map-side combine on the gram key
    assert tree.count("HashAggregate") >= 4
    assert "EvalPython" not in plan


def test_cross_doc_scope_ignores_intra_doc_repeats(spark):
    """scope="cross_doc": a run repeated only WITHIN one document is
    not duplicated (countDistinct(doc) == 1), while any-scope flags
    it; cross-document runs are flagged by both."""
    chorus = " ".join(f"c{i}" for i in range(1, 9))
    docs = spark.createDataFrame(
        [
            (1, "intro one two " + RUN + " tail xyz"),
            (2, "prefix " + RUN + " suffix here now"),
            # chorus repeats inside doc 3 only — never in another doc
            (3, chorus + " bridge word " + chorus),
        ],
        "doc_id long, text string",
    )
    any_ids = {
        (r.doc_id, r.span_start)
        for r in duplicated_spans(
            docs, "doc_id", "text", min_tokens=8, scope="any"
        ).collect()
    }
    cross_ids = {
        (r.doc_id, r.span_start)
        for r in duplicated_spans(
            docs, "doc_id", "text", min_tokens=8, scope="cross_doc"
        ).collect()
    }
    assert (3, 1) in any_ids and (3, 11) in any_ids
    assert not any(d == 3 for d, _ in cross_ids)
    assert (1, 4) in cross_ids and (2, 2) in cross_ids


def test_cross_doc_keep_first_exempts_corpus_first(spark):
    got = {
        (r.doc_id, r.span_start)
        for r in duplicated_spans(
            _docs(spark),
            "doc_id",
            "text",
            min_tokens=8,
            keep="first",
            scope="cross_doc",
        ).collect()
    }
    # doc 1 holds the corpus-first occurrence of RUN -> exempt
    assert not any(d == 1 for d, _ in got)
    assert (2, 2) in got and (4, 1) in got


def test_strip_cross_doc_keeps_intra_doc_repetition(spark):
    chorus = " ".join(f"c{i}" for i in range(1, 9))
    docs = spark.createDataFrame(
        [
            (1, chorus + " bridge word " + chorus),
            (2, "zz " + RUN), (3, RUN + " yy"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.removed_tokens
        for r in strip_duplicate_spans(
            docs, "doc_id", "text", min_tokens=8, scope="cross_doc"
        ).collect()
    }
    assert got == {1: 0, 2: 8, 3: 8}


def test_invalid_scope_raises(spark):
    with pytest.raises(ValueError, match="scope"):
        duplicated_spans(_docs(spark), "doc_id", "text", scope="within")


def test_duplicated_run_report_counts_and_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "x1 x2 " + RUN),
            (2, RUN + " y1 y2"),
            (3, RUN + " " + RUN),   # two more occurrences, one doc
            (4, "all unique words here nothing repeated at all"),
        ],
        "doc_id long, text string",
    )
    from nsl_kdd_spark.operators.substr_dedup import duplicated_run_report

    rows = duplicated_run_report(
        docs, "doc_id", "text", min_tokens=8, top_k=5
    ).collect()
    by_text = {r.gram_text: (r.n_occurrences, r.n_docs) for r in rows}
    # RUN occurs 4x across 3 docs; its text reconstructs verbatim
    assert by_text[RUN] == (4, 3)
    # every reported gram is genuinely duplicated
    assert all(n >= 2 for n, _ in by_text.values())
    # ordering: most frequent first
    assert rows[0].gram_text == RUN


def test_duplicated_run_report_top_k_cutoff(spark):
    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    b = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = spark.createDataFrame(
        [(1, a), (2, a), (3, a), (4, b), (5, b)],
        "doc_id long, text string",
    )
    from nsl_kdd_spark.operators.substr_dedup import duplicated_run_report

    rows = duplicated_run_report(
        docs, "doc_id", "text", min_tokens=8, top_k=1
    ).collect()
    assert len(rows) == 1 and rows[0].gram_text == a  # 3 occ beats 2


def test_xxhash64_mode_matches_md5_mode(spark):
    """hash_mode="xxhash64" (the production 8-byte-key setting) must
    produce the identical span set as the oracle-replayable md5 mode
    — the keys only define equality classes, which differ between
    modes only on a hash collision (~n²/2⁶⁴). Checked across the
    keep x scope matrix on the handcrafted corpus."""
    docs = _docs(spark)
    for keep in ("none", "first"):
        for scope in ("any", "cross_doc"):
            md5_rows = sorted(
                tuple(r) for r in duplicated_spans(
                    docs, "doc_id", "text", min_tokens=8,
                    keep=keep, scope=scope, hash_mode="md5",
                ).collect()
            )
            xx_rows = sorted(
                tuple(r) for r in duplicated_spans(
                    docs, "doc_id", "text", min_tokens=8,
                    keep=keep, scope=scope, hash_mode="xxhash64",
                ).collect()
            )
            assert md5_rows == xx_rows, (keep, scope)


def test_xxhash64_mode_matches_on_fixture_corpus(spark):
    """Mode equivalence on the real sf0.001 documents table (500
    docs) through the full strip output — text rebuilt identically."""
    from nsl_kdd_spark.sources.parquet import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001").documents
    a = strip_duplicate_spans(
        docs, "doc_id", "text", min_tokens=8, hash_mode="md5"
    ).collect()
    b = strip_duplicate_spans(
        docs, "doc_id", "text", min_tokens=8, hash_mode="xxhash64"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_xxhash64_keys_are_longs_in_plan(spark):
    """The point of the mode: the shuffled gram key column is an
    8-byte long, not a 16-char string."""
    df = duplicated_spans(
        _docs(spark), "doc_id", "text", min_tokens=8,
        hash_mode="xxhash64",
    )
    from tests.test_plan_quality import plan_of

    plan = plan_of(df)
    assert "xxhash64" in plan and "md5" not in plan


def test_default_mode_is_wordwise_xxhash64(spark):
    """Optimization r13 plan gate: the DEFAULT gram keys are word-wise
    xxhash64 longs (each token hashed once, one fixed-width hash per
    gram window — no md5, no per-gram string concat), and the zip
    form keeps the token-hash transform out of the per-position
    lambda (the projection-collapse pitfall re-derives the whole
    word-hash array per position)."""
    df = duplicated_spans(_docs(spark), "doc_id", "text", min_tokens=8)
    from tests.test_plan_quality import plan_of

    plan = plan_of(df)
    assert "xxhash64" in plan and "md5" not in plan
    assert "arrays_zip" in plan
    # the tokenize+hash pipeline runs ONCE: the slices reference the
    # materialized word-hash column (a projection-collapse inline
    # would repeat `split(` once per gram position, and the
    # InferFiltersFromGenerate duplication — excluded session-wide,
    # see session.py — would repeat it in a Filter condition)
    assert plan.count("split(") <= 2


def test_invalid_hash_mode_raises(spark):
    with pytest.raises(ValueError, match="hash_mode"):
        duplicated_spans(
            _docs(spark), "doc_id", "text", hash_mode="sha1"
        )

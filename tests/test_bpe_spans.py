"""char_spans_to_bpe_token_spans (round-13; operators/sft.py — the
BPE-token tier of the completion-only mask chain). Oracle parity is
held by q189; these tests pin the engine against an INDEPENDENT pure-
Python formulation (piece char-extent table + min/max cover rules,
where the engine computes prefix sums), sweep every span position of
crafted texts across piece interiors, separators, empty fields and
document edges, and check expr/arrow merge-method parity.
"""

from __future__ import annotations

import pytest

from nsl_kdd_spark.operators.sft import char_spans_to_bpe_token_spans

MERGES = [("a", "t"), ("at", "a"), ("l", "l")]

TEXTS = [
    "small ball  at data",   # double space -> empty field
    "the atlas rattles",
    " lead",                 # leading separator -> empty first field
    "trail ",                # trailing separator -> empty last field
    "a",
    "atata",                 # chained merges: at+a
    "llll",                  # l=r island parity: two 'll' pieces
]


def _pieces(word):
    syms = list(word)
    for left, right in MERGES:
        res, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                res.append(left + right)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def _extents(text):
    """(global piece index, char start, char end) per piece — the
    independent formulation: a span start resolves to the first piece
    whose extent ends at or after it, an end to the last piece whose
    extent starts at or before it."""
    ext, pos, gk = [], 1, 0
    for field in text.split(" "):
        off = pos
        for p in _pieces(field):
            gk += 1
            ext.append((gk, off, off + len(p) - 1))
            off += len(p)
        pos += len(field) + 1
    return ext


def _ref(text, s, e):
    ext = _extents(text)
    ts = min((g for g, _, ce in ext if ce >= s), default=None)
    te = max((g for g, cs, _ in ext if cs <= e), default=None)
    if ts is None or te is None or ts > te:
        return (None, None)
    return (ts, te)


def _merges_df(spark):
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(MERGES)],
        "rank int, left string, right string",
    )


def _span_rows():
    rows, rid = [], 0
    for did, text in enumerate(TEXTS):
        for s in range(1, len(text) + 1):
            for e in range(s, len(text) + 1):
                rows.append((did, rid, text, s, e))
                rid += 1
    return rows


@pytest.mark.parametrize("method", ["expr", "arrow"])
def test_exhaustive_span_sweep_matches_reference(spark, method):
    rows = _span_rows()
    df = spark.createDataFrame(
        rows, "did long, rid long, text string, s long, e long"
    )
    out = char_spans_to_bpe_token_spans(
        df, _merges_df(spark), "did", "text", "s", "e", method=method
    ).collect()
    got = {r["rid"]: (r["bpe_tok_start"], r["bpe_tok_end"]) for r in out}
    assert len(got) == len(rows)
    for did, rid, text, s, e in rows:
        assert got[rid] == _ref(text, s, e), (
            text, s, e, got[rid], _ref(text, s, e)
        )


def test_null_and_out_of_text_spans_are_null(spark):
    """Out-of-range endpoints emit NULL, never crash (review r13: a
    0/negative END reached F.slice with length -1 and killed the
    job before the validity gate bounded both endpoints)."""
    df = spark.createDataFrame(
        [
            (0, 0, "at data", None, 3),
            (0, 1, "at data", 2, None),
            (0, 2, "at data", 0, 3),
            (0, 3, "at data", 2, 99),
            (1, 4, None, 1, 2),
            (2, 5, " ab", 1, 0),      # the review's crash repro
            (2, 6, "ab c ", 1, -1),
            (2, 7, "ab c ", 99, 99),
        ],
        "did long, rid long, text string, s long, e long",
    )
    out = char_spans_to_bpe_token_spans(
        df, _merges_df(spark), "did", "text", "s", "e"
    ).collect()
    for r in out:
        assert r["bpe_tok_start"] is None and r["bpe_tok_end"] is None, r


def test_shared_doc_piece_table_and_indices(spark):
    """Several span rows on ONE doc: indices count the document's
    concatenated piece sequence. 'at data' -> fields ['at','data'],
    pieces ['at'] + ['d','ata'] -> extents at=[1,2] d=[4,4]
    ata=[5,7]."""
    df = spark.createDataFrame(
        [
            (7, 0, "at data", 1, 2),   # the 'at' piece
            (7, 1, "at data", 4, 4),   # 'd'
            (7, 2, "at data", 5, 7),   # 'ata'
            (7, 3, "at data", 1, 7),   # whole doc
            (7, 4, "at data", 3, 3),   # separator only -> NULL
        ],
        "did long, rid long, text string, s long, e long",
    )
    out = {
        r["rid"]: (r["bpe_tok_start"], r["bpe_tok_end"])
        for r in char_spans_to_bpe_token_spans(
            df, _merges_df(spark), "did", "text", "s", "e"
        ).collect()
    }
    assert out == {
        0: (1, 1), 1: (2, 2), 2: (3, 3), 3: (1, 3), 4: (None, None),
    }


def test_plan_no_eval_python_on_expr_path(spark):
    from tests.test_plan_quality import plan_of

    df = spark.createDataFrame(
        [(0, 0, "at data", 1, 2)],
        "did long, rid long, text string, s long, e long",
    )
    out = char_spans_to_bpe_token_spans(
        df, _merges_df(spark), "did", "text", "s", "e", method="expr"
    )
    assert "EvalPython" not in plan_of(out)

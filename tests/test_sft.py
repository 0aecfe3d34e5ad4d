"""SFT chat-template assembly (round-11; operators/sft.py). Oracle
parity is held by q168 + the sft_spans fuzz family; these tests pin
the span invariants (substring extraction, adjacency, loss masking),
template parameterization, and the single-window plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.sft import (
    assemble_chat_text,
    render_chat_spans,
)


def _turns(spark):
    return spark.createDataFrame(
        [
            (1, 1, "user", "hello there"),
            (1, 2, "assistant", "hi! how can I help?"),
            (1, 3, "user", "what is 2+2"),
            (1, 4, "assistant", "4"),
            (2, 1, "system", "be brief"),
            (2, 2, "user", "ok"),
            (2, 3, "assistant", "understood"),
            (3, 1, "assistant", "single turn"),
        ],
        "conv_id long, t long, role string, content string",
    )


def _joined(spark, **kw):
    spans = render_chat_spans(_turns(spark), "conv_id", ["t"], **kw)
    text = assemble_chat_text(
        spans, "conv_id", joiner=kw.get("joiner", "\n")
    )
    return spans.join(text, "conv_id")


def test_substring_extraction_invariants(spark):
    """The defining contract: seg/loss spans index the assembled
    conversation string exactly."""
    rows = _joined(spark).withColumn(
        "seg_ok",
        F.expr(
            "substring(conv_text, seg_start,"
            " seg_end - seg_start + 1) = segment"
        ),
    ).withColumn(
        "loss_ok",
        F.expr(
            "CASE WHEN is_loss THEN substring(conv_text, loss_start,"
            " loss_end - loss_start + 1) = content END"
        ),
    ).collect()
    assert rows and all(r["seg_ok"] for r in rows)
    assert all(r["loss_ok"] for r in rows if r["is_loss"])
    assert all(
        r["loss_start"] is None and r["loss_end"] is None
        for r in rows
        if not r["is_loss"]
    )


def test_spans_tile_the_conversation(spark):
    """Consecutive segments are separated by exactly the joiner; the
    last span ends at the string's end."""
    rows = sorted(
        _joined(spark).collect(),
        key=lambda r: (r["conv_id"], r["turn_idx"]),
    )
    by_conv: dict[int, list] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for conv, rs in by_conv.items():
        assert rs[0]["seg_start"] == 1
        for a, b in zip(rs, rs[1:]):
            assert b["seg_start"] == a["seg_end"] + 2  # len("\n") == 1
        assert rs[-1]["seg_end"] == len(rs[0]["conv_text"])
        assert [r["turn_idx"] for r in rs] == list(range(1, len(rs) + 1))


def test_loss_roles_parameter(spark):
    rows = render_chat_spans(
        _turns(spark), "conv_id", ["t"], loss_roles=("user", "system")
    ).collect()
    for r in rows:
        assert r["is_loss"] == (r["role"] in ("user", "system"))


def test_custom_template(spark):
    spans = render_chat_spans(
        _turns(spark),
        "conv_id",
        ["t"],
        turn_prefix="### ",
        role_sep=": ",
        turn_suffix="",
        joiner="\n\n",
    )
    text = assemble_chat_text(spans, "conv_id", joiner="\n\n")
    rows = (
        spans.join(text, "conv_id")
        .withColumn(
            "seg_ok",
            F.expr(
                "substring(conv_text, seg_start,"
                " seg_end - seg_start + 1) = segment"
            ),
        )
        .collect()
    )
    assert rows and all(r["seg_ok"] for r in rows)
    one = {r["conv_id"]: r for r in rows}[3]
    assert one["conv_text"] == "### assistant: single turn"


def test_invalid_args_raise(spark):
    with pytest.raises(ValueError):
        render_chat_spans(_turns(spark), "conv_id", [])
    with pytest.raises(ValueError):
        render_chat_spans(_turns(spark), "conv_id", ["t"], loss_roles=())


def test_plan_one_window_no_python(spark):
    """Scale shape: one conversation-keyed window (bounded groups),
    scan-stage string arithmetic around it — no join, no Python."""
    from tests.test_plan_quality import plan_of

    df = render_chat_spans(_turns(spark), "conv_id", ["t"])
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") >= 1
    assert "Join" not in tree
    assert "EvalPython" not in plan


def _scored(spark):
    return spark.createDataFrame(
        [
            # prompt 1: clear winner/loser, tie in the middle
            (1, 10, "r10", 5),
            (1, 11, "r11", 3),
            (1, 12, "r12", 3),
            (1, 13, "r13", 1),
            # prompt 2: all tied -> no pair
            (2, 20, "r20", 4),
            (2, 21, "r21", 4),
            # prompt 3: single response -> no pair
            (3, 30, "r30", 9),
            # prompt 4: tie at the TOP and at the BOTTOM -> lowest ids
            (4, 41, "r41", 7),
            (4, 40, "r40", 7),
            (4, 43, "r43", 2),
            (4, 42, "r42", 2),
        ],
        "prompt long, rid long, resp string, score long",
    )


def test_preference_pairs_best_worst(spark):
    from nsl_kdd_spark.operators.sft import preference_pairs

    rows = {
        r["prompt"]: r
        for r in preference_pairs(
            _scored(spark), "prompt", "resp", "score", "rid"
        ).collect()
    }
    assert set(rows) == {1, 4}  # ties and singletons emit nothing
    assert (rows[1]["chosen_id"], rows[1]["rejected_id"]) == (10, 13)
    assert rows[1]["margin"] == 4
    # ties break by LOWEST id on both sides
    assert (rows[4]["chosen_id"], rows[4]["rejected_id"]) == (40, 42)
    assert rows[4]["margin"] == 5


def test_preference_pairs_min_margin(spark):
    from nsl_kdd_spark.operators.sft import preference_pairs

    rows = preference_pairs(
        _scored(spark), "prompt", "resp", "score", "rid", min_margin=5
    ).collect()
    assert sorted(r["prompt"] for r in rows) == [4]


def test_preference_pairs_all_pairs(spark):
    from nsl_kdd_spark.operators.sft import preference_pairs

    rows = preference_pairs(
        _scored(spark), "prompt", "resp", "score", "rid",
        strategy="all_pairs", min_margin=2,
    ).collect()
    got = sorted((r["chosen_id"], r["rejected_id"]) for r in rows)
    # prompt 1: 5-3 (x2), 5-1, 3-1 (x2); prompt 4: 7-2 (x4)
    assert got == [
        (10, 11), (10, 12), (10, 13), (11, 13), (12, 13),
        (40, 42), (40, 43), (41, 42), (41, 43),
    ]
    assert all(r["margin"] >= 2 for r in rows)


def test_preference_pairs_invalid_strategy(spark):
    import pytest as _pytest

    from nsl_kdd_spark.operators.sft import preference_pairs

    with _pytest.raises(ValueError):
        preference_pairs(
            _scored(spark), "prompt", "resp", "score", "rid",
            strategy="tournament",
        )


def test_preference_pairs_plan_single_aggregate(spark):
    """best_worst is ONE aggregate — no window, no join, no Python."""
    from tests.test_plan_quality import plan_of

    from nsl_kdd_spark.operators.sft import preference_pairs

    df = preference_pairs(
        _scored(spark), "prompt", "resp", "score", "rid"
    )
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree and "Join" not in tree
    assert "EvalPython" not in plan


def test_preference_pairs_rejects_non_numeric_id(spark):
    import pytest as _pytest

    from nsl_kdd_spark.operators.sft import preference_pairs

    df = spark.createDataFrame(
        [(1, "r-001", "a", 5), (1, "r-002", "b", 3)],
        "prompt long, rid string, resp string, score long",
    )
    # review r11: -string_id casts to double -> NULL -> arbitrary
    # tie winner; refuse loudly instead
    with _pytest.raises(ValueError):
        preference_pairs(df, "prompt", "resp", "score", "rid")


def test_preference_pairs_null_scores_excluded(spark):
    """NULL-scored responses are out of the preference relation on
    BOTH sides (advice r11: without the pre-filter, min_by's struct
    ordering sorts the NULL score field first and silently crowns
    the unscored row `rejected`, diverging from the SQL twin's
    NULLS LAST)."""
    from nsl_kdd_spark.operators.sft import preference_pairs

    df = spark.createDataFrame(
        [
            (1, 10, "r10", 5),
            (1, 11, "r11", None),  # unscored: never chosen/rejected
            (1, 12, "r12", 2),
            (2, 20, "r20", None),  # only unscored -> prompt drops
            (2, 21, "r21", None),
        ],
        "prompt long, rid long, resp string, score long",
    )
    rows = preference_pairs(df, "prompt", "resp", "score", "rid").collect()
    assert len(rows) == 1
    assert (rows[0]["chosen_id"], rows[0]["rejected_id"]) == (10, 12)
    pairs = preference_pairs(
        df, "prompt", "resp", "score", "rid", strategy="all_pairs"
    ).collect()
    assert sorted((r["chosen_id"], r["rejected_id"]) for r in pairs) == [
        (10, 12)
    ]


def test_preference_pairs_rejects_sub_one_margin(spark):
    """min_margin 0 admits self-pairs and both orders of every tie
    (verdict r11) — refused loudly."""
    import pytest as _pytest

    from nsl_kdd_spark.operators.sft import preference_pairs

    with _pytest.raises(ValueError):
        preference_pairs(
            _scored(spark), "prompt", "resp", "score", "rid",
            strategy="all_pairs", min_margin=0,
        )


def test_best_of_n_ranks_ties_and_floor(spark):
    """Per prompt: top-n by (score desc, lowest id), floor applied
    before ranking, NULL scores excluded, empty prompts emit
    nothing (the rejection-sampling semantics)."""
    from nsl_kdd_spark.operators.sft import best_of_n

    out = best_of_n(
        _scored(spark), "prompt", "resp", "score", "rid", n=2
    ).collect()
    got = sorted(
        (r["prompt"], r["rank"], r["response_id"]) for r in out
    )
    # p1: 5 (id10), then the 3-tie broken by lowest id (11)
    # p2: 4-tie -> ids 20, 21 ; p3 single ; p4: 7-tie -> 40, 41
    assert got == [
        (1, 1, 10), (1, 2, 11),
        (2, 1, 20), (2, 2, 21),
        (3, 1, 30),
        (4, 1, 40), (4, 2, 41),
    ]
    floored = best_of_n(
        _scored(spark), "prompt", "resp", "score", "rid",
        n=2, score_floor=4,
    ).collect()
    fg = sorted((r["prompt"], r["rank"], r["response_id"]) for r in floored)
    # p1 keeps only the 5; p3 (9) and p2/p4 ties survive
    assert fg == [
        (1, 1, 10),
        (2, 1, 20), (2, 2, 21),
        (3, 1, 30),
        (4, 1, 40), (4, 2, 41),
    ]
    nulls = spark.createDataFrame(
        [(1, 10, "a", None), (1, 11, "b", 3)],
        "prompt long, rid long, resp string, score long",
    )
    kept = best_of_n(nulls, "prompt", "resp", "score", "rid", n=5).collect()
    assert [(r["response_id"], r["score"]) for r in kept] == [(11, 3)]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        best_of_n(_scored(spark), "prompt", "resp", "score", "rid", n=0)
    # non-numeric score: unary minus would cast to double -> NULL
    # ordering fields that sort first and crown arbitrary rows
    # (advice r12) — must refuse loudly
    strs = spark.createDataFrame(
        [(1, 10, "a", "90")],
        "prompt long, rid long, resp string, score string",
    )
    with _pytest.raises(ValueError, match="numeric"):
        best_of_n(strs, "prompt", "resp", "score", "rid", n=1)


def test_best_of_n_plan_single_aggregate(spark):
    """ONE grouped aggregate + generate — no window, no join, no
    Python anywhere in the plan."""
    from tests.test_plan_quality import plan_of

    from nsl_kdd_spark.operators.sft import best_of_n

    plan = plan_of(
        best_of_n(
            _scored(spark), "prompt", "resp", "score", "rid",
            n=3, score_floor=2,
        )
    )
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree and "Join" not in tree
    assert "EvalPython" not in plan


def test_char_spans_to_token_spans(spark):
    """Boundary semantics of the prefix-count conversion: interiors,
    separators on either end, separator-only spans, NULL spans, and
    a double-space empty field."""
    from nsl_kdd_spark.operators.sft import char_spans_to_token_spans

    #        123456789012345
    text = "ab cde f  gh ij"  # fields: ab|cde|f||gh|ij (empty 4th)
    rows = [
        (1, text, 1, 2),    # "ab"        -> 1..1
        (2, text, 4, 6),    # "cde"       -> 2..2
        (3, text, 2, 5),    # "b cd"      -> 1..2
        (4, text, 3, 3),    # lone space  -> NULL (nothing to mask)
        (5, text, 3, 7),    # " cde "     -> 2..2 (both ends resolve in)
        (6, text, None, None),
        (7, text, 11, 15),  # "gh ij"     -> 5..6 (past the empty field)
    ]
    df = spark.createDataFrame(rows, "id long, t string, s long, e long")
    got = {
        r["id"]: (r["tok_start"], r["tok_end"])
        for r in char_spans_to_token_spans(df, "t", "s", "e").collect()
    }
    assert got == {
        1: (1, 1), 2: (2, 2), 3: (1, 2), 4: (None, None),
        5: (2, 2), 6: (None, None), 7: (5, 6),
    }
    # slice property: the token range rejoined always CONTAINS the
    # non-space part of the char span
    out = char_spans_to_token_spans(df, "t", "s", "e").collect()
    for r in out:
        if r["tok_start"] is None:
            continue
        toks = r["t"].split(" ")
        joined = " ".join(toks[r["tok_start"] - 1 : r["tok_end"]])
        assert r["t"][r["s"] - 1 : r["e"]].strip(" ") in joined


def test_char_spans_plan_scan_stage(spark):
    """Prefix arithmetic only — no explode, no join, no window, no
    Python."""
    from tests.test_plan_quality import plan_of

    from nsl_kdd_spark.operators.sft import char_spans_to_token_spans

    df = spark.createDataFrame(
        [(1, "a b c", 1, 3)], "id long, t string, s long, e long"
    )
    plan = plan_of(char_spans_to_token_spans(df, "t", "s", "e"))
    tree = plan.split("\n\n")[0]
    for bad in ("Window", "Join", "Generate"):
        assert bad not in tree
    assert "EvalPython" not in plan

"""Packed-SFT loss-span rebasing (round-12; operators/sft.py
pack_conversations / pack_fixed_count / assemble_pack_text — Krell
et al. 2021 §5 cross-contamination-free packing applied to
completion-only SFT). Oracle parity is held by q178 + the sft_pack
fuzz family (fixed-count tier) and q181 runs the Krell SPFHP budget
tier rows-only; these tests pin the rebase arithmetic against a
pure-Python packing reference, the substring/tiling invariants on
the assembled pack text, SPFHP budget compliance, determinism, and
the bounded-window plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.sft import (
    assemble_pack_text,
    pack_conversations,
    pack_fixed_count,
    render_chat_spans,
)


def _turns(spark):
    return spark.createDataFrame(
        [
            (1, 1, "user", "hello there"),
            (1, 2, "assistant", "hi! how can I help?"),
            (2, 1, "system", "be brief"),
            (2, 2, "user", "ok"),
            (2, 3, "assistant", "understood"),
            (3, 1, "assistant", "single turn"),
            (4, 1, "user", "what is 2+2"),
            (4, 2, "assistant", "4"),
            (5, 1, "assistant", ""),  # empty content still spans
        ],
        "conv_id long, t long, role string, content string",
    )


def _python_reference(turns, k, joiner="\n", pack_sep="\n"):
    """Serial packing reference: render segments, join per conv,
    assign packs of k convs in conv order, rebase spans."""
    convs = {}
    for conv, t, role, content in sorted(turns):
        seg = f"<|im_start|>{role}\n{content}<|im_end|>"
        convs.setdefault(conv, []).append((t, role, content, seg))
    conv_ids = sorted(convs)
    out = {}  # (conv, turn_idx) -> row dict
    packs = {}
    for i, conv in enumerate(conv_ids):
        packs.setdefault(i // k, []).append(conv)
    for pid, members in packs.items():
        off = 0
        texts = []
        for pos, conv in enumerate(sorted(members), start=1):
            segs = [s for _, _, _, s in convs[conv]]
            text = joiner.join(segs)
            prior = 0
            for idx, (t, role, content, seg) in enumerate(
                convs[conv], start=1
            ):
                row = {
                    "pack_id": pid,
                    "conv_pos": pos,
                    "seg_start": off + prior + 1,
                    "seg_end": off + prior + len(seg),
                }
                if role == "assistant":
                    head = len(f"<|im_start|>{role}\n")
                    row["loss_start"] = off + prior + head + 1
                    row["loss_end"] = row["loss_start"] + len(content) - 1
                else:
                    row["loss_start"] = row["loss_end"] = None
                out[(conv, idx)] = row
                prior += len(seg) + len(joiner)
            texts.append(text)
            off += len(text) + len(pack_sep)
        packs[pid] = pack_sep.join(texts)
    return out, packs


def _packed(spark, k=2):
    spans = render_chat_spans(_turns(spark), "conv_id", ["t"])
    packs = pack_fixed_count(
        spans.select("conv_id").distinct(), "conv_id", k=k
    )
    return pack_conversations(spans, packs, "conv_id")


def test_rebase_matches_python_reference(spark):
    rows = _packed(spark).collect()
    turns = [tuple(r) for r in _turns(spark).collect()]
    ref, ref_texts = _python_reference(turns, k=2)
    assert len(rows) == len(ref)
    for r in rows:
        e = ref[(r["conv_id"], r["turn_idx"])]
        assert r["pack_id"] == e["pack_id"], r
        assert r["conv_pos"] == e["conv_pos"], r
        assert r["pack_seg_start"] == e["seg_start"], r
        assert r["pack_seg_end"] == e["seg_end"], r
        assert r["pack_loss_start"] == e["loss_start"], r
        assert r["pack_loss_end"] == e["loss_end"], r


def test_pack_text_substring_extraction(spark):
    """The packing invariant: every rebased span re-extracts its
    exact segment/content from the assembled pack text."""
    packed = _packed(spark)
    texts = {
        r["pack_id"]: r["pack_text"]
        for r in assemble_pack_text(packed, "conv_id").collect()
    }
    turns = [tuple(r) for r in _turns(spark).collect()]
    _, ref_texts = _python_reference(turns, k=2)
    assert texts == ref_texts
    for r in packed.collect():
        t = texts[r["pack_id"]]
        s, e = r["pack_seg_start"], r["pack_seg_end"]
        assert t[s - 1 : e] == r["segment"]
        if r["is_loss"]:
            ls, le = r["pack_loss_start"], r["pack_loss_end"]
            assert t[ls - 1 : le] == r["content"]
        else:
            assert r["pack_loss_start"] is None


def test_pack_tiling(spark):
    """Within a pack, segments + joiner/sep gaps tile [1, pack_len]:
    first span starts at 1, the last ends at pack_len, and every gap
    is exactly one joiner (intra-conv) or one pack_sep (between
    conversations)."""
    rows = sorted(
        _packed(spark).collect(),
        key=lambda r: (r["pack_id"], r["conv_pos"], r["turn_idx"]),
    )
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for members in by_pack.values():
        assert members[0]["pack_seg_start"] == 1
        assert members[-1]["pack_seg_end"] == members[-1]["pack_len"]
        for a, b in zip(members, members[1:]):
            assert b["pack_seg_start"] == a["pack_seg_end"] + 2  # len 1 seps


def test_spfhp_budget_compliance(spark):
    """The Krell SPFHP tier: per pack, the packed SIZE MEASURE
    (conversation chars, separators excluded — the caller's
    accounting, same as token budgets) never exceeds the budget,
    and assembled text length == pack_len == fill + separators."""
    from nsl_kdd_spark.operators.packing import pack_best_fit

    spans = render_chat_spans(_turns(spark), "conv_id", ["t"])
    sizes = spans.groupBy("conv_id").agg(
        F.max("seg_end").cast("long").alias("sz")
    )
    budget = 120
    packs = pack_best_fit(sizes, "sz", "conv_id", budget=budget)
    packed = pack_conversations(spans, packs, "conv_id")
    fills = (
        packed.select("pack_id", "conv_id")
        .distinct()
        .join(sizes, "conv_id")
        .groupBy("pack_id")
        .agg(F.sum("sz").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in fills:
        assert r["fill"] <= budget or r["n"] == 1  # oversize rule
    texts = assemble_pack_text(packed, "conv_id").collect()
    lens = {
        r["pack_id"]: r["pack_len"]
        for r in packed.select("pack_id", "pack_len").distinct().collect()
    }
    for r in texts:
        assert len(r["pack_text"]) == r["pack_len"] == lens[r["pack_id"]]


def test_deterministic_and_packer_membership(spark):
    a = sorted(map(tuple, _packed(spark, k=3).collect()))
    b = sorted(map(tuple, _packed(spark, k=3).collect()))
    assert a == b
    # conversations absent from the assignment are dropped
    spans = render_chat_spans(_turns(spark), "conv_id", ["t"])
    partial = spark.createDataFrame(
        [(1, 0), (3, 0)], "conv_id long, pack_id long"
    )
    out = pack_conversations(spans, partial, "conv_id")
    assert set(r["conv_id"] for r in out.collect()) == {1, 3}


def test_invalid_k_raises(spark):
    with pytest.raises(ValueError):
        pack_fixed_count(
            _turns(spark).select("conv_id").distinct(), "conv_id", k=0
        )


def test_plan_bounded_windows_no_python(spark):
    """pack_conversations itself is aggregate + join + ONE per-pack
    bounded window — no Python eval anywhere in the plan."""
    from tests.test_plan_quality import plan_of

    spans = render_chat_spans(_turns(spark), "conv_id", ["t"])
    assignment = spark.createDataFrame(
        [(i, (i - 1) // 2) for i in range(1, 6)],
        "conv_id long, pack_id long",
    )
    plan = plan_of(pack_conversations(spans, assignment, "conv_id"))
    assert "EvalPython" not in plan


def test_pack_boundary_table_tiles(spark):
    """Krell §5 mask metadata: per pack, conversation extents start
    at 1, abut at exactly one separator, and the last ends at
    pack_len; extents agree with the assembled text slices."""
    from nsl_kdd_spark.operators.sft import pack_boundary_table

    packed = _packed(spark, k=2)
    bounds = sorted(
        pack_boundary_table(packed, "conv_id").collect(),
        key=lambda r: (r["pack_id"], r["conv_pos"]),
    )
    lens = {
        r["pack_id"]: r["pack_len"]
        for r in packed.select("pack_id", "pack_len").distinct().collect()
    }
    texts = {
        r["pack_id"]: r["pack_text"]
        for r in assemble_pack_text(packed, "conv_id").collect()
    }
    by_pack = {}
    for r in bounds:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, rows in by_pack.items():
        assert rows[0]["bound_start"] == 1
        assert rows[-1]["bound_end"] == lens[pid]
        for a, b in zip(rows, rows[1:]):
            assert b["bound_start"] == a["bound_end"] + 2  # len-1 sep
        # each extent slices a full conversation out of the pack text
        t = texts[pid]
        for r in rows:
            piece = t[r["bound_start"] - 1 : r["bound_end"]]
            assert piece.startswith("<|im_start|>")
            assert piece.endswith("<|im_end|>")

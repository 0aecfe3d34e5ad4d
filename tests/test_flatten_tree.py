"""Message-tree flattening (round-12; sft.flatten_message_tree).
Oracle parity is held by q186 + the flatten_tree fuzz family; these
tests pin the path semantics (per-leaf linearization, shared-prefix
replication, orphan truncation), the loud cycle/depth guard, and the
documented closed-cycle drop."""

from __future__ import annotations

import pytest

from nsl_kdd_spark.operators.sft import flatten_message_tree


def _tree(spark):
    # 1 -> (2, 3); 2 -> 4; orphan chain 10(parent missing) -> 11
    return spark.createDataFrame(
        [
            (1, None, "root"),
            (2, 1, "a"),
            (3, 1, "b"),
            (4, 2, "c"),
            (10, 99, "orphan-top"),
            (11, 10, "orphan-leaf"),
        ],
        "mid long, pid long, body string",
    )


def test_paths_prefix_replication_and_orphans(spark):
    out = flatten_message_tree(_tree(spark), "mid", "pid", max_depth=8)
    got = sorted(
        (r["path_id"], r["turn_idx"], r["mid"], r["body"])
        for r in out.collect()
    )
    assert got == [
        (3, 1, 1, "root"), (3, 2, 3, "b"),
        (4, 1, 1, "root"), (4, 2, 2, "a"), (4, 3, 4, "c"),
        (11, 1, 10, "orphan-top"), (11, 2, 11, "orphan-leaf"),
    ]
    # the shared root is replicated once per leaf path
    assert sum(1 for p, t, m, b in got if m == 1) == 2


def test_reachable_cycle_and_depth_raise(spark):
    cyc = spark.createDataFrame(
        [(1, 2, "a"), (2, 1, "b"), (3, 1, "leaf")],
        "mid long, pid long, body string",
    )
    with pytest.raises(ValueError, match="max_depth"):
        flatten_message_tree(cyc, "mid", "pid", max_depth=5).collect()
    chain = spark.createDataFrame(
        [(i, i - 1 if i > 1 else None, "x") for i in range(1, 7)],
        "mid long, pid long, body string",
    )
    with pytest.raises(ValueError, match="max_depth"):
        flatten_message_tree(chain, "mid", "pid", max_depth=3).collect()
    # exactly-deep-enough drains cleanly
    ok = flatten_message_tree(chain, "mid", "pid", max_depth=6)
    assert [r["turn_idx"] for r in ok.orderBy("turn_idx").collect()] == [
        1, 2, 3, 4, 5, 6
    ]
    with pytest.raises(ValueError):
        flatten_message_tree(chain, "mid", "pid", max_depth=0)


def test_closed_cycle_emits_nothing(spark):
    """Documented contract: a closed cycle has no leaf, hence no
    root-to-leaf path — its rows drop (run quality.expect first when
    that must be loud)."""
    df = spark.createDataFrame(
        [(1, 2, "a"), (2, 1, "b"), (5, None, "solo-root")],
        "mid long, pid long, body string",
    )
    out = flatten_message_tree(df, "mid", "pid", max_depth=4).collect()
    assert [(r["path_id"], r["mid"]) for r in out] == [(5, 5)]


def test_feeds_render_chat_spans(spark):
    """The flatten -> render composition: path_id is the conv key,
    turn_idx the order — spans tile each linearized path."""
    from nsl_kdd_spark.operators.sft import render_chat_spans

    df = spark.createDataFrame(
        [
            (1, None, "user", "hi"),
            (2, 1, "assistant", "hello"),
            (3, 1, "assistant", "hey there"),
        ],
        "mid long, pid long, role string, content string",
    )
    flat = flatten_message_tree(df, "mid", "pid", max_depth=4)
    spans = render_chat_spans(flat, "path_id", ["turn_idx"])
    rows = sorted(
        (r["path_id"], r["turn_idx"], r["is_loss"])
        for r in spans.collect()
    )
    assert rows == [
        (2, 1, False), (2, 2, True),
        (3, 1, False), (3, 2, True),
    ]


def test_orphan_path_at_exact_max_depth_succeeds(spark):
    """Review r12: an orphan-truncated path of exactly max_depth
    nodes must DRAIN (the dangling parent is a truncation, not an
    overdepth) — the naive any-non-null-parent check falsely raised
    here."""
    df = spark.createDataFrame(
        [(10, 99, "top"), (11, 10, "leaf")],
        "mid long, pid long, body string",
    )
    out = flatten_message_tree(df, "mid", "pid", max_depth=2).collect()
    assert sorted((r["turn_idx"], r["mid"]) for r in out) == [
        (1, 10), (2, 11)
    ]


def test_shared_prefix_loss_exactly_once(spark):
    """dedup_shared_prefix_loss (round-13): every source message is
    loss-bearing in EXACTLY one path, the owner choice is a pure
    function of (table, salt) — partitioning-invariant — and a
    different salt re-draws owners while preserving exactly-once."""
    from pyspark.sql import functions as F

    from nsl_kdd_spark.operators.sft import dedup_shared_prefix_loss

    flat = flatten_message_tree(_tree(spark), "mid", "pid", max_depth=4)
    out = dedup_shared_prefix_loss(flat, "mid")
    per_msg = {
        r["mid"]: r["n_owned"]
        for r in out.groupBy("mid")
        .agg(
            F.sum(F.col("loss_owner").cast("int")).alias("n_owned")
        )
        .collect()
    }
    assert per_msg and all(v == 1 for v in per_msg.values()), per_msg
    # partitioning invariance
    a = sorted(
        (r["mid"], r["path_id"], r["loss_owner"])
        for r in dedup_shared_prefix_loss(
            flat.repartition(7), "mid"
        ).collect()
    )
    b = sorted(
        (r["mid"], r["path_id"], r["loss_owner"])
        for r in dedup_shared_prefix_loss(
            flat.coalesce(1), "mid"
        ).collect()
    )
    assert a == b
    # a salted re-draw keeps the exactly-once invariant
    salted = dedup_shared_prefix_loss(flat, "mid", salt="x")
    per_msg_s = {
        r["mid"]: r["n_owned"]
        for r in salted.groupBy("mid")
        .agg(
            F.sum(F.col("loss_owner").cast("int")).alias("n_owned")
        )
        .collect()
    }
    assert all(v == 1 for v in per_msg_s.values())
    # unshared turns (single-path messages) are trivially owners
    counts = {
        r["mid"]: r["n_paths"]
        for r in out.groupBy("mid")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .collect()
    }
    single = [m for m, n in counts.items() if n == 1]
    owned = {
        r["mid"]
        for r in out.filter("loss_owner").collect()
    }
    assert all(m in owned for m in single)

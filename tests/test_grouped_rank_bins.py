"""grouped_rank_bins (round-11; operators/relational.py — the CCNet
per-language head/middle/tail partitioner without per-group rank
windows). Oracle parity is held by q166; these tests pin the
per-group rank/bin arithmetic against a plain sorted reference, the
partitioning invariance the distributed rank must guarantee, and the
window-free plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.relational import grouped_rank_bins, rank_bins


def _df(spark):
    rows = []
    i = 0
    for grp, scores in (
        ("en", [5, 3, 9, 1, 7, 3, 8]),   # dup scores: id tie-break
        ("fr", [2, 2, 2]),
        ("zh", [10]),
        ("de", [4, 1, 6, 6, 2]),
    ):
        for s in scores:
            rows.append((i, grp, s))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, lang string, score long"
    )


def _reference(rows, n_bins):
    out = {}
    by_grp: dict = {}
    for doc_id, grp, s in rows:
        by_grp.setdefault(grp, []).append((s, doc_id))
    for grp, members in by_grp.items():
        members.sort()
        n = len(members)
        for rank0, (_, doc_id) in enumerate(members):
            out[doc_id] = (rank0 + 1, min((rank0 * n_bins) // n, n_bins - 1))
    return out


@pytest.mark.parametrize("n_bins", [1, 2, 3, 5])
def test_matches_per_group_sorted_reference(spark, n_bins):
    df = _df(spark)
    rows = [(r.doc_id, r.lang, r.score) for r in df.collect()]
    ref = _reference(rows, n_bins)
    got = {
        r.doc_id: (r.group_rank, r.bin)
        for r in grouped_rank_bins(
            df, "lang", "score", "doc_id", n_bins=n_bins
        ).collect()
    }
    assert got == ref


def test_partitioning_invariance(spark):
    """Ranks and bins must not depend on the physical layout — the
    whole point of the id tie-break + range-sorted cumsum."""
    df = _df(spark)
    a = {
        r.doc_id: (r.group_rank, r.bin)
        for r in grouped_rank_bins(
            df.repartition(7), "lang", "score", "doc_id", n_bins=3
        ).collect()
    }
    b = {
        r.doc_id: (r.group_rank, r.bin)
        for r in grouped_rank_bins(
            df.coalesce(1), "lang", "score", "doc_id", n_bins=3
        ).collect()
    }
    assert a == b


def test_bin_populations_differ_by_at_most_one(spark):
    df = _df(spark)
    out = grouped_rank_bins(df, "lang", "score", "doc_id", n_bins=3)
    per = {
        (r.lang, r.bin): r["count"]
        for r in out.groupBy("lang", "bin").count().collect()
    }
    for grp in ("en", "de"):
        sizes = [per.get((grp, b), 0) for b in range(3)]
        assert max(sizes) - min(sizes) <= 1, (grp, sizes)


def test_single_group_matches_global_rank_bins(spark):
    df = _df(spark).withColumn("g", F.lit("all"))
    grouped = {
        r.doc_id: r.bin
        for r in grouped_rank_bins(
            df, "g", "score", "doc_id", n_bins=4
        ).collect()
    }
    global_ = {
        r.doc_id: r.bin
        for r in rank_bins(df, "score", "doc_id", n_bins=4).collect()
    }
    assert grouped == global_


def test_null_group_rows_are_kept_and_ranked(spark):
    """Round-12 verdict #1 repro: rows whose group key is NULL are a
    LEGAL group (documents with missing language/domain metadata) and
    must be ranked/binned like any other — the offsets join back used
    to be an equality join and silently dropped them."""
    rows = [(i, "a", i) for i in range(5)] + [
        (i, None, i) for i in range(5, 9)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, score long"
    )
    out = grouped_rank_bins(
        df, "lang", "score", "doc_id", n_bins=2
    ).collect()
    assert len(out) == 9, "NULL-group rows were dropped"
    null_rows = sorted(
        (r.score, r.group_rank, r.bin) for r in out if r.lang is None
    )
    assert [r[1] for r in null_rows] == [1, 2, 3, 4]
    assert [r[2] for r in null_rows] == [0, 0, 1, 1]
    a_rows = sorted(
        (r.score, r.group_rank) for r in out if r.lang == "a"
    )
    assert [r[1] for r in a_rows] == [1, 2, 3, 4, 5]


def test_cap_per_group_caps_null_group(spark):
    """The verdict's exact repro: 5 rows in domain 'a' + 4 with NULL
    domain, cap k=2 -> 4 rows (2 per group), never 2."""
    from nsl_kdd_spark.operators.relational import cap_per_group

    rows = [(i, "a") for i in range(5)] + [(i, None) for i in range(5, 9)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    kept = cap_per_group(df, "dom", "doc_id", k=2).collect()
    assert len(kept) == 4, "NULL-domain rows vanished instead of capped"
    assert sum(1 for r in kept if r.dom is None) == 2
    assert sum(1 for r in kept if r.dom == "a") == 2


def test_invalid_args_raise(spark):
    with pytest.raises(ValueError, match="n_bins"):
        grouped_rank_bins(_df(spark), "lang", "score", "doc_id", n_bins=0)


def test_plan_has_no_group_partitioned_window(spark):
    """The forbidden shape is ROW_NUMBER OVER (PARTITION BY group)
    over the full table: the plan's only windows are the cumsum's
    __pid-partitioned per-partition pass and the bounded k-row
    offset pass — exactly two, and the full-table one partitions on
    __pid, never on the group column."""
    from tests.test_plan_quality import plan_of

    df = grouped_rank_bins(_df(spark), "lang", "score", "doc_id")
    plan = plan_of(df)
    assert "EvalPython" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") == 2, tree
    # the details section spells the specs. A PARTITION BY column
    # renders as a bare `windowspecdefinition(lang#N,` (no sort
    # direction before the comma) while an ORDER BY renders
    # `lang#N ASC NULLS FIRST` — verified against both shapes in
    # round 11 (the offsets window legitimately ORDERS by the group
    # over its k-row frame; only PARTITIONING on it is forbidden)
    import re

    assert not re.search(r"windowspecdefinition\(lang#\d+,", plan), (
        "group-partitioned window found"
    )
    # and the full-table window partitions on the cumsum's __pid
    assert re.search(r"windowspecdefinition\(__pid#\d+,", plan)

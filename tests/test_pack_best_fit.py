"""SPFHP histogram packing (round-11; packing.pack_best_fit — Krell
et al. 2021 "Efficient Sequence Packing without Cross-contamination",
Algorithm 1). q172 is rows-only BY DESIGN (iterative greedy over the
histogram — the BPE/GK class), so these tests carry the correctness
burden: a pure-Python reference replay of the whole assignment, the
fill/coverage invariants, partitioning-invariance, the oversize rule,
and the paper's fewer-packs-than-next-fit efficiency claim."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from nsl_kdd_spark.operators.packing import (
    pack_best_fit,
    pack_next_fit,
    spfhp_strategies,
)


def _py_assignment(sizes: dict[int, int], budget: int):
    """Expand spfhp_strategies into the same (size, rank) -> (pack,
    fill) map the Spark join computes."""
    strategies = spfhp_strategies(dict(Counter(sizes.values())), budget)
    table = []
    next_rank: dict[int, int] = {}
    base = 0
    for lengths, n in strategies:
        fill = sum(lengths)
        for size, m in sorted(Counter(lengths).items()):
            start = next_rank.get(size, 1)
            table.append((size, start, m, base, n, fill))
            next_rank[size] = start + n * m
        base += n
    # per-size dense rank by id
    by_size: dict[int, list[int]] = {}
    for i in sorted(sizes):
        by_size.setdefault(sizes[i], []).append(i)
    out = {}
    for size, ids in by_size.items():
        for rk0, i in enumerate(ids):
            rk = rk0 + 1
            for s, start, per, b, n, fill in table:
                if s == size and start <= rk < start + n * per:
                    out[i] = (b + (rk - start) // per, fill)
                    break
    return out


def _fixture(seed=5, n=300):
    rnd = random.Random(seed)
    return {i: rnd.choice([3, 5, 7, 8, 11, 16, 21]) for i in range(n)}


def test_matches_python_reference(spark):
    sizes = _fixture()
    df = spark.createDataFrame(
        sorted(sizes.items()), "doc_id long, n long"
    )
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_fill"])
        for r in pack_best_fit(df, "n", "doc_id", budget=24).collect()
    }
    assert got == _py_assignment(sizes, 24)


def test_fill_and_coverage_invariants(spark):
    sizes = _fixture(seed=9, n=400)
    df = spark.createDataFrame(
        sorted(sizes.items()), "doc_id long, n long"
    )
    rows = pack_best_fit(df, "n", "doc_id", budget=30).collect()
    assert len(rows) == 400  # every doc assigned exactly once
    packs: dict[int, list] = {}
    for r in rows:
        packs.setdefault(r["pack_id"], []).append(r)
    for pid, rs in packs.items():
        fill = sum(r["n"] for r in rs)
        assert fill == rs[0]["pack_fill"]
        assert fill <= 30 or len(rs) == 1
    # pack ids are dense 0..n_packs-1
    assert sorted(packs) == list(range(len(packs)))


def test_partitioning_invariance(spark):
    sizes = _fixture(seed=2, n=200)
    df = spark.createDataFrame(
        sorted(sizes.items()), "doc_id long, n long"
    )
    a = {
        r["doc_id"]: (r["pack_id"], r["pack_fill"])
        for r in pack_best_fit(df, "n", "doc_id", 24).collect()
    }
    b = {
        r["doc_id"]: (r["pack_id"], r["pack_fill"])
        for r in pack_best_fit(
            df.repartition(13), "n", "doc_id", 24
        ).collect()
    }
    assert a == b


def test_oversize_docs_get_own_packs(spark):
    df = spark.createDataFrame(
        [(1, 30), (2, 30), (3, 24), (4, 5)], "doc_id long, n long"
    )
    got = {
        r["doc_id"]: r
        for r in pack_best_fit(df, "n", "doc_id", budget=24).collect()
    }
    assert got[1]["pack_fill"] == 30 and got[2]["pack_fill"] == 30
    assert got[1]["pack_id"] != got[2]["pack_id"]
    # exact-budget doc is alone and full
    assert got[3]["pack_fill"] == 24
    assert got[3]["pack_id"] not in (
        got[1]["pack_id"], got[2]["pack_id"], got[4]["pack_id"]
    )


def test_beats_next_fit_on_skewed_sizes(spark):
    """The paper's claim: histogram packing wastes less than the
    sequential next-fit walk."""
    sizes = _fixture(seed=5, n=500)
    df = spark.createDataFrame(
        sorted(sizes.items()), "doc_id long, n long"
    )
    bf = pack_best_fit(df, "n", "doc_id", budget=24)
    n_bf = bf.select("pack_id").distinct().count()
    nf = pack_next_fit(df, "doc_id", "n", budget=24)
    n_nf = nf.select("bin_id").distinct().count()
    assert n_bf < n_nf


def test_strategies_respect_budget_and_counts():
    hist = {3: 10, 5: 7, 11: 4, 21: 2, 30: 3}
    strats = spfhp_strategies(hist, 24)
    placed: Counter = Counter()
    for lengths, n in strats:
        if max(lengths) < 24:
            assert sum(lengths) <= 24
        else:
            assert len(lengths) == 1  # oversize = single-doc pack
        for s in lengths:
            placed[s] += n
    assert placed == Counter(hist)


def test_invalid_args_raise(spark):
    df = spark.createDataFrame([(1, 3)], "doc_id long, n long")
    with pytest.raises(ValueError):
        pack_best_fit(df, "n", "doc_id", budget=0)
    with pytest.raises(ValueError):
        spfhp_strategies({0: 1}, 10)
    with pytest.raises(ValueError):
        spfhp_strategies({3: 1}, 0)

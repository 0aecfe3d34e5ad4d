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


def _greedy_reference_packs(sizes: list[int], budget: int):
    """INDEPENDENT reference (review r11: the _py_assignment replay
    shares spfhp_strategies, so it pins only the join plumbing):
    simulate the paper's one-sequence-at-a-time greedy — each doc
    into the open pack with the smallest remaining space that fits,
    new pack otherwise."""
    packs: list[list] = []  # [remaining, [sizes]]
    for s in sorted(sizes, reverse=True):
        if s >= budget:
            packs.append([0, [s]])
            continue
        best = None
        for i, p in enumerate(packs):
            if s <= p[0] and (best is None or p[0] < packs[best][0]):
                best = i
        if best is None:
            packs.append([budget - s, [s]])
        else:
            packs[best][0] -= s
            packs[best][1].append(s)
    return packs


def test_solver_matches_independent_greedy():
    """Pack COUNT equals the per-sequence greedy on random draws
    (composition may differ on remaining-space ties — both are valid
    SPFHP orders; equal count => equal padding waste), and every
    histogram entry is placed exactly once."""
    rnd = random.Random(17)
    for _ in range(60):
        budget = rnd.choice([7, 10, 24, 100])
        sizes = [
            rnd.randrange(1, budget + rnd.choice([0, 5]))
            for _ in range(rnd.randrange(1, 60))
        ]
        strats = spfhp_strategies(dict(Counter(sizes)), budget)
        placed = Counter()
        for t, k in strats:
            if max(t) < budget:
                assert sum(t) <= budget
            else:
                assert len(t) == 1
            for s in t:
                placed[s] += k
        assert placed == Counter(sizes)
        assert sum(k for _, k in strats) == len(
            _greedy_reference_packs(sizes, budget)
        )


def test_uniform_sizes_stack_densely(spark):
    """Review r11 regression: a uniform-length corpus must share
    packs (the earlier no-fit branch emitted one doc per pack)."""
    assert spfhp_strategies({3: 5}, 10) == [((3, 3, 3), 1), ((3, 3), 1)]
    df = spark.createDataFrame(
        [(i, 3) for i in range(5)], "doc_id long, n long"
    )
    rows = pack_best_fit(df, "n", "doc_id", budget=10).collect()
    packs: dict[int, int] = {}
    for r in rows:
        packs[r["pack_id"]] = packs.get(r["pack_id"], 0) + 1
    assert sorted(packs.values()) == [2, 3]

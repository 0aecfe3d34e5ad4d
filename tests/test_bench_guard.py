"""Record-vs-record bench noise guard (round-7; r5/r6 verdicts):
cells slower than GUARD_RATIO x their committed prior are re-measured
once and the min kept, so a throttled-host burst cannot land in the
committed record, while a genuine regression (reproduced on the
re-measure) still records — with the "guard" field showing its work.
Pure-Python tests: the guard's measurement side is exercised by the
per-round bench itself."""

from __future__ import annotations

import bench


def test_suspect_cells_flags_only_ratio_breakers():
    prior = {"a": 1.0, "b": 2.0, "c": 4.0, "cycles": 32.0}
    current = {"a": 1.4, "b": 3.5, "c": 4.1, "cycles": 32.0, "new": 9.9}
    # a: 1.4x (under), b: 1.75x (over), c: ~1x, new: no prior
    assert bench._suspect_cells(current, prior) == ["b"]


def test_suspect_cells_ignores_non_numeric_and_zero_priors():
    assert bench._suspect_cells({"a": 5.0}, {"a": 0.0}) == []
    assert bench._suspect_cells({"a": 5.0}, {"a": "n/a"}) == []
    assert bench._suspect_cells({"a": "n/a"}, {"a": 1.0}) == []


def test_guard_tier_remeasures_and_keeps_min():
    prior = {"skew_scale": {"plain": 3.0, "salted": 1.8}}
    current = {"plain": 5.1, "salted": 1.9}
    log: dict = {}
    merged = bench.guard_tier(
        "skew_scale", current, prior, lambda: {"plain": 3.2, "salted": 1.7}, log
    )
    # suspect cell took the re-measured min; non-suspect kept rep-1 min
    assert merged == {"plain": 3.2, "salted": 1.7}
    assert log["skew_scale"] == {
        "plain": {"prior": 3.0, "first": 5.1, "final": 3.2}
    }


def test_guard_tier_records_genuine_regression():
    """A slowdown that reproduces on the re-measure IS recorded — the
    guard filters one-off noise, not real regressions."""
    prior = {"t": {"x": 1.0}}
    log: dict = {}
    merged = bench.guard_tier("t", {"x": 2.0}, prior, lambda: {"x": 2.1}, log)
    assert merged == {"x": 2.0}
    assert log["t"]["x"]["final"] == 2.0


def test_guard_tier_no_prior_is_a_noop():
    log: dict = {}
    assert bench.guard_tier("new_tier", {"x": 9.0}, {}, lambda: 1 / 0, log) == {
        "x": 9.0
    }
    assert log == {}


def test_prior_bench_record_finds_newest_round():
    name, parsed = bench.prior_bench_record()
    assert name.startswith("BENCH_r") and name.endswith(".json")
    # the repo has committed records through round 6 at least
    assert int(name[len("BENCH_r"):-len(".json")]) >= 6
    assert "queries" in parsed and parsed["queries"]

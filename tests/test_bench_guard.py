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


# --- round-8: loader robustness to the driver's own record formats
# (the r7 verdict's one red pytest: BENCH_r07.json landed with
# "parsed": null and a tail truncated mid-object, and the loader
# returned ('', {}) — silently no-opping the next round's guard).

_GOOD_LINE = (
    '{"metric": "m", "value": 3.0, "unit": "sec", '
    '"queries": {"q01": 1.0, "q02": 2.0}, '
    '"media_scale": {"media_jpeg512px_decode_mb_per_s": 0.433}, "sf": 0.1}'
)


def _write(tmp_path, name, obj):
    import json

    (tmp_path / name).write_text(json.dumps(obj))


def test_parse_record_head_truncated_tail(tmp_path):
    """The exact BENCH_r07 shape: parsed null, tail cut to start at
    ': {"q01...' (the '{"metric"' head lost)."""
    cut = _GOOD_LINE.index(': {"q01')
    _write(tmp_path, "BENCH_r7.json",
           {"n": 7, "rc": 0, "parsed": None, "tail": _GOOD_LINE[cut:]})
    name, parsed = bench.prior_bench_record(root=str(tmp_path))
    assert name == "BENCH_r7.json"
    assert parsed["queries"] == {"q01": 1.0, "q02": 2.0}
    assert parsed["media_scale"]["media_jpeg512px_decode_mb_per_s"] == 0.433


def test_parse_record_real_driver_r07_file():
    """The actual driver-written BENCH_r07.json in the tree must be
    recoverable (this was the red test's trigger)."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                        "BENCH_r07.json")
    parsed = bench._parse_bench_record(path)
    assert parsed is not None and parsed["queries"]["q01_pricing_summary"] > 0
    assert "bpe_scale" in parsed and "vector_scale" in parsed


def test_prior_record_falls_back_to_newest_parseable(tmp_path):
    """An unrecoverable newest record must not blank the prior —
    the next-oldest parseable record serves instead."""
    _write(tmp_path, "BENCH_r7.json",
           {"parsed": None, "tail": "garbage with no json at all"})
    _write(tmp_path, "BENCH_r6.json", {"parsed": None, "tail": _GOOD_LINE})
    name, parsed = bench.prior_bench_record(root=str(tmp_path))
    assert name == "BENCH_r6.json"
    assert parsed["queries"] == {"q01": 1.0, "q02": 2.0}


def test_suspect_cells_two_sided_for_throughput():
    """*_per_s cells are bigger-is-better: a 3x DROP is the suspect
    direction (r7: media_jpeg512px fell 0.433 -> 0.132 unguarded)."""
    prior = {"media_jpeg512px_decode_mb_per_s": 0.433, "t": 1.0}
    current = {"media_jpeg512px_decode_mb_per_s": 0.132, "t": 1.0}
    assert bench._suspect_cells(current, prior) == [
        "media_jpeg512px_decode_mb_per_s"
    ]
    # ...and a throughput RISE is fine (not suspect)
    assert bench._suspect_cells(
        {"media_jpeg512px_decode_mb_per_s": 1.9}, prior) == []


def test_guard_tier_keeps_max_for_throughput_cells():
    prior = {"media_scale": {"x_mb_per_s": 0.4, "y": 1.0}}
    log: dict = {}
    merged = bench.guard_tier(
        "media_scale", {"x_mb_per_s": 0.1, "y": 1.0}, prior,
        lambda: {"x_mb_per_s": 0.38, "y": 0.9}, log)
    # best-of-both-reps across the tier: max for throughput, min for time
    assert merged == {"x_mb_per_s": 0.38, "y": 0.9}
    assert log["media_scale"]["x_mb_per_s"]["final"] == 0.38


def test_prior_bench_envelope_folds_best_across_records(tmp_path):
    """Envelope prior: per-cell min for time, max for throughput,
    across ALL parseable records — one throttled newest record (r7's
    bpe_scale 22.4 s vs r6's 6.5 s) can't become a lenient prior."""
    _write(tmp_path, "BENCH_r6.json", {"parsed": {
        "queries": {"q01": 1.0},
        "bpe_scale": {"bpe32_serial": 6.5},
        "media_scale": {"x_mb_per_s": 0.433},
    }})
    _write(tmp_path, "BENCH_r7.json", {"parsed": {
        "queries": {"q01": 1.4},
        "bpe_scale": {"bpe32_serial": 22.4},
        "media_scale": {"x_mb_per_s": 0.132},
    }})
    label, env = bench.prior_bench_envelope(root=str(tmp_path))
    assert label == "envelope(BENCH_r6.json..BENCH_r7.json)"
    assert env["bpe_scale"]["bpe32_serial"] == 6.5
    assert env["media_scale"]["x_mb_per_s"] == 0.433
    assert env["queries"]["q01"] == 1.0


# --- round-9: the r8 verdict's #1 — the driver truncated
# BENCH_r08.json deeper than the tier-3 recovery handles (tail starts
# INSIDE the queries dict at ', "q28_...'), so the newest committed
# record was again unusable as the guard prior. Tier-5 splice + the
# BENCH_LOCAL.json full-record sidecar + least-valuable-first emit
# ordering make the committed record truncation-proof.


def test_parse_record_real_driver_r08_file():
    """The actual driver-written BENCH_r08.json must be recoverable
    (tail begins mid-queries-dict — the shape tier 3 missed)."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                        "BENCH_r08.json")
    parsed = bench._parse_bench_record(path)
    assert parsed is not None
    # surviving headline cells after the cut point
    assert parsed["queries"]["q28_jaccard_pairs"] == 3.749
    assert parsed["queries"]["q132_bpe_encode"] == 3.414
    # every LATER tier survives intact
    assert parsed["dedup_scale"]["dedup100k_jaccard"] == 8.815
    assert parsed["corpus_scale"]["winnowreg40k_probe"] == 3.165
    assert parsed["vector_scale"]["vecingest_probe_64k_p8"] == 1.315


def test_parse_record_mid_token_cut(tmp_path):
    """A cut landing MID-TOKEN (inside a key or number) advances to
    the next ', \"' cell boundary before splicing."""
    cut = _GOOD_LINE.index('"q01') + 2  # inside the q01 key token
    _write(tmp_path, "BENCH_r8.json",
           {"parsed": None, "tail": _GOOD_LINE[cut:]})
    name, parsed = bench.prior_bench_record(root=str(tmp_path))
    assert name == "BENCH_r8.json"
    # q01 is the truncation casualty; q02 and the later tier survive
    assert parsed["queries"]["q02"] == 2.0
    assert parsed["media_scale"]["media_jpeg512px_decode_mb_per_s"] == 0.433


def test_sidecar_preferred_when_line_matches(tmp_path):
    """A matching BENCH_LOCAL.json sidecar restores the FULL record —
    including cells the truncated tail lost."""
    import json

    full = {"metric": "m", "value": 3.0, "unit": "sec",
            "queries": {"q01": 1.0, "q02": 2.0},
            "media_scale": {"x_mb_per_s": 0.4}, "sf": 0.1}
    line = json.dumps(bench._ordered_for_emit(full))
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps({"line": line, "record": full}))
    # driver kept only the last 60 chars — far too little for any
    # tail recovery, but enough to prove same-run identity
    _write(tmp_path, "BENCH_r9.json", {"parsed": None, "tail": line[-60:]})
    name, parsed = bench.prior_bench_record(root=str(tmp_path))
    assert name == "BENCH_r9.json"
    assert parsed == full


def test_sidecar_stale_mismatch_falls_through(tmp_path):
    """A sidecar from a DIFFERENT run (line mismatch) must be ignored
    — tail recovery serves what it can instead."""
    import json

    stale = {"metric": "m", "value": 9.9, "unit": "sec",
             "queries": {"q01": 9.9}, "sf": 0.1}
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps({"line": json.dumps(stale), "record": stale}))
    cut = _GOOD_LINE.index(': {"q01')
    _write(tmp_path, "BENCH_r9.json",
           {"parsed": None, "tail": _GOOD_LINE[cut:]})
    name, parsed = bench.prior_bench_record(root=str(tmp_path))
    assert name == "BENCH_r9.json"
    assert parsed["queries"] == {"q01": 1.0, "q02": 2.0}  # not 9.9


def test_records_archive_survives_sidecar_overwrite(tmp_path):
    """Round-11 (verdict #2): the single-slot sidecar is
    last-run-wins — when a NEWER run overwrites it, the older
    round's full record must still resolve via its records/ archive
    (content-addressed, written by _archive_record)."""
    import json

    old_full = {"metric": "m", "value": 3.0, "unit": "sec",
                "queries": {"q01": 1.0, "q02": 2.0},
                "media_scale": {"x_mb_per_s": 0.4}, "sf": 0.1}
    old_line = json.dumps(bench._ordered_for_emit(old_full))
    new_full = {"metric": "m", "value": 4.0, "unit": "sec",
                "queries": {"q01": 2.0}, "sf": 0.1}
    # simulate run order: old run archives, new run overwrites the
    # sidecar (and archives itself)
    rec_dir = tmp_path / "records"
    rec_dir.mkdir()
    (rec_dir / "BENCH_full_aaaa0000.json").write_text(
        json.dumps({"line": old_line, "record": old_full}))
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps({"line": json.dumps(new_full), "record": new_full}))
    # the driver record for the OLD round: 60-char tail, no parse
    _write(tmp_path, "BENCH_r9.json",
           {"parsed": None, "tail": old_line[-60:]})
    name, parsed = bench.prior_bench_record(root=str(tmp_path))
    assert name == "BENCH_r9.json"
    assert parsed == old_full  # full record, via the archive


def test_archive_record_writes_and_prunes(tmp_path, monkeypatch):
    import json
    import time as _time

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    for i in range(63):
        line = json.dumps({"queries": {"q": i}})
        bench._archive_record(line, {"queries": {"q": i}})
        _time.sleep(0.002)  # distinct mtimes: prune order deterministic
    files = list((tmp_path / "records").glob("BENCH_full_*.json"))
    assert len(files) == 60  # pruned oldest-first past the cap
    # every surviving archive parses to its own payload
    for p in files:
        side = json.loads(p.read_text())
        assert side["record"]["queries"]["q"] >= 3


def test_ordered_emit_survives_driver_truncation(tmp_path):
    """End-to-end shape check: a realistic reordered line cut to the
    driver's ~2k-char tail window still yields every headline query
    and the guard log via tail recovery alone (no sidecar)."""
    import json

    out = {
        "metric": "headline query wall-clock", "value": 29.9,
        "unit": "sec",
        "queries": {f"q{i:03d}_some_operator_name": round(0.3 + i * 0.17, 3)
                    for i in range(1, 26)},
        "dedup_scale": {f"dedup{s}_{op}": 3.21 for s in ("25k", "100k")
                        for op in ("jaccard", "containment", "minhash",
                                   "simhash", "spans")},
        "graph_scale": {"pagerank_1x_586k_edges": 3.0,
                        "pagerank_4x_2347k_edges": 8.1},
        "sf1": {"q01": 1.0, "q03": 1.0, "q52": 5.9},
        "media_scale": {f"media{s}_{op}": 0.4 for s in ("2k", "8k")
                        for op in ("decode", "neardup")},
        "bpe_scale": {"bpe32_serial": 5.6, "bpe32_batch16": 4.3},
        "skew_scale": {"skew_plain": 3.3, "skew_aqe": 1.4},
        "vector_scale": {"vecingest_probe_16k_p6": 1.3},
        "corpus_scale": {f"winnow{s}_pairs": 1.5 for s in ("10k", "40k")},
        "sf": 0.1,
        "guard": {"ratio": 1.5, "prior_record": "BENCH_r08.json",
                  "remeasured": {}},
    }
    line = json.dumps(bench._ordered_for_emit(out))
    ordered_keys = list(json.loads(line))
    assert ordered_keys[-2:] == ["queries", "guard"]
    _write(tmp_path, "BENCH_r9.json", {"parsed": None, "tail": line[-2000:]})
    name, parsed = bench.prior_bench_record(root=str(tmp_path))
    assert name == "BENCH_r9.json"
    assert len(parsed["queries"]) == 25  # every headline cell survives
    assert parsed["guard"]["prior_record"] == "BENCH_r08.json"


def test_compare_rejects_unknown_query_names():
    """r8 verdict #5: tools/compare.py silently skipped typo'd names
    and printed ALL PASS having run nothing."""
    from tools.compare import unknown_names

    registered = {"q01_pricing_summary": 1, "q02_counts": 2}
    assert unknown_names({"q01_pricing_summary"}, registered) == []
    assert unknown_names(
        {"q01_pricing_summary", "q01_typo", "zzz"}, registered
    ) == ["q01_typo", "zzz"]
    assert unknown_names(set(), registered) == []


def test_cut_before_queries_keeps_every_cell(tmp_path):
    """Round-9 review: a cut landing BETWEEN the scale tiers and the
    '"queries"' key (e.g. inside '"value": 29.9, ') must recover the
    FULL intact queries dict, not lose its head cells to the
    mid-dict splice tier."""
    import json

    out = {"metric": "m", "unit": "sec", "sf": 0.1,
           "media_scale": {"x_mb_per_s": 0.4}, "value": 29.9,
           "queries": {"q01": 1.0, "q02": 2.0, "q03": 3.0},
           "guard": {"ratio": 1.5, "prior_record": "BENCH_r08.json",
                     "remeasured": {}}}
    line = json.dumps(bench._ordered_for_emit(out))
    cut = line.index('"value"') + 8  # mid-token, before "queries"
    _write(tmp_path, "BENCH_r9.json", {"parsed": None, "tail": line[cut:]})
    name, parsed = bench.prior_bench_record(root=str(tmp_path))
    assert name == "BENCH_r9.json"
    assert parsed["queries"] == {"q01": 1.0, "q02": 2.0, "q03": 3.0}
    assert parsed["guard"]["prior_record"] == "BENCH_r08.json"


def test_cut_inside_queries_with_guard_queries_remnant(tmp_path):
    """A cut INSIDE the queries dict when guard.remeasured ALSO has a
    'queries' entry: the later '"queries"' occurrence must not be
    mistaken for the real dict (its braces don't balance); the splice
    tier recovers the surviving cells instead."""
    import json

    out = {"metric": "m", "unit": "sec", "sf": 0.1,
           "queries": {"q01": 1.0, "q02": 2.0, "q03": 3.0},
           "guard": {"ratio": 1.5, "prior_record": "BENCH_r08.json",
                     "remeasured": {"queries": {"q01": {
                       "prior": 0.9, "first": 1.4, "final": 1.0}}}}}
    line = json.dumps(bench._ordered_for_emit(out))
    cut = line.index('"q02"') - 2  # at the ', ' before q02
    _write(tmp_path, "BENCH_r9.json", {"parsed": None, "tail": line[cut:]})
    name, parsed = bench.prior_bench_record(root=str(tmp_path))
    assert name == "BENCH_r9.json"
    # q01 is the truncation casualty; q02/q03 survive as numbers
    assert parsed["queries"]["q02"] == 2.0
    assert parsed["queries"]["q03"] == 3.0


def test_recovery_sound_at_every_cut_position(tmp_path):
    """Exhaustive sweep: for EVERY possible truncation point of a
    realistic reordered line, the loader must (a) never return
    corrupted cells — any recovered numeric cell that names a real
    query matches the true value — and (b) recover the FULL queries
    dict whenever the cut lands at or before the '"queries"' key
    (the dict is intact in the fragment)."""
    import json

    out = {
        "metric": "m", "unit": "sec", "sf": 0.1,
        "dedup_scale": {"dedup25k_jaccard": 5.3, "dedup100k_jaccard": 9.1},
        "corpus_scale": {"winnow10k_pairs": 1.4, "substr10k_spans": 2.5},
        "value": 12.3,
        "queries": {"q01": 1.0, "q02": 2.0, "q03": 3.0, "q04": 4.0},
        "guard": {"ratio": 1.5, "prior_record": "BENCH_r08.json",
                  "remeasured": {"queries": {"q01": {
                      "prior": 0.9, "first": 1.4, "final": 1.0}}}},
    }
    line = json.dumps(bench._ordered_for_emit(out))
    qkey = line.index('"queries"')
    truth = out["queries"]
    recovered_full = 0
    for cut in range(len(line) - 10):
        _write(tmp_path, "BENCH_r9.json",
               {"parsed": None, "tail": line[cut:]})
        parsed = bench._parse_bench_record(str(tmp_path / "BENCH_r9.json"))
        if parsed is None:
            assert cut > qkey, f"cut {cut} before queries key lost the dict"
            continue
        q = parsed.get("queries")
        assert isinstance(q, dict)
        for k, v in q.items():
            if k in truth and isinstance(v, (int, float)):
                assert v == truth[k], (cut, k, v)
        if cut <= qkey:
            assert q == truth, f"cut {cut}: intact queries dict lost cells"
            recovered_full += 1
    # the pre-queries region must actually have been exercised
    assert recovered_full == qkey + 1


def test_cut_inside_early_tier_keeps_later_intact_tiers(tmp_path):
    """Round-10 advisory: a cut INSIDE an early scale-tier dict
    leaves later tiers (corpus_scale here) intact in the fragment
    BEFORE the '"queries"' key. The 4a bare-brace splice at that key
    parses but would discard them; the candidates must compete and
    the cut-splice (which preserves them via duplicate-key
    shadowing) must win."""
    import json

    out = {
        "metric": "m", "unit": "sec", "sf": 0.1,
        "dedup_scale": {"dedup25k_jaccard": 5.3, "dedup100k_jaccard": 9.1},
        "corpus_scale": {"winnow10k_pairs": 1.4, "substr10k_spans": 2.5},
        "value": 12.3,
        "queries": {"q01": 1.0, "q02": 2.0},
        "guard": {"ratio": 1.5, "prior_record": "BENCH_r08.json",
                  "remeasured": {}},
    }
    line = json.dumps(bench._ordered_for_emit(out))
    cut = line.index('"dedup100k_jaccard"') - 2  # inside dedup_scale
    _write(tmp_path, "BENCH_r9.json", {"parsed": None, "tail": line[cut:]})
    parsed = bench._parse_bench_record(str(tmp_path / "BENCH_r9.json"))
    assert parsed is not None
    # the later tier survived whole — this is what 4a-first discarded
    assert parsed["corpus_scale"] == {
        "winnow10k_pairs": 1.4, "substr10k_spans": 2.5
    }
    # the real queries dict shadows the remnant
    assert parsed["queries"] == {"q01": 1.0, "q02": 2.0}
    assert parsed["guard"]["prior_record"] == "BENCH_r08.json"

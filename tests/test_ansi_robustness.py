"""ANSI-mode robustness gate (optimization r14, verdict r13 #1/#2).

The driver's harness injects its OWN SparkSession into every declared
query, and on PySpark 4.x that session has ``spark.sql.ansi.enabled=
true`` by default — while the engine's ``get_session`` pins it false.
Round 13 shipped a fold whose ``element_at(acc, -1)`` on an empty
accumulator was legal under non-ANSI (NULL) and a crash under ANSI
(q189/q196 failed the driver's oracle while pytest and the builder's
whole-catalog compare were green). The engine does not own the
caller's session, so every query must produce IDENTICAL results under
either setting.

Two layers:

- ``test_catalog_runs_under_ansi``: every registered query executes
  crash-free on an ANSI-ON session at sf0.001 (the r13 failure class
  was an error raise, so crash-freedom over the full catalog is the
  broad net).
- ``test_risk_family_bit_identical_across_ansi``: the operators that
  index arrays/maps inside folds or rely on NULL-on-error semantics
  are additionally checked for row-for-row equality between ANSI on
  and off.

``tools/compare.py`` grows the matching ``SPARK_GRAFT_ANSI=1`` mode
for the full oracle-compare (run at round close; this pytest gate is
the always-on regression net).
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from tests.conftest import SF_SMOKE


@contextmanager
def ansi(spark, enabled: bool):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true" if enabled else "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def _queries():
    import __spark_entry__ as entry

    return entry.queries()


# operators that fold over arrays with element_at/try_element_at,
# look up literal maps, or otherwise leaned on non-ANSI NULL-on-error
# at some point; kept bit-identical across modes, not just crash-free
RISK_FAMILY = [
    "q11_label_map",          # ml/labels map-literal lookup
    "q116_bpe_merges",        # _bpe_merge_fold element_at(acc.res, -1)
    "q132_bpe_encode",        # encode folds over trained vocab
    "q189_bpe_token_spans",   # sft piece_idx cumulative-length fold
    "q196_pack_bpe_boundaries",
    "q183_token_spans",       # sft char-span arithmetic
    "q178_sft_pack",
    "q145_winnow_fingerprints",  # winnow min-fold over gram hashes
    "q167_span_corruption",   # corpus run-boundary element_at neighbors
    "q159_fim_transform",
    "q175_t_closeness",       # privacy map-literal global counts
    "q91_span_dedup",
    "q152_exact_substring_spans",
]


def test_catalog_runs_under_ansi(spark):
    qs = _queries()
    failures: list[str] = []
    with ansi(spark, True):
        for name, fn in sorted(qs.items()):
            try:
                fn(spark, SF_SMOKE).collect()
            except Exception as ex:  # noqa: BLE001 — gate reports all
                failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, (
        "queries crashed on an ANSI-enabled session (the driver's "
        "default): " + "; ".join(failures[:5])
    )


@pytest.mark.parametrize("name", RISK_FAMILY)
def test_risk_family_bit_identical_across_ansi(spark, name):
    fn = _queries()[name]
    with ansi(spark, False):
        off = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    with ansi(spark, True):
        on = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    assert off == on

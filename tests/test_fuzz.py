"""Differential fuzz regression gate (round-7; r5/r6 verdicts #6):
replay a fixed seed of the cheap fuzz families against DuckDB on the
smoke fixture every test run. The full harness (all 10 families,
doc-pair joins included, arbitrary seeds/draws) is tools/fuzz.py."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMOKE
from tools.fuzz import CHEAP, FAMILIES, TABLES, run_fuzz


def test_fuzz_cheap_families_fixed_seed(spark):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    failures = run_fuzz(
        spark, con, SF_SMOKE, CHEAP, draws=2, seed=11, log=lambda *_: None
    )
    assert failures == []


def test_fuzz_families_registry_sane():
    assert len(FAMILIES) >= 31  # round-9: +winnow_registry/substr_*
    assert set(CHEAP) <= set(FAMILIES)

"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql()
are consistent, and every oracle-paired query matches DuckDB at sf0.01
(the same check the driver's CORRECTNESS gate performs)."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE, SF_SMOKE


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    extra = set(entrymod.oracle_sql()) - set(qs)
    assert not extra, f"oracle_sql keys missing from queries(): {extra}"


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_ORACLE)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(s_rows) >= 0  # rows-only check
        return
    res = duck.sql(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    d_idx = [d_cols.index(c) for c in sorted(d_cols)]
    sk = sorted([tuple(_canon(r[i]) for i in s_idx) for r in s_rows], key=repr)
    dk = sorted([tuple(_canon(r[i]) for i in d_idx) for r in d_rows], key=repr)
    assert sk == dk


def test_queries_run_at_smoke_sf(spark):
    # every query must also run at sf0.001 (schema stability)
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name


def test_query_output_columns_unique_and_oracle_parses(spark, duck):
    """Duplicate output column names would silently break the driver's
    sort-columns-by-name hash; every oracle must at least EXPLAIN in
    DuckDB (catches SQL typos without paying full execution twice)."""
    for name, fn in entrymod.queries().items():
        cols = fn(spark, SF_SMOKE).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"
    for name, sql in entrymod.oracle_sql().items():
        duck.sql(f"EXPLAIN {sql}")


def test_driver_window_queries_return_scalar_columns_only(spark):
    """The driver's pandas canonicalizer sorts result rows by every
    column; a Python-list cell (array/map/struct column) is
    unsortable and crashes the comparison even when values match
    (r3's q87 red cell). Window queries must therefore project
    nested types away (array_join CSV, etc.); library APIs keep the
    arrays."""
    from nsl_kdd_spark.plans.catalog import DRIVER_WINDOW, QUERIES

    offenders = {}
    for name in DRIVER_WINDOW:
        df = QUERIES[name](spark, SF_SMOKE)
        nested = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if nested:
            offenders[name] = nested
    assert not offenders, offenders

"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given SF, then compares:
row count, column-name set, and an order-insensitive value hash
(columns sorted by name, rows sorted by their serialized form).
Floats are compared both exactly and at 1e-9 relative tolerance so a
mismatch report shows whether it's a real bug or float noise.

Usage: python tools/compare.py [sf_dir] [query ...]

Set ``SPARK_GRAFT_ANSI=1`` to run the Spark side with
``spark.sql.ansi.enabled=true`` — the driver's harness session is a
stock PySpark 4.x session (ANSI ON by default), so the catalog must
produce identical results under either setting (round-13 verdict:
q189/q196 crashed only on the driver because element_at(-1) on an
empty fold accumulator throws under ANSI).
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def canon(v: object) -> object:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def rows_key(rows: list[tuple]) -> list[tuple]:
    return sorted([tuple(canon(v) for v in r) for r in rows], key=repr)


def unknown_names(only: set[str], registered) -> list[str]:
    """Requested query names that don't exist in ``queries()`` —
    round-9 (r8 verdict #5): these previously vanished silently, so a
    typo'd subset run printed 'ALL PASS' having compared nothing."""
    return sorted(n for n in only if n not in registered)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from nsl_kdd_spark.session import get_session

    bad = unknown_names(only, e.queries())
    if bad:
        print(f"ERROR: unknown query name(s): {', '.join(bad)}")
        print("(names must match __spark_entry__.queries() keys exactly)")
        return 2

    spark = get_session(master="local[8]", shuffle_partitions=8)
    if os.environ.get("SPARK_GRAFT_ANSI") == "1":
        spark.conf.set("spark.sql.ansi.enabled", "true")
        print("(spark.sql.ansi.enabled=true — driver-session replica)")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_types = [str(t) for t in res.types]
            d_rows = [tuple(r) for r in res.fetchall()]
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue

        ok = True
        # DuckDB widens SUM(BIGINT) to HUGEINT (int128); the driver's
        # value hash serializes HUGEINT differently from Spark's BIGINT,
        # so an uncast integer SUM passes here but fails the gate.
        huge = [c for c, t in zip(d_cols, d_types) if t in ("HUGEINT", "INT128")]
        if huge:
            print(f"FAIL {name}: oracle emits HUGEINT column(s) {huge} — "
                  f"wrap with CAST(... AS BIGINT)")
            ok = False
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: row count {len(s_rows)} vs {len(d_rows)}")
            ok = False
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns {sorted(s_cols)} vs {sorted(d_cols)}")
            ok = False
        if ok:
            s_idx = [s_cols.index(c) for c in sorted(s_cols)]
            d_idx = [d_cols.index(c) for c in sorted(d_cols)]
            sk = rows_key([tuple(r[i] for i in s_idx) for r in s_rows])
            dk = rows_key([tuple(r[i] for i in d_idx) for r in d_rows])
            if sk != dk:
                ok = False
                n_shown = 0
                for a, b in zip(sk, dk):
                    if a != b and n_shown < 3:
                        print(f"FAIL {name}: row diff\n  spark: {a}\n  duck:  {b}")
                        n_shown += 1
                if n_shown == 0:
                    print(f"FAIL {name}: row sets differ (ordering of sorted keys)")
        if ok:
            print(f"PASS {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
        else:
            failures += 1
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

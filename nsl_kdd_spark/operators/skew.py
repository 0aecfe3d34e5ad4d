"""Skew-handling join operators (SURVEY.md §4.3; 100 TB toolbox).

AQE's skew-join splitting handles moderate skew automatically (on in
``session.py``); these operators cover the cases it can't:

- ``salted_join``: explicit key salting for pathological hot keys —
  the big side gets a random salt in [0, n), the small side is
  replicated n times; the join key becomes (key, salt), spreading one
  hot key over n reducers. Exact same join result.
- ``bucketed_write`` / co-located joins: pre-shuffle both tables into
  the same bucket layout once, then every subsequent equi-join on the
  bucket key runs with NO exchange on either side — the 100 TB answer
  to repeated fact-to-fact joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.scalar import ppm_of


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
    build_hint: str | None = None,
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Equi-join with salting: use when one/few key values dominate the
    big side and the other side is too large to broadcast outright.

    big:   +salt = uniform random int in [0, n_salts)
    small: replicated n_salts times (explode), one copy per salt
    join on (key, salt), salt columns dropped after.

    ``hot_keys`` (round-7): TARGETED salting — pass the pathological
    key values (from :func:`top_keys`, a tiny driver-side list) and
    only THOSE rows are salted: the big side salts hot rows in
    [0, n_salts) and everything else 0; the small side replicates
    only the hot keys ``n_salts`` times and everything else once.
    Same exact join result, but the dim replication shrinks from
    |small| * n_salts to |small| + n_hot * n_salts rows and every
    non-hot row keeps its original single-copy join — full salting
    taxes the entire join to fix a few keys, targeted salting prices
    the fix at the hot keys alone (measured solo on the bench skew
    fixture, idle host, two runs: targeted 1.24-1.29 s vs
    full-salting 1.36-1.46 s vs 2.9-3.8 s unsalted straggler; the
    per-round committed number is BENCH_r{N}'s ``skew_salted_hot``
    cell).

    ``build_hint="shuffle_hash"`` hints the replicated small side as
    the hash build side: salting spreads the hot key across reducers,
    but a sort-merge join still SORTS the entire big side — the one
    cost salting cannot remove, and the dominant one (measured on the
    bench `skew_scale` fixture: 2.2 s SMJ vs 1.6 s hashed at 24M
    rows). Opt-in rather than default because the build side per task
    is |small| * n_salts / shuffle_partitions rows PLUS hash-map
    overhead and must fit executor memory — a dim near the broadcast
    boundary at high ``n_salts`` can OOM where the default sort-merge
    would have spilled; turn it on when the replicated-dim-per-task
    arithmetic clearly fits (the common case for genuinely small
    dims, and always for targeted salting's |small| + n_hot * n_salts
    build).
    """
    rand_salt = (F.rand(seed) * n_salts).cast("int")
    all_salts = F.array(*[F.lit(i) for i in range(n_salts)])
    if hot_keys is None:
        salted_big = big.withColumn("__salt", rand_salt)
        salted_small = small.withColumn("__salt", F.explode(all_salts))
    else:
        hot = F.array(*[F.lit(k) for k in hot_keys])
        is_hot = F.array_contains(hot, F.col(on))
        salted_big = big.withColumn(
            "__salt", F.when(is_hot, rand_salt).otherwise(F.lit(0))
        )
        salted_small = small.withColumn(
            "__salt",
            F.explode(F.when(is_hot, all_salts).otherwise(F.array(F.lit(0)))),
        )
    if build_hint is not None:
        salted_small = salted_small.hint(build_hint)
    return salted_big.join(salted_small, on=[on, "__salt"], how=how).drop("__salt")


def bucketed_write(
    df: DataFrame,
    table_name: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed table. Two
    tables bucketed the same way equi-join on the bucket key with no
    Exchange (and no Sort, if sorted) — verified in tests."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Skew diagnosis: heaviest keys with counts + integer-ppm share,
    ties broken by key (total order, engine-reproducible). Run this
    before choosing broadcast vs salt vs AQE-only; a key above ~1/32
    of the table (one executor-thread's worth at 32 shuffle
    partitions) is the salting signal.

    One scan: the total derives from the per-key count table (tiny)
    instead of a second ``df.count()`` pass over the fact table."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key,
            "n",
            ppm_of("n", "__total").alias("share_ppm"),
        )
        .orderBy(F.desc("n"), key)
        .limit(n)
    )

"""Generic Bloom semi-join reduction (operators/bloom.py): exactness
vs a plain LEFT SEMI join on fixture tables (single- and multi-column
keys, renamed keys, NULL keys), the exact=False superset contract,
prebuilt-filter reuse, and the phase-1 selectivity that justifies the
plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsl_kdd_spark.operators.bloom import (
    bloom_might_contain_col,
    bloom_semi_join,
    build_key_bloom,
)
from nsl_kdd_spark.sources.parquet import load_tables
from tests.conftest import SF_SMOKE


def _sets(df, *cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_bloom_semi_join_matches_semi_join(spark):
    t = load_tables(spark, SF_SMOKE)
    hot = t.orders.filter(F.col("o_totalprice") > 400_000)
    want = _sets(
        t.lineitem.join(
            hot.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
            on="l_orderkey", how="left_semi",
        ),
        "l_orderkey", "l_linenumber",
    )
    got = _sets(
        bloom_semi_join(
            t.lineitem, hot, on="l_orderkey", small_on="o_orderkey"
        ),
        "l_orderkey", "l_linenumber",
    )
    assert got == want and want  # non-trivial on the fixture


def test_bloom_semi_join_multi_column_key(spark):
    t = load_tables(spark, SF_SMOKE)
    small = t.lineitem.filter(F.col("l_quantity") >= 49).select(
        "l_suppkey", "l_partkey"
    )
    want = _sets(
        t.lineitem.join(small.distinct(), on=["l_suppkey", "l_partkey"],
                        how="left_semi"),
        "l_orderkey", "l_linenumber",
    )
    got = _sets(
        bloom_semi_join(t.lineitem, small, on=["l_suppkey", "l_partkey"]),
        "l_orderkey", "l_linenumber",
    )
    assert got == want and want


def test_bloom_semi_join_null_keys_never_match(spark):
    large = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id int, k int"
    )
    small = spark.createDataFrame([(10,), (None,)], "k int")
    got = {r.id for r in bloom_semi_join(large, small, on="k").collect()}
    assert got == {1}  # SQL semantics: NULL = NULL is not a match


def test_bloom_semi_join_inexact_is_superset_with_bounded_fps(spark):
    t = load_tables(spark, SF_SMOKE)
    hot = t.orders.filter(F.col("o_totalprice") > 400_000)
    exact = bloom_semi_join(
        t.lineitem, hot, on="l_orderkey", small_on="o_orderkey"
    ).count()
    loose = bloom_semi_join(
        t.lineitem, hot, on="l_orderkey", small_on="o_orderkey",
        exact=False, fpp=0.01,
    )
    n_loose = loose.count()
    n_all = t.lineitem.count()
    assert exact <= n_loose  # superset
    # phase-1 selectivity: FP admissions stay near the fpp target
    assert n_loose - exact <= 0.05 * n_all


def test_bloom_prebuilt_filter_reused_across_probes(spark):
    t = load_tables(spark, SF_SMOKE)
    hot = t.orders.filter(F.col("o_totalprice") > 400_000)
    bloom = build_key_bloom(hot, ["o_orderkey"], fpp=0.01)
    a = bloom_semi_join(
        t.lineitem, hot, on="l_orderkey", small_on="o_orderkey", bloom=bloom
    ).count()
    b = bloom_semi_join(
        t.orders, hot, on="o_orderkey", bloom=bloom
    ).count()
    assert a > 0 and b == hot.count()


def test_bloom_probe_column_standalone(spark):
    # the probe column is usable outside the join wrapper (the
    # decontam pattern): all members positive, non-members ~fpp
    small = spark.range(1_000).select(F.col("id").alias("k"))
    bloom = build_key_bloom(small, ["k"], fpp=0.01)
    probe = bloom_might_contain_col(spark, bloom)
    h1, h2 = F.xxhash64("k"), F.xxhash64("k", F.lit(1))
    members = spark.range(1_000).select(F.col("id").alias("k"))
    assert members.filter(~probe(h1, h2)).count() == 0
    outsiders = spark.range(1_000, 9_000).select(F.col("id").alias("k"))
    fp = outsiders.filter(probe(h1, h2)).count()
    assert fp <= 0.03 * 8_000


def test_bloom_probe_plan_is_arrow_and_precedes_fact_exchange(spark):
    # the probe must be Arrow-batched (never row-at-a-time
    # BatchEvalPython) and sit on the fact side BEFORE any Exchange —
    # the whole point is that the big side is filtered map-side
    from tests.test_plan_quality import plan_of

    t = load_tables(spark, SF_SMOKE)
    hot = t.orders.filter(F.col("o_totalprice") > 400_000)
    df = bloom_semi_join(
        t.lineitem, hot, on="l_orderkey", small_on="o_orderkey"
    )
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    # the fact-side probe's SUBTREE (everything deeper-indented below
    # it, down to the scan) must contain no Exchange: the filter sits
    # directly on the scan, map-side
    # depth = position of the "+-" marker (leading whitespace alone
    # is wrong: sibling branches continue with ":" gutter characters)
    probe_idx = next(
        i for i, line in enumerate(lines) if "ArrowEvalPython" in line
    )
    probe_depth = lines[probe_idx].index("+-")
    subtree = []
    for line in lines[probe_idx + 1:]:
        if "+-" not in line or line.index("+-") <= probe_depth:
            break
        subtree.append(line)
    assert subtree and any("Scan" in line for line in subtree)
    assert not any("Exchange" in line for line in subtree), (
        "fact side shuffled below the probe"
    )


def test_bloom_key_width_mismatch_raises(spark):
    t = load_tables(spark, SF_SMOKE)
    try:
        bloom_semi_join(t.lineitem, t.orders, on=["l_orderkey"],
                        small_on=["o_orderkey", "o_custkey"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "key widths differ" in str(e)


def test_bloom_broadcast_cached_per_instance(spark):
    """Round-9 advisory: repeated probes of one KeyBloom must reuse a
    single bitmap broadcast (a fresh broadcast per call accumulated
    blocks in long-lived sessions), and unpersist() releases it so a
    later probe re-broadcasts cleanly."""
    from nsl_kdd_spark.operators.bloom import (
        _bloom_broadcast,
        build_key_bloom,
    )

    small = spark.range(100).withColumnRenamed("id", "k")
    bloom = build_key_bloom(small, ["k"])
    bc1 = _bloom_broadcast(spark, bloom)
    bc2 = _bloom_broadcast(spark, bloom)
    assert bc1 is bc2

    # the cached broadcast serves a real probe end-to-end
    big = spark.range(1_000).withColumnRenamed("id", "k")
    from nsl_kdd_spark.operators.bloom import bloom_semi_join

    assert bloom_semi_join(big, small, on="k", bloom=bloom).count() == 100

    bloom.unpersist()
    assert "_bc" not in bloom.__dict__
    bloom.unpersist()  # idempotent
    bc3 = _bloom_broadcast(spark, bloom)
    assert bc3 is not bc1
    assert bloom_semi_join(big, small, on="k", bloom=bloom).count() == 100


def test_bloom_picklable_after_probe(spark):
    """Round-9 review: probing caches (weakref, Broadcast) on the
    instance; pickling must drop that cache, not crash — the
    build-once/cache/probe-many pattern ships blooms through
    pickle/cloudpickle."""
    import pickle

    from nsl_kdd_spark.operators.bloom import (
        _bloom_broadcast,
        bloom_semi_join,
        build_key_bloom,
    )

    small = spark.range(50).withColumnRenamed("id", "k")
    bloom = build_key_bloom(small, ["k"])
    _bloom_broadcast(spark, bloom)  # populate the cache
    clone = pickle.loads(pickle.dumps(bloom))
    assert clone.bits == bloom.bits and clone.m == bloom.m
    assert "_bc" not in clone.__dict__  # cache not carried over
    big = spark.range(200).withColumnRenamed("id", "k")
    assert bloom_semi_join(big, small, on="k", bloom=clone).count() == 50

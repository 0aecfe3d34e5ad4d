"""Skew + bucketing operators: results must equal plain joins, and
bucketed co-located joins must show NO Exchange in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsl_kdd_spark.operators.skew import bucketed_write, salted_join, top_keys
from nsl_kdd_spark.sources.parquet import load_tables
from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_salted_join_equals_plain_join(spark):
    t = load_tables(spark, SF_SMOKE)
    li = t.lineitem.select("l_orderkey", "l_quantity")
    ords = t.orders.select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(ords, on="l_orderkey").groupBy("o_orderstatus").count()
    salted = (
        salted_join(li, ords, on="l_orderkey", n_salts=8)
        .groupBy("o_orderstatus").count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_targeted_salted_join_equals_plain_join(spark):
    """hot_keys mode (round-7): salting only the pathological keys
    must still produce exactly the plain join's result — for inner
    AND left joins (left keeps unmatched big rows, whose salt never
    finds a dim copy unless the non-hot side defaults to salt 0)."""
    t = load_tables(spark, SF_SMOKE)
    li = t.lineitem.select("l_orderkey", "l_quantity")
    ords = t.orders.select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    # pick genuine heavy keys from the diagnosis operator
    hot = [r["l_orderkey"] for r in top_keys(li, "l_orderkey", n=3).collect()]
    for how in ("inner", "left"):
        plain = (
            li.join(ords, on="l_orderkey", how=how)
            .groupBy("o_orderstatus").count()
        )
        targeted = (
            salted_join(li, ords, on="l_orderkey", n_salts=8, how=how,
                        hot_keys=hot)
            .groupBy("o_orderstatus").count()
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, targeted.collect())
        ), how


def test_top_keys_diagnosis(spark):
    t = load_tables(spark, SF_SMOKE)
    top = top_keys(t.lineitem, "l_returnflag", n=3).collect()
    assert len(top) == 3
    # 3 flags cover the whole table: ppm shares sum to ~1e6 (floor
    # division loses < 1 ppm per row)
    assert 1_000_000 - 3 <= sum(r["share_ppm"] for r in top) <= 1_000_000
    assert top[0]["n"] >= top[1]["n"] >= top[2]["n"]


def test_bucketed_join_has_no_exchange(spark):
    import shutil

    for tbl in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"spark-warehouse/{tbl}", ignore_errors=True)
    t = load_tables(spark, SF_SMOKE)
    bucketed_write(
        t.lineitem.select("l_orderkey", "l_quantity"),
        "li_b", ["l_orderkey"], 8, sort_by=["l_orderkey"],
    )
    bucketed_write(
        t.orders.select("o_orderkey", "o_totalprice"),
        "ord_b", ["o_orderkey"], 8, sort_by=["o_orderkey"],
    )
    li = spark.table("li_b")
    ords = spark.table("ord_b")
    joined = li.join(ords, li.l_orderkey == ords.o_orderkey)
    # at smoke scale the planner prefers broadcast; force the
    # sort-merge path to show the bucketed layout removes the shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, \
            "bucketed co-located join must not shuffle"
        want = (
            t.lineitem.join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
            .count()
        )
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
    assert n == want


def test_sketch_rollup_rel_error_and_merge(spark):
    """Per-group HLL estimates within 5% of exact; the __ALL__ row is
    a UNION of group sketches, not a rescan, and must land within 5%
    of the true global distinct count (dedup across groups — a SUM of
    the group estimates would overcount ~5x here)."""
    from nsl_kdd_spark.operators.agg import sketch_rollup
    from pyspark.sql import functions as F

    t = load_tables(spark, SF_SMOKE)
    rows = sketch_rollup(t.orders, "o_orderpriority", "o_custkey").collect()
    got = {r[0]: r[1] for r in rows if not r["is_total"]}
    got["__ALL__"] = next(r[1] for r in rows if r["is_total"])
    exact_all = t.orders.select("o_custkey").distinct().count()
    exact_per = {
        r[0]: r[1]
        for r in t.orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey"))
        .collect()
    }
    assert abs(got["__ALL__"] - exact_all) <= 0.05 * exact_all
    for k, v in exact_per.items():
        assert abs(got[k] - v) <= 0.05 * v
    assert got["__ALL__"] < sum(v for k, v in got.items() if k != "__ALL__")

"""Query catalog: the engine's operator inventory exercised end-to-end.

Every entry pairs a Spark plan (built from ``nsl_kdd_spark`` operators)
with an ANSI-SQL oracle DuckDB runs on the same parquet tables — the
driver's correctness gate (``__spark_entry__.py``). Each query cites
the SURVEY.md §2 row(s) it covers.

Determinism contract (see ``functions.scalar``): money aggregates go
through exact decimal sums so Spark and DuckDB agree bit-for-bit;
counts/min/max are exact by nature; ties in any top-k are broken by a
unique key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.scalar import (
    exact_avg,
    exact_stddev,
    exact_sum,
    hard_vote_or,
    soft_vote,
    threshold,
)
from nsl_kdd_spark.operators import agg, joins, relational, windows
from nsl_kdd_spark.sources.parquet import load_tables

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (SURVEY §2.4 A1/A5/A7, §2.5 W1-W2)
# ---------------------------------------------------------------------------

@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)                                        AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
           SUM(l_quantity) / COUNT(l_quantity)                    AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        t.lineitem
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(28,6)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(28,6)")).cast("double").alias("sum_charge"),
            (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# A1/W1: group-count + sort (the reference's EDA shape, README.md:296-297)
# ---------------------------------------------------------------------------

@query(
    "q02_group_count",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS count
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY count DESC, o_orderstatus, o_orderpriority
    """,
)
def q02_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return agg.group_count(t.orders, "o_orderstatus", "o_orderpriority")


# ---------------------------------------------------------------------------
# J1 + broadcast dims: star-schema result assembly (README.md:1712 shape)
# ---------------------------------------------------------------------------

@query(
    "q03_revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q03_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ords = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    reg = t.region.filter(F.col("r_name").isin("ASIA", "EUROPE"))
    df = joins.equi_join(
        t.lineitem, ords, on=[t.lineitem.l_orderkey == ords.o_orderkey], how="inner"
    )
    df = joins.equi_join(
        df, t.customer, on=[F.col("o_custkey") == F.col("c_custkey")],
        broadcast_right=True,
    )
    df = joins.equi_join(
        df, t.nation, on=[F.col("c_nationkey") == F.col("n_nationkey")],
        broadcast_right=True,
    )
    df = joins.equi_join(
        df, reg, on=[F.col("n_regionkey") == F.col("r_regionkey")],
        broadcast_right=True,
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    return (
        df.groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# A2: crosstab as explicit-vocabulary pivot (README.md:347)
# ---------------------------------------------------------------------------

@query(
    "q04_crosstab",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q04_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return agg.crosstab(t.orders, "o_orderpriority", "o_orderstatus", values=["F", "O", "P"])


# ---------------------------------------------------------------------------
# A3/A5/A6: describe() with exact decimal stats (README.md:576,1323)
# ---------------------------------------------------------------------------

def _describe_oracle_block(col: str) -> str:
    return f"""
    SELECT '{col}' AS "column",
           CAST(COUNT({col}) AS DOUBLE) AS count,
           CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col}) AS mean,
           SQRT((CAST(SUM(CAST({col} AS DECIMAL(18,2)) * CAST({col} AS DECIMAL(18,2))) AS DOUBLE)
                 - CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)
                   * CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT({col}) AS DOUBLE))
                / (CAST(COUNT({col}) AS DOUBLE) - 1.0)) AS stddev,
           CAST(MIN({col}) AS DOUBLE) AS min,
           CAST(MAX({col}) AS DOUBLE) AS max
    FROM lineitem
    """


@query(
    "q05_describe",
    oracle=" UNION ALL ".join(
        _describe_oracle_block(c) for c in ["l_discount", "l_extendedprice", "l_quantity"]
    ) + ' ORDER BY "column"',
)
def q05_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cols = ["l_discount", "l_extendedprice", "l_quantity"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).cast("double").alias(f"{c}__count"),
            exact_avg(c).alias(f"{c}__mean"),
            exact_stddev(c).alias(f"{c}__stddev"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    wide = t.lineitem.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            *[F.col(f"{c}__{s}").alias(s) for s in ["count", "mean", "stddev", "min", "max"]],
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("s")).select("s.*").orderBy("column")


# ---------------------------------------------------------------------------
# A4: distinct cardinality probe (README.md:372)
# ---------------------------------------------------------------------------

@query(
    "q06_distinct_count",
    oracle="SELECT COUNT(DISTINCT p_type) AS n_distinct, COUNT(DISTINCT p_brand) AS n_brands FROM part",
)
def q06_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.part.agg(
        F.countDistinct("p_type").alias("n_distinct"),
        F.countDistinct("p_brand").alias("n_brands"),
    )


# ---------------------------------------------------------------------------
# A7: grouped multi-avg (README.md:1153)
# ---------------------------------------------------------------------------

@query(
    "q07_grouped_avg",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q07_grouped_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.customer.groupBy("c_mktsegment")
        .agg(exact_avg("c_acctbal").alias("avg_acctbal"), F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# W: windowed top-k per group (SURVEY §2.5 extension idiom)
# ---------------------------------------------------------------------------

@query(
    "q08_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3 AND o_custkey < 100
    ORDER BY o_custkey, rn
    """,
)
def q08_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    top = windows.top_k_per_group(
        t.orders.filter(F.col("o_custkey") < 100),
        partition_by=["o_custkey"],
        order=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )
    return top.select("o_custkey", "o_orderkey", "o_totalprice", "rn").orderBy("o_custkey", "rn")


# ---------------------------------------------------------------------------
# Semi/anti joins (SURVEY §2.3 "free" family)
# ---------------------------------------------------------------------------

@query(
    "q09_semi_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q09_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    f_orders = t.orders.filter(F.col("o_orderstatus") == "F")
    got = joins.semi_join(
        t.customer, f_orders, on=[t.customer.c_custkey == f_orders.o_custkey]
    )
    return (
        got.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "q10_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    ORDER BY c_custkey
    """,
)
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    recent = t.orders.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
    out = joins.anti_join(
        t.customer, recent, on=[t.customer.c_custkey == recent.o_custkey]
    )
    return out.select("c_custkey", "c_name", "c_acctbal").orderBy("c_custkey")

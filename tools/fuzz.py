"""Differential fuzz harness over the DuckDB oracle (round-7; the
r5/r6 verdicts' #6). The q28 prefix-boundary bug and the q121
rounding bug were both found by REPLAYING a query against the oracle
after a parameter moved; this harness generalizes that: each family
below is a parameterizable (Spark operator, DuckDB SQL) template
whose BOTH sides are generated from the SAME randomized draw —
thresholds, bin edges, k, salts, band geometry — then compared
row-for-row exactly like the driver gate. Boundary/rounding logic
bugs (the class fuzzing targets) produce whole rows appearing or
vanishing, not last-ulp noise, so families whose values are floats
compare with 1e-9 relative tolerance while every row-set/count/int
comparison stays exact.

Usage:
    python tools/fuzz.py [--draws N] [--seed S] [--sf DIR] [family...]

Exit 0 iff every (family x draw) replay matches. Draws are seeded —
failures reproduce with the printed seed. The default 3 draws x 28
families runs in a few minutes at sf0.01; tests/test_fuzz.py replays
a fixed seed of the cheap families as a regression gate.
"""

from __future__ import annotations

import argparse
import math
import random
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# --------------------------------------------------------------------
# comparison (mirrors tools/compare.py / the driver gate)
# --------------------------------------------------------------------

def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def _close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def compare_frames(s_cols, s_rows, d_cols, d_rows, float_tol: bool):
    """None when equal, else a human-readable mismatch description."""
    if sorted(s_cols) != sorted(d_cols):
        return f"columns {sorted(s_cols)} vs {sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return f"row count {len(s_rows)} vs {len(d_rows)}"
    si = [s_cols.index(c) for c in sorted(s_cols)]
    di = [d_cols.index(c) for c in sorted(d_cols)]
    sk = sorted((tuple(_canon(r[i]) for i in si) for r in s_rows), key=repr)
    dk = sorted((tuple(_canon(r[i]) for i in di) for r in d_rows), key=repr)
    for a, b in zip(sk, dk):
        if a == b:
            continue
        if float_tol and len(a) == len(b) and all(
            _close(x, y) for x, y in zip(a, b)
        ):
            continue
        return f"row diff\n    spark: {a}\n    duck:  {b}"
    return None


# --------------------------------------------------------------------
# families: rng -> (params_repr, spark_fn(spark, sf_dir) -> DataFrame,
#                   duckdb_sql, float_tol)
# --------------------------------------------------------------------

_P_GRID = (0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
_VCOLS = ("l_extendedprice", "l_quantity", "l_tax")
_GCOLS = ("l_returnflag", "l_linestatus")


def fam_percentiles(rng: random.Random):
    vcol = rng.choice(_VCOLS)
    gcol = rng.choice(_GCOLS)
    ps = sorted(rng.sample(_P_GRID, rng.randint(1, 3)))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.agg import percentile_summary
        from nsl_kdd_spark.sources.parquet import load_tables

        return percentile_summary(
            load_tables(spark, sf_dir).lineitem, vcol, gcol, ps
        ).orderBy(gcol)

    cols = ",\n           ".join(
        f"quantile_cont({vcol}, {p}) AS \"p{100 * p:g}\"" for p in ps
    )
    sql = f"""
    SELECT {gcol}, {cols},
           MIN({vcol}) AS lo, MAX({vcol}) AS hi
    FROM lineitem GROUP BY {gcol} ORDER BY {gcol}
    """
    return f"vcol={vcol} gcol={gcol} ps={ps}", spark_fn, sql, True


def fam_winsorize(rng: random.Random):
    vcol = rng.choice(_VCOLS)
    gcol = rng.choice(_GCOLS)
    p_lo = rng.choice((0.01, 0.02, 0.05, 0.1))
    p_hi = rng.choice((0.9, 0.95, 0.98, 0.99))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.agg import winsorize
        from nsl_kdd_spark.sources.parquet import load_tables

        return winsorize(
            load_tables(spark, sf_dir).lineitem, vcol, gcol, p_lo, p_hi
        )

    sql = f"""
    WITH bounds AS (
      SELECT {gcol},
             quantile_cont({vcol}, {p_lo}) AS lo,
             quantile_cont({vcol}, {p_hi}) AS hi
      FROM lineitem GROUP BY {gcol}
    ), c AS (
      SELECT l.{gcol}, b.lo, b.hi,
             CASE WHEN l.{vcol} < b.lo THEN 1 ELSE 0 END AS is_lo,
             CASE WHEN l.{vcol} > b.hi THEN 1 ELSE 0 END AS is_hi,
             CAST(ROUND(LEAST(GREATEST(l.{vcol}, b.lo), b.hi)
                        * 1000000.0) AS BIGINT) AS cu
      FROM lineitem l JOIN bounds b USING ({gcol})
    )
    SELECT {gcol}, COUNT(*) AS n,
           CAST(SUM(is_lo) AS BIGINT) AS n_lo,
           CAST(SUM(is_hi) AS BIGINT) AS n_hi,
           lo, hi,
           CAST(SUM(cu) AS BIGINT) AS sum_u,
           CAST(SUM(cu) AS BIGINT) // COUNT(*) AS mean_u
    FROM c GROUP BY {gcol}, lo, hi
    ORDER BY {gcol}
    """
    return f"vcol={vcol} gcol={gcol} p=[{p_lo},{p_hi}]", spark_fn, sql, True


def fam_topk(rng: random.Random):
    k = rng.randint(1, 8)
    cap = rng.choice((50, 100, 200))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators import windows
        from nsl_kdd_spark.sources.parquet import load_tables

        t = load_tables(spark, sf_dir)
        top = windows.top_k_per_group(
            t.orders.filter(F.col("o_custkey") < cap),
            partition_by=["o_custkey"],
            order=[F.desc("o_totalprice"), F.asc("o_orderkey")],
            k=k,
        )
        return top.select(
            "o_custkey", "o_orderkey", "o_totalprice", "rn"
        ).orderBy("o_custkey", "rn")

    sql = f"""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= {k} AND o_custkey < {cap}
    ORDER BY o_custkey, rn
    """
    return f"k={k} cap={cap}", spark_fn, sql, False


def fam_histogram(rng: random.Random):
    lo = rng.choice((0.0, 500.0, 1000.0, 5000.0))
    hi = rng.choice((90000.0, 110000.0, 130000.0))
    n_bins = rng.randint(3, 16)

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.agg import histogram
        from nsl_kdd_spark.sources.parquet import load_tables

        return histogram(
            load_tables(spark, sf_dir).lineitem, "l_extendedprice",
            lo=lo, hi=hi, n_bins=n_bins,
        )

    w = (hi - lo) / n_bins
    sql = f"""
    WITH b AS (
      SELECT LEAST(GREATEST(FLOOR((l_extendedprice - {lo}) / {w!r}), 0),
                   {n_bins - 1}) AS bucket
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
           {lo} + bucket * {w!r} AS bin_lo
    FROM b GROUP BY bucket ORDER BY bucket
    """
    return f"lo={lo} hi={hi} bins={n_bins}", spark_fn, sql, True


def fam_hash_split(rng: random.Random):
    n_splits = rng.randint(2, 4)
    raw = [rng.randint(1, 10) for _ in range(n_splits)]
    total = sum(raw)
    names = [f"s{i}" for i in range(n_splits)]
    splits = list(zip(names, [float(x) for x in raw]))
    salt = rng.choice(("", "s1", "fuzz"))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators import relational
        from nsl_kdd_spark.sources.parquet import load_tables

        t = load_tables(spark, sf_dir)
        return (
            relational.hash_split(t.documents, "doc_id", splits, salt=salt)
            .groupBy("split")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("doc_id").alias("key_checksum"),
            )
            .orderBy("split")
        )

    hexpos = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5('{salt}' || "
        f"CAST(doc_id AS VARCHAR)),{i},1)) - 1) * {16 ** (4 - i)}"
        for i in range(1, 5)
    )
    # same cumulative-threshold arithmetic as relational.hash_split
    case, cum = [], 0.0
    for name, wgt in splits[:-1]:
        cum += wgt
        case.append(f"WHEN hv < {int(cum / total * 65536)} THEN '{name}'")
    case_sql = "CASE " + " ".join(case) + f" ELSE '{splits[-1][0]}' END"
    sql = f"""
    WITH h AS (SELECT doc_id, ({hexpos}) AS hv FROM documents)
    SELECT {case_sql} AS split, COUNT(*) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS key_checksum
    FROM h GROUP BY 1 ORDER BY split
    """
    return f"splits={splits} salt={salt!r}", spark_fn, sql, False


def fam_jaccard(rng: random.Random):
    threshold = rng.choice((0.5, 0.6, 0.7, 0.8, 0.9))
    n = rng.choice((2, 3, 4))
    order = rng.choice(("freq", "hash"))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.dedup import jaccard_pairs
        from nsl_kdd_spark.sources.parquet import load_tables

        return jaccard_pairs(
            load_tables(spark, sf_dir).documents, "doc_id", "text",
            n=n, threshold=threshold, order=order,
        )

    sql = f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= {n} THEN
               list_transform(generate_series(1, len(w) - {n - 1}),
                              i -> array_to_string(w[i:i+{n - 1}], ' '))
               ELSE [] END) AS s
      FROM w
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_filter(a.s, x -> list_contains(b.s, x))) AS i,
             len(a.s) AS sa, len(b.s) AS sb
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, i * 1.0 / (sa + sb - i) AS jaccard
    FROM inter
    WHERE i * 1.0 / (sa + sb - i) >= {threshold}
    ORDER BY id_a, id_b
    """
    return f"t={threshold} n={n} order={order}", spark_fn, sql, True


def fam_minhash(rng: random.Random):
    num_hashes = rng.choice((4, 8))
    band_size = rng.choice([b for b in (1, 2, 4) if b <= num_hashes])
    threshold = rng.choice((0.6, 0.7, 0.8))
    shingle_n = rng.choice((2, 3))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.dedup import minhash_lsh_pairs
        from nsl_kdd_spark.sources.parquet import load_tables

        return minhash_lsh_pairs(
            load_tables(spark, sf_dir).documents, "doc_id", "text",
            num_hashes=num_hashes, band_size=band_size,
            threshold=threshold, shingle_n=shingle_n,
        )

    # signature: 4 hashes per seeded md5 digest (_minhash_min_exprs)
    mh = []
    for j in range((num_hashes + 3) // 4):
        for k in range(min(4, num_hashes - 4 * j)):
            mh.append(
                f"min(substr(md5('{j}:' || t), {1 + 8 * k}, 8)) "
                f"AS mh{4 * j + k}"
            )
    n_bands = num_hashes // band_size
    buckets = ",\n        ".join(
        f"'{i}|' || " + " || '|' || ".join(
            f"mh{i * band_size + k}" for k in range(band_size)
        )
        for i in range(n_bands)
    )
    sql = f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= {shingle_n} THEN
               list_transform(generate_series(1, len(w) - {shingle_n - 1}),
                              i -> array_to_string(w[i:i+{shingle_n - 1}], ' '))
               ELSE [] END) AS s
      FROM w
    ), tok AS (
      SELECT doc_id, unnest(s) AS t FROM sh
    ), sig AS (
      SELECT doc_id, {', '.join(mh)}
      FROM tok GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, unnest([
        {buckets}]) AS bucket
      FROM sig
    ), cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands x JOIN bands y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
    )
    SELECT id_a, id_b,
           len(list_filter(a.s, x -> list_contains(b.s, x))) * 1.0 /
           (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x))))
             AS jaccard
    FROM cand JOIN sh a ON cand.id_a = a.doc_id
              JOIN sh b ON cand.id_b = b.doc_id
    WHERE len(list_filter(a.s, x -> list_contains(b.s, x))) * 1.0 /
          (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))) >= {threshold}
    ORDER BY id_a, id_b
    """
    return (
        f"k={num_hashes} band={band_size} t={threshold} n={shingle_n}",
        spark_fn, sql, True,
    )


def fam_simhash(rng: random.Random):
    bits = rng.choice((16, 24, 32))
    bands = rng.choice((4, 5, 8))
    max_hamming = rng.randint(1, min(bands - 1, 5))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.dedup import simhash_pairs
        from nsl_kdd_spark.sources.parquet import load_tables

        out = simhash_pairs(
            load_tables(spark, sf_dir).documents, "doc_id", "text",
            max_hamming=max_hamming, bits=bits, bands=bands,
        )
        return out.withColumn("hamming", F.col("hamming").cast("long"))

    # hv = big-endian int of the FIRST bits/4 hex chars of md5(t) —
    # the engine's _md5_bit layout (first fuzz run caught this very
    # template reading the first 8 chars for every width, which is a
    # DIFFERENT hash for bits < 32: the harness works)
    nchars = bits // 4
    hv = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(md5(t),{pos},1)) - 1 AS BIGINT)"
        f" * {16 ** (nchars - pos)}"
        for pos in range(1, nchars + 1)
    )
    bitsums = ",\n        ".join(
        f"SUM((hv // {2 ** b}) % 2) AS b{b}" for b in range(bits)
    )
    sigexpr = " + ".join(
        f"(CASE WHEN b{b} * 2 > n THEN 1 ELSE 0 END) * CAST({2 ** b} AS BIGINT)"
        for b in range(bits)
    )
    sql = f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      FROM documents
    ), h AS (
      SELECT doc_id, ({hv}) AS hv FROM tok
    ), bitsum AS (
      SELECT doc_id, COUNT(*) AS n,
        {bitsums}
      FROM h GROUP BY doc_id
    ), sig AS (
      SELECT doc_id, CAST({sigexpr} AS BIGINT) AS simhash FROM bitsum
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    ORDER BY id_a, id_b
    """
    return f"bits={bits} bands={bands} h={max_hamming}", spark_fn, sql, False


def fam_asof(rng: random.Random):
    tol = rng.choice((None, 3600, 86400, 7 * 86400))
    direction = rng.choice(("backward", "forward"))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.asof import asof_join
        from nsl_kdd_spark.sources.parquet import load_tables

        t = load_tables(spark, sf_dir)
        clicks = t.events.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        purch = t.events.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("pts"),
            F.col("value").alias("pvalue"),
        )
        out = asof_join(
            clicks, purch, key="user_id", left_ts="ts", right_ts="pts",
            right_values=["pvalue"], tolerance_seconds=tol,
            direction=direction,
        )
        return out.select(
            "event_id", "user_id",
            F.col("pvalue").alias("matched_value"), "matched_ts",
        ).orderBy("event_id")

    if direction == "backward":
        on, gap = "c.ts >= p.pts", "date_diff('second', p.pts, c.ts)"
    else:
        on, gap = "c.ts <= p.pts", "date_diff('second', c.ts, p.pts)"
    in_tol = "TRUE" if tol is None else f"{gap} <= {tol}"
    sql = f"""
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ), purch AS (
      SELECT user_id, ts AS pts, value AS pvalue
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           CASE WHEN {in_tol} THEN p.pvalue END AS matched_value,
           CASE WHEN {in_tol} THEN p.pts END AS matched_ts
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND {on}
    ORDER BY c.event_id
    """
    return f"tol={tol} dir={direction}", spark_fn, sql, True


def fam_scd2_pointtime(rng: random.Random):
    at = rng.choice((
        "2024-01-05 00:00:00", "2024-01-15 12:00:00",
        "2024-02-01 06:30:00", "2024-03-01 00:00:00",
    ))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.merge import scd2_history
        from nsl_kdd_spark.sources.parquet import load_tables

        t = load_tables(spark, sf_dir)
        at_lit = F.lit(at).cast("timestamp")
        hist = scd2_history(
            t.events, ["user_id"], "ts", ["event_type"],
            tiebreak_col="event_id",
        )
        return (
            hist.filter(
                (F.col("effective_from") <= at_lit)
                & (
                    F.col("effective_to").isNull()
                    | (F.col("effective_to") > at_lit)
                )
            )
            .select(
                "user_id",
                F.col("event_type").alias("state_at_t"),
                "effective_from",
            )
            .orderBy("user_id")
        )

    # reuse the catalog's shared SCD2 CTE so the fuzz twin can never
    # drift from the q93/q102 oracles' derivation
    from nsl_kdd_spark.plans.catalog import _scd2_history_sql

    sql = _scd2_history_sql() + f"""
    SELECT user_id, event_type AS state_at_t, effective_from
    FROM hist
    WHERE effective_from <= TIMESTAMP '{at}'
      AND (effective_to IS NULL OR effective_to > TIMESTAMP '{at}')
    ORDER BY user_id
    """
    return f"at={at}", spark_fn, sql, False


def fam_filtered_agg(rng: random.Random):
    date = rng.choice(("1995-06-30", "1996-12-31", "1997-09-01", "1998-06-01"))
    d_lo = rng.choice((0.02, 0.04, 0.06))
    d_hi = round(d_lo + rng.choice((0.01, 0.02)), 2)
    qty = rng.choice((24, 30, 40))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.functions.scalar import exact_sum
        from nsl_kdd_spark.sources.parquet import load_tables

        li = load_tables(spark, sf_dir).lineitem
        return (
            li.filter(
                (F.col("l_shipdate") <= F.lit(date).cast("timestamp"))
                & (F.col("l_discount") >= d_lo)
                & (F.col("l_discount") <= d_hi)
                & (F.col("l_quantity") < qty)
            )
            .groupBy("l_returnflag")
            .agg(
                exact_sum(
                    F.col("l_extendedprice") * F.col("l_discount"),
                    scale=6, precision=28,
                ).alias("revenue"),
                F.count(F.lit(1)).alias("n"),
            )
            .orderBy("l_returnflag")
        )

    sql = f"""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{date}'
      AND l_discount >= {d_lo} AND l_discount <= {d_hi}
      AND l_quantity < {qty}
    GROUP BY l_returnflag ORDER BY l_returnflag
    """
    return f"date={date} disc=[{d_lo},{d_hi}] qty<{qty}", spark_fn, sql, False


def fam_containment(rng: random.Random):
    threshold = rng.choice((0.5, 0.6, 0.7, 0.8))
    n = rng.choice((2, 3))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.dedup import containment_pairs
        from nsl_kdd_spark.sources.parquet import load_tables

        return containment_pairs(
            load_tables(spark, sf_dir).documents, "doc_id", "text",
            n=n, threshold=threshold,
        ).orderBy("id_a", "id_b")

    sql = f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= {n} THEN
               list_transform(generate_series(1, len(w) - {n - 1}),
                              i -> array_to_string(w[i:i+{n - 1}], ' '))
               ELSE [] END) AS s
      FROM w
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_filter(a.s, x -> list_contains(b.s, x))) AS i,
             len(a.s) AS sa, len(b.s) AS sb
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, i * 1.0 / LEAST(sa, sb) AS overlap
    FROM inter
    WHERE sa > 0 AND sb > 0 AND i * 1.0 / LEAST(sa, sb) >= {threshold}
    ORDER BY id_a, id_b
    """
    return f"t={threshold} n={n}", spark_fn, sql, True


def fam_spans(rng: random.Random):
    span_words = rng.choice((3, 4, 5, 7))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.dedup import dedup_spans
        from nsl_kdd_spark.sources.parquet import load_tables

        return dedup_spans(
            load_tables(spark, sf_dir).documents, "doc_id", "text",
            span_words=span_words, max_docs=1,
        ).orderBy("doc_id")

    s = span_words
    sql = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), spans AS (
      SELECT doc_id, t.i AS ord,
             array_to_string(w[(t.i*{s}+1):(t.i*{s}+{s})], ' ') AS span
      FROM toks,
           unnest(generate_series(0,
             CAST(ceil(len(w) / {s}.0) AS BIGINT) - 1)) AS t(i)
      WHERE len(w) > 0
    ), dup AS (
      SELECT span FROM spans GROUP BY span
      HAVING COUNT(DISTINCT doc_id) > 1
    ), flagged AS (
      SELECT s.doc_id, s.ord, s.span, d.span IS NOT NULL AS is_dup
      FROM spans s LEFT JOIN dup d USING (span)
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN NOT is_dup THEN span END,
                               ' ' ORDER BY ord), '') AS clean_text,
           CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           COUNT(*) AS n_spans
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """
    return f"span_words={span_words}", spark_fn, sql, False


def fam_hash_sample(rng: random.Random):
    fraction = rng.choice((0.1, 0.25, 0.5, 0.77))
    salt = rng.choice(("", "z", "resample2"))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.relational import sample_hash
        from nsl_kdd_spark.sources.parquet import load_tables

        return (
            sample_hash(
                load_tables(spark, sf_dir).documents, "doc_id",
                fraction=fraction, salt=salt,
            )
            .select("doc_id", "lang")
            .orderBy("doc_id")
        )

    hexpos = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5('{salt}' || "
        f"CAST(doc_id AS VARCHAR)),{i},1)) - 1) * {16 ** (4 - i)}"
        for i in range(1, 5)
    )
    sql = f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ({hexpos}) < {int(fraction * 65536)}
    ORDER BY doc_id
    """
    return f"fraction={fraction} salt={salt!r}", spark_fn, sql, False


def fam_resample(rng: random.Random):
    interval = rng.choice((900, 1800, 3600, 7200))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.functions.scalar import exact_sum
        from nsl_kdd_spark.operators.timeseries import resample_ffill
        from nsl_kdd_spark.sources.parquet import load_tables

        t = load_tables(spark, sf_dir)
        out = resample_ffill(
            t.events, "ts", ["event_type"], interval,
            aggs=[exact_sum("value").alias("total_value")],
            ffill_cols=["total_value"],
        )
        return out.select(
            "event_type", "bucket", "n_events", "total_value",
            "total_value_ffill",
        )

    sql = f"""
    WITH b AS (
      SELECT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) // {interval}) * {interval}
               AS bucket,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM b GROUP BY 1
    ), spine AS (
      SELECT event_type, unnest(generate_series(lo, hi, {interval})) AS bucket
      FROM span
    ), grid AS (
      SELECT s.event_type, s.bucket,
             COALESCE(b.n_events, 0) AS n_events, b.total_value
      FROM spine s LEFT JOIN b
        ON s.event_type = b.event_type AND s.bucket = b.bucket
    )
    SELECT event_type, bucket, n_events, total_value,
           last_value(total_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS total_value_ffill
    FROM grid ORDER BY event_type, bucket
    """
    return f"interval={interval}", spark_fn, sql, True


def fam_pack_chunks(rng: random.Random):
    budget = rng.choice((1024, 2048, 4096, 8192))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.packing import pack_chunks
        from nsl_kdd_spark.sources.parquet import load_tables

        return (
            pack_chunks(
                load_tables(spark, sf_dir).documents, "doc_id", "n_chars",
                budget=budget,
            )
            .select(
                "doc_id", "n_chars", "stream_end",
                "first_bin", "last_bin", "n_bins", "offset_in_first",
            )
            .orderBy("doc_id")
        )

    sql = f"""
    WITH c AS (
      SELECT doc_id, n_chars,
             CAST(SUM(n_chars) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS stream_end
      FROM documents
    )
    SELECT doc_id, n_chars, stream_end,
           CAST((stream_end - n_chars) // {budget} AS BIGINT) AS first_bin,
           CAST(GREATEST((stream_end - n_chars) // {budget},
                         (stream_end - 1) // {budget}) AS BIGINT) AS last_bin,
           CAST(GREATEST((stream_end - n_chars) // {budget},
                         (stream_end - 1) // {budget})
                - (stream_end - n_chars) // {budget} + 1 AS BIGINT) AS n_bins,
           CAST((stream_end - n_chars) % {budget} AS BIGINT) AS offset_in_first
    FROM c ORDER BY doc_id
    """
    return f"budget={budget}", spark_fn, sql, False


def fam_sample_exact_n(rng: random.Random):
    n = rng.choice((5, 10, 30, 100))
    salt = rng.choice(("ev1", "x", ""))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.relational import sample_exact_n
        from nsl_kdd_spark.sources.parquet import load_tables

        return (
            sample_exact_n(
                load_tables(spark, sf_dir).documents, "doc_id", "lang",
                n=n, salt=salt,
            )
            .select("doc_id", "lang")
            .orderBy("doc_id")
        )

    sql = f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('{salt}' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= {n} ORDER BY doc_id
    """
    return f"n={n} salt={salt!r}", spark_fn, sql, False


_BM25_POOL = ("spark", "vector", "stream", "merge", "window", "join",
              "data", "shuffle", "index", "batch")


def fam_bm25(rng: random.Random):
    k1 = rng.choice((0.9, 1.2, 1.5, 2.0))
    b = rng.choice((0.5, 0.75, 1.0))
    terms = tuple(sorted(rng.sample(_BM25_POOL, rng.randint(3, 6))))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.ml.text_features import bm25_scores
        from nsl_kdd_spark.sources.parquet import load_tables

        return (
            bm25_scores(
                load_tables(spark, sf_dir).documents, list(terms),
                k1=k1, b=b,
            )
            .orderBy(F.desc("bm25_u"), "doc_id")
            .limit(15)
        )

    sql = f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
      FROM documents
    ), clean AS (SELECT doc_id, token FROM toks WHERE token <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM clean GROUP BY 1),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM clean
      WHERE token IN {terms!r} GROUP BY 1, 2
    ), dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    stats AS (
      SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS total FROM dl
    ), scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               LN(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * {k1 + 1.0!r})
               / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r}
                  * CAST(dl.dl AS DOUBLE)
                  / (CAST(stats.total AS DOUBLE) / CAST(stats.n AS DOUBLE))))
               * 1000000.0) AS BIGINT) AS su
      FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(su) AS BIGINT) AS bm25_u
    FROM scored GROUP BY doc_id
    ORDER BY bm25_u DESC, doc_id LIMIT 15
    """
    return f"k1={k1} b={b} terms={terms}", spark_fn, sql, False


def fam_rolling_window(rng: random.Random):
    seconds = rng.choice((600, 1800, 3600, 14400))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from nsl_kdd_spark.functions.scalar import epoch_seconds
        from nsl_kdd_spark.sources.parquet import load_tables

        e = load_tables(spark, sf_dir).events.withColumn(
            "epoch_s", epoch_seconds("ts", "long")
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("epoch_s")
            .rangeBetween(-(seconds - 1), Window.currentRow)
        )
        return e.select(
            "event_id", "user_id", "epoch_s",
            F.count(F.lit(1)).over(w).alias("n_w"),
            F.sum(F.col("value").cast("decimal(18,2)")).over(w)
            .cast("double").alias("sum_w"),
        ).orderBy("event_id")

    sql = f"""
    WITH e AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, value
      FROM events
    )
    SELECT event_id, user_id, epoch_s,
           COUNT(*) OVER w AS n_w,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_w
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN {seconds - 1} PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """
    return f"window={seconds}s", spark_fn, sql, True


def fam_grouping_sets(rng: random.Random):
    c1, c2 = rng.sample(["o_orderstatus", "o_orderpriority"], 2)
    include_mid = rng.choice((True, False))
    sets = f"(({c1}, {c2}), ({c1}), ())" if include_mid else f"(({c1}, {c2}), ())"

    def body(grouping_fn: str, table: str) -> str:
        return f"""
        SELECT {c1}, {c2},
               CAST({grouping_fn}({c1}, {c2}) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM {table}
        GROUP BY GROUPING SETS {sets}
        ORDER BY gid, {c1} NULLS FIRST, {c2} NULLS FIRST
        """

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.sources.parquet import load_tables

        load_tables(spark, sf_dir).orders.createOrReplaceTempView(
            "orders_fuzz_gs"
        )
        return spark.sql(body("grouping_id", "orders_fuzz_gs"))

    return (
        f"cols=({c1},{c2}) mid={include_mid}",
        spark_fn, body("GROUPING", "orders"), True,
    )


def fam_decontam(rng: random.Random):
    n = rng.choice((2, 3, 4))
    min_hits = rng.choice((1, 2, 3))
    mod = rng.choice((29, 41, 53))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.decontam import overlap_pairs
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        corpus = docs.filter(F.col("doc_id") % mod != 0)
        bench = docs.filter(F.col("doc_id") % mod == 0).select(
            F.col("doc_id").alias("bench_id"), "text"
        )
        return overlap_pairs(
            corpus, bench, "doc_id", "text", "bench_id", "text",
            n=n, min_hits=min_hits,
        ).orderBy("doc_id", "bench_id")

    grams = f"""list_distinct(CASE WHEN len(w) >= {n} THEN
               list_transform(generate_series(1, len(w) - {n - 1}),
                              i -> array_to_string(w[i:i+{n - 1}], ' '))
               ELSE [] END)"""
    sql = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {mod} <> 0
    ), bench AS (
      SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % {mod} = 0
    ), cw AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM corpus
    ), cg AS (
      SELECT doc_id, unnest({grams}) AS g FROM cw
    ), bw AS (
      SELECT bench_id, string_split(text, ' ') AS w FROM bench
    ), bg AS (
      SELECT bench_id, unnest({grams}) AS g FROM bw
    )
    SELECT c.doc_id, b.bench_id, COUNT(*) AS hits
    FROM cg c JOIN bg b ON c.g = b.g
    GROUP BY c.doc_id, b.bench_id
    HAVING COUNT(*) >= {min_hits}
    ORDER BY doc_id, bench_id
    """
    return f"n={n} min_hits={min_hits} mod={mod}", spark_fn, sql, False


def fam_bloom_semi_join(rng: random.Random):
    """Bloom semi-join reduction vs a plain IN-subquery oracle: the
    two-phase plan must equal the semi join at every drawn fpp and
    dimension-filter selectivity (including fpp=0.5, where phase 2
    does nearly all the work)."""
    cut = rng.choice((350_000, 400_000, 450_000, 500_000))
    fpp = rng.choice((0.01, 0.1, 0.5))
    gcol = rng.choice(("l_returnflag", "l_linestatus"))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.bloom import bloom_semi_join
        from nsl_kdd_spark.sources.parquet import load_tables

        t = load_tables(spark, sf_dir)
        hot = t.orders.filter(F.col("o_totalprice") > cut)
        return (
            bloom_semi_join(
                t.lineitem, hot, on="l_orderkey", small_on="o_orderkey",
                fpp=fpp,
            )
            .groupBy(gcol)
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.countDistinct("l_orderkey").alias("n_orders"),
                F.sum("l_orderkey").alias("key_checksum"),
            )
            .orderBy(gcol)
        )

    sql = f"""
    SELECT {gcol},
           COUNT(*) AS n_items,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_checksum
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_totalprice > {cut}
    )
    GROUP BY {gcol}
    ORDER BY {gcol}
    """
    return f"cut={cut} fpp={fpp} gcol={gcol}", spark_fn, sql, False


def fam_hard_negatives(rng: random.Random):
    """Hard-negative mining over (k, n_queries, positive-labeling)
    draws — the exclusion must happen BEFORE the rank window so
    negatives fill dense 1..k ranks; oracle replays scoring, the
    anti-join, and the re-rank."""
    k = rng.choice((3, 5, 10))
    nq = rng.choice((3, 5))
    mod = rng.choice((7, 10, 13))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.similarity import mine_hard_negatives
        from nsl_kdd_spark.sources.parquet import load_tables

        e = load_tables(spark, sf_dir).embeddings
        queries = e.filter(F.col("vec_id") < nq)
        positives = e.select(
            (F.col("vec_id") % mod).alias("query_id"), "vec_id"
        ).filter(F.col("query_id") < nq)
        return mine_hard_negatives(e, queries, positives, k=k)

    sql = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {nq}
    ), pos AS (
      SELECT CAST(e.vec_id % {mod} AS BIGINT) AS query_id, e.vec_id
      FROM e WHERE e.vec_id % {mod} < {nq}
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.qv, e.v) AS cos_sim
      FROM e, q WHERE e.vec_id <> q.query_id
    ), neg AS (
      SELECT s.query_id, s.vec_id, s.cos_sim,
             ROW_NUMBER() OVER (PARTITION BY s.query_id
                                ORDER BY s.cos_sim DESC, s.vec_id) AS rank
      FROM scored s
      LEFT JOIN pos p ON p.query_id = s.query_id AND p.vec_id = s.vec_id
      WHERE p.vec_id IS NULL
    )
    SELECT query_id, vec_id, cos_sim, rank
    FROM neg WHERE rank <= {k}
    ORDER BY query_id, rank
    """
    return f"k={k} nq={nq} mod={mod}", spark_fn, sql, True


def fam_decontam_bloom(rng: random.Random):
    """Bloom-gated decontamination vs the PLAIN exact oracle: the
    two-phase plan must be bit-identical at every drawn fpp — even a
    deliberately dense fpp=0.5 filter, where phase 1 passes nearly
    everything and phase 2 does all the work."""
    n = rng.choice((2, 3, 4))
    min_hits = rng.choice((1, 2, 3))
    mod = rng.choice((29, 41, 53))
    fpp = rng.choice((0.01, 0.1, 0.5))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.decontam import contaminated_ids_bloom
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        corpus = docs.filter(F.col("doc_id") % mod != 0)
        bench = docs.filter(F.col("doc_id") % mod == 0)
        return contaminated_ids_bloom(
            corpus, bench, "doc_id", "text", "text",
            n=n, min_hits=min_hits, fpp=fpp,
        ).orderBy("doc_id")

    grams = f"""list_distinct(CASE WHEN len(w) >= {n} THEN
               list_transform(generate_series(1, len(w) - {n - 1}),
                              i -> array_to_string(w[i:i+{n - 1}], ' '))
               ELSE [] END)"""
    sql = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {mod} <> 0
    ), bench AS (
      SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % {mod} = 0
    ), cw AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM corpus
    ), cg AS (
      SELECT doc_id, unnest({grams}) AS g FROM cw
    ), bw AS (
      SELECT bench_id, string_split(text, ' ') AS w FROM bench
    ), bg AS (
      SELECT DISTINCT unnest({grams}) AS g FROM bw
    )
    SELECT c.doc_id, COUNT(*) AS hits
    FROM cg c JOIN bg b ON c.g = b.g
    GROUP BY c.doc_id
    HAVING COUNT(*) >= {min_hits}
    ORDER BY doc_id
    """
    return f"n={n} min_hits={min_hits} mod={mod} fpp={fpp}", spark_fn, sql, False


def fam_winnow(rng: random.Random):
    """Winnowing fingerprint selection over (k, w) draws. The oracle
    replays the rightmost-argmin as ROW_NUMBER ordered (hash ASC,
    pos DESC); hashes are 16-hex md5 prefixes in both engines, so
    selection is bit-identical — no float or boundary class at all."""
    k = rng.choice((2, 3, 4, 6))
    w = rng.choice((2, 3, 4, 8))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.winnow import winnow_fingerprints
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        return winnow_fingerprints(docs, "doc_id", "text", k=k, w=w).orderBy(
            "doc_id", "pos"
        )

    min_tokens = k + w - 1
    sql = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), grams AS (
      SELECT doc_id, t.i AS i,
             substr(md5(array_to_string(tk[t.i:t.i+{k - 1}], ' ')), 1, 16)
               AS h
      FROM toks, unnest(generate_series(1, len(tk) - {k - 1})) AS t(i)
      WHERE len(tk) >= {min_tokens}
    ), wins AS (
      SELECT doc_id, t.j AS j
      FROM toks, unnest(generate_series(1, len(tk) - {min_tokens - 1}))
             AS t(j)
      WHERE len(tk) >= {min_tokens}
    ), cand AS (
      SELECT w.doc_id, w.j, g.i, g.h,
             ROW_NUMBER() OVER (PARTITION BY w.doc_id, w.j
                                ORDER BY g.h, g.i DESC) AS rn
      FROM wins w JOIN grams g
        ON g.doc_id = w.doc_id AND g.i BETWEEN w.j AND w.j + {w - 1}
    )
    SELECT DISTINCT doc_id, CAST(i AS INTEGER) AS pos, h AS fp
    FROM cand WHERE rn = 1
    ORDER BY doc_id, pos
    """
    return f"k={k} w={w}", spark_fn, sql, False


# --------------------------------------------------------------------
# similarity / vector families (round-8; the r7 verdict's "the newest,
# least-aged code is the one family the harness skips"). Oracle
# exactness rests on two identities: n_probe = 2**n_planes probes
# every sign-LSH bucket, so the candidate set is provably all-pairs
# and the oracle needs no hash layout at all (the drawn plane count
# only changes WHICH buckets exist, never the result); and cosine
# thresholds come from a coarse grid, so no data pair sits within
# float-noise of the boundary (the boundary class the jaccard fix
# taught us to respect — here the draw varies the boundary instead
# of nudging it).
# --------------------------------------------------------------------

def fam_knn(rng: random.Random):
    k = rng.choice((3, 5, 10))
    nq = rng.choice((3, 5, 8))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.similarity import knn_bruteforce
        from nsl_kdd_spark.sources.parquet import load_tables

        t = load_tables(spark, sf_dir)
        return knn_bruteforce(
            t.embeddings, t.embeddings.filter(F.col("vec_id") < nq), k=k
        )

    sql = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {nq}
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.qv, e.v) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q.query_id
                                ORDER BY list_cosine_similarity(q.qv, e.v)
                                  DESC, e.vec_id) AS rank
      FROM e, q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim, rank
    FROM scored WHERE rank <= {k}
    ORDER BY query_id, rank
    """
    return f"k={k} nq={nq}", spark_fn, sql, True


def fam_semantic_dedup(rng: random.Random):
    n_centroids = rng.choice((4, 8, 12, 16))
    threshold = rng.choice((0.2, 0.3, 0.4, 0.5))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.similarity import semantic_dedup
        from nsl_kdd_spark.sources.parquet import load_tables

        return semantic_dedup(
            load_tables(spark, sf_dir).embeddings, "vec_id", "embedding",
            n_centroids=n_centroids, threshold=threshold,
        ).orderBy("vec_id")

    sql = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), c AS (
      SELECT v AS cv, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      FROM e ORDER BY vec_id LIMIT {n_centroids}
    ), s AS (
      SELECT e.vec_id, c.cid, list_cosine_similarity(e.v, c.cv) AS sim
      FROM e, c
    ), r AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cid) AS rn
      FROM s
    ), a AS (
      SELECT r.vec_id, CAST(r.cid AS BIGINT) AS cluster_id, e.v
      FROM r JOIN e USING (vec_id) WHERE rn = 1
    ), d AS (
      SELECT DISTINCT y.vec_id
      FROM a x JOIN a y
        ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
      WHERE list_cosine_similarity(x.v, y.v) >= {threshold}
    )
    SELECT a.vec_id, a.cluster_id, d.vec_id IS NULL AS kept
    FROM a LEFT JOIN d USING (vec_id) ORDER BY a.vec_id
    """
    return f"n_centroids={n_centroids} t={threshold}", spark_fn, sql, False


def fam_vector_registry(rng: random.Random):
    threshold = rng.choice((0.7, 0.8, 0.9, 0.95))
    n_planes = rng.choice((2, 3, 4))
    split = rng.choice((150, 250, 350))
    n_probe = 2 ** n_planes  # exact-recall identity: every bucket probed

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.functions.vector import (
            sign_bits_hex,
            to_double_array,
        )
        from nsl_kdd_spark.operators.similarity import hyperplanes
        from nsl_kdd_spark.sources.parquet import load_tables
        from nsl_kdd_spark.streaming.vector_ingest import semantic_dedup_batch

        e = load_tables(spark, sf_dir).embeddings.select(
            "vec_id", to_double_array("embedding").alias("embedding")
        )
        planes = hyperplanes(64, n_planes, 42)
        registry = e.filter(F.col("vec_id") < split).withColumn(
            "__bucket", sign_bits_hex(F.col("embedding"), planes)
        )
        b = e.filter(F.col("vec_id") >= split).alias("b")
        r = e.select(
            (F.col("vec_id") + split).alias("__bid"),
            F.col("embedding").alias("__rv"),
        )
        p = e.select(
            (F.col("vec_id") + 1).alias("__bid"),
            F.col("embedding").alias("__pv"),
        )
        batch = (
            b.join(r, F.col("b.vec_id") == F.col("__bid"), "left").drop("__bid")
            .join(p, F.col("b.vec_id") == F.col("__bid"), "left").drop("__bid")
            .select(
                "vec_id",
                F.when(F.col("vec_id") % 10 == 0, F.col("__rv"))
                .when(F.col("vec_id") % 10 == 5, F.col("__pv"))
                .otherwise(F.col("embedding"))
                .alias("embedding"),
            )
        )
        return (
            semantic_dedup_batch(
                batch, registry,
                threshold=threshold, dim=64,
                n_planes=n_planes, n_probe=n_probe, seed=42,
            )
            .select("vec_id")
            .orderBy("vec_id")
        )

    sql = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), batch AS (
      SELECT b.vec_id,
             CASE WHEN b.vec_id % 10 = 0 THEN r.v
                  WHEN b.vec_id % 10 = 5 THEN p.v
                  ELSE b.v END AS v
      FROM e b
      LEFT JOIN e r ON r.vec_id = b.vec_id - {split}
      LEFT JOIN e p ON p.vec_id = b.vec_id - 1
      WHERE b.vec_id >= {split}
    ), self_drop AS (
      SELECT DISTINCT GREATEST(a.vec_id, b.vec_id) AS vec_id
      FROM batch a JOIN batch b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= {threshold}
    ), surv AS (
      SELECT * FROM batch
      WHERE vec_id NOT IN (SELECT vec_id FROM self_drop)
    ), reg_drop AS (
      SELECT DISTINCT s.vec_id
      FROM surv s JOIN e r ON r.vec_id < {split}
      WHERE list_cosine_similarity(s.v, r.v) >= {threshold}
    )
    SELECT vec_id FROM surv
    WHERE vec_id NOT IN (SELECT vec_id FROM reg_drop)
    ORDER BY vec_id
    """
    return (
        f"t={threshold} planes={n_planes} probe={n_probe} split={split}",
        spark_fn, sql, False,
    )


def fam_winnow_registry(rng: random.Random):
    """The q151 two-tier winnow-registry dedup (round-9; the r8
    verdict's #4 — the exact analogue of fam_vector_registry for the
    4th registry ingest): within-batch MOSS pairs keep the lowest
    doc_id, then survivors sharing >= min_shared non-boilerplate
    fingerprints with any single registry doc are rejected. Draws
    move the winnow geometry (k, w), both rejection knobs
    (min_shared, max_fp_df — the boilerplate guard is applied on the
    batch side AND, recomputed from the probe-join output, on the
    registry side), and the registry/batch split. The oracle replays
    the ENGINE's exact hash layout (16-hex md5 prefix per k-gram,
    rightmost-argmin window selection — the r7 lesson: templates
    replicate the engine's layout, not an approximation of it), so
    every comparison is bit-exact row sets."""
    k = rng.choice((2, 3, 4))
    w = rng.choice((2, 3, 4))
    min_shared = rng.choice((1, 2, 3))
    max_fp_df = rng.choice((2, 5, 50))
    split = rng.choice((150, 250, 350))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.winnow import winnow_fingerprints
        from nsl_kdd_spark.sources.parquet import load_tables
        from nsl_kdd_spark.streaming.winnow_ingest import winnow_dedup_batch

        docs = load_tables(spark, sf_dir).documents
        reg_fps = winnow_fingerprints(
            docs.filter(F.col("doc_id") < split), "doc_id", "text", k=k, w=w
        ).select("doc_id", "fp").distinct()
        res = winnow_dedup_batch(
            docs.filter(F.col("doc_id") >= split), reg_fps,
            k=k, w=w, min_shared=min_shared, max_fp_df=max_fp_df,
        )
        return res.accepted.select("doc_id").orderBy("doc_id")

    min_tokens = k + w - 1
    sql = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), grams AS (
      SELECT doc_id, t.i AS i,
             substr(md5(array_to_string(tk[t.i:t.i+{k - 1}], ' ')), 1, 16)
               AS h
      FROM toks, unnest(generate_series(1, len(tk) - {k - 1})) AS t(i)
      WHERE len(tk) >= {min_tokens}
    ), wins AS (
      SELECT doc_id, t.j AS j
      FROM toks, unnest(generate_series(1, len(tk) - {min_tokens - 1}))
             AS t(j)
      WHERE len(tk) >= {min_tokens}
    ), cand AS (
      SELECT w.doc_id, w.j, g.h,
             ROW_NUMBER() OVER (PARTITION BY w.doc_id, w.j
                                ORDER BY g.h, g.i DESC) AS rn
      FROM wins w JOIN grams g
        ON g.doc_id = w.doc_id AND g.i BETWEEN w.j AND w.j + {w - 1}
    ), wfp AS (
      SELECT DISTINCT doc_id, h FROM cand WHERE rn = 1
    ), bfp AS (
      SELECT doc_id, h FROM wfp WHERE doc_id >= {split}
    ), bkeep AS (
      SELECT * FROM bfp WHERE h NOT IN (
        SELECT h FROM bfp GROUP BY h HAVING COUNT(*) > {max_fp_df})
    ), self_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bkeep a JOIN bkeep b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= {min_shared}
    ), surv AS (
      SELECT DISTINCT doc_id FROM bfp
      WHERE doc_id NOT IN (SELECT id_b FROM self_pairs)
      UNION
      SELECT doc_id FROM documents
      WHERE doc_id >= {split} AND doc_id NOT IN (SELECT doc_id FROM bfp)
    ), sfp AS (
      SELECT b.doc_id, b.h FROM bfp b JOIN surv USING (doc_id)
    ), rfp AS (
      SELECT doc_id, h FROM wfp WHERE doc_id < {split}
    ), hits AS (
      SELECT s.doc_id AS bid, r.doc_id AS rid, s.h
      FROM sfp s JOIN rfp r ON s.h = r.h
    ), rej AS (
      SELECT DISTINCT bid FROM hits
      WHERE h NOT IN (
        SELECT h FROM hits GROUP BY h HAVING COUNT(DISTINCT rid) > {max_fp_df})
      GROUP BY bid, rid HAVING COUNT(*) >= {min_shared}
    )
    SELECT doc_id FROM surv
    WHERE doc_id NOT IN (SELECT bid FROM rej)
    ORDER BY doc_id
    """
    return (
        f"k={k} w={w} min_shared={min_shared} max_fp_df={max_fp_df} "
        f"split={split}",
        spark_fn, sql, False,
    )


def fam_substr_spans(rng: random.Random):
    """Exact-substring duplicated spans (round-9; Lee et al. 2022
    ExactSubstr, operators/substr_dedup.py). Draws move the run
    length L, the keep mode (remove-all vs corpus-first-exempt) and
    — round-10, matching the de-skewed groupBy engine shape — the
    scope (any occurrence vs >= 2 distinct docs); the oracle replays
    the engine's exact layout — 16-hex md5 gram hashes, grouped
    duplicate predicate + join back, (doc_id, pos)-min exemption for
    keep="first", fixed-interval island merge — so row sets compare
    bit-exact (int positions only, no float class at all)."""
    L = rng.choice((5, 6, 8, 10))
    keep = rng.choice(("none", "first"))
    scope = rng.choice(("any", "cross_doc"))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.substr_dedup import duplicated_spans
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        return duplicated_spans(
            docs, "doc_id", "text", min_tokens=L, keep=keep, scope=scope
        ).orderBy("doc_id", "span_start")

    pred = (
        "COUNT(DISTINCT doc_id)" if scope == "cross_doc" else "COUNT(*)"
    )
    if keep == "first":
        dup = f"""dup AS (
      SELECT g.doc_id, g.pos
      FROM grams g
      JOIN (SELECT h FROM grams GROUP BY h
            HAVING {pred} >= 2) d USING (h)
      JOIN (SELECT h, doc_id AS fd, pos AS fp FROM (
              SELECT h, doc_id, pos,
                     ROW_NUMBER() OVER (PARTITION BY h
                                        ORDER BY doc_id, pos) AS rn
              FROM grams) r WHERE rn = 1) f USING (h)
      WHERE NOT (g.doc_id = f.fd AND g.pos = f.fp)
    )"""
    else:
        dup = f"""dup AS (
      SELECT g.doc_id, g.pos
      FROM grams g
      JOIN (SELECT h FROM grams GROUP BY h
            HAVING {pred} >= 2) d USING (h)
    )"""
    sql = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), grams AS (
      SELECT doc_id, t.i AS pos,
             substr(md5(array_to_string(tk[t.i:t.i+{L - 1}], ' ')), 1, 16)
               AS h
      FROM toks, unnest(generate_series(1, len(tk) - {L - 1})) AS t(i)
      WHERE len(tk) >= {L}
    ), {dup}, isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NOT NULL AND pos <= prev + {L}
                      THEN 0 ELSE 1 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM (SELECT doc_id, pos,
                   LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM dup) lagged
    )
    SELECT doc_id,
           CAST(MIN(pos) AS INTEGER) AS span_start,
           CAST(MAX(pos) + {L - 1} AS INTEGER) AS span_end,
           CAST(MAX(pos) + {L - 1} - MIN(pos) + 1 AS INTEGER)
             AS span_tokens
    FROM isl GROUP BY doc_id, island
    ORDER BY doc_id, span_start
    """
    return f"L={L} keep={keep} scope={scope}", spark_fn, sql, False


def fam_substr_report(rng: random.Random):
    """Duplicated-run report (round-9, q155's operator): draws move
    the run length L and the top-k cutoff. Tie-breaking at the
    cutoff is on the md5 gram hash — engine-portable — so the
    selected SET is identical across engines even when several runs
    share an occurrence count; text reconstructs from the first
    (doc_id, pos) occurrence in both."""
    L = rng.choice((4, 5, 6, 8))
    top_k = rng.choice((5, 10, 20, 40))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.substr_dedup import (
            duplicated_run_report,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        return duplicated_run_report(
            docs, "doc_id", "text", min_tokens=L, top_k=top_k
        )

    sql = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), grams AS (
      SELECT doc_id, t.i AS pos,
             substr(md5(array_to_string(tk[t.i:t.i+{L - 1}], ' ')), 1, 16)
               AS h
      FROM toks, unnest(generate_series(1, len(tk) - {L - 1})) AS t(i)
      WHERE len(tk) >= {L}
    ), agg AS (
      SELECT h, COUNT(*) AS n_occurrences,
             COUNT(DISTINCT doc_id) AS n_docs
      FROM grams GROUP BY h HAVING COUNT(*) >= 2
    ), rep AS (
      SELECT h, doc_id, pos FROM (
        SELECT h, doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY h
                                  ORDER BY doc_id, pos) AS rn
        FROM grams) ranked
      WHERE rn = 1
    ), top AS (
      SELECT a.h, a.n_occurrences, a.n_docs, r.doc_id, r.pos
      FROM agg a JOIN rep r USING (h)
      ORDER BY a.n_occurrences DESC, a.h LIMIT {top_k}
    )
    SELECT array_to_string(tk[t.pos:t.pos+{L - 1}], ' ') AS gram_text,
           CAST(t.n_occurrences AS BIGINT) AS n_occurrences,
           CAST(t.n_docs AS BIGINT) AS n_docs
    FROM top t JOIN toks USING (doc_id)
    ORDER BY n_occurrences DESC, gram_text
    """
    return f"L={L} top_k={top_k}", spark_fn, sql, False


def fam_linear_text(rng: random.Random):
    """fastText-style linear classifier inference (round-10 growth
    item; ml/linear_text.py). Draws move the n-gram order, the
    hashed-bucket count, the label-set size and the model seed; the
    oracle regenerates the deterministic demo model with
    demo_weights_sql (kept in-module next to the generator) and
    replays the engine's exact layout — 16-bit md5 gram buckets mod
    n_buckets, division-free n-scaled integer margins — comparing
    the FULL per-(doc, label) score table bit-exact."""
    word_ngrams = rng.choice((1, 2, 3))
    n_buckets = rng.choice((256, 1024, 4096))
    n_labels = rng.choice((2, 3, 4))
    seed = rng.randrange(100)
    labels = ("keep", "review", "spam", "toss")[:n_labels]

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.ml.linear_text import (
            demo_weights,
            linear_text_scores,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        w, b = demo_weights(
            spark, labels, n_buckets=n_buckets, seed=seed
        )
        return linear_text_scores(
            docs, "doc_id", "text", w, b,
            word_ngrams=word_ngrams, n_buckets=n_buckets,
        ).orderBy("doc_id", "label")

    from nsl_kdd_spark.ml.linear_text import demo_weights_sql
    from nsl_kdd_spark.plans.catalog import _md5_bucket_sql

    wsql, bsql = demo_weights_sql(labels, n_buckets=n_buckets, seed=seed)
    gram_sel = [
        """SELECT doc_id, tk[t.i] AS g
      FROM toks, unnest(generate_series(1, len(tk))) AS t(i)"""
    ]
    n_terms = ["len(tk)"]
    for n in range(2, word_ngrams + 1):
        gram_sel.append(
            f"""SELECT doc_id, array_to_string(tk[t.i:t.i+{n - 1}], ' ') AS g
      FROM toks, unnest(generate_series(1, len(tk) - {n - 1})) AS t(i)
      WHERE len(tk) >= {n}"""
        )
        n_terms.append(
            f"CASE WHEN len(tk) >= {n} THEN len(tk) - {n - 1} ELSE 0 END"
        )
    sql = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), grams AS (
      {" UNION ALL ".join(gram_sel)}
    ), w AS ({wsql}),
    b AS ({bsql}),
    gb AS (
      SELECT doc_id, ({_md5_bucket_sql("", "g")}) % {n_buckets} AS bucket
      FROM grams
    ), sums AS (
      SELECT gb.doc_id, w.label, SUM(w.w_u) AS sw
      FROM gb JOIN w USING (bucket) GROUP BY gb.doc_id, w.label
    ), nn AS (
      SELECT doc_id, {" + ".join(n_terms)} AS n FROM toks
    )
    SELECT nn.doc_id, b.label,
           CAST(nn.n * b.bias_u + COALESCE(s.sw, 0) AS BIGINT)
             AS margin_u
    FROM nn CROSS JOIN b
    LEFT JOIN sums s ON s.doc_id = nn.doc_id AND s.label = b.label
    ORDER BY nn.doc_id, b.label
    """
    return (
        f"ngrams={word_ngrams} buckets={n_buckets} "
        f"labels={n_labels} seed={seed}",
        spark_fn,
        sql,
        False,
    )


def fam_temperature_mixture(rng: random.Random):
    """Temperature-balanced mixture sampling (round-10;
    operators/corpus.temperature_mixture — the XLM/mT5 alpha
    -smoothing step with epoch upsampling). Draws move alpha across
    the sqrt-chain grid, the group column, the target size, the
    salt and the exact/rate remainder mode; the oracle replays the
    integer allocation (floor(n^alpha * 1e6) via IEEE sqrt chains,
    HUGEINT take math mirroring Spark's DECIMAL(38,0) div, 32-bit
    md5 remainder cut — round-11) — rows compare bit-exact, epochs
    included."""
    alpha = rng.choice((0.25, 0.5, 0.75, 1.0))
    grp = rng.choice(("lang", "source"))
    salt = rng.choice(("", "s1"))
    exact = rng.choice((False, True))
    # round-11: toggle doc-count vs token-mass weighting (the mT5/
    # XLM-R corpus-size basis); targets scale with the unit
    weighted = rng.choice((False, True))
    target = rng.choice((None, 3000, 30000) if weighted else (None, 300, 1000))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.functions.text import token_count
        from nsl_kdd_spark.operators.corpus import temperature_mixture
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        if weighted:
            docs = docs.withColumn(
                "n_tok", token_count("text").cast("long")
            )
        return (
            temperature_mixture(
                docs, grp, "doc_id", alpha=alpha,
                target_total=target, salt=salt, exact=exact,
                weight_col="n_tok" if weighted else None,
            )
            .select("doc_id", F.col(grp).alias("grp"), "epoch")
            .orderBy("doc_id", "epoch")
        )

    from nsl_kdd_spark.plans.catalog import _md5_bucket32_sql

    wexpr = {
        1.0: "n",
        0.5: "CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)",
        0.25: "CAST(FLOOR(SQRT(SQRT(CAST(n AS DOUBLE))) * 1000000.0)"
              " AS BIGINT)",
        0.75: "CAST(FLOOR(SQRT(CAST(n AS DOUBLE))"
              " * SQRT(SQRT(CAST(n AS DOUBLE))) * 1000000.0) AS BIGINT)",
    }[alpha]
    tgt = "(SELECT sn FROM tot)" if target is None else str(target)
    doc_mass = (
        "len(string_split(text, ' '))" if weighted else "1"
    )
    if exact:
        if weighted:
            # greedy prefix packing: cumulative token mass in
            # md5-digest order must fit the remainder budget
            member = """ranked AS (
      SELECT doc_id, grp,
             SUM(n_tok) OVER (PARTITION BY grp
               ORDER BY md5(CONCAT('{salt}', CAST(doc_id AS VARCHAR))),
                        doc_id
               ROWS UNBOUNDED PRECEDING) AS rk
      FROM docs
    )""".replace("{salt}", salt)
        else:
            member = """ranked AS (
      SELECT doc_id, grp,
             ROW_NUMBER() OVER (PARTITION BY grp
               ORDER BY md5(CONCAT('{salt}', CAST(doc_id AS VARCHAR))),
                        doc_id) AS rk
      FROM docs
    )""".replace("{salt}", salt)
        in_rem = "d.rk <= a2.rem"
    else:
        member = "ranked AS (SELECT doc_id, grp, 0 AS rk FROM docs)"
        in_rem = (
            f"({_md5_bucket32_sql(salt, 'd.doc_id')})"
            f" < CAST((CAST(4294967296 AS HUGEINT) * a2.rem) // a2.n"
            f" AS BIGINT)"
        )
    sql = f"""
    WITH docs AS (
      SELECT doc_id, {grp} AS grp, {doc_mass} AS n_tok FROM documents
    ), counts AS (
      SELECT grp, SUM(n_tok) AS n FROM docs GROUP BY grp
    ), w AS (
      SELECT grp, n, {wexpr} AS w FROM counts
    ), tot AS (
      SELECT SUM(w) AS sw, SUM(n) AS sn FROM w
    ), alloc AS (
      SELECT grp, n,
             CAST((CAST({tgt} AS HUGEINT) * w) // (SELECT sw FROM tot)
                  AS BIGINT) AS take
      FROM w
    ), a2 AS (
      SELECT grp, n, take // n AS ep, take % n AS rem FROM alloc
    ), {member}
    SELECT d.doc_id, d.grp, CAST(e.epoch AS BIGINT) AS epoch
    FROM ranked d
    JOIN a2 USING (grp),
    unnest(generate_series(
      1,
      CAST(a2.ep + CASE WHEN {in_rem} THEN 1 ELSE 0 END AS BIGINT)
    )) AS e(epoch)
    ORDER BY doc_id, epoch
    """
    return (
        f"alpha={alpha} grp={grp} target={target} salt={salt!r} "
        f"exact={exact} weighted={weighted}",
        spark_fn,
        sql,
        False,
    )


def fam_fim(rng: random.Random):
    """Fill-in-the-middle transform (round-10;
    operators/corpus.fim_transform, Bavarian et al. 2022). Draws
    move the FIM rate across the full range (0 = pure pass-through,
    1 = every doc), the salt (independent split-point streams) and
    the PSM/SPM serialization order; the oracle replays the 16-bit
    md5 apply cut, the 32-bit mod-(L+1) split points (round-11) and
    the token-boundary slices — strings compare bit-exact."""
    rate = rng.choice((0.0, 0.25, 0.5, 0.9, 1.0))
    salt = rng.choice(("", "s1"))
    mode = rng.choice(("psm", "spm"))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.corpus import fim_transform
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        return (
            fim_transform(
                docs, "doc_id", "text", rate=rate, salt=salt, mode=mode
            )
            .select("doc_id", "fim_applied", "text_fim")
            .orderBy("doc_id")
        )

    from nsl_kdd_spark.plans.catalog import (
        _md5_bucket32_sql,
        _md5_bucket_sql,
    )

    cut = int(rate * 65536)
    if mode == "psm":
        ser = ("['<PRE>'] || tk[1:lo] || ['<SUF>'] || tk[hi+1:L]"
               " || ['<MID>'] || tk[lo+1:hi]")
    else:
        ser = ("['<SUF>'] || tk[hi+1:L] || ['<PRE>'] || tk[1:lo]"
               " || ['<MID>'] || tk[lo+1:hi]")
    sql = f"""
    WITH toks AS (
      SELECT doc_id, text, string_split(text, ' ') AS tk
      FROM documents
    ), pos AS (
      SELECT doc_id, text, tk, len(tk) AS L,
             ({_md5_bucket32_sql(salt + "a", "doc_id")}) % (len(tk) + 1)
               AS c1,
             ({_md5_bucket32_sql(salt + "b", "doc_id")}) % (len(tk) + 1)
               AS c2,
             ({_md5_bucket_sql(salt, "doc_id")}) < {cut} AS applied
      FROM toks
    ), seg AS (
      SELECT doc_id, text, tk, L, applied,
             LEAST(c1, c2) AS lo, GREATEST(c1, c2) AS hi
      FROM pos
    )
    SELECT doc_id, applied AS fim_applied,
           CASE WHEN applied THEN array_to_string({ser}, ' ')
           ELSE text END AS text_fim
    FROM seg
    ORDER BY doc_id
    """
    return f"rate={rate} salt={salt!r} mode={mode}", spark_fn, sql, False


def fam_span_corruption(rng: random.Random):
    """T5/UL2 span corruption (round-11;
    operators/corpus.span_corruption_transform — Raffel et al. 2020
    §3.1.4). Draws move the token-corruption rate across the full
    range (0 = pass-through, 1 = whole-document mask), the mean span
    length and the salt (independent unit-selection streams); the
    oracle replays the 16-bit md5 unit cut, the window-island maximal
    runs and both sentinel serializations — strings compare
    bit-exact."""
    rate = rng.choice((0.0, 0.15, 0.3, 0.6, 1.0))
    span_len = rng.choice((1, 2, 3, 5))
    salt = rng.choice(("", "s1"))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.corpus import (
            span_corruption_transform,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        return (
            span_corruption_transform(
                docs, "doc_id", "text",
                rate=rate, span_len=span_len, salt=salt,
            )
            .select(
                "doc_id", "n_spans", "corrupted_tokens",
                "text_input", "text_target",
            )
            .orderBy("doc_id")
        )

    from nsl_kdd_spark.plans.catalog import _md5_bucket_sql

    cut = int(rate * 65536)
    ukey = (
        f"doc_id || '-' || CAST((pos - 1) // {span_len} AS VARCHAR)"
    )
    sql = f"""
    WITH toks AS (
      SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents
    ), tok AS (
      SELECT doc_id, t.i AS pos, tk[t.i] AS w
      FROM toks, unnest(generate_series(1, len(tk))) AS t(i)
    ), sel AS (
      SELECT doc_id, pos FROM tok
      WHERE {_md5_bucket_sql(salt, ukey)} < {cut}
    ), isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS island
      FROM sel
    ), spans AS (
      SELECT doc_id, MIN(pos) AS s, MAX(pos) AS e
      FROM isl GROUP BY doc_id, island
    ), ks AS (
      SELECT doc_id, s, e,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS k
      FROM spans
    ), cov AS (
      SELECT doc_id, u.p AS pos
      FROM ks, unnest(generate_series(s, e)) AS u(p)
    ), pieces AS (
      SELECT t.doc_id, t.pos, t.w AS v
      FROM tok t LEFT JOIN cov c
        ON t.doc_id = c.doc_id AND t.pos = c.pos
      WHERE c.pos IS NULL
      UNION ALL
      SELECT doc_id, s AS pos,
             '<extra_id_' || CAST(k AS VARCHAR) || '>' AS v
      FROM ks
    ), inp AS (
      SELECT doc_id, string_agg(v, ' ' ORDER BY pos) AS text_input
      FROM pieces GROUP BY doc_id
    ), tgt AS (
      SELECT ks.doc_id,
             string_agg('<extra_id_' || CAST(k AS VARCHAR) || '> ' ||
                        array_to_string(tk[s:e], ' '), ' ' ORDER BY k)
               AS body,
             COUNT(*) AS nsp, SUM(e - s + 1) AS ct
      FROM ks JOIN toks USING (doc_id) GROUP BY ks.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(t.nsp, 0) AS INTEGER) AS n_spans,
           CAST(COALESCE(t.ct, 0) AS INTEGER) AS corrupted_tokens,
           COALESCE(i.text_input, d.text) AS text_input,
           COALESCE(t.body || ' ', '')
             || '<extra_id_' || CAST(COALESCE(t.nsp, 0) AS VARCHAR) || '>'
             AS text_target
    FROM documents d
    LEFT JOIN inp i USING (doc_id)
    LEFT JOIN tgt t USING (doc_id)
    ORDER BY doc_id
    """
    return (
        f"rate={rate} span_len={span_len} salt={salt!r}",
        spark_fn,
        sql,
        False,
    )


def fam_sft_spans(rng: random.Random):
    """SFT chat-template assembly (round-11; operators/sft.py —
    completion-only loss spans). Draws move the template pieces
    (suffix/joiner), which roles are trainable, and the turn-role
    mapping; the oracle replays the rendering, the prefix-sum span
    arithmetic and the ordered string_agg digest — spans and digests
    compare bit-exact."""
    suffix = rng.choice(("<|im_end|>", "[END]", ""))
    joiner = rng.choice(("\n", " "))
    loss_roles = rng.choice((("assistant",), ("assistant", "system")))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.sft import (
            assemble_chat_text,
            render_chat_spans,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        ev = load_tables(spark, sf_dir).events
        turns = ev.select(
            F.col("user_id").alias("conv_id"),
            "event_id",
            "ts",
            F.when(F.col("event_type").isin("click", "view"), "user")
            .when(F.col("event_type") == "error", "system")
            .otherwise("assistant")
            .alias("role"),
            F.concat_ws(
                " ", "event_type", F.coalesce("props", F.lit(""))
            ).alias("content"),
        )
        spans = render_chat_spans(
            turns, "conv_id", ["ts", "event_id"],
            loss_roles=loss_roles, turn_suffix=suffix, joiner=joiner,
        )
        text = assemble_chat_text(spans, "conv_id", joiner=joiner)
        return (
            spans.join(
                text.select(
                    "conv_id", F.md5("conv_text").alias("conv_digest")
                ),
                "conv_id",
            )
            .select(
                "conv_id", "turn_idx", "seg_start", "seg_end",
                "is_loss", "loss_start", "loss_end", "conv_digest",
            )
            .orderBy("conv_id", "turn_idx")
        )

    jsql = "chr(10)" if joiner == "\n" else f"'{joiner}'"
    roles_in = ", ".join(f"'{r}'" for r in loss_roles)
    sql = f"""
    WITH turns AS (
      SELECT user_id AS conv_id, event_id, ts,
             CASE WHEN event_type IN ('click', 'view') THEN 'user'
                  WHEN event_type = 'error' THEN 'system'
                  ELSE 'assistant' END AS role,
             event_type || ' ' || COALESCE(props, '') AS content
      FROM events
    ), ordered AS (
      SELECT conv_id, role, content,
             ROW_NUMBER() OVER (PARTITION BY conv_id
                                ORDER BY ts, event_id) AS turn_idx
      FROM turns
    ), seg AS (
      SELECT *,
             '<|im_start|>' || role || chr(10) || content || '{suffix}'
               AS segment
      FROM ordered
    ), off AS (
      SELECT *,
             COALESCE(SUM(CAST(length(segment) + {len(joiner)} AS BIGINT))
               OVER (PARTITION BY conv_id ORDER BY turn_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS prior
      FROM seg
    ), txt AS (
      SELECT conv_id,
             md5(string_agg(segment, {jsql} ORDER BY turn_idx))
               AS conv_digest
      FROM seg GROUP BY conv_id
    )
    SELECT o.conv_id, CAST(o.turn_idx AS INTEGER) AS turn_idx,
           CAST(o.prior + 1 AS BIGINT) AS seg_start,
           CAST(o.prior + length(o.segment) AS BIGINT) AS seg_end,
           o.role IN ({roles_in}) AS is_loss,
           CAST(CASE WHEN o.role IN ({roles_in})
                THEN o.prior + length('<|im_start|>' || o.role) + 2
                END AS BIGINT) AS loss_start,
           CAST(CASE WHEN o.role IN ({roles_in})
                THEN o.prior + length('<|im_start|>' || o.role) + 1
                     + length(o.content) END AS BIGINT) AS loss_end,
           t.conv_digest
    FROM off o JOIN txt t USING (conv_id)
    ORDER BY o.conv_id, o.turn_idx
    """
    return (
        f"suffix={suffix!r} joiner={joiner!r} loss_roles={loss_roles}",
        spark_fn,
        sql,
        False,
    )


def fam_diversity(rng: random.Random):
    """Corpus n-gram diversity report (round-11;
    ml/text_features.ngram_diversity_report — Li et al. 2016
    distinct-n + hapax share). Draws move the gram-order set; the
    oracle replays the per-order gram counts and the integer-ppm
    ratios exactly."""
    ns = rng.choice(((1,), (2,), (1, 2), (1, 2, 3), (2, 4)))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.ml.text_features import (
            ngram_diversity_report,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        return ngram_diversity_report(docs, "text", ns=ns)

    from nsl_kdd_spark.plans.catalog import _diversity_tier_sql

    tiers = "\n      UNION ALL\n".join(
        _diversity_tier_sql(n) for n in ns
    )
    sql = f"""
    WITH tiers AS (
      {tiers}
    )
    SELECT CAST(n AS INTEGER) AS n, total_grams, distinct_grams,
           singleton_grams,
           CAST(CASE WHEN total_grams > 0
                THEN (CAST(1000000 AS HUGEINT) * distinct_grams)
                     // total_grams
                ELSE 0 END AS BIGINT) AS distinct_ppm,
           CAST(CASE WHEN total_grams > 0
                THEN (CAST(1000000 AS HUGEINT) * singleton_grams)
                     // total_grams
                ELSE 0 END AS BIGINT) AS singleton_ppm
    FROM tiers
    ORDER BY n
    """
    return f"ns={ns}", spark_fn, sql, False


def fam_k_anonymity(rng: random.Random):
    """k-anonymity (round-11; operators/privacy.k_anonymize —
    Sweeney 2002). Draws move the linkage floor k, the
    generalization bin width and the quasi-identifier set, and
    toggle audit (flag) vs the published suppression remedy; the
    oracle replays the grouped count, the join back and the k cut
    exactly."""
    k = rng.choice((2, 3, 5, 10))
    width = rng.choice((500, 1000, 2500))
    quasi = rng.choice(
        (
            ("c_nationkey", "c_mktsegment", "bal_bin"),
            ("c_mktsegment", "bal_bin"),
            ("c_nationkey", "bal_bin"),
        )
    )
    mode = rng.choice(("flag", "suppress"))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.privacy import (
            generalize_bin,
            k_anonymize,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        cust = load_tables(spark, sf_dir).customer
        qid = cust.select(
            "c_custkey", "c_nationkey", "c_mktsegment",
            generalize_bin("c_acctbal", width).alias("bal_bin"),
        )
        out = k_anonymize(qid, list(quasi), k=k, mode=mode)
        cols = ["c_custkey", "c_nationkey", "c_mktsegment", "bal_bin"]
        if mode == "flag":
            cols += ["qid_group_size", "k_anonymous"]
        return out.select(*cols).orderBy("c_custkey")

    qcols = ", ".join(quasi)
    if mode == "flag":
        sel = (
            "q.c_custkey, q.c_nationkey, q.c_mktsegment, q.bal_bin,"
            " s.qid_group_size,"
            f" s.qid_group_size >= {k} AS k_anonymous"
        )
        gate = ""
    else:
        sel = "q.c_custkey, q.c_nationkey, q.c_mktsegment, q.bal_bin"
        gate = f"WHERE s.qid_group_size >= {k}"
    sql = f"""
    WITH q AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / {width}) * {width} AS BIGINT)
               AS bal_bin
      FROM customer
    ), s AS (
      SELECT {qcols}, COUNT(*) AS qid_group_size
      FROM q GROUP BY {qcols}
    )
    SELECT {sel}
    FROM q JOIN s USING ({qcols})
    {gate}
    ORDER BY q.c_custkey
    """
    return (
        f"k={k} width={width} quasi={quasi} mode={mode}",
        spark_fn,
        sql,
        False,
    )


def fam_l_diversity(rng: random.Random):
    """l-diversity (round-11; operators/privacy.l_diversify —
    Machanavajjhala et al. 2007). Draws move the diversity floor l,
    the generalization width and audit-vs-suppress mode; the oracle
    replays the grouped distinct-sensitive count and the cut
    exactly."""
    l = rng.choice((2, 3, 4))
    width = rng.choice((1000, 2500, 5000))
    mode = rng.choice(("flag", "suppress"))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.privacy import (
            generalize_bin,
            l_diversify,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        cust = load_tables(spark, sf_dir).customer
        qid = cust.select(
            "c_custkey", "c_nationkey", "c_mktsegment",
            generalize_bin("c_acctbal", width).alias("bal_bin"),
        )
        out = l_diversify(
            qid, ["c_nationkey", "bal_bin"], "c_mktsegment",
            l=l, mode=mode,
        )
        cols = ["c_custkey", "c_nationkey", "bal_bin", "c_mktsegment"]
        if mode == "flag":
            cols += ["qid_distinct_sensitive", "l_diverse"]
        return out.select(*cols).orderBy("c_custkey")

    if mode == "flag":
        sel = (
            "q.c_custkey, q.c_nationkey, q.bal_bin, q.c_mktsegment,"
            " s.qid_distinct_sensitive,"
            f" s.qid_distinct_sensitive >= {l} AS l_diverse"
        )
        gate = ""
    else:
        sel = "q.c_custkey, q.c_nationkey, q.bal_bin, q.c_mktsegment"
        gate = f"WHERE s.qid_distinct_sensitive >= {l}"
    sql = f"""
    WITH q AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / {width}) * {width} AS BIGINT)
               AS bal_bin
      FROM customer
    ), s AS (
      SELECT c_nationkey, bal_bin,
             CAST(COUNT(DISTINCT COALESCE(c_mktsegment,
                                          chr(0) || 'null'))
                  AS BIGINT) AS qid_distinct_sensitive
      FROM q GROUP BY c_nationkey, bal_bin
    )
    SELECT {sel}
    FROM q JOIN s USING (c_nationkey, bal_bin)
    {gate}
    ORDER BY q.c_custkey
    """
    return f"l={l} width={width} mode={mode}", spark_fn, sql, False


def fam_t_closeness(rng: random.Random):
    """t-closeness (round-11; operators/privacy.t_closeness_audit —
    Li, Li & Venkatasubramanian 2007). Draws move the closeness
    floor, the generalization width and audit-vs-suppress mode; the
    oracle replays the 2nN-scaled total-variation algebra and the
    integer-ppm cut exactly."""
    t_ppm = rng.choice((100000, 300000, 600000))
    width = rng.choice((1000, 2500, 5000))
    mode = rng.choice(("flag", "suppress"))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.privacy import (
            generalize_bin,
            t_closeness_audit,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        cust = load_tables(spark, sf_dir).customer
        qid = cust.select(
            "c_custkey", "c_nationkey", "c_mktsegment",
            generalize_bin("c_acctbal", width).alias("bal_bin"),
        )
        out = t_closeness_audit(
            qid, ["c_nationkey", "bal_bin"], "c_mktsegment",
            t_ppm=t_ppm, mode=mode,
        )
        cols = ["c_custkey", "c_nationkey", "bal_bin", "c_mktsegment"]
        if mode == "flag":
            cols += ["qid_emd_ppm", "t_close"]
        return out.select(*cols).orderBy("c_custkey")

    if mode == "flag":
        sel = (
            "q.c_custkey, q.c_nationkey, q.bal_bin, q.c_mktsegment,"
            " e.qid_emd_ppm,"
            f" e.qid_emd_ppm <= {t_ppm} AS t_close"
        )
        gate = ""
    else:
        sel = "q.c_custkey, q.c_nationkey, q.bal_bin, q.c_mktsegment"
        gate = f"WHERE e.qid_emd_ppm <= {t_ppm}"
    sql = f"""
    WITH q AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / {width}) * {width} AS BIGINT)
               AS bal_bin
      FROM customer
    ), cells AS (
      SELECT c_nationkey, bal_bin,
             COALESCE(c_mktsegment, chr(0) || 'null') AS sv,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM q GROUP BY c_nationkey, bal_bin, sv
    ), gdist AS (
      SELECT sv, CAST(SUM(c) AS BIGINT) AS gc FROM cells GROUP BY sv
    ), tot AS (
      SELECT CAST(SUM(gc) AS BIGINT) AS n_tot FROM gdist
    ), sizes AS (
      SELECT c_nationkey, bal_bin, CAST(SUM(c) AS BIGINT) AS n
      FROM cells GROUP BY c_nationkey, bal_bin
    ), terms AS (
      SELECT ce.c_nationkey, ce.bal_bin,
             CAST(MAX(s.n) AS BIGINT) AS n,
             CAST(MAX(t.n_tot) AS BIGINT) AS n_tot,
             CAST(SUM(ABS(ce.c * t.n_tot - g.gc * s.n)
                      - g.gc * s.n) AS BIGINT) AS tsum
      FROM cells ce
      JOIN sizes s USING (c_nationkey, bal_bin)
      JOIN gdist g USING (sv)
      CROSS JOIN tot t
      GROUP BY ce.c_nationkey, ce.bal_bin
    ), emd AS (
      SELECT c_nationkey, bal_bin,
             CAST((CAST(1000000 AS HUGEINT) * (n * n_tot + tsum))
                  // (CAST(2 AS HUGEINT) * n * n_tot) AS BIGINT)
               AS qid_emd_ppm
      FROM terms
    )
    SELECT {sel}
    FROM q JOIN emd e USING (c_nationkey, bal_bin)
    {gate}
    ORDER BY q.c_custkey
    """
    return f"t_ppm={t_ppm} width={width} mode={mode}", spark_fn, sql, False


def fam_preference_pairs(rng: random.Random):
    """DPO preference-pair assembly (round-11;
    operators/sft.preference_pairs — Rafailov et al. 2023). Draws
    move the margin floor, the pairing strategy (max-margin
    best-worst vs the full comparison matrix) and the prompt-group
    modulus; the oracle replays the integer scoring, the lowest-id
    tie-breaks and the margin cut exactly."""
    min_margin = rng.choice((1, 50, 500))
    strategy = rng.choice(("best_worst", "all_pairs"))
    mod = rng.choice((0, 3))  # 0 = all prompts, else a subset

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.sft import preference_pairs
        from nsl_kdd_spark.sources.parquet import load_tables

        ev = load_tables(spark, sf_dir).events
        if mod:
            ev = ev.filter(F.col("user_id") % mod == 0)
        scored = ev.select(
            F.col("user_id").alias("prompt_id"),
            "event_id",
            F.concat_ws(
                " ", "event_type", F.coalesce("props", F.lit(""))
            ).alias("resp"),
            F.floor(F.col("value") * 100).cast("long").alias("score"),
        )
        return preference_pairs(
            scored, "prompt_id", "resp", "score", "event_id",
            strategy=strategy, min_margin=min_margin,
        ).orderBy("prompt_id", "chosen_id", "rejected_id")

    # NULL scores excluded by operator contract (advice r11)
    gate = "WHERE value IS NOT NULL" + (
        f" AND user_id % {mod} = 0" if mod else ""
    )
    if strategy == "best_worst":
        body = f"""
    , c AS (
      SELECT prompt_id, event_id, resp, score,
             ROW_NUMBER() OVER (PARTITION BY prompt_id
                                ORDER BY score DESC, event_id) AS rc,
             ROW_NUMBER() OVER (PARTITION BY prompt_id
                                ORDER BY score ASC, event_id) AS rr
      FROM r
    )
    SELECT a.prompt_id,
           a.event_id AS chosen_id, a.resp AS chosen,
           a.score AS chosen_score,
           b.event_id AS rejected_id, b.resp AS rejected,
           b.score AS rejected_score,
           a.score - b.score AS margin
    FROM c a JOIN c b ON a.prompt_id = b.prompt_id
    WHERE a.rc = 1 AND b.rr = 1 AND a.score - b.score >= {min_margin}
    ORDER BY a.prompt_id, chosen_id, rejected_id
    """
    else:
        body = f"""
    SELECT a.prompt_id,
           a.event_id AS chosen_id, a.resp AS chosen,
           a.score AS chosen_score,
           b.event_id AS rejected_id, b.resp AS rejected,
           b.score AS rejected_score,
           a.score - b.score AS margin
    FROM r a JOIN r b ON a.prompt_id = b.prompt_id
    WHERE a.score - b.score >= {min_margin}
    ORDER BY a.prompt_id, chosen_id, rejected_id
    """
    sql = f"""
    WITH r AS (
      SELECT user_id AS prompt_id, event_id,
             event_type || ' ' || COALESCE(props, '') AS resp,
             CAST(FLOOR(value * 100) AS BIGINT) AS score
      FROM events {gate}
    ){body}
    """
    return (
        f"min_margin={min_margin} strategy={strategy} mod={mod}",
        spark_fn,
        sql,
        False,
    )


def fam_fertility(rng: random.Random):
    """Tokenizer fertility report (round-11;
    ml/text_features.tokenizer_fertility_report — Rust et al. 2021).
    Draws move the grouping column and a doc-subset modulus; the
    oracle replays the regex token tier and the integer-ppm ratios
    exactly."""
    group = rng.choice(("lang", "source"))
    mod = rng.choice((0, 2, 5))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.ml.text_features import (
            tokenizer_fertility_report,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        if mod:
            docs = docs.filter(F.col("doc_id") % mod == 0)
        return tokenizer_fertility_report(docs, group, "text")

    gate = f"WHERE doc_id % {mod} = 0" if mod else ""
    sql = f"""
    WITH per AS (
      SELECT {group},
             len(string_split(text, ' ')) AS w,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS t,
             length(text) AS c
      FROM documents {gate}
    ), agg AS (
      SELECT {group}, COUNT(*) AS n_docs,
             CAST(SUM(w) AS BIGINT) AS n_words,
             CAST(SUM(t) AS BIGINT) AS n_tokens,
             CAST(SUM(c) AS BIGINT) AS n_chars
      FROM per GROUP BY {group}
    )
    SELECT {group}, n_docs, n_words, n_tokens, n_chars,
           CAST(CASE WHEN n_words > 0
                THEN (CAST(1000000 AS HUGEINT) * n_tokens) // n_words
                ELSE 0 END AS BIGINT) AS fertility_ppm,
           CAST(CASE WHEN n_tokens > 0
                THEN (CAST(1000000 AS HUGEINT) * n_chars) // n_tokens
                ELSE 0 END AS BIGINT) AS chars_per_token_ppm
    FROM agg
    ORDER BY {group}
    """
    return f"group={group} mod={mod}", spark_fn, sql, False


def fam_datacard(rng: random.Random):
    """Dataset data card (round-11; quality.datacard_report — Gebru
    et al. 2018 datasheets). Draws move the rollup dimension order
    and a subset modulus; the oracle replays ROLLUP + GROUPING and
    the integer-ppm densities exactly."""
    dims = rng.choice((("source", "lang"), ("lang", "source"), ("lang",)))
    mod = rng.choice((0, 2))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.quality import datacard_report
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        if mod:
            docs = docs.filter(F.col("doc_id") % mod == 0)
        return datacard_report(docs, list(dims), "text")

    gate = f"WHERE doc_id % {mod} = 0" if mod else ""
    dcols = ", ".join(dims)
    dsel = ", ".join(dims)
    nulls_order = ", ".join(f"{d} NULLS FIRST" for d in dims)
    sql = f"""
    WITH per AS (
      SELECT {dsel},
             CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
             CAST(length(text) AS BIGINT) AS c
      FROM documents {gate}
    ), agg AS (
      SELECT {dsel},
             CAST(GROUPING({dcols}) AS BIGINT) AS gid,
             COUNT(*) AS n_docs,
             CAST(SUM(t) AS BIGINT) AS n_tokens,
             CAST(SUM(c) AS BIGINT) AS n_chars,
             MIN(t) AS min_tokens,
             MAX(t) AS max_tokens
      FROM per
      GROUP BY ROLLUP ({dcols})
    )
    SELECT {dsel}, gid, n_docs, n_tokens, n_chars,
           min_tokens, max_tokens,
           CAST(CASE WHEN n_docs > 0
                THEN (CAST(1000000 AS HUGEINT) * n_tokens) // n_docs
                ELSE 0 END AS BIGINT) AS tokens_per_doc_ppm,
           CAST(CASE WHEN n_tokens > 0
                THEN (CAST(1000000 AS HUGEINT) * n_chars) // n_tokens
                ELSE 0 END AS BIGINT) AS chars_per_token_ppm
    FROM agg
    ORDER BY gid, {nulls_order}
    """
    return f"dims={dims} mod={mod}", spark_fn, sql, False


def fam_denoiser_mix(rng: random.Random):
    """UL2 mixture of denoisers (round-11;
    corpus.mixture_of_denoisers — Tay et al. 2022). Draws move the
    R/X/S route weights, the R and X (rate, span_len) points and the
    salt; the oracle replays the route cut, the routed per-position
    selection, the islands and both serializations — strings compare
    bit-exact."""
    weights = rng.choice(((0.5, 0.25, 0.25), (1.0, 0.0, 0.0),
                          (0.0, 0.0, 1.0), (0.34, 0.33, 0.33)))
    r_cfg = rng.choice(((0.15, 3), (0.3, 2)))
    x_cfg = rng.choice(((0.5, 8), (0.6, 4)))
    salt = rng.choice(("", "mz"))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.corpus import mixture_of_denoisers
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        return (
            mixture_of_denoisers(
                docs, "doc_id", "text", salt=salt,
                r_denoiser=r_cfg, x_denoiser=x_cfg, weights=weights,
            )
            .select(
                "doc_id", "denoiser", "n_spans", "corrupted_tokens",
                "text_input", "text_target",
            )
            .orderBy("doc_id")
        )

    from nsl_kdd_spark.plans.catalog import (
        _md5_bucket32_sql,
        _md5_bucket_sql,
    )

    total = sum(weights)
    cut_r = int(weights[0] / total * 65536)
    cut_rx = int((weights[0] + weights[1]) / total * 65536)
    route = _md5_bucket_sql(salt + "route", "doc_id")
    sel_r = _md5_bucket_sql(
        salt + "u",
        f"t.doc_id || '-' || CAST((t.pos - 1) // {r_cfg[1]} AS VARCHAR)",
    )
    sel_x = _md5_bucket_sql(
        salt + "u",
        f"t.doc_id || '-' || CAST((t.pos - 1) // {x_cfg[1]} AS VARCHAR)",
    )
    sql = f"""
    WITH toks AS (
      SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents
    ), routed AS (
      SELECT doc_id, text, tk,
             CASE WHEN {route} < {cut_r} THEN 'R'
                  WHEN {route} < {cut_rx} THEN 'X'
                  ELSE 'S' END AS denoiser,
             ({_md5_bucket32_sql(salt + "s", "doc_id")}) % (len(tk) + 1)
               AS s_cut
      FROM toks
    ), tok AS (
      SELECT doc_id, t.i AS pos, tk[t.i] AS w
      FROM toks, unnest(generate_series(1, len(tk))) AS t(i)
    ), sel AS (
      SELECT t.doc_id, t.pos
      FROM tok t JOIN routed r USING (doc_id)
      WHERE (r.denoiser = 'S' AND t.pos > r.s_cut)
         OR (r.denoiser = 'R' AND {sel_r} < {int(r_cfg[0] * 65536)})
         OR (r.denoiser = 'X' AND {sel_x} < {int(x_cfg[0] * 65536)})
    ), isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS island
      FROM sel
    ), spans AS (
      SELECT doc_id, MIN(pos) AS s, MAX(pos) AS e
      FROM isl GROUP BY doc_id, island
    ), ks AS (
      SELECT doc_id, s, e,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS k
      FROM spans
    ), cov AS (
      SELECT doc_id, u.p AS pos
      FROM ks, unnest(generate_series(s, e)) AS u(p)
    ), pieces AS (
      SELECT t.doc_id, t.pos, t.w AS v
      FROM tok t LEFT JOIN cov c
        ON t.doc_id = c.doc_id AND t.pos = c.pos
      WHERE c.pos IS NULL
      UNION ALL
      SELECT doc_id, s AS pos,
             '<extra_id_' || CAST(k AS VARCHAR) || '>' AS v
      FROM ks
    ), inp AS (
      SELECT doc_id, string_agg(v, ' ' ORDER BY pos) AS text_input
      FROM pieces GROUP BY doc_id
    ), tgt AS (
      SELECT ks.doc_id,
             string_agg('<extra_id_' || CAST(k AS VARCHAR) || '> ' ||
                        array_to_string(tk[s:e], ' '), ' ' ORDER BY k)
               AS body,
             COUNT(*) AS nsp, SUM(e - s + 1) AS ct
      FROM ks JOIN toks USING (doc_id) GROUP BY ks.doc_id
    )
    SELECT d.doc_id, r.denoiser,
           CAST(COALESCE(t.nsp, 0) AS INTEGER) AS n_spans,
           CAST(COALESCE(t.ct, 0) AS INTEGER) AS corrupted_tokens,
           COALESCE(i.text_input, d.text) AS text_input,
           COALESCE(t.body || ' ', '')
             || '<extra_id_' || CAST(COALESCE(t.nsp, 0) AS VARCHAR) || '>'
             AS text_target
    FROM documents d
    JOIN routed r USING (doc_id)
    LEFT JOIN inp i USING (doc_id)
    LEFT JOIN tgt t USING (doc_id)
    ORDER BY d.doc_id
    """
    return (
        f"weights={weights} r={r_cfg} x={x_cfg} salt={salt!r}",
        spark_fn,
        sql,
        False,
    )


def fam_decontam_spans(rng: random.Random):
    """Window-level decontamination (round-10;
    decontam.decontaminate_spans — GPT-3 Appendix C's strip-the
    -region remedy). Draws move the gram order n, the expansion
    window and the corpus/benchmark split modulus; the oracle
    replays gram text matching, the fixed-gap (n + 2*window) island
    merge, clamped span expansion and the token-coverage strip —
    cleaned text compares bit-exact."""
    n = rng.choice((2, 3, 4))
    window = rng.choice((0, 1, 2, 5))
    mod = rng.choice((41, 53, 29))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.decontam import decontaminate_spans
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        return decontaminate_spans(
            docs.filter(F.col("doc_id") % mod != 0),
            docs.filter(F.col("doc_id") % mod == 0),
            "doc_id", "text", "text", n=n, window=window,
        ).orderBy("doc_id")

    gap = n + 2 * window
    sql = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {mod} <> 0
    ), toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM corpus
    ), cg AS (
      SELECT doc_id, len(tk) AS L, t.i AS pos,
             array_to_string(tk[t.i:t.i+{n - 1}], ' ') AS g
      FROM toks, unnest(generate_series(1, len(tk) - {n - 1})) AS t(i)
      WHERE len(tk) >= {n}
    ), bg AS (
      SELECT DISTINCT array_to_string(btk[t.i:t.i+{n - 1}], ' ') AS g
      FROM (SELECT string_split(text, ' ') AS btk FROM documents
            WHERE doc_id % {mod} = 0) b,
           unnest(generate_series(1, len(btk) - {n - 1})) AS t(i)
      WHERE len(btk) >= {n}
    ), hits AS (
      SELECT DISTINCT doc_id, L, pos FROM cg JOIN bg USING (g)
    ), isl AS (
      SELECT doc_id, L, pos,
             SUM(CASE WHEN prev IS NOT NULL AND pos <= prev + {gap}
                      THEN 0 ELSE 1 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM (SELECT doc_id, L, pos,
                   LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                     AS prev
            FROM hits) lagged
    ), spans AS (
      SELECT doc_id,
             GREATEST(MIN(pos) - {window}, 1) AS s,
             LEAST(MAX(pos) + {n - 1} + {window}, MAX(L)) AS e
      FROM isl GROUP BY doc_id, island
    ), cov AS (
      SELECT DISTINCT doc_id, u.p AS pos
      FROM spans, unnest(generate_series(s, e)) AS u(p)
    ), tok AS (
      SELECT doc_id, t.i AS pos, tk[t.i] AS w
      FROM toks, unnest(generate_series(1, len(tk))) AS t(i)
    ), kept AS (
      SELECT t.doc_id, t.pos, t.w
      FROM tok t LEFT JOIN cov c
        ON t.doc_id = c.doc_id AND t.pos = c.pos
      WHERE c.pos IS NULL
    ), agg AS (
      SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS txt,
             COUNT(*) AS nk
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.txt, '') AS text_clean,
           CAST(len(string_split(d.text, ' ')) - COALESCE(a.nk, 0)
                AS INTEGER) AS removed_tokens
    FROM corpus d LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
    """
    return f"n={n} window={window} mod={mod}", spark_fn, sql, False


def fam_gopher(rng: random.Random):
    """Gopher document-quality rules (round-11; operators/gopher.py —
    Rae et al. 2021 table A1's non-repetition half). Draws move the
    word-count bounds, the mean-word-length bounds, the stop-hit
    floor and the stop list; newline/bullet/ellipsis injection makes
    every rule discriminate on the single-line fixture. Counters,
    per-rule verdicts and the conjunction compare bit-exact (integer
    cross-multiplied ratios — no float division)."""
    min_words, max_words = rng.choice(((30, 100000), (50, 100000), (50, 60)))
    min_len, max_len = rng.choice(((3, 10), (2, 8), (4, 10)))
    min_hits = rng.choice((1, 2))
    stops = rng.choice((("the", "a", "key"), ("the", "data", "row", "a")))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.gopher import gopher_quality_stats
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents.select(
            "doc_id",
            F.replace(
                F.replace(F.col("text"), F.lit(" line "), F.lit("\n- ")),
                F.lit(" slow "),
                F.lit("...\n"),
            ).alias("text"),
        )
        return gopher_quality_stats(
            docs, "doc_id", "text",
            min_words=min_words, max_words=max_words,
            min_mean_word_len=min_len, max_mean_word_len=max_len,
            min_stop_hits=min_hits, stopwords=stops,
        ).orderBy("doc_id")

    stop_sum = " + ".join(
        f"CAST(list_contains(tk, '{w}') AS BIGINT)" for w in stops
    )
    sql = f"""
    WITH prep AS (
      SELECT doc_id,
             replace(replace(text, ' line ', chr(10) || '- '),
                     ' slow ', '...' || chr(10)) AS text
      FROM documents
    ), c AS (
      SELECT doc_id,
             string_split(text, ' ') AS tk,
             string_split(text, chr(10)) AS ln,
             len(text) - len(replace(text, '#', '')) AS hash_count,
             (len(text) - len(replace(text, '...', ''))) // 3
               AS ellipsis_count
      FROM prep
    ), cnt AS (
      SELECT doc_id,
             CAST(len(tk) AS BIGINT) AS n_words,
             CAST(len(ln) AS BIGINT) AS n_lines,
             CAST(COALESCE(list_aggregate(
               list_transform(tk, t -> len(t)), 'sum'), 0) AS BIGINT)
               AS n_chars_in_words,
             CAST(hash_count AS BIGINT) AS hash_count,
             CAST(ellipsis_count AS BIGINT) AS ellipsis_count,
             CAST(len(list_filter(ln,
               l -> starts_with(l, '- ') OR starts_with(l, '* ')
                    OR starts_with(l, '•'))) AS BIGINT) AS bullet_lines,
             CAST(len(list_filter(ln, l -> ends_with(l, '...')))
               AS BIGINT) AS ellipsis_lines,
             CAST(len(list_filter(tk,
               t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)
               AS alpha_words,
             CAST({stop_sum} AS BIGINT) AS stop_hits
      FROM c
    ), rules AS (
      SELECT *,
             n_words >= {min_words} AND n_words <= {max_words}
               AS r_word_count,
             {min_len} * n_words <= n_chars_in_words
               AND n_chars_in_words <= {max_len} * n_words
               AS r_mean_word_len,
             10 * hash_count <= n_words AS r_hash_ratio,
             10 * ellipsis_count <= n_words AS r_ellipsis_ratio,
             10 * bullet_lines <= 9 * n_lines AS r_bullet_lines,
             10 * ellipsis_lines <= 3 * n_lines AS r_ellipsis_lines,
             5 * alpha_words >= 4 * n_words AS r_alpha_words,
             stop_hits >= {min_hits} AS r_stopwords
      FROM cnt
    )
    SELECT *,
           r_word_count AND r_mean_word_len AND r_hash_ratio
             AND r_ellipsis_ratio AND r_bullet_lines
             AND r_ellipsis_lines AND r_alpha_words AND r_stopwords
             AS gopher_pass
    FROM rules
    ORDER BY doc_id
    """
    return (
        f"words=({min_words},{max_words}) len=({min_len},{max_len}) "
        f"hits={min_hits} stops={len(stops)}",
        spark_fn,
        sql,
        False,
    )


def fam_c4(rng: random.Random):
    """C4 line-level cleaning (round-11; operators/c4.py — Raffel et
    al. 2020 §2.2). Draws move the per-line word floor and the
    retained-line page floor; punctuation/javascript/brace injection
    makes every rule discriminate. Cleaned text, line counts and
    page verdicts compare bit-exact."""
    min_wpl = rng.choice((3, 5, 8))
    min_lines = rng.choice((1, 2, 3))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.c4 import c4_clean
        from nsl_kdd_spark.sources.parquet import load_tables

        text = F.col("text")
        for old, new in (
            (" fast ", ".\n"),
            (" big ", "?\n"),
            (" spark ", " javascript "),
            (" merge ", " { "),
        ):
            text = F.replace(text, F.lit(old), F.lit(new))
        docs = load_tables(spark, sf_dir).documents.select(
            "doc_id", text.alias("text")
        )
        return c4_clean(
            docs, "doc_id", "text",
            min_words_per_line=min_wpl, min_lines=min_lines,
        ).orderBy("doc_id")

    sql = f"""
    WITH prep AS (
      SELECT doc_id,
             replace(replace(replace(replace(text,
               ' fast ', '.' || chr(10)),
               ' big ', '?' || chr(10)),
               ' spark ', ' javascript '),
               ' merge ', ' {{ ') AS text
      FROM documents
    ), c AS (
      SELECT doc_id, text,
             list_filter(string_split(text, chr(10)),
               l -> (ends_with(l, '.') OR ends_with(l, '!')
                     OR ends_with(l, '?') OR ends_with(l, '"'))
                    AND len(string_split(l, ' ')) >= {min_wpl}
                    AND NOT contains(lower(l), 'javascript'))
               AS kept,
             NOT contains(lower(text), 'lorem ipsum')
               AND NOT contains(lower(text), '{{') AS page_ok
      FROM prep
    )
    SELECT doc_id,
           COALESCE(array_to_string(kept, chr(10)), '') AS text_clean,
           CAST(len(kept) AS BIGINT) AS n_lines_kept,
           page_ok,
           page_ok AND len(kept) >= {min_lines} AS c4_keep
    FROM c
    ORDER BY doc_id
    """
    return (
        f"min_wpl={min_wpl} min_lines={min_lines}",
        spark_fn,
        sql,
        False,
    )


def fam_contamination(rng: random.Random):
    """Per-doc contamination report (round-11;
    decontam.contamination_report — GPT-3 App C dirty/clean
    accounting). Draws move the gram order, the verdict threshold
    and the corpus/benchmark split; totals, hit counts, integer-ppm
    ratios and verdicts compare bit-exact (engine joins on xxhash64,
    oracle on gram text — the decontam convention)."""
    n = rng.choice((2, 3, 4))
    min_hits = rng.choice((1, 2, 3))
    mod = rng.choice((29, 41, 53))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.decontam import contamination_report
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        return contamination_report(
            docs.filter(F.col("doc_id") % mod != 0),
            docs.filter(F.col("doc_id") % mod == 0),
            "doc_id", "text", "doc_id", "text", n=n, min_hits=min_hits,
        ).orderBy("doc_id")

    sql = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {mod} <> 0
    ), cg AS (
      SELECT DISTINCT doc_id,
             array_to_string(tk[t.i:t.i+{n - 1}], ' ') AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
           unnest(generate_series(1, len(tk) - {n - 1})) AS t(i)
      WHERE len(tk) >= {n}
    ), bg AS (
      SELECT DISTINCT array_to_string(btk[t.i:t.i+{n - 1}], ' ') AS g
      FROM (SELECT string_split(text, ' ') AS btk FROM documents
            WHERE doc_id % {mod} = 0) b,
           unnest(generate_series(1, len(btk) - {n - 1})) AS t(i)
      WHERE len(btk) >= {n}
    ), totals AS (
      SELECT doc_id, COUNT(*) AS n_grams FROM cg GROUP BY doc_id
    ), hits AS (
      SELECT doc_id, COUNT(*) AS hit_grams
      FROM cg JOIN bg USING (g) GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(COALESCE(t.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.hit_grams, 0) AS BIGINT) AS hit_grams,
           CAST(CASE WHEN COALESCE(t.n_grams, 0) > 0 THEN
                  (COALESCE(h.hit_grams, 0) * 1000000) // t.n_grams
                ELSE 0 END AS BIGINT) AS hit_ppm,
           COALESCE(h.hit_grams, 0) >= {min_hits} AS contaminated
    FROM corpus c
    LEFT JOIN totals t USING (doc_id)
    LEFT JOIN hits h USING (doc_id)
    ORDER BY c.doc_id
    """
    return f"n={n} min_hits={min_hits} mod={mod}", spark_fn, sql, False


def fam_grouped_bins(rng: random.Random):
    """Per-group equal-count rank bins (round-11;
    relational.grouped_rank_bins — the CCNet head/middle/tail
    partitioner without per-group windows). Draws move the group
    column, the bin count and the score definition; per-group ranks
    and bins compare bit-exact against a plain per-group ROW_NUMBER
    replay."""
    grp = rng.choice(("lang", "source"))
    n_bins = rng.choice((2, 3, 4, 5))
    score = rng.choice(("tokens", "length"))
    # NULL-group leg (round-12 verdict #1): a slice of rows gets a
    # NULL group key — the NULL group must rank/bin like any other,
    # not drop out of the offsets join back.
    null_cut = rng.choice((0, 6553, 19660))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.functions.text import token_count
        from nsl_kdd_spark.operators.relational import (
            grouped_rank_bins,
            md5_bucket16,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        sc = (
            token_count("text").cast("long") if score == "tokens"
            else F.length("text").cast("long")
        )
        gcol = (
            F.when(
                md5_bucket16("doc_id", "nullg") < null_cut, F.lit(None)
            ).otherwise(F.col(grp))
            if null_cut
            else F.col(grp)
        )
        scored = docs.select(
            "doc_id", gcol.alias("grp"), sc.alias("score")
        )
        return (
            grouped_rank_bins(
                scored, "grp", "score", "doc_id", n_bins=n_bins
            )
            .select("doc_id", "grp", "score", "group_rank", "bin")
            .orderBy("doc_id")
        )

    from nsl_kdd_spark.plans.catalog import _md5_bucket_sql

    sexpr = (
        "len(string_split(text, ' '))" if score == "tokens"
        else "len(text)"
    )
    gexpr = (
        f"CASE WHEN {_md5_bucket_sql('nullg', 'doc_id')} < {null_cut}"
        f" THEN NULL ELSE {grp} END"
        if null_cut
        else grp
    )
    sql = f"""
    WITH scored AS (
      SELECT doc_id, {gexpr} AS grp, CAST({sexpr} AS BIGINT) AS score
      FROM documents
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY grp
                                ORDER BY score, doc_id) AS group_rank,
             COUNT(*) OVER (PARTITION BY grp) AS ng
      FROM scored
    )
    SELECT doc_id, grp, score,
           CAST(group_rank AS BIGINT) AS group_rank,
           CAST(LEAST(((group_rank - 1) * {n_bins}) // ng,
                      {n_bins - 1}) AS INTEGER) AS bin
    FROM ranked
    ORDER BY doc_id
    """
    return (
        f"grp={grp} n_bins={n_bins} score={score} null_cut={null_cut}",
        spark_fn,
        sql,
        False,
    )


def fam_dsir(rng: random.Random):
    """DSIR importance resampling (round-11; ml/dsir.py — Xie et al.
    2023 hashed-n-gram importance weights + deterministic log-space
    hash acceptance). Draws move the n-gram order, the bucket count,
    the acceptance temperature tau, the selection salt and the
    target/raw split modulus; the oracle replays the micro-nat
    -quantized Laplace log-ratios, the margin sum and the ln(u)
    acceptance — selected rows + scores compare bit-exact. Also
    asserts the _lu_u libm guard band (verdict r11): ln() is not
    correctly rounded in IEEE, so the acceptance draw is the one
    place where cross-engine exactness rests on libm agreement
    rather than integer construction — every raw row's 1e6*ln(u)
    must sit > 1e-6 away from the nearest round() half-boundary
    (a 1-ulp JVM/DuckDB divergence is ~2e-9), making a silent
    acceptance flip a loud failure here instead of a hash
    mismatch."""
    ngrams = rng.choice((1, 2))
    buckets = rng.choice((512, 4096))
    tau = rng.choice((0, -30_000_000, -45_000_000))
    salt = rng.choice(("", "s1"))
    mod = rng.choice((5, 7, 11))

    def spark_fn(spark, sf_dir):
        import duckdb

        from pyspark.sql import functions as F

        from nsl_kdd_spark.ml.dsir import dsir_select, dsir_weights
        from nsl_kdd_spark.plans.catalog import _md5_bucket32_sql
        from nsl_kdd_spark.sources.parquet import load_tables

        # hold the connection: duckdb relations are lazy and the
        # anonymous connection would be GC'd before fetchone()
        gcon = duckdb.connect()
        guard = gcon.sql(f"""
            SELECT MIN(ABS(x - FLOOR(x) - 0.5)) AS d FROM (
              SELECT ln(({_md5_bucket32_sql(salt, "doc_id")} + 1)
                        / 4294967296.0) * 1000000.0 AS x
              FROM '{sf_dir}/documents.parquet'
              WHERE doc_id % {mod} <> 0
            )
        """).fetchone()[0]
        gcon.close()
        assert guard is None or guard > 1e-6, (
            f"_lu_u half-boundary guard band violated: a drawn row's"
            f" 1e6*ln(u) sits {guard} from a round() boundary —"
            f" cross-engine acceptance may silently diverge"
        )

        docs = load_tables(spark, sf_dir).documents
        target = docs.filter(F.col("doc_id") % mod == 0)
        raw = docs.filter(F.col("doc_id") % mod != 0)
        w, b = dsir_weights(
            target, raw, "text", word_ngrams=ngrams, n_buckets=buckets
        )
        return (
            dsir_select(
                raw, "doc_id", "text", w, b, tau_u=tau, salt=salt,
                word_ngrams=ngrams, n_buckets=buckets,
            )
            .select("doc_id", "log_w_u")
            .orderBy("doc_id")
        )

    from nsl_kdd_spark.plans.catalog import (
        _md5_bucket32_sql,
        _md5_bucket_sql,
    )

    bucket = _md5_bucket_sql("", "g")
    lnu = "CAST(round(ln({x}) * 1000000.0) AS BIGINT)"
    bigram_t = (
        """UNION ALL
      SELECT array_to_string(tk[t.i:t.i+1], ' ') AS g
      FROM ttoks, unnest(generate_series(1, len(tk) - 1)) AS t(i)
      WHERE len(tk) >= 2"""
        if ngrams == 2 else ""
    )
    bigram_r = (
        """UNION ALL
      SELECT doc_id, array_to_string(tk[t.i:t.i+1], ' ') AS g
      FROM rtoks, unnest(generate_series(1, len(tk) - 1)) AS t(i)
      WHERE len(tk) >= 2"""
        if ngrams == 2 else ""
    )
    nexpr = (
        "len(tk) + CASE WHEN len(tk) >= 2 THEN len(tk) - 1 ELSE 0 END"
        if ngrams == 2 else "len(tk)"
    )
    sql = f"""
    WITH raw AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {mod} <> 0
    ), ttoks AS (
      SELECT string_split(text, ' ') AS tk FROM documents
      WHERE doc_id % {mod} = 0
    ), tgrams AS (
      SELECT tk[t.i] AS g
      FROM ttoks, unnest(generate_series(1, len(tk))) AS t(i)
      {bigram_t}
    ), tcnt AS (
      SELECT ({bucket}) % {buckets} AS bucket, COUNT(*) AS c
      FROM tgrams GROUP BY 1
    ), rtoks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM raw
    ), rgrams AS (
      SELECT doc_id, tk[t.i] AS g
      FROM rtoks, unnest(generate_series(1, len(tk))) AS t(i)
      {bigram_r}
    ), rb AS (
      SELECT doc_id, ({bucket}) % {buckets} AS bucket FROM rgrams
    ), rcnt AS (
      SELECT bucket, COUNT(*) AS c FROM rb GROUP BY bucket
    ), w AS (
      SELECT COALESCE(t.bucket, r.bucket) AS bucket,
             {lnu.format(x="COALESCE(t.c, 0) + 1")}
               - {lnu.format(x="COALESCE(r.c, 0) + 1")} AS w_u
      FROM tcnt t FULL JOIN rcnt r ON t.bucket = r.bucket
    ), tot AS (
      SELECT (SELECT COALESCE(SUM(c), 0) FROM tcnt) AS T,
             (SELECT COALESCE(SUM(c), 0) FROM rcnt) AS R
    ), b AS (
      SELECT {lnu.format(x='R + ' + str(buckets))}
               - {lnu.format(x='T + ' + str(buckets))} AS bias_u
      FROM tot
    ), sums AS (
      SELECT rb.doc_id, SUM(w.w_u) AS sw
      FROM rb JOIN w USING (bucket) GROUP BY rb.doc_id
    ), nn AS (
      SELECT doc_id, {nexpr} AS n FROM rtoks
    ), imp AS (
      SELECT nn.doc_id,
             CAST(nn.n * (SELECT bias_u FROM b)
                  + COALESCE(s.sw, 0) AS BIGINT) AS log_w_u
      FROM nn LEFT JOIN sums s USING (doc_id)
    )
    SELECT r.doc_id, imp.log_w_u
    FROM raw r JOIN imp USING (doc_id)
    WHERE CAST(round(ln(({_md5_bucket32_sql(salt, "r.doc_id")} + 1)
                        / 4294967296.0) * 1000000.0) AS BIGINT)
          < imp.log_w_u - ({tau})
    ORDER BY r.doc_id
    """
    return (
        f"ngrams={ngrams} buckets={buckets} tau={tau} salt={salt!r} "
        f"mod={mod}",
        spark_fn,
        sql,
        False,
    )


def fam_cross_source_dups(rng: random.Random):
    """Cross-source duplicate-leakage matrix (round-12;
    dedup.cross_source_dup_matrix). Draws move the dedup-key prefix
    length (how aggressively heads collide) and the doc subset; the
    oracle replays the (hash, source) cells, the diagonal and the
    pair join."""
    L = rng.choice((15, 30, 60))
    mod = rng.choice((0, 2))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.dedup import (
            cross_source_dup_matrix,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        if mod:
            docs = docs.filter(F.col("doc_id") % mod == 0)
        docs = docs.withColumn("head", F.substring("text", 1, L))
        return cross_source_dup_matrix(docs, "source", "head").orderBy(
            "source_a", "source_b"
        )

    gate = f"WHERE doc_id % {mod} = 0" if mod else ""
    sql = f"""
    WITH cells AS (
      SELECT md5(substr(text, 1, {L})) AS h,
             COALESCE(CAST(source AS VARCHAR), chr(0) || 'null') AS src,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM documents {gate} GROUP BY h, src
    ), diag AS (
      SELECT src AS source_a, src AS source_b,
             CAST(COUNT(*) AS BIGINT) AS dup_groups,
             CAST(SUM(c) AS BIGINT) AS dup_docs
      FROM cells WHERE c >= 2 GROUP BY src
    ), off AS (
      SELECT a.src AS source_a, b.src AS source_b,
             CAST(COUNT(*) AS BIGINT) AS dup_groups,
             CAST(SUM(a.c + b.c) AS BIGINT) AS dup_docs
      FROM cells a JOIN cells b ON a.h = b.h AND a.src < b.src
      GROUP BY a.src, b.src
    )
    SELECT source_a, source_b, dup_groups, dup_docs FROM diag
    UNION ALL
    SELECT source_a, source_b, dup_groups, dup_docs FROM off
    ORDER BY source_a, source_b
    """
    return f"L={L} mod={mod}", spark_fn, sql, False


def fam_threshold_sweep(rng: random.Random):
    """Filter-threshold sweep (round-12;
    quality.threshold_sweep_report). Draws move the cutoff set
    (incl. never/always-passing extremes) and the doc-count vs
    token-weighted basis; the oracle replays the one-pass
    conditional counters and ppm algebra per threshold."""
    ts = rng.choice(
        ((100, 300, 500, 800), (0, 650), (200, 400, 10_000))
    )
    weighted = rng.choice((True, False))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.functions.text import token_count
        from nsl_kdd_spark.operators.quality import (
            threshold_sweep_report,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents.select(
            F.length("text").cast("long").alias("score"),
            token_count("text").cast("long").alias("n_tok"),
        )
        return threshold_sweep_report(
            docs, "score", list(ts),
            weight_col="n_tok" if weighted else None,
        )

    wexpr = "len(string_split(text, ' '))" if weighted else "1"
    tiers = "\n      UNION ALL\n".join(
        f"""
      SELECT CAST({t} AS BIGINT) AS threshold,
             CAST(COUNT(*) FILTER (WHERE length(text) >= {t})
                  AS BIGINT) AS kept_docs,
             CAST(COALESCE(SUM({wexpr})
                  FILTER (WHERE length(text) >= {t}), 0)
                  AS BIGINT) AS kept_weight,
             CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM({wexpr}) AS BIGINT) AS nw
      FROM documents
        """
        for t in sorted(set(ts))
    )
    sql = f"""
    WITH tiers AS (
      {tiers}
    )
    SELECT threshold, kept_docs, kept_weight,
           CAST(CASE WHEN nd > 0
                THEN (CAST(1000000 AS HUGEINT) * kept_docs) // nd
                ELSE 0 END AS BIGINT) AS kept_docs_ppm,
           CAST(CASE WHEN nw > 0
                THEN (CAST(1000000 AS HUGEINT) * kept_weight) // nw
                ELSE 0 END AS BIGINT) AS kept_weight_ppm
    FROM tiers
    ORDER BY threshold
    """
    return f"ts={ts} weighted={weighted}", spark_fn, sql, False


def fam_flatten_tree(rng: random.Random):
    """Message-tree flattening (round-12; sft.flatten_message_tree).
    Draws move the synthetic tree's arity (parent = rank // d) and
    the user subset; the oracle replays the frontier walk with a
    recursive CTE — chains, shared-prefix replication and turn
    indices bit-exact."""
    d = rng.choice((2, 3, 5))
    mod = rng.choice((2, 3))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.sft import flatten_message_tree
        from nsl_kdd_spark.sources.parquet import load_tables

        ev = load_tables(spark, sf_dir).events.filter(
            F.col("user_id") % mod == 0
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ranked = ev.select("user_id", "event_id", "ts").withColumn(
            "rk", F.row_number().over(w)
        )
        b = ranked.select(
            F.col("user_id").alias("__bu"),
            F.col("event_id").alias("parent_id"),
            F.col("rk").alias("__brk"),
        )
        tree = ranked.join(
            b,
            (F.col("user_id") == F.col("__bu"))
            & (F.col("__brk") == F.floor(F.col("rk") / d)),
            "left",
        ).select("user_id", "event_id", "parent_id")
        return (
            flatten_message_tree(
                tree, "event_id", "parent_id", max_depth=16
            )
            .select("user_id", "path_id", "turn_idx", "event_id")
            .orderBy("path_id", "turn_idx")
        )

    sql = f"""
    WITH RECURSIVE r AS (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rk
      FROM events WHERE user_id % {mod} = 0
    ), t AS (
      SELECT a.user_id, a.event_id AS mid, b.event_id AS pid
      FROM r a LEFT JOIN r b
        ON a.user_id = b.user_id AND b.rk = a.rk // {d}
    ), leaves AS (
      SELECT mid FROM t
      WHERE mid NOT IN (SELECT pid FROM t WHERE pid IS NOT NULL)
    ), chain AS (
      SELECT l.mid AS path_id, l.mid AS mid, 0 AS up FROM leaves l
      UNION ALL
      SELECT c.path_id, t.pid, c.up + 1
      FROM chain c JOIN t ON t.mid = c.mid AND t.pid IS NOT NULL
    ), lens AS (
      SELECT path_id, MAX(up) AS mx FROM chain GROUP BY path_id
    )
    SELECT t.user_id, c.path_id,
           CAST(l.mx - c.up + 1 AS INTEGER) AS turn_idx,
           c.mid AS event_id
    FROM chain c JOIN lens l USING (path_id) JOIN t ON t.mid = c.mid
    ORDER BY c.path_id, turn_idx
    """
    return f"d={d} mod={mod}", spark_fn, sql, False


def fam_dup_downweight(rng: random.Random):
    """Soft dedup by cluster downweighting (round-13;
    corpus.dup_downweight — 1e6/cluster_size ppm weights). Draws
    move the near-dup EDGE SOURCE (winnow fingerprints vs jaccard
    pairs — the operator is edge-agnostic); the oracle replays the
    matching shared fragment chain + CC + the integer ppm
    division."""
    edge_src = rng.choice(("winnow", "jaccard"))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.corpus import dup_downweight
        from nsl_kdd_spark.operators.dedup import jaccard_pairs
        from nsl_kdd_spark.operators.graph import connected_components
        from nsl_kdd_spark.operators.winnow import winnow_overlap_pairs
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        if edge_src == "winnow":
            pairs = winnow_overlap_pairs(
                docs, "doc_id", "text",
                k=4, w=4, min_shared=2, max_fp_df=50,
            )
        else:
            pairs = jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=0.8
            )
        comps = connected_components(pairs)
        return (
            dup_downweight(docs.select("doc_id"), comps)
            .select("doc_id", "comp", "dup_weight_ppm")
            .orderBy("doc_id")
        )

    # ONE oracle builder for both gates (review r13)
    from nsl_kdd_spark.plans.catalog import (
        _dup_downweight_oracle_sql,
        _NEARDUP_EDGES_SQL,
        _WINNOW_EDGES_FRAG,
    )

    frag = (
        _WINNOW_EDGES_FRAG if edge_src == "winnow"
        else _NEARDUP_EDGES_SQL
    )
    sql = _dup_downweight_oracle_sql(frag)
    return f"edge_src={edge_src}", spark_fn, sql, False


def fam_neardup_decontam(rng: random.Random):
    """Near-dup decontamination (round-13;
    dedup.neardup_decontaminate — the paraphrase-leakage tier).
    Draws move the band width, the verify threshold and the
    benchmark modulus; the oracle replays the one-signature-table
    band arithmetic, the cross-side bucket join and the ppm
    argmax."""
    band_size = rng.choice((2, 4))
    threshold_ppm = rng.choice((300_000, 500_000, 800_000))
    mod = rng.choice((5, 7))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.dedup import neardup_decontaminate
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        corpus = docs.filter(F.col("doc_id") % mod != 0).select(
            "doc_id", "text"
        )
        bench = docs.filter(F.col("doc_id") % mod == 0).select(
            "doc_id", "text"
        )
        return (
            neardup_decontaminate(
                corpus, bench, "doc_id", "text",
                num_hashes=8, band_size=band_size,
                threshold_ppm=threshold_ppm, shingle_n=3,
            )
            .select(
                "doc_id", "contaminated", "jaccard_ppm",
                "best_bench_id",
            )
            .orderBy("doc_id")
        )

    # ONE oracle builder for both gates (review r13)
    from nsl_kdd_spark.plans.catalog import _neardup_decontam_oracle_sql

    sql = _neardup_decontam_oracle_sql(band_size, threshold_ppm, mod)
    return (
        f"band_size={band_size} t_ppm={threshold_ppm} mod={mod}",
        spark_fn,
        sql,
        False,
    )


def fam_pack_bpe_boundaries(rng: random.Random):
    """Pack boundaries in BPE token space (round-13; q196's
    composition of pack_boundary_table -> char_spans_to_bpe_token_
    spans). Draws move the merge table over the fixed q188 pack
    fixture; the oracle rides the shared pack CTEs + the shared
    piece-extent blocks."""
    merges = rng.choice((
        [("e", "r"), ("er", "r"), ("c", "l")],
        [("i", "m"), ("s", "t")],
        [("r", "r"), ("s", "s")],
    ))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.sft import (
            assemble_pack_text,
            char_spans_to_bpe_token_spans,
            pack_boundary_table,
            pack_conversations,
            pack_fixed_count,
            render_chat_spans,
        )
        from nsl_kdd_spark.plans.catalog import _chat_turns
        from nsl_kdd_spark.sources.parquet import load_tables

        turns = _chat_turns(load_tables(spark, sf_dir).events)
        spans = render_chat_spans(turns, "conv_id", ["ts", "event_id"])
        packs = pack_fixed_count(
            spans.select("conv_id").distinct(), "conv_id", k=5
        )
        packed = pack_conversations(spans, packs, "conv_id")
        bounds = pack_boundary_table(packed, "conv_id")
        texts = assemble_pack_text(packed, "conv_id")
        joined = bounds.join(
            texts.select("pack_id", "pack_text"), "pack_id"
        )
        mdf = spark.createDataFrame(
            [(i, l, r) for i, (l, r) in enumerate(merges)],
            "rank int, left string, right string",
        )
        return (
            char_spans_to_bpe_token_spans(
                joined, mdf, "pack_id", "pack_text",
                "bound_start", "bound_end",
                start_out="tok_start", end_out="tok_end",
            )
            .select(
                "pack_id", "conv_id", "conv_pos",
                "bound_start", "bound_end", "tok_start", "tok_end",
            )
            .orderBy("pack_id", "conv_pos")
        )

    # ONE oracle builder for both gates (review r13)
    from nsl_kdd_spark.plans.catalog import (
        _pack_bpe_boundaries_oracle_sql,
    )

    sql = _pack_bpe_boundaries_oracle_sql(merges)
    return f"merges={merges}", spark_fn, sql, False


def fam_priority_dedup(rng: random.Random):
    """Priority dedup (round-13; dedup.dedup_priority — keep the
    highest-priority source's copy per exact-dup group). Draws move
    the priority order, the content-key length and the priority
    column; the oracle replays the rank argmin with a per-hash
    ROW_NUMBER."""
    head = rng.choice((20, 30, 50))
    pcol = rng.choice(("source", "lang"))
    pool = (
        ["src0", "src1", "src2", "src3"] if pcol == "source"
        else ["en", "zh", "es"]
    )
    k = rng.randrange(1, len(pool) + 1)
    prio = rng.sample(pool, k)

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.dedup import dedup_priority
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents.select(
            "doc_id", "source", "lang",
            F.substring("text", 1, head).alias("head"),
        )
        return (
            dedup_priority(docs, "head", "doc_id", pcol, prio)
            .select("doc_id", "source", "lang")
            .orderBy("doc_id")
        )

    rank_case = " ".join(
        f"WHEN '{s}' THEN {i}" for i, s in enumerate(prio)
    )
    sql = f"""
    WITH k AS (
      SELECT doc_id, source, lang, md5(substr(text, 1, {head})) AS h,
             CASE {pcol} {rank_case} ELSE {len(prio)} END AS pr
      FROM documents
    ), r AS (
      SELECT doc_id, source, lang,
             ROW_NUMBER() OVER (PARTITION BY h
                                ORDER BY pr, doc_id) AS rn
      FROM k
    )
    SELECT doc_id, source, lang FROM r WHERE rn = 1
    ORDER BY doc_id
    """
    return (
        f"head={head} pcol={pcol} prio={prio}", spark_fn, sql, False
    )


def fam_leakage_split(rng: random.Random):
    """Leakage-safe split (round-13; relational.leakage_safe_split —
    near-dup clusters never straddle train/val/test). Draws move the
    split weights and the salt over the fixed q150 winnow edge set;
    the oracle replays the shared winnow/CC fragments and the md5
    bucket cuts."""
    weights = rng.choice(((0.8, 0.1, 0.1), (0.6, 0.2, 0.2), (0.9, 0.05, 0.05)))
    salt = rng.choice(("", "e1"))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.relational import leakage_safe_split
        from nsl_kdd_spark.operators.winnow import winnow_overlap_pairs
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        pairs = winnow_overlap_pairs(
            docs, "doc_id", "text", k=4, w=4, min_shared=2, max_fp_df=50
        )
        return (
            leakage_safe_split(
                docs.select("doc_id"), "doc_id", pairs,
                splits=(
                    ("train", weights[0]), ("val", weights[1]),
                    ("test", weights[2]),
                ),
                salt=salt,
            )
            .select("doc_id", "comp", "split")
            .orderBy("doc_id")
        )

    from nsl_kdd_spark.plans.catalog import (
        _CC_COMPS_SQL,
        _md5_bucket_sql,
        _WINNOW_PAIRS_SQL,
        _WINNOW_WFP_SQL,
    )

    cut1 = int(weights[0] / sum(weights) * 65536)
    cut2 = int((weights[0] + weights[1]) / sum(weights) * 65536)
    sql = f"""
    WITH RECURSIVE
    {_WINNOW_WFP_SQL},
    {_WINNOW_PAIRS_SQL},
    edges AS (
      SELECT id_a, id_b FROM winnow_pairs
    ),
    {_CC_COMPS_SQL},
    scored AS (
      SELECT d.doc_id, c.comp
      FROM documents d LEFT JOIN comps c ON c.node = d.doc_id
    ), keyed AS (
      SELECT doc_id, comp,
             CAST(COALESCE(comp, doc_id) AS VARCHAR) AS k
      FROM scored
    ), h AS (
      SELECT doc_id, comp, {_md5_bucket_sql(salt, "k")} AS hv
      FROM keyed
    )
    SELECT doc_id, comp,
           CASE WHEN hv < {cut1} THEN 'train'
                WHEN hv < {cut2} THEN 'val'
                ELSE 'test' END AS split
    FROM h ORDER BY doc_id
    """
    return f"weights={weights} salt={salt!r}", spark_fn, sql, False


def fam_cross_source_neardups(rng: random.Random):
    """Cross-source NEAR-duplicate matrix (round-13;
    dedup.cross_source_neardup_matrix — q184's provenance audit over
    MinHash bands). Draws move the band width (2 -> 4 bands of 2 vs
    2 bands of 4), the shingle order and the verify threshold; the
    oracle replays the q29 band arithmetic, the jaccard verify and
    the unordered source-cell aggregation."""
    band_size = rng.choice((2, 4))
    shingle_n = rng.choice((2, 3))
    threshold = rng.choice((0.3, 0.5, 0.8))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.dedup import (
            cross_source_neardup_matrix,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        return cross_source_neardup_matrix(
            docs, "source", "doc_id", "text",
            num_hashes=8, band_size=band_size,
            threshold=threshold, shingle_n=shingle_n,
        ).orderBy("source_a", "source_b")

    from nsl_kdd_spark.plans.catalog import _minhash_band_items_sql

    band_items = _minhash_band_items_sql(band_size)
    sql = f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= {shingle_n} THEN
               list_transform(generate_series(1, len(w) - {shingle_n - 1}),
                              i -> array_to_string(
                                     w[i:i+{shingle_n - 1}], ' '))
               ELSE [] END) AS s
      FROM w
    ), tok AS (
      SELECT doc_id, unnest(s) AS t FROM sh
    ), sig AS (
      SELECT doc_id,
             min(substr(md5('0:' || t), 1, 8))  AS mh0,
             min(substr(md5('0:' || t), 9, 8))  AS mh1,
             min(substr(md5('0:' || t), 17, 8)) AS mh2,
             min(substr(md5('0:' || t), 25, 8)) AS mh3,
             min(substr(md5('1:' || t), 1, 8))  AS mh4,
             min(substr(md5('1:' || t), 9, 8))  AS mh5,
             min(substr(md5('1:' || t), 17, 8)) AS mh6,
             min(substr(md5('1:' || t), 25, 8)) AS mh7
      FROM tok GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, unnest([
        {band_items}]) AS bucket
      FROM sig
    ), cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands x JOIN bands y
        ON x.bucket = y.bucket AND x.doc_id < y.doc_id
    ), pr AS (
      SELECT id_a, id_b
      FROM cand JOIN sh a ON cand.id_a = a.doc_id
                JOIN sh b ON cand.id_b = b.doc_id
      WHERE len(list_filter(a.s, x -> list_contains(b.s, x))) * 1.0 /
            (len(a.s) + len(b.s)
             - len(list_filter(a.s, x -> list_contains(b.s, x))))
            >= {threshold}
    ), src AS (
      SELECT doc_id,
             COALESCE(CAST(source AS VARCHAR), chr(0) || 'null') AS s
      FROM documents
    ), lab AS (
      SELECT LEAST(sa.s, sb.s) AS source_a,
             GREATEST(sa.s, sb.s) AS source_b,
             pr.id_a, pr.id_b
      FROM pr JOIN src sa ON pr.id_a = sa.doc_id
              JOIN src sb ON pr.id_b = sb.doc_id
    ), cells AS (
      SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS dup_pairs
      FROM lab GROUP BY source_a, source_b
    ), dd AS (
      SELECT source_a, source_b,
             CAST(COUNT(DISTINCT d) AS BIGINT) AS dup_docs
      FROM (
        SELECT source_a, source_b, id_a AS d FROM lab
        UNION ALL
        SELECT source_a, source_b, id_b AS d FROM lab
      ) GROUP BY source_a, source_b
    )
    SELECT c.source_a, c.source_b, c.dup_pairs, d.dup_docs
    FROM cells c JOIN dd d USING (source_a, source_b)
    ORDER BY c.source_a, c.source_b
    """
    return (
        f"band_size={band_size} shingle_n={shingle_n} thr={threshold}",
        spark_fn,
        sql,
        False,
    )


def fam_prefix_loss(rng: random.Random):
    """Shared-prefix loss deduplication (round-13;
    sft.dedup_shared_prefix_loss — the OpenAssistant exactly-once
    loss convention over flattened trees). Draws move the tree
    arity, the user subset and the owner-draw salt; the oracle
    replays the digest argmin with a per-message ROW_NUMBER over
    the recursive-CTE tree."""
    d = rng.choice((2, 3, 5))
    mod = rng.choice((2, 3))
    salt = rng.choice(("", "s1"))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.sft import (
            dedup_shared_prefix_loss,
            flatten_message_tree,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        ev = load_tables(spark, sf_dir).events.filter(
            F.col("user_id") % mod == 0
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ranked = ev.select("user_id", "event_id", "ts").withColumn(
            "rk", F.row_number().over(w)
        )
        b = ranked.select(
            F.col("user_id").alias("__bu"),
            F.col("event_id").alias("parent_id"),
            F.col("rk").alias("__brk"),
        )
        tree = ranked.join(
            b,
            (F.col("user_id") == F.col("__bu"))
            & (F.col("__brk") == F.floor(F.col("rk") / d)),
            "left",
        ).select("user_id", "event_id", "parent_id")
        flat = flatten_message_tree(
            tree, "event_id", "parent_id", max_depth=16
        )
        return (
            dedup_shared_prefix_loss(flat, "event_id", salt=salt)
            .select(
                "user_id", "path_id", "turn_idx", "event_id",
                "loss_owner",
            )
            .orderBy("path_id", "turn_idx")
        )

    sql = f"""
    WITH RECURSIVE r AS (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rk
      FROM events WHERE user_id % {mod} = 0
    ), t AS (
      SELECT a.user_id, a.event_id AS mid, b.event_id AS pid
      FROM r a LEFT JOIN r b
        ON a.user_id = b.user_id AND b.rk = a.rk // {d}
    ), leaves AS (
      SELECT mid FROM t
      WHERE mid NOT IN (SELECT pid FROM t WHERE pid IS NOT NULL)
    ), chain AS (
      SELECT l.mid AS path_id, l.mid AS mid, 0 AS up FROM leaves l
      UNION ALL
      SELECT c.path_id, t.pid, c.up + 1
      FROM chain c JOIN t ON t.mid = c.mid AND t.pid IS NOT NULL
    ), lens AS (
      SELECT path_id, MAX(up) AS mx FROM chain GROUP BY path_id
    ), flat AS (
      SELECT t.user_id, c.path_id,
             CAST(l.mx - c.up + 1 AS INTEGER) AS turn_idx,
             c.mid AS event_id
      FROM chain c JOIN lens l USING (path_id) JOIN t ON t.mid = c.mid
    ), own AS (
      SELECT event_id, path_id,
             ROW_NUMBER() OVER (PARTITION BY event_id
               ORDER BY md5('{salt}' || CAST(path_id AS VARCHAR)),
                        path_id) AS rn
      FROM flat
    )
    SELECT f.user_id, f.path_id, f.turn_idx, f.event_id,
           o.path_id IS NOT NULL AS loss_owner
    FROM flat f LEFT JOIN (
      SELECT event_id, path_id FROM own WHERE rn = 1
    ) o ON f.event_id = o.event_id AND f.path_id = o.path_id
    ORDER BY f.path_id, f.turn_idx
    """
    return f"d={d} mod={mod} salt={salt!r}", spark_fn, sql, False


def fam_cap_per_group(rng: random.Random):
    """Deterministic per-group cap (round-12;
    relational.cap_per_group — the RefinedWeb per-domain cap).
    Draws move k, the salt, the group column and the NULL-group
    fraction (round-12 verdict #1: rows with a NULL group key must be
    capped as their own group, never dropped); the oracle replays
    the md5-digest order and the cut with a per-group ROW_NUMBER."""
    k = rng.choice((5, 150, 1000))
    salt = rng.choice(("", "c1"))
    group = rng.choice(("source", "lang"))
    null_cut = rng.choice((0, 6553, 19660))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.relational import (
            cap_per_group,
            md5_bucket16,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents.select(
            "doc_id", "source", "lang"
        )
        if null_cut:
            docs = docs.withColumn(
                group,
                F.when(
                    md5_bucket16("doc_id", "nullg") < null_cut,
                    F.lit(None),
                ).otherwise(F.col(group)),
            )
        return cap_per_group(
            docs, group, "doc_id", k=k, salt=salt
        ).orderBy("doc_id")

    from nsl_kdd_spark.plans.catalog import _md5_bucket_sql

    gexpr = (
        f"CASE WHEN {_md5_bucket_sql('nullg', 'doc_id')} < {null_cut}"
        f" THEN NULL ELSE {group} END"
        if null_cut
        else group
    )
    sql = f"""
    WITH src AS (
      SELECT doc_id,
             {"source" if group != "source" else gexpr} AS source,
             {"lang" if group != "lang" else gexpr} AS lang
      FROM documents
    ), r AS (
      SELECT doc_id, source, lang,
             ROW_NUMBER() OVER (
               PARTITION BY {group}
               ORDER BY md5('{salt}' || CAST(doc_id AS VARCHAR)),
                        doc_id
             ) AS rk
      FROM src
    )
    SELECT doc_id, source, lang FROM r WHERE rk <= {k}
    ORDER BY doc_id
    """
    return (
        f"k={k} salt={salt!r} group={group} null_cut={null_cut}",
        spark_fn,
        sql,
        False,
    )


def fam_pack_boundaries(rng: random.Random):
    """Pack attention boundaries (round-12;
    sft.pack_boundary_table — Krell §5 block-diagonal mask
    metadata). Draws move conversations-per-pack and the separator;
    the oracle replays extents AND asserts the tiling invariant in
    SQL (first bound at 1, consecutive bounds exactly one separator
    apart)."""
    k = rng.choice((2, 4, 9))
    pack_sep = rng.choice(("\n", "<|eod|>"))
    sep_len = len(pack_sep)

    def spark_fn(spark, sf_dir):
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.sft import (
            pack_boundary_table,
            pack_conversations,
            pack_fixed_count,
            render_chat_spans,
        )
        from nsl_kdd_spark.plans.catalog import _chat_turns
        from nsl_kdd_spark.sources.parquet import load_tables

        ev = load_tables(spark, sf_dir).events.filter(
            F.col("user_id") % 2 == 0
        )
        spans = render_chat_spans(
            _chat_turns(ev), "conv_id", ["ts", "event_id"]
        )
        packs = pack_fixed_count(
            spans.select("conv_id").distinct(), "conv_id", k=k
        )
        packed = pack_conversations(
            spans, packs, "conv_id", pack_sep=pack_sep
        )
        b = pack_boundary_table(packed, "conv_id")
        prev_end = F.lag("bound_end").over(
            W.partitionBy("pack_id").orderBy("conv_pos")
        )
        return (
            b.withColumn(
                "tiled",
                F.when(
                    F.col("conv_pos") == 1, F.col("bound_start") == 1
                ).otherwise(
                    F.col("bound_start") == prev_end + 1 + sep_len
                ),
            )
            .orderBy("pack_id", "conv_pos")
        )

    sql = f"""
    WITH turns AS (
      SELECT user_id AS conv_id, event_id, ts,
             CASE WHEN event_type IN ('click', 'view') THEN 'user'
                  WHEN event_type = 'error' THEN 'system'
                  ELSE 'assistant' END AS role,
             event_type || ' ' || COALESCE(props, '') AS content
      FROM events WHERE user_id % 2 = 0
    ), ordered AS (
      SELECT conv_id, role, content,
             ROW_NUMBER() OVER (PARTITION BY conv_id
                                ORDER BY ts, event_id) AS turn_idx
      FROM turns
    ), seg AS (
      SELECT *,
             '<|im_start|>' || role || chr(10) || content || '<|im_end|>'
               AS segment
      FROM ordered
    ), conv AS (
      SELECT conv_id,
             CAST(SUM(length(segment)) + COUNT(*) - 1 AS BIGINT)
               AS conv_len
      FROM seg GROUP BY conv_id
    ), pk AS (
      SELECT conv_id, conv_len,
             CAST((ROW_NUMBER() OVER (ORDER BY conv_id) - 1) // {k}
                  AS BIGINT) AS pack_id
      FROM conv
    ), pos AS (
      SELECT conv_id, conv_len, pack_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY pack_id
                                     ORDER BY conv_id) AS INTEGER)
               AS conv_pos,
             CAST(COALESCE(SUM(conv_len + {sep_len})
               OVER (PARTITION BY pack_id ORDER BY conv_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS conv_off
      FROM pk
    )
    SELECT pack_id, conv_id, conv_pos,
           CAST(conv_off + 1 AS BIGINT) AS bound_start,
           CAST(conv_off + conv_len AS BIGINT) AS bound_end,
           TRUE AS tiled
    FROM pos
    ORDER BY pack_id, conv_pos
    """
    return f"k={k} pack_sep={pack_sep!r}", spark_fn, sql, False


def fam_token_spans(rng: random.Random):
    """Char-span -> token-span conversion (round-12;
    sft.char_spans_to_token_spans — whitespace-token prefix
    arithmetic). Draws move the span-position and span-length
    moduli, sweeping starts/ends across token interiors, separators
    and document edges; the oracle replays the spaces-in-prefix
    counts and both separator-resolution rules exactly."""
    p = rng.choice((37, 113, 311))
    q = rng.choice((3, 29, 97))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.sft import (
            char_spans_to_token_spans,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        spanned = (
            docs.withColumn("__l", F.length("text").cast("long"))
            .filter(F.col("__l") > 0)
            .withColumn(
                "s", (F.col("doc_id") % p) % F.col("__l") + 1
            )
            .withColumn(
                "e",
                F.least(F.col("s") + F.col("doc_id") % q, F.col("__l")),
            )
        )
        return (
            char_spans_to_token_spans(spanned, "text", "s", "e")
            .select("doc_id", "s", "e", "tok_start", "tok_end")
            .orderBy("doc_id")
        )

    sql = f"""
    WITH spanned AS (
      SELECT doc_id, text,
             (doc_id % {p}) % length(text) + 1 AS s
      FROM documents WHERE length(text) > 0
    ), se AS (
      SELECT doc_id, text, s,
             LEAST(s + doc_id % {q}, length(text)) AS e
      FROM spanned
    ), cnt AS (
      SELECT doc_id, s, e,
             CAST(length(substr(text, 1, CAST(s AS INT)))
                  - length(replace(substr(text, 1, CAST(s AS INT)),
                                   ' ', '')) AS BIGINT) AS cs,
             CAST(length(substr(text, 1, CAST(e AS INT)))
                  - length(replace(substr(text, 1, CAST(e AS INT)),
                                   ' ', '')) AS BIGINT) AS ce,
             substr(text, CAST(e AS INT), 1) = ' ' AS e_sp
      FROM se
    )
    SELECT doc_id, CAST(s AS BIGINT) AS s, CAST(e AS BIGINT) AS e,
           CASE WHEN cs + 1 <= (CASE WHEN e_sp THEN ce ELSE ce + 1 END)
                THEN cs + 1 END AS tok_start,
           CASE WHEN cs + 1 <= (CASE WHEN e_sp THEN ce ELSE ce + 1 END)
                THEN CASE WHEN e_sp THEN ce ELSE ce + 1 END
                END AS tok_end
    FROM cnt
    ORDER BY doc_id
    """
    return f"p={p} q={q}", spark_fn, sql, False


def fam_bpe_spans(rng: random.Random):
    """Char-span -> BPE-token-span conversion (round-13;
    sft.char_spans_to_bpe_token_spans — the q183 mask chain's BPE
    tier). Draws move the span moduli AND the merge table (chained
    merges, left = right island-parity cases, no-op merges); the
    oracle replays the merges with the independent island-parity
    CTE chain and the span rules as a piece char-extent table."""
    p = rng.choice((37, 113, 311))
    q = rng.choice((3, 29, 97))
    merges = rng.choice((
        [("a", "t"), ("at", "a"), ("l", "l")],
        [("l", "l"), ("s", "s"), ("e", "e")],
        [("t", "h"), ("th", "e"), ("a", "n")],
        [("z", "z"), ("q", "x")],  # mostly no-ops: pieces ~ chars
    ))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.sft import (
            char_spans_to_bpe_token_spans,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        spanned = (
            docs.withColumn("__l", F.length("text").cast("long"))
            .filter(F.col("__l") > 0)
            .withColumn("s", (F.col("doc_id") % p) % F.col("__l") + 1)
            .withColumn(
                "e",
                F.least(F.col("s") + F.col("doc_id") % q, F.col("__l")),
            )
            .select("doc_id", "text", "s", "e")
        )
        mdf = spark.createDataFrame(
            [(i, l, r) for i, (l, r) in enumerate(merges)],
            "rank int, left string, right string",
        )
        return (
            char_spans_to_bpe_token_spans(
                spanned, mdf, "doc_id", "text", "s", "e"
            )
            .select("doc_id", "s", "e", "bpe_tok_start", "bpe_tok_end")
            .orderBy("doc_id")
        )

    # ONE oracle definition for both gates (review r13): the fuzz
    # family replays the SAME parameterized builder the q189 driver
    # gate registers, so the two can never police different SQL
    from nsl_kdd_spark.plans.catalog import _bpe_span_oracle_sql

    sql = _bpe_span_oracle_sql(p, q, merges)
    return f"p={p} q={q} merges={merges}", spark_fn, sql, False


def fam_epoch_budget(rng: random.Random):
    """Data-constrained epoch budgeting (round-12;
    corpus.epoch_budget_report — Muennighoff et al. 2023). Draws
    move alpha (the shared sqrt-chain allocation), the token budget
    (sub-1-epoch through heavy-repeat regimes), the epoch cap and
    the doc-count vs token-weighted mass basis; the oracle replays
    the allocation, the ppm epoch algebra, the quantized exp decay
    and the cap accounting."""
    alpha = rng.choice((0.25, 0.5, 1.0))
    budget = rng.choice((50_000, 200_000, 1_000_000))
    cap = rng.choice((None, 2_000_000, 4_000_000))
    weighted = rng.choice((True, False))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.functions.text import token_count
        from nsl_kdd_spark.operators.corpus import epoch_budget_report
        from nsl_kdd_spark.sources.parquet import load_tables

        docs = load_tables(spark, sf_dir).documents
        if weighted:
            docs = docs.withColumn(
                "n_tok", token_count("text").cast("long")
            )
        return epoch_budget_report(
            docs, "lang", budget=budget, alpha=alpha,
            weight_col="n_tok" if weighted else None,
            max_epochs_ppm=cap,
        )

    mass = (
        "CAST(SUM(len(string_split(text, ' '))) AS BIGINT)"
        if weighted else "CAST(COUNT(*) AS BIGINT)"
    )
    if alpha == 1.0:
        wexpr = "n"
    elif alpha == 0.5:
        wexpr = (
            "CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)"
        )
    else:
        wexpr = (
            "CAST(FLOOR(SQRT(SQRT(CAST(n AS DOUBLE))) * 1000000.0)"
            " AS BIGINT)"
        )
    if cap is None:
        cap_cols = ""
    else:
        cap_cols = f""",
           epochs_ppm > {cap} AS over_cap,
           CAST(CASE WHEN epochs_ppm > {cap}
                THEN (CAST(n_tokens AS HUGEINT) * (epochs_ppm - {cap}))
                     // 1000000
                ELSE 0 END AS BIGINT) AS excess_tokens"""
    sql = f"""
    WITH counts AS (
      SELECT lang, {mass} AS n FROM documents GROUP BY lang
    ), w AS (
      SELECT lang, n, {wexpr} AS w FROM counts
    ), tot AS (
      SELECT SUM(w) AS sw FROM w
    ), alloc AS (
      SELECT lang, n,
             CAST((CAST({budget} AS HUGEINT) * w)
                  // (SELECT sw FROM tot) AS BIGINT) AS take
      FROM w WHERE n > 0
    ), rep AS (
      SELECT lang, n AS n_tokens, take AS take_tokens,
             CAST((CAST(1000000 AS HUGEINT) * take) // n AS BIGINT)
               AS epochs_ppm
      FROM alloc
    ), r2 AS (
      SELECT *, GREATEST(epochs_ppm - 1000000, 0) AS repeats_ppm
      FROM rep
    ), r3 AS (
      SELECT *,
             CAST(round(exp(-(CAST(repeats_ppm AS DOUBLE)
                             / 15390000.0)) * 1000000.0) AS BIGINT)
               AS decay_ppm
      FROM r2
    )
    SELECT lang, n_tokens, take_tokens, epochs_ppm, repeats_ppm,
           decay_ppm,
           CAST(LEAST(take_tokens, n_tokens)
                + (CAST(LEAST(take_tokens, n_tokens) AS HUGEINT)
                   * 15390000 * (1000000 - decay_ppm))
                  // 1000000000000 AS BIGINT)
             AS effective_tokens{cap_cols}
    FROM r3
    ORDER BY lang
    """
    return (
        f"alpha={alpha} budget={budget} cap={cap} weighted={weighted}",
        spark_fn,
        sql,
        False,
    )


def fam_best_of_n(rng: random.Random):
    """Best-of-n rejection sampling (round-12; operators/sft.
    best_of_n — Bai et al. 2022 / ReST selection). Draws move n,
    the score floor and the prompt-subset modulus; the oracle
    replays the NULL exclusion, the floor-before-rank semantics and
    the lowest-id tie-break exactly."""
    n = rng.choice((1, 2, 5))
    floor = rng.choice((None, 0, 60, 95))
    mod = rng.choice((0, 3))

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.sft import best_of_n
        from nsl_kdd_spark.sources.parquet import load_tables

        ev = load_tables(spark, sf_dir).events
        if mod:
            ev = ev.filter(F.col("user_id") % mod == 0)
        scored = ev.select(
            F.col("user_id").alias("prompt_id"),
            "event_id",
            F.concat_ws(
                " ", "event_type", F.coalesce("props", F.lit(""))
            ).alias("resp"),
            F.floor(F.col("value") * 100).cast("long").alias("score"),
        )
        return best_of_n(
            scored, "prompt_id", "resp", "score", "event_id",
            n=n, score_floor=floor,
        ).orderBy("prompt_id", "rank")

    gate = "value IS NOT NULL" + (
        f" AND user_id % {mod} = 0" if mod else ""
    )
    fgate = f"WHERE score >= {floor}" if floor is not None else ""
    sql = f"""
    WITH r AS (
      SELECT user_id AS prompt_id, event_id,
             event_type || ' ' || COALESCE(props, '') AS resp,
             CAST(FLOOR(value * 100) AS BIGINT) AS score
      FROM events WHERE {gate}
    ), ranked AS (
      SELECT prompt_id, event_id, resp, score,
             ROW_NUMBER() OVER (PARTITION BY prompt_id
                                ORDER BY score DESC, event_id) AS rk
      FROM r {fgate}
    )
    SELECT prompt_id, CAST(rk AS INTEGER) AS rank,
           event_id AS response_id, resp AS response, score
    FROM ranked WHERE rk <= {n}
    ORDER BY prompt_id, rank
    """
    return (
        f"n={n} floor={floor} mod={mod}",
        spark_fn,
        sql,
        False,
    )


def fam_t_ordered(rng: random.Random):
    """Ordered t-closeness for numeric sensitive attributes
    (round-12; privacy.t_closeness_ordered_audit — Li et al. 2007
    §4.2 cumulative-sum EMD). Draws move the generalization width
    (the domain size m), the threshold and the quasi-identifier set,
    and toggle flag vs suppress; the oracle replays the bounded
    domain window, the group x domain grid cumsums and the exact
    integer ppm algebra."""
    width = rng.choice((500, 1000, 2500, 4000))
    t_ppm = rng.choice((100_000, 250_000, 400_000))
    mode = rng.choice(("flag", "suppress"))
    quasi = rng.choice(
        (["c_nationkey", "c_mktsegment"], ["c_mktsegment"],
         ["c_nationkey"])
    )

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.privacy import (
            generalize_bin,
            t_closeness_ordered_audit,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        cust = load_tables(spark, sf_dir).customer
        qid = cust.select(
            "c_custkey", "c_nationkey", "c_mktsegment",
            generalize_bin("c_acctbal", width).alias("bal_bin"),
        )
        out = t_closeness_ordered_audit(
            qid, quasi, "bal_bin", t_ppm=t_ppm, mode=mode
        )
        cols = ["c_custkey", "c_nationkey", "c_mktsegment", "bal_bin"]
        cols += (
            ["qid_emd_ppm", "t_close"] if mode == "flag" else []
        )
        return out.select(*cols).orderBy("c_custkey")

    qcols = ", ".join(quasi)
    jcond = " AND ".join(f"ce.{c} = s.{c}" for c in quasi)
    if mode == "flag":
        sel_extra = ", e.qid_emd_ppm, e.qid_emd_ppm <= {t} AS t_close"
        gate = ""
    else:
        sel_extra = ""
        gate = "WHERE e.qid_emd_ppm <= {t}"
    sql = f"""
    WITH q AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / {width}) * {width} AS BIGINT)
               AS bal_bin
      FROM customer
    ), cells AS (
      SELECT {qcols}, bal_bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM q WHERE bal_bin IS NOT NULL
      GROUP BY {qcols}, bal_bin
    ), dom AS (
      SELECT bal_bin AS sv, CAST(SUM(c) AS BIGINT) AS gc
      FROM cells GROUP BY bal_bin
    ), dom2 AS (
      SELECT sv, gc,
             CAST(ROW_NUMBER() OVER (ORDER BY sv) AS BIGINT) AS i,
             CAST(SUM(gc) OVER (ORDER BY sv) AS BIGINT) AS cumgc
      FROM dom
    ), tot AS (
      SELECT CAST(SUM(gc) AS BIGINT) AS n_tot,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM dom
    ), sizes AS (
      SELECT {qcols}, CAST(SUM(c) AS BIGINT) AS n
      FROM cells GROUP BY {qcols}
    ), grid AS (
      SELECT {', '.join('s.' + c for c in quasi)}, s.n, d.sv, d.i,
             d.cumgc, COALESCE(ce.c, 0) AS c
      FROM sizes s CROSS JOIN dom2 d
      LEFT JOIN cells ce ON {jcond} AND ce.bal_bin = d.sv
    ), cum AS (
      SELECT *,
             CAST(SUM(c) OVER (PARTITION BY {qcols}
                               ORDER BY sv) AS BIGINT) AS cumc
      FROM grid
    ), terms AS (
      SELECT {qcols}, MAX(n) AS n,
             SUM(CASE WHEN i < t.m
                 THEN ABS(cumc * t.n_tot - cumgc * n)
                 ELSE 0 END) AS tsum
      FROM cum, tot t
      GROUP BY {qcols}
    ), emd AS (
      SELECT {qcols},
             CASE WHEN t.m > 1 THEN
               CAST((CAST(1000000 AS HUGEINT) * tsum)
                    // ((t.m - 1) * CAST(n AS HUGEINT) * t.n_tot)
                    AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS qid_emd_ppm
      FROM terms, tot t
    )
    SELECT q.c_custkey, q.c_nationkey, q.c_mktsegment, q.bal_bin
           {sel_extra.format(t=t_ppm)}
    FROM q JOIN emd e USING ({qcols})
    {gate.format(t=t_ppm)}
    ORDER BY q.c_custkey
    """
    return (
        f"width={width} t_ppm={t_ppm} mode={mode} quasi={quasi}",
        spark_fn,
        sql,
        False,
    )


def fam_sft_pack(rng: random.Random):
    """Packed-SFT loss-span rebasing (round-12;
    operators/sft.pack_conversations + pack_fixed_count — Krell et
    al. 2021 §5 applied to completion-only SFT). Draws move the
    conversations-per-pack k, the pack separator and the
    conversation-subset modulus; the oracle replays the fixed-count
    assignment, the separator-aware offset rebasing, the assembled
    pack text (digest) and the substring re-extraction checks."""
    k = rng.choice((2, 3, 7))
    pack_sep = rng.choice(("\n", "<|eod|>"))
    mod = rng.choice((2, 3))  # subset keeps a draw under ~5s

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from nsl_kdd_spark.operators.sft import (
            assemble_pack_text,
            pack_conversations,
            pack_fixed_count,
            render_chat_spans,
        )
        from nsl_kdd_spark.sources.parquet import load_tables

        ev = load_tables(spark, sf_dir).events.filter(
            F.col("user_id") % mod == 0
        )
        turns = ev.select(
            F.col("user_id").alias("conv_id"),
            "event_id",
            "ts",
            F.when(F.col("event_type").isin("click", "view"), "user")
            .when(F.col("event_type") == "error", "system")
            .otherwise("assistant")
            .alias("role"),
            F.concat_ws(
                " ", "event_type", F.coalesce("props", F.lit(""))
            ).alias("content"),
        )
        spans = render_chat_spans(turns, "conv_id", ["ts", "event_id"])
        packs = pack_fixed_count(
            spans.select("conv_id").distinct(), "conv_id", k=k
        )
        packed = pack_conversations(
            spans, packs, "conv_id", pack_sep=pack_sep
        )
        ptext = assemble_pack_text(
            packed, "conv_id", pack_sep=pack_sep
        )
        out = packed.join(ptext.select("pack_id", "pack_text"), "pack_id")
        sub = (
            "substring(pack_text, CAST({s} AS INT),"
            " CAST({e} - {s} + 1 AS INT))"
        )
        return (
            out.withColumn(
                "ok_seg",
                F.expr(
                    sub.format(s="pack_seg_start", e="pack_seg_end")
                    + " = segment"
                ),
            )
            .withColumn(
                "ok_loss",
                F.when(
                    F.col("is_loss"),
                    F.expr(
                        sub.format(
                            s="pack_loss_start", e="pack_loss_end"
                        )
                        + " = content"
                    ),
                ).otherwise(F.lit(True)),
            )
            .withColumn("pack_digest", F.md5("pack_text"))
            .select(
                "conv_id", "turn_idx", "pack_id", "conv_pos",
                "n_convs", "pack_len", "pack_seg_start",
                "pack_seg_end", "pack_loss_start", "pack_loss_end",
                "ok_seg", "ok_loss", "pack_digest",
            )
            .orderBy("conv_id", "turn_idx")
        )

    sep_sql = "chr(10)" if pack_sep == "\n" else f"'{pack_sep}'"
    sep_len = len(pack_sep)
    sql = f"""
    WITH turns AS (
      SELECT user_id AS conv_id, event_id, ts,
             CASE WHEN event_type IN ('click', 'view') THEN 'user'
                  WHEN event_type = 'error' THEN 'system'
                  ELSE 'assistant' END AS role,
             event_type || ' ' || COALESCE(props, '') AS content
      FROM events WHERE user_id % {mod} = 0
    ), ordered AS (
      SELECT conv_id, role, content,
             ROW_NUMBER() OVER (PARTITION BY conv_id
                                ORDER BY ts, event_id) AS turn_idx
      FROM turns
    ), seg AS (
      SELECT *,
             '<|im_start|>' || role || chr(10) || content || '<|im_end|>'
               AS segment
      FROM ordered
    ), off AS (
      SELECT *,
             COALESCE(SUM(CAST(length(segment) + 1 AS BIGINT))
               OVER (PARTITION BY conv_id ORDER BY turn_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS prior
      FROM seg
    ), conv AS (
      SELECT conv_id,
             CAST(MAX(prior + length(segment)) AS BIGINT) AS conv_len,
             string_agg(segment, chr(10) ORDER BY turn_idx) AS conv_text
      FROM off GROUP BY conv_id
    ), pk AS (
      SELECT conv_id, conv_len, conv_text,
             CAST((ROW_NUMBER() OVER (ORDER BY conv_id) - 1) // {k}
                  AS BIGINT) AS pack_id
      FROM conv
    ), pos AS (
      SELECT conv_id, pack_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY pack_id
                                     ORDER BY conv_id) AS INTEGER)
               AS conv_pos,
             CAST(COALESCE(SUM(conv_len + {sep_len})
               OVER (PARTITION BY pack_id ORDER BY conv_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS conv_off,
             CAST(COUNT(*) OVER (PARTITION BY pack_id) AS BIGINT)
               AS n_convs,
             CAST(SUM(conv_len) OVER (PARTITION BY pack_id)
                  + (COUNT(*) OVER (PARTITION BY pack_id) - 1)
                    * {sep_len} AS BIGINT) AS pack_len
      FROM pk
    ), ptext AS (
      SELECT pack_id,
             string_agg(conv_text, {sep_sql} ORDER BY conv_id)
               AS pack_text
      FROM pk GROUP BY pack_id
    )
    SELECT o.conv_id, CAST(o.turn_idx AS INTEGER) AS turn_idx,
           p.pack_id, p.conv_pos, p.n_convs, p.pack_len,
           CAST(o.prior + 1 + p.conv_off AS BIGINT) AS pack_seg_start,
           CAST(o.prior + length(o.segment) + p.conv_off AS BIGINT)
             AS pack_seg_end,
           CAST(CASE WHEN o.role = 'assistant'
                THEN o.prior + length('<|im_start|>' || o.role) + 2
                     + p.conv_off END AS BIGINT) AS pack_loss_start,
           CAST(CASE WHEN o.role = 'assistant'
                THEN o.prior + length('<|im_start|>' || o.role) + 1
                     + length(o.content) + p.conv_off END AS BIGINT)
             AS pack_loss_end,
           substr(t.pack_text,
                  CAST(o.prior + 1 + p.conv_off AS BIGINT),
                  CAST(length(o.segment) AS BIGINT)) = o.segment
             AS ok_seg,
           CASE WHEN o.role = 'assistant'
                THEN substr(t.pack_text,
                       CAST(o.prior + length('<|im_start|>' || o.role)
                            + 2 + p.conv_off AS BIGINT),
                       CAST(length(o.content) AS BIGINT)) = o.content
                ELSE TRUE END AS ok_loss,
           md5(t.pack_text) AS pack_digest
    FROM off o JOIN pos p USING (conv_id) JOIN ptext t USING (pack_id)
    ORDER BY o.conv_id, o.turn_idx
    """
    return (
        f"k={k} pack_sep={pack_sep!r} mod={mod}",
        spark_fn,
        sql,
        False,
    )



def fam_line_dedup(rng: random.Random):
    """Cross-document line dedup (round-13; dedup.dedup_common_lines
    — the CCNet/FineWeb boilerplate scrub). Draws move the dedup
    threshold, the exemption floor (0 = even blank lines dedup), the
    line-splitting token and the shared-footer modulus; the oracle
    replays the shared fixture + md5-keyed frequency/rebuild builder
    from catalog.py (one-builder rule)."""
    min_docs = rng.choice((2, 3, 4))
    exempt = rng.choice((0, 1, 6))
    split_token = rng.choice((" the ", " a ", " of "))
    footer_mod = rng.choice((2, 3, 5))
    null_mod = rng.choice((41, 53))

    def spark_fn(spark, sf_dir):
        from nsl_kdd_spark.operators.dedup import dedup_common_lines
        from nsl_kdd_spark.plans.catalog import _line_dedup_fixture_df

        docs = _line_dedup_fixture_df(
            spark, sf_dir, split_token=split_token,
            footer_mod=footer_mod, null_mod=null_mod,
        )
        return dedup_common_lines(
            docs, "doc_id", "text", min_docs=min_docs,
            exempt_below_chars=exempt,
        ).orderBy("doc_id")

    from nsl_kdd_spark.plans.catalog import (
        _line_dedup_fixture_frag,
        _line_dedup_oracle_sql,
    )

    sql = _line_dedup_oracle_sql(
        _line_dedup_fixture_frag(
            split_token=split_token, footer_mod=footer_mod,
            null_mod=null_mod,
        ),
        min_docs, exempt,
    )
    return (
        f"min_docs={min_docs} exempt={exempt}"
        f" split={split_token!r} footer_mod={footer_mod}"
        f" null_mod={null_mod}",
        spark_fn, sql, False,
    )


FAMILIES = {
    "percentiles": fam_percentiles,
    "winsorize": fam_winsorize,
    "topk": fam_topk,
    "histogram": fam_histogram,
    "hash_split": fam_hash_split,
    "jaccard": fam_jaccard,
    "minhash": fam_minhash,
    "simhash": fam_simhash,
    "asof": fam_asof,
    "filtered_agg": fam_filtered_agg,
    "containment": fam_containment,
    "spans": fam_spans,
    "hash_sample": fam_hash_sample,
    "resample": fam_resample,
    "bm25": fam_bm25,
    "rolling_window": fam_rolling_window,
    "grouping_sets": fam_grouping_sets,
    "decontam": fam_decontam,
    "scd2_pointtime": fam_scd2_pointtime,
    "pack_chunks": fam_pack_chunks,
    "sample_exact_n": fam_sample_exact_n,
    "winnow": fam_winnow,
    "decontam_bloom": fam_decontam_bloom,
    "bloom_semi_join": fam_bloom_semi_join,
    "hard_negatives": fam_hard_negatives,
    "knn": fam_knn,
    "semantic_dedup": fam_semantic_dedup,
    "vector_registry": fam_vector_registry,
    "winnow_registry": fam_winnow_registry,
    "substr_spans": fam_substr_spans,
    "substr_report": fam_substr_report,
    "linear_text": fam_linear_text,
    "temperature_mixture": fam_temperature_mixture,
    "fim": fam_fim,
    "span_corruption": fam_span_corruption,
    "denoiser_mix": fam_denoiser_mix,
    "datacard": fam_datacard,
    "sft_spans": fam_sft_spans,
    "diversity": fam_diversity,
    "k_anonymity": fam_k_anonymity,
    "l_diversity": fam_l_diversity,
    "t_closeness": fam_t_closeness,
    "preference_pairs": fam_preference_pairs,
    "fertility": fam_fertility,
    "decontam_spans": fam_decontam_spans,
    "dsir": fam_dsir,
    "gopher": fam_gopher,
    "c4": fam_c4,
    "contamination": fam_contamination,
    "grouped_bins": fam_grouped_bins,
    "sft_pack": fam_sft_pack,
    "t_ordered": fam_t_ordered,
    "best_of_n": fam_best_of_n,
    "epoch_budget": fam_epoch_budget,
    "token_spans": fam_token_spans,
    "bpe_spans": fam_bpe_spans,
    "cross_source_dups": fam_cross_source_dups,
    "cross_source_neardups": fam_cross_source_neardups,
    "priority_dedup": fam_priority_dedup,
    "leakage_split": fam_leakage_split,
    "dup_downweight": fam_dup_downweight,
    "neardup_decontam": fam_neardup_decontam,
    "pack_bpe_boundaries": fam_pack_bpe_boundaries,
    "line_dedup": fam_line_dedup,
    "threshold_sweep": fam_threshold_sweep,
    "flatten_tree": fam_flatten_tree,
    "prefix_loss": fam_prefix_loss,
    "cap_per_group": fam_cap_per_group,
    "pack_boundaries": fam_pack_boundaries,
}

#: cheap enough for the per-commit pytest gate (no doc-pair joins;
#: the 500-row embeddings families qualify)
CHEAP = ("percentiles", "winsorize", "topk", "histogram", "hash_split",
         "asof", "filtered_agg", "hash_sample", "pack_chunks",
         "sample_exact_n", "grouping_sets", "scd2_pointtime",
         "knn", "semantic_dedup", "winnow", "decontam_bloom",
         "hard_negatives", "winnow_registry", "substr_spans",
         "substr_report", "gopher", "c4", "contamination",
         "grouped_bins", "sft_spans", "diversity", "k_anonymity",
         "preference_pairs", "fertility", "l_diversity", "t_closeness",
         "datacard", "best_of_n", "epoch_budget", "threshold_sweep",
         "cross_source_dups")


def run_fuzz(spark, con, sf_dir: str, families, draws: int, seed: int,
             log=print) -> list[str]:
    """Replay every (family x draw); returns failure descriptions."""
    failures = []
    for name in families:
        build = FAMILIES[name]
        for d in range(draws):
            # crc32, not hash(): PYTHONHASHSEED salts str hashes per
            # process, and draws must reproduce from the printed seed
            import zlib

            fam_key = zlib.crc32(name.encode()) % 10_000
            rng = random.Random(seed * 10_000 + fam_key + d)
            params, spark_fn, sql, float_tol = build(rng)
            t0 = time.time()
            try:
                sdf = spark_fn(spark, sf_dir)
                s_cols, s_rows = list(sdf.columns), [tuple(r) for r in sdf.collect()]
                res = con.sql(sql)
                d_cols = [c[0] for c in res.description]
                d_rows = [tuple(r) for r in res.fetchall()]
            except Exception as ex:  # noqa: BLE001 - report, keep fuzzing
                failures.append(f"{name}[{params}] ERROR: {ex}")
                log(f"FAIL {name} draw{d} [{params}] error: {ex}")
                continue
            diff = compare_frames(s_cols, s_rows, d_cols, d_rows, float_tol)
            if diff is None:
                log(f"PASS {name} draw{d} [{params}] "
                    f"({len(s_rows)} rows, {time.time() - t0:.1f}s)")
            else:
                failures.append(f"{name}[{params}] {diff}")
                log(f"FAIL {name} draw{d} [{params}]: {diff}")
    return failures


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="*", default=[])
    ap.add_argument("--draws", type=int, default=3)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    fams = args.families or list(FAMILIES)
    unknown = [f for f in fams if f not in FAMILIES]
    if unknown:
        print(f"unknown families: {unknown}; available: {list(FAMILIES)}")
        return 2

    import duckdb

    from nsl_kdd_spark.session import get_session

    spark = get_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")
    failures = run_fuzz(spark, con, args.sf, fams, args.draws, args.seed)
    print(f"\n{'ALL PASS' if not failures else f'{len(failures)} FAILURES'}"
          f" ({len(fams)} families x {args.draws} draws, seed {args.seed})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""k-anonymity (round-11; operators/privacy.py — Sweeney 2002).
Oracle parity is held by q170 + the k_anonymity fuzz family; these
tests pin the suppression semantics, NULL linkage-class grouping,
the generalization arithmetic, and the no-window plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.privacy import generalize_bin, k_anonymize


def _people(spark):
    # (id, zip, age_bin) — zip 100 has 3 rows, zip 200 has 2, zip
    # NULL has 2 (must group together), zip 300 has 1
    return spark.createDataFrame(
        [
            (1, 100, 30),
            (2, 100, 30),
            (3, 100, 30),
            (4, 200, 40),
            (5, 200, 40),
            (6, None, 50),
            (7, None, 50),
            (8, 300, 60),
        ],
        "id long, zip int, age int",
    )


def test_suppress_drops_under_k_groups(spark):
    out = k_anonymize(_people(spark), ["zip", "age"], k=3)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]
    out2 = k_anonymize(_people(spark), ["zip", "age"], k=2)
    assert sorted(r["id"] for r in out2.collect()) == [1, 2, 3, 4, 5, 6, 7]
    # suppress mode drops the helper column
    assert "qid_group_size" not in out.columns


def test_nulls_are_one_linkage_class(spark):
    """Two unknown quasi-identifiers are the SAME linkage class: the
    NULL-zip rows survive k=2 because the join back is null-safe."""
    out = k_anonymize(_people(spark), ["zip"], k=2, mode="flag")
    rows = {r["id"]: r for r in out.collect()}
    assert rows[6]["qid_group_size"] == 2 and rows[6]["k_anonymous"]
    assert rows[7]["qid_group_size"] == 2 and rows[7]["k_anonymous"]
    assert not rows[8]["k_anonymous"]
    # every input row comes back exactly once in flag mode
    assert len(rows) == 8


def test_flag_counts_match_groupby(spark):
    df = _people(spark)
    out = k_anonymize(df, ["zip", "age"], k=3, mode="flag").collect()
    exp = {
        (r["zip"], r["age"]): r["cnt"]
        for r in df.groupBy("zip", "age").agg(F.count("*").alias("cnt")).collect()
    }
    for r in out:
        assert r["qid_group_size"] == exp[(r["zip"], r["age"])]
        assert r["k_anonymous"] == (r["qid_group_size"] >= 3)


def test_generalize_bin(spark):
    df = spark.createDataFrame(
        [(1, 1234.5), (2, -994.28), (3, 0.0), (4, 999.99)],
        "id long, v double",
    )
    got = {
        r["id"]: r["b"]
        for r in df.select("id", generalize_bin("v", 1000).alias("b")).collect()
    }
    assert got == {1: 1000, 2: -1000, 3: 0, 4: 0}


def test_invalid_args_raise(spark):
    df = _people(spark)
    with pytest.raises(ValueError):
        k_anonymize(df, [], k=2)
    with pytest.raises(ValueError):
        k_anonymize(df, ["zip"], k=0)
    with pytest.raises(ValueError):
        k_anonymize(df, ["zip"], k=2, mode="mask")
    with pytest.raises(ValueError):
        generalize_bin("v", 0)


def test_plan_aggregate_join_no_window(spark):
    """Scale shape: map-side-combined aggregate + one join back — no
    window (a coarse quasi-identifier bin can be corpus-sized), no
    Python."""
    from tests.test_plan_quality import plan_of

    df = k_anonymize(_people(spark), ["zip", "age"], k=3, mode="flag")
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert "HashAggregate" in tree or "Aggregate" in tree
    assert "Join" in tree
    assert "EvalPython" not in plan


def test_generalize_bin_fractional_width(spark):
    from nsl_kdd_spark.operators.privacy import generalize_bin

    df = spark.createDataFrame(
        [(1, 1.2), (2, 2.5), (3, 0.4), (4, -0.3)],
        "id long, v double",
    )
    got = {
        r["id"]: r["b"]
        for r in df.select(
            "id", generalize_bin("v", 0.5).alias("b")
        ).collect()
    }
    # review r11: int(width) zeroed every bin for width < 1
    assert got == {1: 1.0, 2: 2.5, 3: 0.0, 4: -0.5}


def _patients(spark):
    # qid zip; sensitive condition. zip 100: 3 distinct conditions;
    # zip 200: 1 condition across 3 rows (homogeneity attack!);
    # zip 300: 2 values where one is NULL (counts as a class)
    return spark.createDataFrame(
        [
            (1, 100, "flu"),
            (2, 100, "cold"),
            (3, 100, "burn"),
            (4, 200, "flu"),
            (5, 200, "flu"),
            (6, 200, "flu"),
            (7, 300, "cold"),
            (8, 300, None),
        ],
        "id long, zip int, cond string",
    )


def test_l_diversify_suppresses_homogeneous_groups(spark):
    from nsl_kdd_spark.operators.privacy import l_diversify

    out = l_diversify(_patients(spark), ["zip"], "cond", l=2)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3, 7, 8]
    out3 = l_diversify(_patients(spark), ["zip"], "cond", l=3)
    assert sorted(r["id"] for r in out3.collect()) == [1, 2, 3]


def test_l_diversify_flag_counts(spark):
    from nsl_kdd_spark.operators.privacy import l_diversify

    rows = {
        r["id"]: r
        for r in l_diversify(
            _patients(spark), ["zip"], "cond", l=2, mode="flag"
        ).collect()
    }
    assert len(rows) == 8
    assert rows[1]["qid_distinct_sensitive"] == 3 and rows[1]["l_diverse"]
    assert rows[4]["qid_distinct_sensitive"] == 1 and not rows[4]["l_diverse"]
    # NULL sensitive value is its own disclosure class
    assert rows[7]["qid_distinct_sensitive"] == 2 and rows[7]["l_diverse"]


def test_l_diversify_invalid_args(spark):
    import pytest as _pytest

    from nsl_kdd_spark.operators.privacy import l_diversify

    df = _patients(spark)
    with _pytest.raises(ValueError):
        l_diversify(df, [], "cond", l=2)
    with _pytest.raises(ValueError):
        l_diversify(df, ["zip"], "cond", l=0)
    with _pytest.raises(ValueError):
        l_diversify(df, ["zip"], "cond", l=2, mode="mask")


def test_t_closeness_matches_python_reference(spark):
    from collections import Counter

    from nsl_kdd_spark.operators.privacy import t_closeness_audit

    rows = [
        (1, 100, "flu"), (2, 100, "flu"), (3, 100, "cold"),
        (4, 200, "flu"), (5, 200, "cold"), (6, 200, "burn"),
        (7, 300, "burn"), (8, 300, "burn"),
        (9, 400, None), (10, 400, "flu"),
    ]
    df = spark.createDataFrame(rows, "id long, zip int, cond string")
    out = {
        r["id"]: r
        for r in t_closeness_audit(
            df, ["zip"], "cond", t_ppm=300000
        ).collect()
    }
    assert len(out) == 10
    n_total = len(rows)
    glob = Counter(
        ("\x00null" if r[2] is None else r[2]) for r in rows
    )
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(r[1], []).append(
            "\x00null" if r[2] is None else r[2]
        )
    for zipc, vals in groups.items():
        n = len(vals)
        c = Counter(vals)
        tv2 = sum(
            abs(c.get(v, 0) * n_total - glob[v] * n) for v in glob
        )
        ppm = (1_000_000 * tv2) // (2 * n * n_total)
        for i in (r[0] for r in rows if r[1] == zipc):
            assert out[i]["qid_emd_ppm"] == ppm
            assert out[i]["t_close"] == (ppm <= 300000)


def test_t_closeness_suppress_and_edges(spark):
    from nsl_kdd_spark.operators.privacy import t_closeness_audit

    rows = [
        (1, 100, "a"), (2, 100, "b"),   # mirrors the global mix
        (3, 200, "a"), (4, 200, "a"),   # skewed group
    ]
    df = spark.createDataFrame(rows, "id long, zip int, cond string")
    # global: a=3/4, b=1/4. group 100: a=1/2,b=1/2 -> TV=1/4=250000;
    # group 200: a=1,b=0 -> TV=1/4=250000. Both suppressed at t=0.2.
    flagged = {
        r["id"]: r["qid_emd_ppm"]
        for r in t_closeness_audit(
            df, ["zip"], "cond", t_ppm=200000
        ).collect()
    }
    assert flagged[1] == 250000 and flagged[3] == 250000
    kept = t_closeness_audit(
        df, ["zip"], "cond", t_ppm=250000, mode="suppress"
    ).count()
    assert kept == 4  # boundary is inclusive
    # whole-table-as-one-group is 0-distance from itself
    one = t_closeness_audit(df, ["zip"], "cond", t_ppm=0, mode="flag")
    grp = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b")], "id long, zip int, cond string"
    )
    all_rows = t_closeness_audit(
        grp, ["zip"], "cond", t_ppm=0
    ).collect()
    assert all(r["qid_emd_ppm"] == 0 and r["t_close"] for r in all_rows)


def test_t_closeness_invalid_args(spark):
    import pytest as _pytest

    from nsl_kdd_spark.operators.privacy import t_closeness_audit

    df = spark.createDataFrame([(1, 1, "a")], "id long, zip int, cond string")
    with _pytest.raises(ValueError):
        t_closeness_audit(df, [], "cond", t_ppm=1)
    with _pytest.raises(ValueError):
        t_closeness_audit(df, ["zip"], "cond", t_ppm=-1)
    with _pytest.raises(ValueError):
        t_closeness_audit(df, ["zip"], "cond", t_ppm=2_000_000)
    with _pytest.raises(ValueError):
        t_closeness_audit(df, ["zip"], "cond", t_ppm=1, mode="x")


def test_t_closeness_caps_sensitive_cardinality(spark):
    """The global distribution re-enters the plan as a LITERAL map,
    so the sensitive class domain must be bounded — past max_classes
    the operator refuses loudly instead of building a million-entry
    literal (verdict r11); the LIMIT bounds the collect itself."""
    from nsl_kdd_spark.operators.privacy import t_closeness_audit

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).alias("zip"),
        F.col("id").cast("string").alias("cond"),  # 100 classes
    )
    with pytest.raises(ValueError, match="generalize_bin"):
        t_closeness_audit(
            df, ["zip"], "cond", t_ppm=500_000, max_classes=50
        )
    # under the cap the same call runs
    out = t_closeness_audit(
        df, ["zip"], "cond", t_ppm=500_000, max_classes=200
    )
    assert out.count() == 100


def _ordered(spark, rows, **kw):
    from nsl_kdd_spark.operators.privacy import t_closeness_ordered_audit

    df = spark.createDataFrame(rows, "g string, v int")
    kw.setdefault("t_ppm", 500_000)
    kw.setdefault("mode", "flag")
    return t_closeness_ordered_audit(df, ["g"], "v", **kw)


def test_t_ordered_matches_python_reference(spark):
    """Hand-computed Li et al. §4.2 cumulative-sum EMD: domain
    {1,2,3} with global counts {3,2,1} (N=6, m=3); per group,
    ppm = (1e6 * sum_{i<m} |cumc_i*N - cumG_i*n|) // ((m-1)*n*N)."""
    rows = [("A", 1), ("A", 1), ("A", 2), ("B", 2), ("B", 3), ("C", 1)]
    got = {
        r["g"]: r["qid_emd_ppm"]
        for r in _ordered(spark, rows).select("g", "qid_emd_ppm")
        .distinct().collect()
    }
    # A: n=3, terms |2*6-3*3|+|3*6-5*3| = 3+3 -> 6e6//36 = 166666
    # B: n=2, terms |0-6|+|1*6-10|    = 6+4 -> 10e6//24 = 416666
    # C: n=1, terms |6-3|+|6-5|       = 3+1 -> 4e6//12  = 333333
    assert got == {"A": 166666, "B": 416666, "C": 333333}


def test_t_ordered_sees_position_categorical_cannot(spark):
    """The §4.2 motivation: P (all mass at the domain's EXTREME) and
    Q (all mass at its MIDDLE) are equally far under the categorical
    equal-ground-distance EMD, but the ordered EMD must move P's
    mass across every intermediate value — so only the ordered tier
    ranks P as the worse disclosure (hand-computed: 428571 vs
    285714 ppm ordered; both 714285 categorical)."""
    from nsl_kdd_spark.operators.privacy import t_closeness_audit

    rows = [("P", 0), ("P", 0), ("Q", 2), ("Q", 2)] + [
        ("R", v) for v in (0, 1, 2, 3, 4) for _ in (1, 2)
    ]
    ordered = {
        r["g"]: r["qid_emd_ppm"]
        for r in _ordered(spark, rows).select("g", "qid_emd_ppm")
        .distinct().collect()
    }
    df = spark.createDataFrame(rows, "g string, v int")
    cat = {
        r["g"]: r["qid_emd_ppm"]
        for r in t_closeness_audit(df, ["g"], "v", t_ppm=500_000)
        .select("g", "qid_emd_ppm").distinct().collect()
    }
    assert cat["P"] == cat["Q"] == 714285
    assert (ordered["P"], ordered["Q"]) == (428571, 285714)


def test_t_ordered_null_sensitive_excluded_and_m1(spark):
    # NULL sensitive rows leave the DISTRIBUTION but stay in the
    # flag-mode OUTPUT with their group's metric (advice r12: an
    # audit must not silently lose rows); a group whose every value
    # is NULL has no distribution and drops out
    rows = [("A", 1), ("A", None), ("B", 2), ("C", None)]
    out = _ordered(spark, rows).collect()
    got = sorted(
        (r["g"], -1 if r["v"] is None else r["v"]) for r in out
    )
    assert got == [("A", -1), ("A", 1), ("B", 2)]
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], set()).add(r["qid_emd_ppm"])
    # the NULL-valued A row carries the SAME group metric as A's
    # non-NULL row
    assert len(by_g["A"]) == 1
    # single-value domain: EMD 0 by definition, everything t-close
    one = _ordered(spark, [("A", 7), ("B", 7)], t_ppm=0).collect()
    assert all(r["qid_emd_ppm"] == 0 and r["t_close"] for r in one)


def test_t_ordered_guards(spark):
    from nsl_kdd_spark.operators.privacy import (
        t_closeness_ordered_audit,
    )

    sdf = spark.createDataFrame(
        [(1, "x", "a")], "id long, g string, v string"
    )
    with pytest.raises(ValueError, match="numeric"):
        t_closeness_ordered_audit(sdf, ["g"], "v", t_ppm=1)
    big = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("int").alias("v"),  # 100 distinct values
    )
    with pytest.raises(ValueError, match="generalize_bin"):
        t_closeness_ordered_audit(
            big, ["g"], "v", t_ppm=1, max_classes=50
        )


def test_t_ordered_suppress_counts(spark):
    rows = [("A", 1), ("A", 1), ("A", 2), ("B", 2), ("B", 3), ("C", 1)]
    kept = _ordered(spark, rows, t_ppm=200_000, mode="suppress").collect()
    # only A (166666 ppm) survives the 200k cut
    assert sorted(set(r["g"] for r in kept)) == ["A"]
    assert len(kept) == 3

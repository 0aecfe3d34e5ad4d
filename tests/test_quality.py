"""Data-quality tier: observe()-piggybacked audit counters (zero
extra passes) and keyed table reconciliation."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsl_kdd_spark.operators.quality import observe_quality, table_diff


def test_observe_quality_counts_in_one_action(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, "b", -1.0), (3, None, 2.0), (4, "d", None)],
        ["id", "name", "score"],
    )
    observed, obs = observe_quality(
        df,
        null_cols=["name", "score"],
        violations={"negative_score": F.col("score") < 0},
    )
    assert observed.count() == 4  # the only action — metrics ride on it
    got = obs.get
    assert got["n_rows"] == 4
    assert got["null_name"] == 2
    assert got["null_score"] == 1
    assert got["bad_negative_score"] == 1


def test_table_diff_classifies_all_four_ways(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(2, 25.0), (3, None), (4, 40.0), (5, 50.0)], ["k", "v"]
    )
    d = {r.k: r for r in table_diff(old, new, ["k"]).collect()}
    assert d[1].change_type == "removed"
    assert d[2].change_type == "changed" and d[2].old_v == 20.0 and d[2].new_v == 25.0
    assert d[3].change_type == "unchanged"  # null <=> null is a match
    assert d[4].change_type == "unchanged"
    assert d[5].change_type == "added" and d[5].old_v is None


def test_fuzzy_pairs_blocking_and_distance(spark):
    from nsl_kdd_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [("kitten",), ("sitten",), ("kittens",), ("kite",), (None,), ("kitten",)],
        ["name"],
    )
    got = {(r.val_a, r.val_b): r.distance for r in
           fuzzy_pairs(df, "name", max_distance=2).collect()}
    # same-prefix pairs within distance 2; duplicates and nulls ignored
    assert got[("kite", "kitten")] == 2
    assert got[("kitten", "kittens")] == 1
    # "sitten" is 1 edit from kitten but blocked out by first char:
    # the documented recall knob
    assert not any("sitten" in p for p in got)
    # length band is lossless under the distance cap
    assert ("kite", "kittens") not in got  # lev 3 > 2


def test_table_digest_detects_every_mutation_class(spark):
    from nsl_kdd_spark.operators.quality import table_digest

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], ["id", "v"]
    )
    d0 = tuple(table_digest(base).collect()[0])
    # identical content, different row order / partitioning -> equal
    d1 = tuple(table_digest(base.orderBy(F.desc("id")).repartition(7)).collect()[0])
    assert d0 == d1
    # mutation, deletion, duplication all move the digest
    mut = spark.createDataFrame([(1, "a"), (2, "B"), (3, None)], ["id", "v"])
    assert tuple(table_digest(mut).collect()[0]) != d0
    dele = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    assert tuple(table_digest(dele).collect()[0]) != d0
    dup = base.unionAll(spark.createDataFrame([(1, "a")], ["id", "v"]))
    # XOR alone would cancel the duplicated pair on even counts; the
    # mod-sum + row count still move
    assert tuple(table_digest(dup).collect()[0]) != d0
    # NULL sentinel: (3, NULL) vs (3, '') must differ
    empt = spark.createDataFrame([(1, "a"), (2, "b"), (3, "")], ["id", "v"])
    assert tuple(table_digest(empt).collect()[0]) != d0


def test_expect_quoted_rule_names_and_empty_guard(spark):
    import pytest

    from nsl_kdd_spark.operators.quality import expect

    df = spark.createDataFrame([(1,)], ["id"])
    rows = {r.rule: r for r in expect(
        df, {"customer's id present": "id IS NOT NULL"}
    ).collect()}
    assert rows["customer's id present"].n_violations == 0
    with pytest.raises(ValueError, match="at least one rule"):
        expect(df, {})


def test_psi_drift_detects_shift_and_is_stable(spark):
    """Identical distributions yield ~zero PSI; a hard shift yields a
    large one; partitioning does not change a single bin term
    (fixed-point rule); empty bins stay finite via smoothing."""
    import pytest

    from nsl_kdd_spark.operators.quality import psi_drift

    a = spark.createDataFrame([(float(i % 10),) for i in range(1000)], "v double")
    same = psi_drift(a, a, "v", lo=0.0, hi=10.0, n_bins=10).collect()
    assert sum(r.psi_u for r in same) == 0
    assert all(r.n_base == 100 for r in same)

    # target mass moves entirely into the top half
    b = spark.createDataFrame([(5.0 + (i % 5),) for i in range(1000)], "v double")
    shifted = psi_drift(a, b, "v", lo=0.0, hi=10.0, n_bins=10).collect()
    total = sum(r.psi_u for r in shifted)
    assert total > 250_000            # PSI > 0.25 = action threshold
    # bottom-half target bins are empty but finite (smoothed)
    bottom = [r for r in shifted if r.bin < 5]
    assert all(r.n_target == 0 and r.p_target_ppm > 0 for r in bottom)

    # partition invariance: same integers at any parallelism
    re = psi_drift(
        a.repartition(7), b.repartition(3), "v", lo=0.0, hi=10.0, n_bins=10
    ).collect()
    assert [(r.bin, r.psi_u) for r in re] == [(r.bin, r.psi_u) for r in shifted]

    with pytest.raises(ValueError, match="n_bins"):
        psi_drift(a, b, "v", lo=1.0, hi=1.0)


def test_psi_categorical_vocabulary_and_other(spark):
    """Explicit vocabulary fixes the output schema; unknown and NULL
    values land in __other__; identical mixes score zero."""
    import pytest

    from nsl_kdd_spark.operators.quality import psi_drift_categorical

    a = spark.createDataFrame(
        [("x",)] * 6 + [("y",)] * 3 + [("weird",)] + [(None,)],
        "c string",
    )
    same = psi_drift_categorical(a, a, "c", ["x", "y"]).collect()
    assert [r.category for r in same] == ["__other__", "x", "y"]
    other = [r for r in same if r.category == "__other__"][0]
    assert other.n_base == 2                    # 'weird' + NULL
    assert sum(r.psi_u for r in same) == 0

    b = spark.createDataFrame([("y",)] * 10, "c string")
    shifted = psi_drift_categorical(a, b, "c", ["x", "y"]).collect()
    assert sum(r.psi_u for r in shifted) > 250_000

    with pytest.raises(ValueError, match="category"):
        psi_drift_categorical(a, b, "c", [])


def test_psi_terms_never_null_past_scale_totals(spark):
    """Round-4 advisory regression: once a side's total exceeds the
    fixed-point ``scale``, an empty bin's smoothed proportion floors
    to 0 under integer division, ln(0) goes NULL, and the summed PSI
    silently understates drift. The >=1-ppm clamp must keep every term
    finite — exercised here with a reduced scale so the test stays
    tiny (200 rows > scale=100 triggers the same floor)."""
    from pyspark.sql import functions as F

    from nsl_kdd_spark.operators.quality import psi_drift

    base = spark.range(200).select((F.lit(0.5)).alias("v"))     # bin 0
    target = spark.range(200).select((F.lit(1.5)).alias("v"))   # bin 1
    rows = {r.bin: r for r in psi_drift(
        base, target, "v", lo=0.0, hi=2.0, n_bins=2, scale=100
    ).collect()}
    # every proportion >= 1 ppm-unit, every term present and finite
    for r in rows.values():
        assert r.p_base_ppm >= 1 and r.p_target_ppm >= 1
        assert r.psi_u is not None
    # maximal shift: both bins contribute large positive terms
    assert rows[0].psi_u > 0 and rows[1].psi_u > 0


def test_containment_pairs_catch_subset_dups_jaccard_misses(spark):
    """Overlap-coefficient dedup: a short doc quoted whole inside a
    much longer one must pair at containment ~1.0 while the jaccard
    tier (correctly) scores it far below its threshold; stop-shingle
    df-cap only lowers overlap, never invents pairs."""
    from nsl_kdd_spark.operators.dedup import containment_pairs, jaccard_pairs

    quote = "the quick brown fox jumps over the lazy dog near the riverbank"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, quote),
         (2, filler + " " + quote + " " + filler.replace("w", "z")),
         (3, "completely unrelated text about parquet shuffle tuning")],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b): r.overlap for r in containment_pairs(
        docs, "doc_id", "text", threshold=0.9).collect()}
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert all(k == (1, 2) for k in got)

    jac = {(r.id_a, r.id_b) for r in jaccard_pairs(
        docs, "doc_id", "text", threshold=0.8).collect()}
    assert (1, 2) not in jac            # the gap this operator fills

    capped = {(r.id_a, r.id_b): r.overlap for r in containment_pairs(
        docs, "doc_id", "text", threshold=0.5,
        max_shingle_freq=1).collect()}
    # every shared shingle has df=2 -> all dropped -> no pairs at all
    assert capped == {}


def test_datacard_report_known_values(spark):
    from nsl_kdd_spark.operators.quality import datacard_report

    df = spark.createDataFrame(
        [
            (1, "s0", "en", "a b c"),
            (2, "s0", "en", "d e"),
            (3, "s0", "fr", "f"),
            (4, "s1", "en", "g h i j"),
        ],
        "id long, source string, lang string, text string",
    )
    rows = datacard_report(df, ["source", "lang"], "text").collect()
    by_key = {(r["source"], r["lang"], r["gid"]): r for r in rows}
    # finest tier
    r = by_key[("s0", "en", 0)]
    assert (r["n_docs"], r["n_tokens"], r["min_tokens"], r["max_tokens"]) \
        == (2, 5, 2, 3)
    assert r["tokens_per_doc_ppm"] == (1_000_000 * 5) // 2
    # source rollup
    r = by_key[("s0", None, 1)]
    assert (r["n_docs"], r["n_tokens"]) == (3, 6)
    # grand total
    r = by_key[(None, None, 3)]
    assert (r["n_docs"], r["n_tokens"]) == (4, 10)
    assert len(rows) == 3 + 2 + 1  # (s,l) tiers + s tiers + total


def test_datacard_report_rejects_empty_dims(spark):
    import pytest as _pytest

    from nsl_kdd_spark.operators.quality import datacard_report

    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with _pytest.raises(ValueError):
        datacard_report(df, [], "text")


def test_threshold_sweep_report(spark):
    """One-pass sweep semantics: NULL scores never pass but count in
    the totals; weight defaults to 1/doc; ppm against the FULL
    corpus; thresholds sorted + deduped; empty set refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from nsl_kdd_spark.operators.quality import threshold_sweep_report

    df = spark.createDataFrame(
        [(10, 4), (20, 6), (30, 10), (None, 100)],
        "score long, w long",
    )
    rows = {
        r["threshold"]: r
        for r in threshold_sweep_report(
            df, "score", [20, 5, 20, 31], weight_col="w"
        ).collect()
    }
    assert sorted(rows) == [5, 20, 31]
    assert (rows[5]["kept_docs"], rows[5]["kept_weight"]) == (3, 20)
    assert (rows[20]["kept_docs"], rows[20]["kept_weight"]) == (2, 16)
    assert (rows[31]["kept_docs"], rows[31]["kept_weight"]) == (0, 0)
    # ppm against full totals (4 docs, 120 weight incl. the unscored)
    assert rows[5]["kept_docs_ppm"] == (1_000_000 * 3) // 4
    assert rows[5]["kept_weight_ppm"] == (1_000_000 * 20) // 120
    # doc-count basis
    one = threshold_sweep_report(df, "score", [15]).collect()[0]
    assert (one["kept_docs"], one["kept_weight"]) == (2, 2)
    with _pytest.raises(ValueError):
        threshold_sweep_report(df, "score", [])
    # plan: ONE aggregate, no window/join
    from tests.test_plan_quality import plan_of

    plan = plan_of(threshold_sweep_report(df, "score", [5, 20]))
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree and "Join" not in tree
    assert "EvalPython" not in plan

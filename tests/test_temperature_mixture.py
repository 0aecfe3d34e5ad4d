"""Temperature-balanced mixture sampling (round-10;
operators/corpus.temperature_mixture — XLM/mT5-style alpha-smoothed
group sampling with epoch-replication upsampling). Oracle parity is
held by q158 + the temperature_mixture fuzz family; these tests pin
the allocation arithmetic against a pure-Python reference and the
100 TB plan shape of the default rate mode."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.corpus import temperature_mixture


def _docs(spark):
    rows = []
    doc = 0
    for grp, n in (("en", 40), ("fr", 10), ("zh", 6)):
        for _ in range(n):
            rows.append((doc, grp, f"text {doc}"))
            doc += 1
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


def _py_alloc(counts: dict[str, int], alpha: float, target: int):
    w = {}
    for g, n in counts.items():
        if alpha == 1.0:
            w[g] = n * 1000000
        elif alpha == 0.5:
            w[g] = math.floor(math.sqrt(n) * 1000000.0)
        elif alpha == 0.25:
            w[g] = math.floor(math.sqrt(math.sqrt(n)) * 1000000.0)
        else:
            w[g] = math.floor(
                math.sqrt(n) * math.sqrt(math.sqrt(n)) * 1000000.0
            )
    sw = sum(w.values())
    take = {g: (target * w[g]) // sw for g in counts}
    return {
        g: (take[g] // counts[g], take[g] % counts[g]) for g in counts
    }


def _bucket32(doc_id: int, salt: str = "") -> int:
    return int(
        hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16
    )


@pytest.mark.parametrize("alpha", [0.25, 0.5, 0.75, 1.0])
def test_rate_mode_matches_python_reference(spark, alpha):
    docs = _docs(spark)
    counts = {"en": 40, "fr": 10, "zh": 6}
    alloc = _py_alloc(counts, alpha, 56)
    out = temperature_mixture(
        docs, "lang", "doc_id", alpha=alpha
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.epoch)
    grp_of = {r.doc_id: r.lang for r in docs.collect()}
    for doc_id, grp in grp_of.items():
        ep, rem = alloc[grp]
        # 32-bit remainder cut (round-11 — the 16-bit truncation
        # undershot heavy downsampling)
        thr = (2**32 * rem) // counts[grp]
        expected = ep + (1 if _bucket32(doc_id) < thr else 0)
        eps = sorted(got.get(doc_id, []))
        assert eps == list(range(1, expected + 1)), (doc_id, alpha)


def test_exact_mode_takes_exactly_the_allocation(spark):
    docs = _docs(spark)
    out = temperature_mixture(
        docs, "lang", "doc_id", alpha=0.5, target_total=112, exact=True
    )
    per = {
        r.lang: r["count"]
        for r in out.groupBy("lang").count().collect()
    }
    alloc = _py_alloc({"en": 40, "fr": 10, "zh": 6}, 0.5, 112)
    for g, (ep, rem) in alloc.items():
        n = {"en": 40, "fr": 10, "zh": 6}[g]
        assert per[g] == ep * n + rem, g


def test_alpha_one_is_identity_mixture(spark):
    # alpha=1 with default target reproduces the corpus exactly once
    docs = _docs(spark)
    out = temperature_mixture(docs, "lang", "doc_id", alpha=1.0)
    assert out.count() == 56
    assert out.filter(F.col("epoch") != 1).count() == 0


def test_lower_alpha_flattens_the_mixture(spark):
    docs = _docs(spark)

    def spread(alpha):
        per = {
            r.lang: r["count"]
            for r in temperature_mixture(
                docs, "lang", "doc_id", alpha=alpha, exact=True
            ).groupBy("lang").count().collect()
        }
        return max(per.values()) / max(1, min(per.values()))

    # monotone: smaller alpha -> more balanced groups
    assert spread(0.25) <= spread(0.5) <= spread(1.0)


def test_upsampled_copies_number_epochs_densely(spark):
    docs = _docs(spark)
    out = temperature_mixture(
        docs, "lang", "doc_id", alpha=0.25, target_total=300,
        exact=True,
    )
    # zh (6 docs) is heavily upsampled: every doc carries epochs 1..k
    zh = out.filter(F.col("lang") == "zh").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.min("epoch").alias("lo"),
        F.max("epoch").alias("hi"),
    )
    for r in zh.collect():
        assert (r.lo, r.hi) == (1, r.k)
        assert r.k >= 2  # genuinely replicated


def test_invalid_args_raise(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mixture(docs, "lang", "doc_id", alpha=0.7)
    with pytest.raises(ValueError, match="target_total"):
        temperature_mixture(
            docs, "lang", "doc_id", target_total=0
        )


def _weighted_docs(spark):
    # per-doc token-count weights: en docs are LONG (10 tokens
    # each), zh docs are short (2) — doc-count balancing and
    # token-mass balancing disagree sharply on this corpus
    rows = []
    doc = 0
    for grp, n, toks in (("en", 8, 10), ("fr", 6, 5), ("zh", 12, 2)):
        for _ in range(n):
            rows.append((doc, grp, toks))
            doc += 1
    return spark.createDataFrame(
        rows, "doc_id long, lang string, n_tok long"
    )


def _py_weighted_alloc(masses, alpha, target):
    w = {}
    for g, m in masses.items():
        if alpha == 1.0:
            w[g] = m * 1000000
        elif alpha == 0.5:
            w[g] = math.floor(math.sqrt(m) * 1000000.0)
    sw = sum(w.values())
    take = {g: (target * w[g]) // sw for g in masses}
    return {g: (take[g] // masses[g], take[g] % masses[g]) for g in masses}


def test_weight_col_allocates_by_token_mass(spark):
    """Round-10 verdict task 1: weight_col balances groups by
    CORPUS SIZE (mT5/XLM-R's published basis), replaying the same
    alloc arithmetic with n_g = sum(weight). Epoch semantics stay
    group-uniform: a doc's copy count is e_g + the id-hash
    remainder draw, never a function of other docs' lengths."""
    docs = _weighted_docs(spark)
    masses = {"en": 80, "fr": 30, "zh": 24}  # token masses
    alloc = _py_weighted_alloc(masses, 0.5, 134)  # default tgt = Σmass
    out = temperature_mixture(
        docs, "lang", "doc_id", alpha=0.5, weight_col="n_tok"
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.epoch)
    for r in docs.collect():
        ep, rem = alloc[r.lang]
        thr = (2**32 * rem) // masses[r.lang]
        expected = ep + (1 if _bucket32(r.doc_id) < thr else 0)
        eps = sorted(got.get(r.doc_id, []))
        assert eps == list(range(1, expected + 1)), r.doc_id


def test_weight_col_disagrees_with_doc_count_balancing(spark):
    """The motivating case: zh has the MOST docs but the LEAST
    tokens. Doc-count alpha=1 keeps zh the biggest group of the mix;
    token-weighted alpha=1 allocates zh the least token mass."""
    docs = _weighted_docs(spark)
    by_doc = temperature_mixture(docs, "lang", "doc_id", alpha=1.0)
    doc_counts = {
        r.lang: r["count"]
        for r in by_doc.groupBy("lang").count().collect()
    }
    assert max(doc_counts, key=doc_counts.get) == "zh"
    by_tok = temperature_mixture(
        docs, "lang", "doc_id", alpha=1.0, weight_col="n_tok"
    )
    tok_mass = {
        r.lang: r.mass
        for r in by_tok.groupBy("lang")
        .agg(F.sum("n_tok").alias("mass"))
        .collect()
    }
    assert min(tok_mass, key=tok_mass.get) == "zh"


def test_weight_col_exact_mode_greedy_prefix_packing(spark):
    """exact=True + weight_col: the remainder is the longest
    md5-digest-ordered prefix whose cumulative weight fits rem_g."""
    docs = _weighted_docs(spark)
    masses = {"en": 80, "fr": 30, "zh": 24}
    alloc = _py_weighted_alloc(masses, 0.5, 134)
    out = temperature_mixture(
        docs, "lang", "doc_id", alpha=0.5, weight_col="n_tok",
        exact=True,
    )
    per = {
        r.lang: r.mass
        for r in out.groupBy("lang")
        .agg(F.sum("n_tok").alias("mass"))
        .collect()
    }
    rows = sorted(
        docs.collect(),
        key=lambda r: (
            hashlib.md5(f"{r.doc_id}".encode()).hexdigest(),
            r.doc_id,
        ),
    )
    for g, (ep, rem) in alloc.items():
        cum = packed = 0
        for r in rows:
            if r.lang != g:
                continue
            cum += r.n_tok
            if cum <= rem:
                packed += r.n_tok
        assert per.get(g, 0) == ep * masses[g] + packed, g


def test_cross_group_weight_sum_does_not_wrap(spark):
    """Round-11 review: Σw across groups can wrap BIGINT even when
    every per-group weight fits it (alpha=0.75, four ~3.5e16-mass
    groups => each w ~ 2.6e18, Σw ~ 1e19 > 2^63). The decimal sum
    must allocate exactly instead of silently returning zero rows."""
    per_doc = 35_000_000_000_000_000 // 2  # 2 docs/group = 3.5e16 mass
    rows = []
    doc = 0
    for grp in ("g0", "g1", "g2", "g3"):
        for _ in range(2):
            rows.append((doc, grp, per_doc))
            doc += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tok long"
    )
    out = temperature_mixture(
        docs, "lang", "doc_id", alpha=0.75, weight_col="n_tok"
    ).collect()
    # equal masses => every group allocates ~one epoch; with the r11
    # BIGINT sum wrap this returned [] (all takes negative)
    assert len(out) > 0
    masses = {g: 2 * per_doc for g in ("g0", "g1", "g2", "g3")}
    w = {
        g: math.floor(
            math.sqrt(m) * math.sqrt(math.sqrt(m)) * 1000000.0
        )
        for g, m in masses.items()
    }
    sw = sum(w.values())
    assert sw > 2**63 - 1  # the scenario genuinely exceeds BIGINT
    tgt = sum(masses.values())
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.epoch)
    for doc_id, grp, _ in rows:
        take = (tgt * w[grp]) // sw
        ep, rem = take // masses[grp], take % masses[grp]
        thr = (2**32 * rem) // masses[grp]
        expected = ep + (1 if _bucket32(doc_id) < thr else 0)
        assert sorted(got.get(doc_id, [])) == list(
            range(1, expected + 1)
        ), doc_id


def test_weight_col_null_raises(spark):
    docs = _weighted_docs(spark).withColumn(
        "n_tok",
        F.when(F.col("doc_id") == 3, F.lit(None)).otherwise(
            F.col("n_tok")
        ),
    )
    with pytest.raises(Exception, match="NULL"):
        temperature_mixture(
            docs, "lang", "doc_id", alpha=0.5, weight_col="n_tok"
        ).collect()


def test_weight_col_negative_raises(spark):
    docs = _weighted_docs(spark).withColumn(
        "n_tok",
        F.when(F.col("doc_id") == 3, F.lit(-1)).otherwise(F.col("n_tok")),
    )
    with pytest.raises(Exception, match="negative"):
        temperature_mixture(
            docs, "lang", "doc_id", alpha=0.5, weight_col="n_tok"
        ).collect()


def test_zero_mass_group_is_dropped_not_divided(spark):
    docs = _weighted_docs(spark).withColumn(
        "n_tok",
        F.when(F.col("lang") == "fr", F.lit(0)).otherwise(F.col("n_tok")),
    )
    out = temperature_mixture(
        docs, "lang", "doc_id", alpha=0.5, weight_col="n_tok"
    )
    assert out.filter(F.col("lang") == "fr").count() == 0
    assert out.filter(F.col("lang") == "en").count() > 0


def test_token_scale_targets_do_not_overflow(spark):
    """The DECIMAL(38,0) alloc: a ~100-trillion-token corpus with a
    token-scale target puts tgt * w at ~1e27 — far past BIGINT,
    where the round-10 arithmetic raised loudly — and 2^32 * rem at
    ~1e23. Both must now allocate exactly (epoch counts stay O(1):
    the target is the same order as the corpus, the realistic
    regime — explode materializes epochs physically)."""
    per_doc = 4_000_000_000_000  # 4e12 tokens per doc
    rows = []
    doc = 0
    for grp, n in (("en", 15), ("fr", 7), ("zh", 4)):
        for _ in range(n):
            rows.append((doc, grp, per_doc))
            doc += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tok long"
    )
    masses = {g: n * per_doc for g, n in (("en", 15), ("fr", 7), ("zh", 4))}
    tgt = sum(masses.values())  # ~1.04e14 tokens
    alloc = _py_weighted_alloc(masses, 0.5, tgt)
    out = temperature_mixture(
        docs, "lang", "doc_id", alpha=0.5, weight_col="n_tok",
        target_total=tgt,
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.epoch)
    n_docs = {"en": 15, "fr": 7, "zh": 4}
    for r in rows:
        doc_id, grp, _ = r
        ep, rem = alloc[grp]
        thr = (2**32 * rem) // masses[grp]
        expected = ep + (1 if _bucket32(doc_id) < thr else 0)
        eps = sorted(got.get(doc_id, []))
        assert eps == list(range(1, expected + 1)), doc_id
    # the zh upweight genuinely replicates (alpha=0.5 over-allocates
    # the smallest group past one epoch)
    assert alloc["zh"][0] >= 1 and alloc["en"][0] <= 1


def test_rate_mode_plan_has_no_window(spark):
    """100 TB shape of the default: one k-row count aggregate,
    broadcast alloc join, explode — NO window anywhere (a language
    is a corpus-sized group; a per-group rank would be a giant
    single partition), no cartesian on the big side, no Python."""
    from tests.test_plan_quality import plan_of

    df = temperature_mixture(_docs(spark), "lang", "doc_id", alpha=0.5)
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in tree  # alloc attaches broadcast


def test_epoch_budget_report_reference(spark):
    """Muennighoff et al. 2023 accounting on a hand-checked fixture:
    alpha=1 token-weighted allocation of a 60-unit budget over
    masses {a: 10, b: 20} -> takes {20, 40}, epochs {2x, 2x},
    repeats 1e6 ppm each; effective = U + U*15.39*(1 - exp(-R/R*))
    quantized; the 1.5-epoch cap flags both and frees the excess."""
    import math

    from nsl_kdd_spark.operators.corpus import epoch_budget_report

    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 6), ("b", 3, 20)],
        "g string, i long, w long",
    )
    rows = {
        r["g"]: r
        for r in epoch_budget_report(
            df, "g", budget=60, alpha=1.0, weight_col="w",
            max_epochs_ppm=1_500_000,
        ).collect()
    }
    for g, n in (("a", 10), ("b", 20)):
        r = rows[g]
        assert (r["n_tokens"], r["take_tokens"]) == (n, 2 * n)
        assert r["epochs_ppm"] == 2_000_000
        assert r["repeats_ppm"] == 1_000_000
        decay = round(1e6 * math.exp(-1_000_000 / 15_390_000.0))
        assert r["decay_ppm"] == decay
        seen = min(r["take_tokens"], n)
        assert r["effective_tokens"] == seen + (
            seen * 15_390_000 * (1_000_000 - decay)
        ) // 10**12
        assert r["over_cap"]
        assert r["excess_tokens"] == (n * 500_000) // 10**6


def test_epoch_budget_sub_one_epoch_and_budget_conservation(spark):
    """Groups allocated under one epoch carry zero repeats, decay
    1e6 and effective == unique; floor rounding keeps the summed
    allocation at or under the budget."""
    from nsl_kdd_spark.operators.corpus import epoch_budget_report

    df = spark.createDataFrame(
        [("a", 1, 100), ("b", 2, 300), ("c", 3, 77)],
        "g string, i long, w long",
    )
    rows = epoch_budget_report(
        df, "g", budget=200, alpha=0.5, weight_col="w"
    ).collect()
    assert sum(r["take_tokens"] for r in rows) <= 200
    for r in rows:
        assert r["epochs_ppm"] < 1_000_000
        assert r["repeats_ppm"] == 0
        assert r["decay_ppm"] == 1_000_000
        # sub-1-epoch: effective = tokens actually consumed (take),
        # never the corpus mass (review r12)
        assert r["effective_tokens"] == r["take_tokens"]
    assert "over_cap" not in rows[0].asDict()


def test_epoch_budget_guards(spark):
    import pytest as _pytest

    from nsl_kdd_spark.operators.corpus import epoch_budget_report

    df = spark.createDataFrame([("a", 1)], "g string, i long")
    with _pytest.raises(ValueError):
        epoch_budget_report(df, "g", budget=10, alpha=0.3)
    with _pytest.raises(ValueError):
        epoch_budget_report(df, "g", budget=10, r_star_ppm=0)
    with _pytest.raises(ValueError):
        epoch_budget_report(df, "g", budget=10, max_epochs_ppm=500)

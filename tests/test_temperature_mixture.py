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


def _bucket(doc_id: int, salt: str = "") -> int:
    return int(
        hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:4], 16
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
        thr = (65536 * rem) // counts[grp]
        expected = ep + (1 if _bucket(doc_id) < thr else 0)
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

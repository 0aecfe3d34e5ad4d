"""Corpus cleaning funnel — the LLM-training-data pipeline composition
(BASELINE.json north-star), chaining the engine's dedup/text tiers in
cost order:

  raw docs
   1. exact dedup         md5(content), keep lowest id     (cheapest)
   2. fingerprint dedup   md5(sorted distinct tokens) — catches
                          token-permutation/repetition copies
   3. near-dup drop       shingle-jaccard pairs >= t among survivors;
                          greedy rule: drop the higher id of each pair
   4. quality gate        token count + quality score thresholds

Each tier only sees the previous tier's survivors, so the expensive
pairwise stage runs on the smallest candidate set. The greedy pair
rule (drop id_b) is order-deterministic and engine-portable; exact
transitive clustering is a connected-components pass that can replace
it where clusters matter more than throughput.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.text import (
    exact_hash,
    fingerprint,
    quality_score,
    token_count,
)
from nsl_kdd_spark.operators.dedup import jaccard_pairs


@dataclass(frozen=True)
class CorpusCleanConfig:
    jaccard_threshold: float = 0.8
    shingle_n: int = 3
    min_tokens: int = 20
    min_quality: float = 0.3


def _keep_first(df: DataFrame, key, id_col: str) -> DataFrame:
    w = Window.partitionBy(key).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def corpus_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: CorpusCleanConfig | None = None,
) -> dict[str, DataFrame]:
    """Returns {"kept": surviving rows, "funnel": one-row stage
    counts}. Stage counts are computed on cached survivors so the
    funnel costs one pass per tier."""
    cfg = cfg or CorpusCleanConfig()

    s1 = _keep_first(df, exact_hash(text_col), id_col).cache()
    s2 = _keep_first(s1, fingerprint(text_col), id_col).cache()

    pairs = jaccard_pairs(
        s2, id_col, text_col, n=cfg.shingle_n, threshold=cfg.jaccard_threshold
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    s3 = s2.join(drop, on=id_col, how="left_anti").cache()

    s4 = s3.filter(
        (token_count(text_col) >= cfg.min_tokens)
        & (quality_score(text_col) >= cfg.min_quality)
    ).cache()

    spark = df.sparkSession
    funnel = spark.createDataFrame(
        [(
            df.count(), s1.count(), s2.count(), s3.count(), s4.count(),
        )],
        "n_raw long, n_after_exact long, n_after_fingerprint long, "
        "n_after_neardup long, n_kept long",
    )
    return {"kept": s4, "funnel": funnel}


def mix_corpora(
    sources: dict[str, DataFrame],
    key_col: str,
    fractions: dict[str, float],
    salt: str = "",
    tag_col: str = "source_name",
) -> DataFrame:
    """Pretraining-mixture assembly: deterministically subsample each
    source corpus to its target fraction and union the results, tagged
    with the source name. The "30% web / 30% code / 40% books" step of
    a training-data pipeline, built on ``relational.sample_hash`` so
    membership is a pure function of (salt, source, key): re-runs,
    repartitionings, and incremental re-ingests of any one source
    never change another source's sample, and upsampling a source
    (raising its fraction) GROWS its sample as a superset — no
    resample churn. Per-source salts (``salt + name``) keep the
    sources' hash streams independent.

    Scale shape (100 TB): each source scans once with a scan-level
    filter (no shuffle, no RNG state, no coordination); the union is
    plan-level only. Mixing ratios over token budgets rather than doc
    counts: pair with ``sample_hash_weighted`` using a per-doc
    token-count-aware weight, same contract.
    """
    from functools import reduce

    from nsl_kdd_spark.operators.relational import sample_hash

    missing = set(sources) - set(fractions)
    if missing:
        raise ValueError(f"mix_corpora: no fraction for {sorted(missing)}")
    parts = [
        sample_hash(df, key_col, fractions[name], salt=salt + name)
        .withColumn(tag_col, F.lit(name))
        for name, df in sorted(sources.items())
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def select_canonical(
    docs: DataFrame,
    components: DataFrame,
    score: Column,
    id_col: str = "doc_id",
    node_col: str = "node",
    comp_col: str = "comp",
) -> DataFrame:
    """Pick the canonical document per duplicate cluster BY QUALITY
    instead of by id: given the corpus and a (node, comp) component
    table from ``graph.connected_components``, keep the
    highest-``score`` member of every cluster (ties by id — total
    order) and every unclustered document. The upgrade over
    keep-first/keep-lowest-id dedup: when near-dups differ (one copy
    truncated, one boilerplated), the cluster survivor is the best
    copy, not an arbitrary one.

    Output: the surviving rows of ``docs`` with their ``comp`` (null
    for singletons) — same schema contract as the dedup tier, so it
    drops into ``corpus_clean`` pipelines after the CC step.

    Scale shape: the component table is pair-derived (much smaller
    than the corpus); one equi-join attaches cluster ids, one
    cluster-keyed window picks the argmax. Only clustered rows enter
    the window — singletons pass through the anti-join untouched.
    """
    from pyspark.sql import Window

    comp = components.select(
        F.col(node_col).alias(id_col), F.col(comp_col).alias("comp")
    )
    clustered = docs.join(comp, id_col)
    w = Window.partitionBy("comp").orderBy(
        score.desc(), F.col(id_col).asc()
    )
    winners = (
        clustered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    singletons = docs.join(comp, id_col, "left_anti").withColumn(
        "comp", F.lit(None).cast(comp.schema["comp"].dataType)
    )
    return winners.unionByName(singletons)

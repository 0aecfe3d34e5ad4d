"""Repetition-based quality signals (Gopher-rule family).

The Gopher / MassiveText cleaning rules (Rae et al. 2021, table A1)
filter documents by how self-repetitive they are: fraction of tokens
that are duplicates, and fraction of characters covered by the most
frequent word n-gram. Both are strong low-quality indicators
(boilerplate, SEO spam, template pages) that simple length/stopword
gates miss.

Spark shape: per-doc token multiplicities need an explode, but the
groupBy keys are (doc, gram) — partial aggregation (map-side combine)
collapses each doc's grams within its own partition, so the shuffle
carries one row per *distinct* gram per doc, and the top-gram pick is
a max_by in the same doc-keyed aggregation that re-assembles the
metrics (no window, no second shuffle of the exploded data).

Metrics (all ratios in [0,1], 0 for degenerate/empty docs):

- ``dup_token_frac``   1 - distinct_tokens / tokens (expression-only)
- ``top_ngram_frac``   chars of the most frequent word n-gram * its
                       count / total chars (ties: lexicographically
                       smallest gram, so results are deterministic)

Everything is tokenization + counting — DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.text import token_count, tokens


def dup_token_frac(col) -> F.Column:
    """1 - |distinct tokens| / |tokens|; 0 for empty docs."""
    t = tokens(col)
    return F.when(
        F.size(t) > 0,
        1.0 - F.size(F.array_distinct(t)) / F.size(t).cast("double"),
    ).otherwise(F.lit(0.0))


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-doc repetition metrics: (id, n_tokens, dup_token_frac,
    top_ngram, top_ngram_count, top_ngram_frac).

    ``top_ngram_frac`` uses the Gopher definition: characters covered
    by all occurrences of the single most frequent n-gram, divided by
    total characters of the doc.
    """
    from nsl_kdd_spark.operators.dedup import word_shingles  # non-distinct below

    toks = tokens(text_col)
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        token_count(text_col).alias("n_tokens"),
        dup_token_frac(text_col).alias("dup_token_frac"),
        F.length(text_col).cast("double").alias("__chars"),
        toks.alias("__toks"),
    )
    # All (non-distinct) n-gram occurrences: same slice recipe as
    # word_shingles but WITHOUT array_distinct — counts need every
    # occurrence. Short docs (< n tokens) contribute no grams.
    grams = base.select(
        id_col,
        "n_tokens",
        "dup_token_frac",
        "__chars",
        F.explode(
            F.when(
                F.size("__toks") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("__toks", i, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("__g"),
    )
    per_gram = grams.groupBy(id_col, "__g").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.first("dup_token_frac").alias("dup_token_frac"),
        F.first("__chars").alias("__chars"),
        F.count(F.lit(1)).alias("__gc"),
    )
    # Deterministic top gram: max count, ties -> smallest gram text.
    # max_by over a struct orders by (count, reversed-bytes proxy) —
    # instead use two-stage: max count, then min gram at that count.
    top = (
        per_gram.groupBy(id_col)
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.first("dup_token_frac").alias("dup_token_frac"),
            F.first("__chars").alias("__chars"),
            F.max("__gc").alias("top_ngram_count"),
            F.min_by(
                "__g",
                F.struct(
                    (-F.col("__gc")).alias("neg"), F.col("__g").alias("g")
                ),
            ).alias("top_ngram"),
        )
    )
    out = top.select(
        id_col,
        "n_tokens",
        F.col("dup_token_frac"),
        "top_ngram",
        "top_ngram_count",
        F.when(
            F.col("__chars") > 0,
            # chars covered = occurrences * gram length (spaces incl.)
            F.least(
                F.lit(1.0),
                F.col("top_ngram_count")
                * F.length("top_ngram")
                / F.col("__chars"),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("top_ngram_frac"),
    )
    # Docs with < n tokens produced no grams and dropped out of the
    # aggregation — restore them with zero repetition signals.
    short = base.join(
        out.select(id_col), on=id_col, how="left_anti"
    ).select(
        id_col,
        "n_tokens",
        "dup_token_frac",
        F.lit(None).cast("string").alias("top_ngram"),
        F.lit(0).cast("long").alias("top_ngram_count"),
        F.lit(0.0).alias("top_ngram_frac"),
    )
    return out.unionByName(short)


def repetition_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    max_dup_token_frac: float = 0.5,
    max_top_ngram_frac: float = 0.2,
) -> DataFrame:
    """Gopher-style gate: keep docs under both repetition ceilings."""
    stats = repetition_stats(df, id_col, text_col, n).select(
        id_col, "dup_token_frac", "top_ngram_frac"
    )
    keep = stats.filter(
        (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_ngram_frac") <= max_top_ngram_frac)
    ).select(id_col)
    return df.join(keep, on=id_col, how="left_semi")

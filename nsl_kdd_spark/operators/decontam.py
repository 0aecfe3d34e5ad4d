"""Benchmark decontamination (SURVEY.md §2.13 training-data tier).

LLM training corpora must not contain the evaluation benchmarks they
are scored on. The industry-standard check (GPT-3 appendix C, PaLM,
Llama) flags a training document as contaminated when it shares at
least ``min_hits`` distinct word n-grams (n=13 is the published
default; lower n = stricter) with any benchmark document.

Spark shape (100 TB corpus, small benchmark):

- The benchmark side (eval sets: 1e3..1e6 short docs) is exploded to
  a DISTINCT (gram-hash, bench_id) index and **broadcast** — the
  corpus never shuffles for the probe; the join is a map-side
  BroadcastHashJoin against every corpus partition.
- Grams are joined on a 64-bit ``xxhash64`` of the gram text, not the
  text itself, so the broadcast table and join keys stay 8 bytes per
  gram. Collisions only create candidate hits (over-flagging by one
  gram), never missed contamination, and at 64 bits are ~0 in
  practice.
- Hit counting is a partial-aggregable groupBy on (doc, bench) —
  map-side combine keeps the shuffle at one row per *matched* pair,
  which is ~0 for a clean corpus.

The reference notebook has no decontamination stage (it predates the
concern); this extends its corpus-cleaning capabilities per the
BASELINE.json north-star. Oracle-checkable: gram extraction is plain
tokenization, so DuckDB reproduces hit counts exactly (the oracle
joins on gram text; hashing is a Spark-side key-size optimization
that does not change counts at 64-bit collision rates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.dedup import word_shingles


def _gram_index(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str
) -> DataFrame:
    """(id, gram_hash) index, one row per DISTINCT gram per doc."""
    return (
        df.select(
            F.col(id_col).alias(out_id),
            F.explode(word_shingles(text_col, n)).alias("__g"),
        )
        .withColumn("__gh", F.xxhash64("__g"))
        .select(out_id, "__gh")
    )


def overlap_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, bench_id, hits) for every corpus x benchmark pair
    sharing >= ``min_hits`` distinct word n-grams.

    ``hits`` counts distinct shared grams (word_shingles is already
    distinct per doc, so a plain count is a distinct count)."""
    cg = _gram_index(corpus, id_col, text_col, n, id_col)
    bg = _gram_index(benchmark, bench_id_col, bench_text_col, n, bench_id_col)
    return (
        cg.join(F.broadcast(bg), on="__gh")
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Distinct corpus ids flagged against ANY benchmark doc, with the
    total distinct-gram hit count across the whole benchmark (the
    aggregate form most filter pipelines key on)."""
    cg = _gram_index(corpus, id_col, text_col, n, id_col)
    bg = _gram_index(
        benchmark, bench_id_col, bench_text_col, n, bench_id_col
    ).select("__gh").distinct()
    return (
        cg.join(F.broadcast(bg), on="__gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Corpus with contaminated docs removed (left_anti on flagged
    ids). No broadcast hint: the flagged set is usually tiny (AQE
    picks the broadcast anti join at runtime) but on a genuinely
    dirty corpus it can be large, and a forced broadcast would OOM
    the driver — let AQE decide from the measured size."""
    bad = contaminated_ids(
        corpus, benchmark, id_col, text_col, bench_id_col, bench_text_col, n, min_hits
    ).select(id_col)
    return corpus.join(bad, on=id_col, how="left_anti")

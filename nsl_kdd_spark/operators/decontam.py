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

import math
from dataclasses import dataclass

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


# ---------------------------------------------------------------------------
# Bloom-gated decontamination (round-8): the broadcast story above
# holds while the benchmark gram index fits a broadcast at 8 bytes
# per gram — ~1e8 grams (a 1e6-doc eval suite) is an 800 MB
# broadcast, past Spark's comfort zone. A Bloom filter is ~10 bits
# per gram at 1% FP (~60x smaller than the index's in-memory hash
# relation), so phase 1 probes every corpus gram map-side against
# the broadcast bitmap; phase 2 re-checks ONLY the survivors
# (true hits + fpp * |corpus grams|) against the exact gram set
# with a shuffle join whose input is now tiny. False positives are
# eliminated by phase 2, so the result is IDENTICAL to the exact
# path — same oracle, not a weaker sketch tier.
#
# One arithmetic implementation: `_bloom_positions` (numpy, wrapping
# int64 — the same two's-complement semantics as Java longs) is used
# by the builder and the probe, so build/probe can never disagree.
# The two 64-bit keys per gram are Spark-side `xxhash64(gram)` and
# `xxhash64(gram, 1)`; positions follow the standard double-hashing
# scheme (h1 + i*h2 mod m, Kirsch & Mitzenmacher 2006).
# ---------------------------------------------------------------------------


def _bloom_positions(h1, h2, m: int, k: int):
    """(len(h1), k) int64 array of bit positions; wrapping int64
    arithmetic, then a floored mod into [0, m)."""
    import numpy as np

    with np.errstate(over="ignore"):
        h1 = np.asarray(h1, dtype=np.int64)
        h2 = np.asarray(h2, dtype=np.int64)
        i = np.arange(k, dtype=np.int64)
        raw = h1[:, None] + i[None, :] * h2[:, None]  # wraps like Java
    return np.mod(raw, np.int64(m))  # floored mod -> non-negative


@dataclass(frozen=True)
class GramBloom:
    """A built benchmark-gram Bloom filter: packed little-endian bit
    array plus the (m, k) geometry and build metadata."""

    bits: bytes  # ceil(m/8) bytes, bit j = bits[j//8] >> (j%8) & 1
    m: int  # filter size in bits
    k: int  # hashes per item
    n_items: int  # distinct grams inserted
    n: int  # shingle width the grams were built with

    @property
    def n_bytes(self) -> int:
        return len(self.bits)


def bloom_geometry(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard sizing: m = -n ln(p)/ln(2)^2 bits, k = m/n ln(2)."""
    n_items = max(1, n_items)
    m = max(64, math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _gram_keys(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct (h1, h2) 64-bit key pairs over all word n-grams."""
    return (
        df.select(F.explode(word_shingles(text_col, n)).alias("__g"))
        .distinct()
        .select(
            F.xxhash64("__g").alias("__h1"),
            F.xxhash64("__g", F.lit(1)).alias("__h2"),
        )
    )


def build_gram_bloom(
    benchmark: DataFrame,
    bench_text_col: str,
    n: int = 13,
    fpp: float = 0.01,
) -> GramBloom:
    """Build the benchmark-side Bloom filter distributively.

    Executors emit (word_index, 64-bit word) partial rows via an
    Arrow-batched mapInPandas; a single bit_or aggregation merges
    them; the driver materializes exactly ``m/8`` bytes (the filter
    itself — the one artifact that MUST land on the driver to be
    broadcast). Peak driver transfer is the set-word count, <= m/64
    rows — the dense limit equals the filter size, never the gram
    count. One extra count() job sizes the filter first (the
    benchmark side is the small side by assumption; pass a corpus-
    scale DataFrame here and the count is the least of your
    problems)."""
    import numpy as np

    keys = _gram_keys(benchmark, bench_text_col, n)
    n_items = keys.count()
    m, k = bloom_geometry(n_items, fpp)

    def emit_words(batches):
        import pandas as pd

        for pdf in batches:
            pos = _bloom_positions(
                pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy(), m, k
            ).ravel()
            words = np.unique(pos // 64)
            acc = np.zeros(len(words), dtype=np.uint64)
            idx = np.searchsorted(words, pos // 64)
            np.bitwise_or.at(
                acc, idx, np.uint64(1) << (pos % 64).astype(np.uint64)
            )
            yield pd.DataFrame(
                {"widx": words.astype("int64"), "word": acc.astype("int64")}
            )

    merged = (
        keys.mapInPandas(emit_words, "widx long, word long")
        .groupBy("widx")
        .agg(F.bit_or("word").alias("word"))
        .collect()
    )
    arr = np.zeros((m + 63) // 64, dtype=np.int64)
    for row in merged:
        arr[row["widx"]] = row["word"]
    bits = arr.view(np.uint8).tobytes()[: (m + 7) // 8]
    return GramBloom(bits=bits, m=m, k=k, n_items=n_items, n=n)


def _bloom_probe_col(spark, bloom: GramBloom):
    """Arrow-batched membership test column over (__h1, __h2). The
    packed bitmap rides a SparkContext broadcast so executors fetch
    it once per worker, not per task."""
    from pyspark.sql.pandas.functions import pandas_udf

    bc = spark.sparkContext.broadcast(bloom.bits)
    m, k = bloom.m, bloom.k

    @pandas_udf("boolean")
    def might_contain(h1, h2):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        buf = np.frombuffer(bc.value, dtype=np.uint8)
        pos = _bloom_positions(h1.to_numpy(), h2.to_numpy(), m, k)
        hit = (buf[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    return might_contain


def contaminated_ids_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str,
    n: int = 13,
    min_hits: int = 1,
    fpp: float = 0.01,
    bloom: GramBloom | None = None,
) -> DataFrame:
    """Exact ``contaminated_ids`` semantics via the two-phase Bloom
    plan: map-side bitmap probe, then an exact re-check join on the
    survivors. Bit-identical to the exact path (phase 2 removes every
    false positive); pass a prebuilt ``bloom`` to amortize the build
    across corpus shards."""
    if bloom is None:
        bloom = build_gram_bloom(benchmark, bench_text_col, n=n, fpp=fpp)
    elif bloom.n != n:
        raise ValueError(
            f"bloom was built with n={bloom.n}, probe asked n={n}"
        )
    cg = (
        corpus.select(
            F.col(id_col),
            F.explode(word_shingles(text_col, n)).alias("__g"),
        )
        .select(
            id_col,
            F.xxhash64("__g").alias("__h1"),
            F.xxhash64("__g", F.lit(1)).alias("__h2"),
        )
    )
    probe = _bloom_probe_col(corpus.sparkSession, bloom)
    candidates = cg.filter(probe(F.col("__h1"), F.col("__h2")))
    exact = _gram_keys(benchmark, bench_text_col, n).select("__h1", "__h2")
    return (
        candidates.join(exact, on=["__h1", "__h2"])
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str,
    n: int = 13,
    min_hits: int = 1,
    fpp: float = 0.01,
    bloom: GramBloom | None = None,
) -> DataFrame:
    """``decontaminate`` on the Bloom-gated plan — same output, the
    100 TB shape when the benchmark gram index outgrows a broadcast."""
    bad = contaminated_ids_bloom(
        corpus, benchmark, id_col, text_col, bench_text_col,
        n=n, min_hits=min_hits, fpp=fpp, bloom=bloom,
    ).select(id_col)
    return corpus.join(bad, on=id_col, how="left_anti")


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

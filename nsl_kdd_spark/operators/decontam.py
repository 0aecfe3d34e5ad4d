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

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.bloom import (
    KeyBloom,
    bloom_might_contain_col,
    build_bloom_from_keys,
)
from nsl_kdd_spark.operators.dedup import _hashed_word_shingles


def _gram_index(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str
) -> DataFrame:
    """(id, gram_hash) index, one row per DISTINCT gram per doc.

    Built word-wise (optimization r13, the jaccard/containment
    pattern): tokens hash once each and every gram key is one
    fixed-width xxhash64 over its n word-hashes, instead of
    materializing an n-word string per position (at the n=13 default
    each word's bytes were copied and hashed ~13 times). Hash VALUES
    change but never surface — every consumer compares both sides
    under the same function, and word-sequence equality == hash-tuple
    equality under the already-documented collision trust."""
    return _hashed_word_shingles(df, id_col, text_col, n).select(
        F.col("__id").alias(out_id), F.explode("__shs").alias("__gh")
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


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document contamination accounting for EVERY corpus doc —
    the observability view behind GPT-3 appendix C's published
    dirty/clean tables (each benchmark is reported with how much of
    the training set collides with it BEFORE anyone picks a removal
    remedy): ``(id_col, n_grams, hit_grams, hit_ppm, contaminated)``
    where ``n_grams`` is the doc's distinct ``n``-gram count,
    ``hit_grams`` how many of them occur anywhere in the benchmark,
    ``hit_ppm = hit_grams * 1e6 div n_grams`` (0 for gram-less
    docs), and ``contaminated = hit_grams >= min_hits`` — the same
    verdict :func:`contaminated_ids` filters on, surfaced for every
    doc instead of only the flagged ones. Feed it to a grouped
    aggregate for the per-benchmark dirty-fraction table.

    Scale shape: the corpus gram index is built ONCE and serves both
    the per-doc totals and the hit counts (two map-side-combined
    aggregates over the same scan lineage); the benchmark gram set
    is DISTINCT + broadcast exactly as in :func:`contaminated_ids`,
    so the corpus never shuffles for the probe. Integer-ppm ratio —
    no float division (the q100 convention).
    """
    cg = _gram_index(corpus, id_col, text_col, n, id_col)
    bg = (
        _gram_index(benchmark, bench_id_col, bench_text_col, n, bench_id_col)
        .select("__gh")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # ONE corpus pass (optimization r13): a LEFT broadcast probe tags
    # each gram row, and a single map-side-combined aggregate counts
    # totals and hits together — the previous shape scanned the
    # corpus-sized gram index twice (separate totals and hits
    # aggregates) and joined both back
    stats = (
        cg.join(F.broadcast(bg), on="__gh", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("hit_grams"),
        )
    )
    return (
        corpus.select(id_col)
        .join(stats, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("hit_grams", F.lit(0)).alias("hit_grams"),
            F.expr(
                "CASE WHEN coalesce(n_grams, 0) > 0 THEN"
                " (coalesce(hit_grams, 0) * 1000000) div n_grams"
                " ELSE 0 END"
            ).alias("hit_ppm"),
            (F.coalesce("hit_grams", F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
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
# The bitmap machinery (geometry, distributive build, probe column,
# the shared build/probe position arithmetic) is the generic
# operators/bloom.py core — this module only owns the GRAM layer:
# which strings get inserted (distinct word n-grams) and the
# two-phase contaminated_ids/decontaminate plans on top.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GramBloom(KeyBloom):
    """A KeyBloom built over word n-grams; remembers the shingle
    width so a probe at a different ``n`` fails loudly instead of
    silently matching nothing."""

    n: int = 13  # shingle width the grams were built with


def _gram_keys(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct (h1, h2) 64-bit key pairs over all word n-grams.

    Word-wise build (optimization r13): h1 IS the combined word-hash
    gram key (uniform 64-bit) and h2 re-hashes it with a seed — the
    same double-hash independence the old (xxhash64(g), xxhash64(g,1))
    string pair provided, minus the n-word string per position. Build
    and probe both derive keys through this function's twin in
    :func:`contaminated_ids_bloom`, so the pair stays consistent."""
    grams = (
        _hashed_word_shingles(
            df.select(F.lit(0).alias("__rid"), F.col(text_col)),
            "__rid",
            text_col,
            n,
        )
        .select(F.explode("__shs").alias("__gh"))
        .distinct()
    )
    return grams.select(
        F.col("__gh").alias("__h1"),
        F.xxhash64("__gh", F.lit(1)).alias("__h2"),
    )


def build_gram_bloom(
    benchmark: DataFrame,
    bench_text_col: str,
    n: int = 13,
    fpp: float = 0.01,
) -> GramBloom:
    """Build the benchmark-side gram Bloom filter distributively (see
    bloom.build_bloom_from_keys for the build shape and driver-
    transfer bound; the benchmark side is the small side by
    assumption, so the sizing count() is cheap)."""
    kb = build_bloom_from_keys(_gram_keys(benchmark, bench_text_col, n), fpp)
    return GramBloom(
        bits=kb.bits, m=kb.m, k=kb.k, n_items=kb.n_items, n=n
    )


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
    # word-wise gram keys, the _gram_keys twin (h1 = combined word
    # hash, h2 = seeded re-hash) — build and probe stay consistent
    cg = _hashed_word_shingles(corpus, id_col, text_col, n).select(
        F.col("__id").alias(id_col), F.explode("__shs").alias("__gh")
    ).select(
        id_col,
        F.col("__gh").alias("__h1"),
        F.xxhash64("__gh", F.lit(1)).alias("__h2"),
    )
    probe = bloom_might_contain_col(corpus.sparkSession, bloom)
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


def decontaminate_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str,
    n: int = 13,
    window: int = 200,
) -> DataFrame:
    """Window-level decontamination — GPT-3 Appendix C's SECOND
    remedy (also the PaLM/Llama practice for long documents): instead
    of dropping a whole training document that collides with a
    benchmark (``decontaminate``, the right call for short docs),
    remove only the contaminated REGION — every position covered by a
    benchmark-colliding n-gram, expanded by ``window`` tokens on each
    side — and keep the rest of the document. Output: ``(id_col,
    text_clean, removed_tokens)``, the same contract as
    ``strip_duplicate_spans`` (a book with one quoted eval question
    loses a ~2*window-token hole, not 300 pages).

    Spark shape (100 TB corpus, small benchmark): positional corpus
    grams are a scan-stage projection (the substr_dedup pattern —
    hashes materialized as a column, then posexplode); the benchmark
    gram set is DISTINCT hashes, **broadcast** (eval suites are
    small by definition), so contamination detection is a map-side
    BroadcastHashJoin semi-join with NO corpus shuffle; the
    surviving hit positions (≈0 on a clean corpus) island-merge per
    document — all expanded intervals share one length, so hits
    merge exactly when the next start is within ``n + 2*window`` of
    the previous (the fixed-gap rule), making the merge one tiny
    per-doc window over hit rows only. Span ends clamp to the doc
    length; coverage strips via the JVM higher-order filter, no
    token-table explode, no Python.

    Joins on ``xxhash64`` like the sibling tiers (8-byte broadcast
    entries; a collision can only over-strip one window, never miss
    contamination); the oracle replays on gram TEXT, the q76/q147
    convention.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    from pyspark.sql import Window as W

    from nsl_kdd_spark.functions.text import tokens

    # positional word-wise gram hashes (optimization r13, the
    # _gram_index pattern): hash each token once, then one fixed-width
    # xxhash64 per position over its n word-hashes — no n-word string
    # per position. The word-hash array materializes in its own
    # projection first so the outer transform's element_at reads a
    # computed array instead of re-evaluating the inner transform per
    # position. The benchmark side derives keys the same way below.
    toks = corpus.select(
        F.col(id_col), tokens(text_col).alias("__tk")
    ).withColumn("__wh", F.transform("__tk", lambda x: F.xxhash64(x)))
    grams = (
        toks.withColumn(
            "__h",
            F.when(
                F.size("__tk") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("__tk") - (n - 1)),
                    lambda i: F.xxhash64(
                        *[
                            F.element_at(F.col("__wh"), i + k)
                            for k in range(n)
                        ]
                    ),
                ),
            ).otherwise(F.array().cast("array<bigint>")),
        )
        .select(
            F.col(id_col),
            F.size("__tk").alias("__len"),
            F.posexplode("__h").alias("__p0", "__gh"),
        )
        .select(id_col, "__len", (F.col("__p0") + 1).alias("pos"), "__gh")
    )
    bgrams = (
        _hashed_word_shingles(
            benchmark.select(F.lit(0).alias("__rid"), F.col(bench_text_col)),
            "__rid",
            bench_text_col,
            n,
        )
        .select(F.explode("__shs").alias("__gh"))
        .distinct()
    )
    hits = grams.join(F.broadcast(bgrams), on="__gh", how="left_semi")
    gap = n + 2 * window
    wd = W.partitionBy(id_col).orderBy("pos")
    islands = (
        hits.select(id_col, "__len", "pos")
        .withColumn("__prev", F.lag("pos").over(wd))
        .withColumn(
            "__new",
            F.when(F.col("pos") > F.col("__prev") + gap, 1).otherwise(0),
        )
        .withColumn("__isl", F.sum("__new").over(wd))
    )
    spans = islands.groupBy(id_col, "__isl").agg(
        F.greatest(
            F.min("pos") - window, F.lit(1)
        ).alias("span_start"),
        F.least(
            F.max("pos") + (n - 1) + window, F.first("__len")
        ).alias("span_end"),
    )
    span_arr = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    empty_spans = F.array().cast(
        "array<struct<span_start:int,span_end:int>>"
    )
    sp = F.coalesce(F.col("__spans"), empty_spans)
    indexed = F.transform(
        F.col("__tk"), lambda t, i: F.struct(t.alias("t"), (i + 1).alias("p"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            sp,
            lambda span: (s["p"] >= span["span_start"])
            & (s["p"] <= span["span_end"]),
        ),
    )
    return (
        toks.join(span_arr, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(kept, lambda s: s["t"]), " "
            ).alias("text_clean"),
            (F.size("__tk") - F.size(kept)).alias("removed_tokens"),
        )
    )

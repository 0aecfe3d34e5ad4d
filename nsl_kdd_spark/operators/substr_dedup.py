"""Exact-substring corpus dedup (SURVEY.md §2.13 dedup tier).

The ExactSubstr procedure of Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better", ACL 2022): any token run of at
least ``min_tokens`` that occurs more than once in the corpus is a
duplicated span, and training-data curation removes those spans (all
occurrences, or all but one canonical copy) while keeping the rest of
each document. This is the EXACT counterpart of the approximate
winnowing tier (operators/winnow.py): winnowing finds documents that
*probably* share a long run from a fingerprint sample; this operator
finds every duplicated run itself, exactly.

The reference notebook (README.md) has no corpus-dedup stage at all;
this extends the engine's curation surface per the BASELINE.json
north-star, alongside q91's C4-style span dedup (keep-first over
fixed sentence spans) — ExactSubstr differs in that spans are
MAXIMAL merged runs at token granularity and the default removes
every occurrence, the paper's setting.

Spark shape (100 TB) — deliberately NOT a suffix array:

- Lee et al. build a single-node suffix array because their corpus
  fits one big machine's disk. The distributed-native equivalence:
  a token run of length >= L occurs twice iff some L-gram inside it
  occurs twice, and merging overlapping duplicated L-gram positions
  per document recovers exactly the maximal duplicated runs. L-gram
  hashing is one scan-shaped projection (the same
  materialize-hashes-as-a-column pattern as winnow.py — no
  re-evaluation trap), and "occurs twice" is ONE hash-partitioned
  window count: no suffix sorting, no prefix-doubling rounds, no
  driver-side anything.
- Cost envelope: one shuffle of (id, pos, hash) rows — linear in
  token count — then a per-document window over only the DUPLICATED
  positions (tiny unless the corpus is mostly duplicate). No pair
  join exists anywhere in the plan, so there is no quadratic path
  and no hot-key FAN-OUT to guard: a gram shared by a million
  documents still contributes one counted group, not a million²
  pair candidates. Hot-key BUFFERING does need a guard, though
  (round-10 verdict fix): duplicate detection is a map-side-partial
  ``groupBy(gram)`` aggregate joined back on the gram hash — NOT a
  ``COUNT(*) OVER (PARTITION BY gram)`` window, which would buffer
  every occurrence of a ubiquitous boilerplate gram (a license
  header at df ~1e5-1e9) in one WindowExec task. The aggregate
  absorbs the hot key in partial (map-side) combine; the join-back
  probes a table with exactly ONE row per gram key, so it has no
  fan-out, streams under sort-merge, and AQE's skew-join split can
  further divide a hot gram's probe rows — none of which is
  possible for a window partition.
- Gram keys default to word-wise ``xxhash64`` longs (each token
  hashed once, each gram key one fixed-width hash of its L word
  hashes — optimization r13, see :func:`_word_gram_keys`); the
  16-hex-md5-over-gram-text reference layout (winnow.py's, the one
  the DuckDB oracle replays) stays available as
  ``hash_mode="md5"``. The key never surfaces in the output — it
  only defines gram equality — so the modes return identical spans
  absent a 64-bit collision, which only ever MERGES two runs into
  one false duplicated span (~n²/2⁶⁴ odds), never loses one.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.text import tokens
from nsl_kdd_spark.operators.winnow import _gram_hashes

_KEEP_MODES = ("none", "first")
_SCOPE_MODES = ("any", "cross_doc")
_HASH_MODES = ("md5", "xxhash64")

#: the single outstanding persisted gram table (see duplicated_spans).
#: Mutated only under the lock — concurrent duplicated_spans calls
#: (e.g. threaded test suites) otherwise race the pop/append pair
#: (round-10 advisory).
_GRAM_CACHE: list = []
_GRAM_CACHE_LOCK = threading.Lock()


def _evict_gram_cache(replacement: DataFrame) -> None:
    """Swap the single outstanding persisted gram table for
    ``replacement`` under the module lock. Eviction is best-effort:
    a previous entry whose SparkSession has already stopped is
    dropped silently (its JVM-side blocks died with the session),
    but any other unpersist failure propagates — the round-10
    advisory's point that a bare ``except Exception`` here would
    also swallow real errors."""
    with _GRAM_CACHE_LOCK:
        while _GRAM_CACHE:
            prev = _GRAM_CACHE.pop()
            try:
                stopped = prev.sparkSession.sparkContext._jsc is None
            except Exception:
                stopped = True  # session torn down mid-check
            if not stopped:
                prev.unpersist()
        _GRAM_CACHE.append(replacement)


def _word_gram_keys(wh, L: int):
    """Per-position 64-bit gram keys over a MATERIALIZED word-hash
    array column (optimization r13, guide §1.2 per-task work — the
    dedup.py ``_hashed_word_shingles`` pattern): each token's bytes
    hash ONCE (one xxhash64 per word, in the caller's projection),
    then every gram key is one fixed-width ``xxhash64`` over its L
    word-hashes, built as ``arrays_zip`` of L shifted slices. The old
    xxhash64 branch allocated a concatenated string per gram and
    hashed its bytes — every word's bytes copied and hashed ~L times
    (L=8 by default). Equality structure is unchanged: word sequences
    are equal iff their hash tuples are equal (words cannot contain
    the separator), under the same collision trust already documented
    (~n²/2⁶⁴ only ever MERGES two runs, never loses one).

    NOT ``element_at`` over the word-hash array inside the lambda —
    projection collapse inlines the token-hash transform into each
    ``element_at``, re-deriving the whole array per position (the
    measured 6.6 s vs 0.5 s pitfall recorded in dedup.py). The zip
    form references the materialized column only via slices."""
    size = F.size(wh)
    zipped = F.arrays_zip(
        *[
            F.slice(wh, k + 1, size - (L - 1)).alias(f"_{k}")
            for k in range(L)
        ]
    )
    return F.when(
        size >= L,
        F.transform(
            zipped, lambda s: F.xxhash64(*[s[f"_{k}"] for k in range(L)])
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 8,
    keep: str = "none",
    scope: str = "any",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Maximal duplicated token runs: ``(id_col, span_start,
    span_end, span_tokens)`` with 1-based inclusive token positions.

    A position is covered iff some ``min_tokens``-gram through it is
    duplicated under ``scope``; overlapping or adjacent covered grams
    merge into one maximal span per document.

    ``keep``:
      - ``"none"`` (default, the paper's setting): every occurrence
        of a duplicated run is reported.
      - ``"first"``: the corpus-first occurrence of each duplicated
        gram — ordered by (id, pos) — is exempted, so one canonical
        copy of every run survives removal.

    ``scope``:
      - ``"any"`` (default, the paper's setting): a gram is
        duplicated when it occurs >= 2 times anywhere — across
        documents AND repeats within one document.
      - ``"cross_doc"``: a gram is duplicated only when it occurs in
        >= 2 DISTINCT documents — the variant curation teams use
        when intra-document repetition is already handled by a
        repetition-quality filter (functions/quality.py), so a
        chorus repeated inside one song lyric is not stripped.

    ``hash_mode``: ``"xxhash64"`` (default since optimization r13;
    8-byte longs derived word-wise — one xxhash64 per token, one per
    gram window — ~half the gram-shuffle bytes and ~6x less hashing
    work than the md5 strings, see :func:`_word_gram_keys`) or
    ``"md5"`` (the 16-hex-key reference implementation whose layout
    the DuckDB oracle replays bit-exactly). The two modes return
    IDENTICAL spans absent a 64-bit key collision — the key only
    defines gram equality and never surfaces in the output — pinned
    by the pytest mode-equivalence suite; the default flip is safe
    for the q152/q153/q156 oracles because those compare the
    hash-free span/strip output (the eb94dec decontamination
    precedent). A collision only ever MERGES two runs into one false
    duplicated span (~n²/2⁶⁴ odds), never loses one.

    Scale shape (round-10 verdict fix): duplicate detection is a
    map-side-partial ``groupBy(gram).agg(count, [countDistinct],
    [min(struct(id, pos))])`` joined back to the gram table on the
    hash — deliberately NOT a ``COUNT(*) OVER (PARTITION BY gram)``
    window, which would buffer every occurrence of a hot boilerplate
    gram in one WindowExec task (the shape SCALE.md rejects for
    TF-IDF document frequency). The aggregate side has exactly one
    row per gram key, so the join-back has no fan-out and AQE's
    skew-join split can divide a hot gram's probe rows across tasks.
    """
    if keep not in _KEEP_MODES:
        raise ValueError(f"keep must be one of {_KEEP_MODES}, got {keep!r}")
    if scope not in _SCOPE_MODES:
        raise ValueError(
            f"scope must be one of {_SCOPE_MODES}, got {scope!r}"
        )
    if hash_mode not in _HASH_MODES:
        raise ValueError(
            f"hash_mode must be one of {_HASH_MODES}, got {hash_mode!r}"
        )
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    from pyspark import StorageLevel

    L = min_tokens
    # persisted because TWO consumers read it (the duplicate
    # aggregate and the join-back probe) and Spark does not reuse a
    # scan across consumers — without this the corpus is tokenized +
    # hashed twice. The q67 TF-IDF tier's persisted-TF pattern:
    # disk-backed blocks, ~the bytes the gram shuffle moves anyway.
    if hash_mode == "md5":
        keyed = df.select(
            F.col(id_col), tokens(text_col).alias("__tk")
        ).withColumn("__h", _gram_hashes(F.col("__tk"), L))
    else:
        # word-wise: the token-hash array MUST be a materialized
        # column of its own projection (see _word_gram_keys)
        keyed = df.select(
            F.col(id_col),
            F.transform(tokens(text_col), lambda x: F.xxhash64(x)).alias(
                "__wh"
            ),
        ).withColumn("__h", _word_gram_keys(F.col("__wh"), L))
    grams = (
        keyed.select(F.col(id_col), F.posexplode("__h").alias("__p0", "__g"))
        .select(F.col(id_col), (F.col("__p0") + 1).alias("pos"), "__g")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # bound the cache to ONE outstanding gram table (round-10 review:
    # the function has no safe unpersist site after returning a lazy
    # result, so repeated calls — fuzz draws, the driver's query
    # sweep — would otherwise pin a corpus-sized cache entry EACH).
    # Evicting the previous call's entry at worst costs that caller a
    # recompute (correctness is unaffected; the cache is an
    # optimization), and keeps session storage O(one corpus). Callers
    # that interleave TWO still-lazy results (e.g. comparing two L
    # values) should materialize the first before computing the
    # second, or the first recomputes its gram lineage on action.
    _evict_gram_cache(grams)
    aggs = [
        (
            F.countDistinct(id_col) if scope == "cross_doc"
            else F.count(F.lit(1))
        ).alias("__c")
    ]
    if keep == "first":
        aggs.append(
            F.min(
                F.struct(
                    F.col(id_col).alias("d"), F.col("pos").alias("p")
                )
            ).alias("__first")
        )
    dup_grams = grams.groupBy("__g").agg(*aggs).filter(F.col("__c") >= 2)
    dup = grams.join(dup_grams, on="__g")
    if keep == "first":
        dup = dup.filter(
            (F.col(id_col) != F.col("__first.d"))
            | (F.col("pos") != F.col("__first.p"))
        )
    # gaps-and-islands per document over the duplicated positions:
    # fixed-length intervals [pos, pos+L-1], so runs merge exactly
    # when the next start is within L of the previous start
    wd = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        dup.select(id_col, "pos")
        .withColumn("__prev", F.lag("pos").over(wd))
        .withColumn(
            "__new",
            F.when(F.col("pos") > F.col("__prev") + L, 1).otherwise(0),
        )
        .withColumn("__isl", F.sum("__new").over(wd))
    )
    return (
        islands.groupBy(id_col, "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (L - 1)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "span_tokens"
            ),
        )
    )


def duplicated_run_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 8,
    top_k: int = 20,
) -> DataFrame:
    """The corpus's dominant duplicated runs: ``(gram_text,
    n_occurrences, n_docs)`` for the ``top_k`` most frequent
    duplicated ``min_tokens``-grams — the observability view an
    operator consults BEFORE tuning dedup (is the duplication one
    viral quote or ubiquitous boilerplate? what should the
    ``max_fp_df`` stop list / a stop-shingle cap be set to?).

    Ties at the top-k boundary break on the gram hash (total order,
    engine-portable), and each gram's text is reconstructed from its
    first occurrence — by (id, pos) — so the report is deterministic.

    Scale shape: the gram aggregation is the same single
    hash-partitioned pass as :func:`duplicated_spans` (count +
    distinct-docs + min-position in ONE groupBy); the top-k is a
    TakeOrdered of aggregate rows (never a full sort of the gram
    table), and only those ``top_k`` winners join back to documents
    for text slicing — a broadcast join of k rows."""
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    L = min_tokens
    toks = df.select(F.col(id_col), tokens(text_col).alias("__tk"))
    grams = (
        toks.withColumn("__h", _gram_hashes(F.col("__tk"), L))
        .select(F.col(id_col), F.posexplode("__h").alias("__p0", "__g"))
        .select(F.col(id_col), (F.col("__p0") + 1).alias("pos"), "__g")
    )
    top = (
        grams.groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
            F.min(
                F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
            ).alias("__rep"),
        )
        .filter(F.col("n_occurrences") >= 2)
        .orderBy(F.desc("n_occurrences"), F.asc("__g"))
        .limit(top_k)
    )
    return (
        top.join(
            toks.select(F.col(id_col).alias("__rid"), "__tk"),
            top["__rep.d"] == F.col("__rid"),
        )
        .select(
            F.concat_ws(
                " ", F.slice("__tk", F.col("__rep.p"), L)
            ).alias("gram_text"),
            "n_occurrences",
            "n_docs",
        )
        .orderBy(F.desc("n_occurrences"), "gram_text")
    )


def strip_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 8,
    keep: str = "none",
    scope: str = "any",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The curation output: ``(id_col, text_clean, removed_tokens)``
    — each document's text with every duplicated span (per
    :func:`duplicated_spans` under the same ``keep``/``scope``) removed
    and the survivors re-joined on single spaces. Documents whose
    every token sat in a duplicated span come back with empty
    ``text_clean`` (and are candidates for dropping downstream);
    untouched documents report ``removed_tokens = 0``.

    Span coverage is tested with JVM higher-order functions against
    each document's (small) merged-span array — no explode of the
    token table, no Python. Note text is REBUILT from the token
    array for every document, touched or not, so output is a pure
    function of the tokenization (a doc with consecutive separators
    normalizes identically whether or not it had duplicates)."""
    spans = duplicated_spans(
        df, id_col, text_col, min_tokens=min_tokens, keep=keep,
        scope=scope, hash_mode=hash_mode,
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
        df.select(F.col(id_col), tokens(text_col).alias("__tk"))
        .join(span_arr, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(kept, lambda s: s["t"]), " "
            ).alias("text_clean"),
            (F.size("__tk") - F.size(kept)).alias("removed_tokens"),
        )
    )

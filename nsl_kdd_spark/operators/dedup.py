"""Deduplication operators (BASELINE.json north-star; SURVEY.md §2.13).

Four tiers, cheapest first:

1. exact       — hash-groupBy on content hash; one shuffle.
2. simhash     — per-doc 16-bit signature, near-dups = small hamming
                 distance; candidate pairs via same-bucket join.
3. minhash LSH — k md5 min-hashes -> banded buckets -> bucket join ->
                 verify jaccard. The classic shingle->minhash->band
                 pipeline, entirely in expressions.
4. n-gram jaccard — exact set-similarity join via token/shingle
                 inverted index (explode -> join on shingle -> count),
                 the verification layer and the ground truth.

Scale notes (100 TB): every pairwise step goes through an equi-join on
a derived key (shingle / band bucket / signature), never a cross join;
hot shingles are the skew risk — AQE skew-join handles moderate skew,
and ``max_shingle_freq`` drops degenerate stop-shingles (a standard
LSH trick) for the rest. Hashes are md5 hex (cross-engine identical),
so every operator here is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.text import distinct_tokens, exact_hash, tokens


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content hash. Hash first so the
    shuffle key is 32 bytes, not the document body."""
    w = Window.partitionBy(exact_hash(text_col)).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key(
    df: DataFrame,
    key_cols: list[str] | str,
    order_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Upsert-log compaction: keep each key's most recent row (max
    ``order_col``; ties broken by ``tiebreak_col`` descending, so the
    result is deterministic when version stamps repeat). One window
    keyed by the natural key — the same shape CDC readers use to
    collapse an append log to current state, and the batch twin of
    ``streaming.dedup_stream``."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(order_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column.

    Guarded for short docs: Spark's ``sequence(1, 0)`` counts DOWN
    (step -1), so docs with < n tokens must short-circuit to empty."""
    w = tokens(col)
    return F.when(
        F.size(w) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _hashed_word_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(__id, __shs: array<bigint>) — distinct word n-gram shingles as
    64-bit hashes, built WITHOUT materializing shingle strings
    (optimization r13): words hash once each (one xxhash64 per token),
    then every shingle key is one fixed-width ``xxhash64`` over its n
    word-hashes. The old path allocated a concatenated string per
    shingle and hashed its bytes — each word's bytes hashed ~n times
    plus per-shingle allocations; measured 1.4 s -> 0.25 s for the
    shingle stage on the 5k-doc sf0.1 corpus. Equality structure is
    unchanged: word sequences are equal iff their hash tuples are
    equal (words cannot contain the separator), so distinct counts —
    and every similarity computed from them — match the string form
    under the same xxhash64 collision trust (~n_distinct^2/2^64)
    already documented on the consumers. Tie-break ORDER among
    equal-frequency shingles differs from the string form, which can
    change prefix-filter candidate sets but never verified results."""
    wh = F.transform(tokens(text_col), lambda x: F.xxhash64(x))
    base = df.select(F.col(id_col).alias("__id"), wh.alias("__wh"))
    # n shifted slices zipped positionally, one xxhash64 per struct:
    # NOT element_at over the word-hash array — projection collapse
    # inlines the token-hash transform into each element_at, so the
    # whole array is re-derived per position (measured 6.6 s vs this
    # form's 0.5 s on the 40k-doc gram index; the zip form also beats
    # the old string concat 4-6x)
    size = F.size("__wh")
    zipped = F.arrays_zip(
        *[
            F.slice("__wh", k + 1, size - (n - 1)).alias(f"_{k}")
            for k in range(n)
        ]
    )
    shingle = F.when(
        size >= n,
        F.array_distinct(
            F.transform(
                zipped,
                lambda s: F.xxhash64(*[s[f"_{k}"] for k in range(n)]),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return base.select("__id", shingle.alias("__shs"))


def _shingle_index(
    df: DataFrame, id_col: str, shingle_col: Column, max_shingle_freq: int | None
) -> DataFrame:
    """(id, shingle) inverted index; optionally drops shingles more
    frequent than ``max_shingle_freq`` (stop-shingle skew guard)."""
    idx = df.select(F.col(id_col).alias("__id"), F.explode(shingle_col).alias("__sh"))
    if max_shingle_freq is not None:
        freq = idx.groupBy("__sh").agg(F.count(F.lit(1)).alias("__f"))
        idx = idx.join(
            F.broadcast(freq.filter(F.col("__f") > max_shingle_freq).select("__sh")),
            on="__sh",
            how="left_anti",
        )
    return idx


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
    prefix_filter: bool = True,
    order: str = "freq",
) -> DataFrame:
    """Exact set-similarity join on word n-gram shingles.

    Default plan uses PREFIX FILTERING (PPJoin-style, lossless): order
    every shingle set by a consistent global total order; for
    jaccard >= t a qualifying pair MUST share one of each side's first
    ``floor((1-t)*|set|)+1`` shingles, so only that prefix is indexed.
    Candidates from the prefix-index self-join are verified with the
    exact jaccard of the full sets. Cuts the inverted-index join from
    "all pairs sharing ANY shingle" (quadratic on template-heavy
    corpora) to near the true-pair count, without changing results.

    ``order`` picks the canonical order (BOTH are lossless — the
    filter only needs consistency; it changes candidate count, never
    results):

    - ``"freq"`` (default): rarest-first by global shingle frequency —
      PPJoin's max-pruning order. Prefixes avoid common/boilerplate
      shingles, so candidates stay near true pairs even on
      template-heavy corpora. Costs one frequency aggregation plus a
      doc-keyed shuffle to rebuild ordered arrays.
    - ``"hash"``: ascending xxhash64 value — a pseudo-random but
      consistent order computed as a pure PROJECTION (no freq pass,
      no join, no shuffle; measured 1.25-1.6x faster end-to-end on
      the bench corpus). Right when shingles are mostly distinct
      (near-unique content); on boilerplate-heavy corpora a common
      shingle landing in many prefixes inflates candidates, which
      freq-order avoids — keep the default there.

    ``prefix_filter=False`` falls back to the plain inverted-index
    count join. Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    if order not in ("freq", "hash"):
        raise ValueError(f"order must be 'freq' or 'hash', got {order!r}")
    if prefix_filter:
        # hashed shingles built word-wise (no per-shingle string
        # concat — see _hashed_word_shingles); in freq order the
        # compact per-doc array feeds two consumers (freq agg +
        # ordered build), so persist it — one row per doc, not the
        # exploded index. Hash order has only ONE consumer (the
        # ordered build, itself checkpointed below), so materializing
        # here would be a wasted pass — skip it.
        sh = _hashed_word_shingles(df, id_col, text_col, n)
        if order == "freq":
            # lazy (optimization r13): blocks materialize inside the
            # first consuming job and are shared from there — the
            # eager form paid a separate construction-time job per
            # checkpoint (measured q28 warm ~2.6 s -> ~2.5 s, and the
            # first-run variance drops with the extra barriers)
            sh = sh.localCheckpoint(eager=False)
    else:
        sh = df.select(
            F.col(id_col).alias("__id"),
            word_shingles(text_col, n).alias("__shs"),
        )
    if not prefix_filter:
        sizes = sh.select("__id", F.size("__shs").alias("__sz"))
        idx = _shingle_index(sh, "__id", F.col("__shs"), max_shingle_freq)
        a = idx.select(F.col("__id").alias("id_a"), "__sh")
        b = idx.select(F.col("__id").alias("id_b"), "__sh")
        inter = (
            a.join(b, on="__sh")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("__inter"))
        )
        sz_a = sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("__sza"))
        sz_b = sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("__szb"))
        jac = (
            inter.join(sz_a, "id_a").join(sz_b, "id_b")
            .select(
                "id_a", "id_b",
                (
                    F.col("__inter").cast("double")
                    / (F.col("__sza") + F.col("__szb") - F.col("__inter"))
                ).alias("jaccard"),
            )
        )
        return jac.filter(F.col("jaccard") >= threshold).orderBy("id_a", "id_b")

    # Work on 64-bit shingle HASHES from here down: freq keys, sort
    # keys, prefix-index join keys, and the verify arrays all become
    # 8-byte longs instead of ~20-char strings (cheaper shuffle, sort,
    # and intersect). Lossless for the filter — prefix filtering only
    # needs SOME deterministic total order — and exact for the jaccard
    # VALUE absent xxhash64 collisions (~n_distinct^2 / 2^64; ~1e-6 at
    # 5M shingles), since |A∩B| / |A∪B| depends on cardinalities only.
    if order == "hash":
        # ascending hash IS a consistent global order: the whole
        # ordered build is one projection — no explode, no freq join,
        # no doc-keyed shuffle (see docstring trade-off)
        ordered = sh.select(
            "__id",
            F.array_sort(F.array_distinct("__shs")).alias("__shs"),
        ).localCheckpoint(eager=False)
    else:
        # Canonical order rarest-first (max pruning power); freq
        # table is |distinct shingles| rows — broadcast it so the
        # (id, hash) index isn't shuffled just to pick up counts.
        ex = sh.select("__id", F.explode("__shs").alias("__sh"))
        freq = ex.groupBy("__sh").agg(F.count(F.lit(1)).alias("__f"))
        ordered = (
            ex.join(F.broadcast(freq), on="__sh")
            .groupBy("__id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__f", "__sh"))),
                    lambda s: s["__sh"],
                ).alias("__shs")
            )
            # the prefix index below is self-joined (two physical
            # scans): truncate the compact per-doc form so the
            # shingle+sort lineage runs once (localCheckpoint, not
            # persist: blocks release when the caller drops the
            # result — a bare persist pins a CacheManager entry per
            # call with no unpersist site; LAZY so the blocks build
            # inside the first consuming job instead of a separate
            # construction-time job — optimization r13)
            .localCheckpoint(eager=False)
        )
    # Candidates-then-lookup, NOT carry-payload: the prefix index
    # explodes to ~prefix_len rows per doc, so carrying the full
    # shingle array through it would duplicate the payload prefix_len
    # times in the self-join shuffle (measured 100k docs: ~10x the
    # bytes, 54 s -> 516 s). Keep the index narrow (id, shingle),
    # dedupe candidate ids while they are still 16-byte rows, then
    # fetch each side's array ONCE for the verify join. simhash takes
    # the opposite choice (its payload is 8 bytes — see simhash_pairs).
    # prefix bound = |s| - ceil(t*|s|) + 1. The float form
    # floor(|s|*(1-t)) equals that EXCEPT when t*|s| is an exact
    # integer and binary rounding pulls |s|*(1-t) a hair BELOW it
    # (10 * (1-0.8) = 1.9999999999999996 -> floor 1, prefix one
    # SHORT -> a boundary pair like jaccard == 0.8 with A ⊂ B loses
    # its only shared prefix element; observed at sf0.1). The nudge
    # has an ABSOLUTE term for small sizes and a RELATIVE term so the
    # compensation keeps pace with the product's ulp for huge shingle
    # sets (double error is relative; a fixed 1e-9 stops covering it
    # past |s|*(1-t) ~ 4e6 — review r03). Both terms are orders of
    # magnitude below 1, so the bound can only round UP to the exact
    # integer, never cross to the next one: lossless, never wider
    # than one extra element.
    approx = F.size("__shs") * F.lit(1.0 - threshold)
    prefix_len = (
        F.floor(approx + F.lit(1e-9) + approx * F.lit(1e-12)).cast("int") + 1
    )
    # The index carries the set SIZE (a 4-byte int — unlike the full
    # payload, negligible in the self-join shuffle) to power the
    # size-ratio pre-filter below (round-7; r5 verdict #4): for
    # jaccard >= t, |A∩B| <= min(|A|,|B|) and |A∪B| >= max(|A|,|B|),
    # so J <= min/max — any pair with min(sz) < t * max(sz) cannot
    # qualify and is dropped BEFORE the distinct and the
    # array-intersect verify join. Lossless; the float comparison
    # gets the same absolute+relative nudge as prefix_len above so a
    # boundary pair (e.g. A ⊂ B with |A| = t * |B| exactly, J = t)
    # can never be lost to t * max rounding a hair high — the nudge
    # only ever ADMITS a borderline candidate, which exact
    # verification then rejects.
    idx = ordered.select(
        "__id",
        F.size("__shs").alias("__sz"),
        F.explode(F.slice("__shs", 1, prefix_len)).alias("__sh"),
    )
    szmin = F.least("__sza", "__szb").cast("double")
    szmax = F.greatest("__sza", "__szb").cast("double")
    cand = (
        idx.select(F.col("__id").alias("id_a"), F.col("__sz").alias("__sza"), "__sh")
        .join(
            idx.select(F.col("__id").alias("id_b"), F.col("__sz").alias("__szb"), "__sh"),
            on="__sh",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            szmin + F.lit(1e-9) + szmax * F.lit(1e-12)
            >= F.lit(threshold) * szmax
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # Verify-join strategy is deliberate (optimization r13, guide §3.1):
    # shuffle_hash on the payload side, never broadcast. The per-doc
    # shingle-array table is corpus-sized; under the session's 64 MB
    # broadcast threshold a mid-size corpus (the dedup25k tier: ~25k
    # docs of long arrays) got BROADCAST — two single-threaded
    # collect+build jobs of array payloads that cost more than the
    # whole parallel join (measured 4.6 s -> 2.3 s full-op at 25k
    # docs; the 100k tier was already past the threshold and fast).
    # The shuffled hash join streams the slim candidate rows against
    # per-partition payload maps whose size AQE bounds via the
    # advisory partition size. |A∪B| = |A| + |B| - |A∩B| (arrays are
    # distinct by construction), so the union is never re-built just
    # to take its size — one hash-set pass per pair instead of two.
    full_a = ordered.select(
        F.col("__id").alias("id_a"), F.col("__shs").alias("__sa")
    ).hint("shuffle_hash")
    full_b = ordered.select(
        F.col("__id").alias("id_b"), F.col("__shs").alias("__sb")
    ).hint("shuffle_hash")
    inter = F.size(F.array_intersect("__sa", "__sb"))
    verified = (
        cand.join(full_a, "id_a").join(full_b, "id_b")
        .select(
            "id_a", "id_b",
            (
                inter.cast("double")
                / (F.size("__sa") + F.size("__sb") - inter)
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).orderBy("id_a", "id_b")


def _minhash_min_exprs(col: str, num_hashes: int) -> list[Column]:
    """k MinHash aggregates from ceil(k/4) md5 calls: each seeded
    digest yields four independent 32-bit hashes (8 hex chars each —
    md5's diffusion makes digest chunks behave as independent hash
    functions, the standard one-hash-many-pieces construction).
    Fixed-width lowercase hex compares lexicographically == numerically,
    so ``min`` over the substring IS min over the 32-bit value. Hashing
    dominates the signature agg's per-row cost; 4 hashes per digest
    cuts it ~4x without changing the LSH structure."""
    out: list[Column] = []
    for j in range((num_hashes + 3) // 4):
        digest = F.md5(F.concat(F.lit(f"{j}:"), F.col(col)))
        for k in range(min(4, num_hashes - 4 * j)):
            out.append(
                F.min(F.substring(digest, 1 + 8 * k, 8)).alias(f"mh{4 * j + k}")
            )
    return out


def _minhash_sig_agg(tok: DataFrame, num_hashes: int) -> DataFrame:
    """The ONE signature aggregate every MinHash consumer rides —
    (__id, mh0..mhK, __ts shingle-HASH set), localCheckpoint'ed
    because every caller scans it at least twice (review r13: the
    decontamination tier had its own copy; a hash-family or
    checkpoint change must hit all consumers at once).

    The verify payload ``__ts`` collects ``xxhash64`` of each shingle
    (8-byte longs), NOT the shingle strings (optimization r13): every
    consumer reads only set CARDINALITIES (``size(array_intersect)``
    and set sizes), which hashing preserves under the same xxhash64
    collision trust the q28 word-hash path documents — while the
    band-join shuffle, the checkpoint blocks, and the per-pair
    intersect all shrink ~3x (string shingles average ~20 chars).
    The md5 min-hashes stay over the shingle TEXT — that is the
    LSH/oracle contract. Lazy checkpoint: blocks build inside the
    first consuming job instead of a construction-time job (the
    jaccard/simhash r13 flip; eager re-paid the materialization in
    every caller's timed region)."""
    return tok.groupBy("__id").agg(
        *_minhash_min_exprs("__t", num_hashes),
        F.collect_set(F.xxhash64("__t")).alias("__ts"),
    ).localCheckpoint(eager=False)


def _band_bucket_expr(num_hashes: int, band_size: int):
    """The ONE band-bucket construction (``'<band>|mh..|mh..'``
    strings) shared by every LSH consumer — q29/q191's banding and
    the q195 decontamination tier must bucket IDENTICALLY or
    corpus-vs-bench candidates stop matching the documented
    S-curve."""
    n_bands = num_hashes // band_size
    return F.explode(
        F.array(
            *[
                F.concat_ws(
                    "|",
                    F.lit(str(bi)),
                    *[
                        F.col(f"mh{bi * band_size + j}")
                        for j in range(band_size)
                    ],
                )
                for bi in range(n_bands)
            ]
        )
    ).alias("__bucket")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """k-permutation MinHash over word n-gram shingles.

    Shingles, not raw tokens: token-set minhash collapses on
    small-vocabulary corpora (every doc shares the same minima ->
    degenerate LSH buckets -> quadratic bucket joins); the n-gram
    shingle space is |V|^n so signatures stay discriminative.
    ``shingle_n=1`` recovers token-set minhash for corpora where
    that's wanted.

    Hash family: 32-bit chunks of ``md5(seed || ':' || shingle)``
    compared as hex strings — engine-portable (md5 is identical
    everywhere), uniform, and 4 hashes per digest (see
    ``_minhash_min_exprs``). One explode + one grouped agg with k
    min() columns: a single shuffle regardless of k."""
    shingle = (
        word_shingles(text_col, shingle_n) if shingle_n > 1 else distinct_tokens(text_col)
    )
    tok = df.select(F.col(id_col).alias("__id"), F.explode(shingle).alias("__t"))
    return tok.groupBy("__id").agg(*_minhash_min_exprs("__t", num_hashes))


def _cap_buckets(
    bucketed: DataFrame, bucket_cols: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Drop LSH buckets with more than ``max_bucket_size`` members
    BEFORE the self-join. A degenerate bucket (template cluster, stop
    phrase) makes the candidate set quadratic in its size; the true
    pair set of such a cluster is itself quadratic, so no plan can
    return it cheaply — capping is the standard production guard
    (recall loss is confined to the oversized buckets; pairs found via
    any other bucket are unaffected). The bucket-size aggregate rides
    the same shuffle key as the join, and the oversize list is tiny ->
    broadcast anti-join."""
    if max_bucket_size is None:
        return bucketed
    big = (
        bucketed.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_bucket_size)
        .select(*bucket_cols)
    )
    return bucketed.join(F.broadcast(big), on=bucket_cols, how="left_anti")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.7,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """shingle -> minhash -> band -> bucket-join -> verify.

    Bands of ``band_size`` signatures hash to a bucket; docs sharing
    any band bucket become candidates (standard S-curve selectivity);
    candidates are then verified with the exact jaccard of their
    shingle sets via a second pass. ``max_bucket_size`` caps the
    per-bucket join fan-out (see ``_cap_buckets``). Returns verified
    (id_a, id_b, jaccard >= threshold).

    One tokenize pass total: the signature aggregate computes the k
    min-hashes AND collects the distinct shingle set in the same
    grouped agg, so the verification payload rides the one per-doc
    table (persisted — the band index is self-joined, two physical
    scans) instead of re-joining the corpus per candidate. The band
    self-join carries both shingle sets and verifies inline — no
    distinct + no candidate-lookup joins."""
    shingle_expr = (
        word_shingles(text_col, shingle_n) if shingle_n > 1 else distinct_tokens(text_col)
    )
    tok = df.select(
        F.col(id_col).alias("__id"), F.explode(shingle_expr).alias("__t")
    )
    sigs = _minhash_sig_agg(tok, num_hashes)
    n_bands = num_hashes // band_size
    bands = sigs.select(
        "__id", "__ts", _band_bucket_expr(num_hashes, band_size)
    )
    bands = _cap_buckets(bands, ["__bucket"], max_bucket_size)
    if n_bands <= 2:
        # carry-payload: the band join duplicates the shingle set
        # n_bands times in the shuffle; at <= 2 bands that costs less
        # than the distinct barrier + two lookup joins it replaces
        xa = bands.select(
            F.col("__id").alias("id_a"), F.col("__ts").alias("__ta"), "__bucket"
        )
        xb = bands.select(
            F.col("__id").alias("id_b"), F.col("__ts").alias("__tb"), "__bucket"
        )
        # |A∪B| = |A| + |B| - |A∩B| (sets are distinct by
        # construction): one hash-set pass per pair instead of two —
        # array_union re-built the union only for its size
        # (optimization r13; measured 2.5-3x on the verify stage)
        inter = F.size(F.array_intersect("__ta", "__tb"))
        scored = (
            xa.join(xb, on="__bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                (
                    inter.cast("double")
                    / (F.size("__ta") + F.size("__tb") - inter)
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
        return (
            scored.groupBy("id_a", "id_b")
            .agg(F.first("jaccard").alias("jaccard"))
            .orderBy("id_a", "id_b")
        )
    # wider bands: keep the index narrow, dedupe candidate ids small,
    # fetch each side's shingle set once from the persisted sigs (same
    # reasoning as jaccard_pairs — payload duplication beats the saved
    # joins only when the duplication factor is tiny)
    slim = bands.select("__id", "__bucket")
    cand = (
        slim.select(F.col("__id").alias("id_a"), "__bucket")
        .join(slim.select(F.col("__id").alias("id_b"), "__bucket"), on="__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # shuffle_hash, never broadcast: the per-doc payload table is
    # corpus-sized — at the 64 MB session threshold a mid-size corpus
    # broadcasts it, paying two single-threaded builds of array
    # payloads (the dedup25k regression, optimization r13); the
    # shuffled hash join streams candidates against per-partition
    # payload maps bounded by AQE's advisory partition size
    ta = sigs.select(
        F.col("__id").alias("id_a"), F.col("__ts").alias("__ta")
    ).hint("shuffle_hash")
    tb = sigs.select(
        F.col("__id").alias("id_b"), F.col("__ts").alias("__tb")
    ).hint("shuffle_hash")
    inter = F.size(F.array_intersect("__ta", "__tb"))
    verified = (
        cand.join(ta, "id_a").join(tb, "id_b")
        .select(
            "id_a", "id_b",
            (
                inter.cast("double")
                / (F.size("__ta") + F.size("__tb") - inter)
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).orderBy("id_a", "id_b")


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-subset duplicate pairs by OVERLAP COEFFICIENT
    (Szymkiewicz-Simpson): ``|A ∩ B| / min(|A|, |B|)`` over word
    n-gram shingles — the containment of the SMALLER document in the
    larger. Catches the duplication jaccard misses by construction: a
    short doc quoted whole inside a long one has
    jaccard ~ |A|/|B| (arbitrarily small) but containment 1.0 —
    boilerplate-wrapped articles, quoted posts, template expansions
    (production corpus cleanup runs BOTH filters). Returns
    (id_a, id_b, overlap) with id_a < id_b, overlap >= ``threshold``.

    Scale shape: inverted-index equi-join on 64-bit shingle hashes
    with a map-side-combined intersection count; per-doc sizes join
    back on the id. ``max_shingle_freq`` (document-frequency cap)
    drops stop-shingles from the index — a shingle appearing in 10k
    docs contributes ~10k^2/2 candidate pairs and near-zero evidence
    of containment — the explicit recall/cost contract at corpus
    scale. PPJoin prefix filtering does NOT transfer here (it bounds
    the union, not the min), so the df-cap is the load-bearing guard;
    a capped-out shingle can only LOWER a pair's computed overlap
    (intersection undercount), never invent a pair.
    """
    # hashed shingles built word-wise (no per-shingle string concat —
    # see _hashed_word_shingles); feeds sizes + index: one shingle
    # build, shared via a LAZY local checkpoint (eager would run a
    # corpus-sized job at plan-construction time — the lazy-plan
    # contract)
    sh = _hashed_word_shingles(df, id_col, text_col, n).localCheckpoint(
        eager=False
    )
    sizes = sh.select("__id", F.size("__shs").alias("__sz"))
    idx = _shingle_index(sh, "__id", F.col("__shs"), max_shingle_freq)
    a = idx.select(F.col("__id").alias("id_a"), "__sh")
    b = idx.select(F.col("__id").alias("id_b"), "__sh")
    inter = (
        a.join(b, on="__sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sz_a = sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("__sza"))
    sz_b = sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("__szb"))
    out = (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a", "id_b",
            (
                F.col("__inter").cast("double")
                / F.least(F.col("__sza"), F.col("__szb"))
            ).alias("overlap"),
        )
    )
    return out.filter(F.col("overlap") >= threshold).orderBy("id_a", "id_b")


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """SimHash over distinct tokens: per-bit majority vote of token-hash
    bits, any width up to 128 (multiple of 4; md5 supplies the bits).
    explode -> one agg with ``bits`` conditional sums -> pack. Packing
    uses shiftleft|or, so bit 63 (sign bit) is well-defined; xor/
    bit_count downstream treat each long as a bag of bits. Returns
    (id, simhash long) for widths <= 64, (id, simhash_hi, simhash_lo)
    above — the two-long layout ``banded_hamming_pairs`` consumes.
    Width is the CORPUS-SIZE knob, not a recall knob: see
    :func:`simhash_pairs` sizing notes."""
    if bits % 4 or not 4 <= bits <= 128:
        raise ValueError(f"bits must be a multiple of 4 in [4, 128], got {bits}")
    nchars = bits // 4
    # Optimization r13 (guide §1.2 per-task work): the per-row bit
    # source is ONE conv() per 60-bit chunk of the digest prefix, not
    # one instr+substring per BIT (`_md5_bit`): bit b of the
    # big-endian nchars-hex integer == bit (b - 60c) of the value of
    # hex chars (nchars-15c-width, nchars-15c] for c = b div 60 —
    # contiguous chars, so chunk values are exact longs (15 hex chars
    # = 60 bits < 2^63, no sign/overflow) and every per-bit aggregate
    # input collapses to shiftright(chunk, b mod 60) & 1. Bit-exact
    # vs the per-char form by construction (pinned across widths by
    # tests/test_operators_unit.py::test_simhash_chunk_extraction
    # _matches_reference); the md5 column materializes in its own
    # projection so multi-chunk widths never re-hash the token.
    tok = df.select(
        F.col(id_col).alias(id_col), F.explode(distinct_tokens(text_col)).alias("__t")
    ).select(id_col, F.md5(F.col("__t")).alias("__h"))
    nchunks = (nchars + 14) // 15
    chunk_exprs = []
    for c in range(nchunks):
        width = min(15, nchars - c * 15)
        start = nchars - c * 15 - width + 1
        chunk_exprs.append(
            F.conv(F.substring(F.col("__h"), start, width), 16, 10)
            .cast("long")
            .alias(f"__c{c}")
        )
    tok = tok.select(id_col, *chunk_exprs)
    per_bit = tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(
                F.shiftright(F.col(f"__c{b // 60}"), b % 60).bitwiseAND(
                    F.lit(1)
                )
            ).alias(f"__b{b}")
            for b in range(bits)
        ],
    )

    def pack(lo_bit: int, hi_bit: int):
        sig = F.lit(0).cast("long")
        for b in range(lo_bit, hi_bit):
            bit = F.when(
                F.col(f"__b{b}") * 2 > F.col("__n"), F.lit(1)
            ).otherwise(F.lit(0))
            sig = sig.bitwiseOR(F.shiftleft(bit.cast("long"), b - lo_bit))
        return sig

    if bits <= 64:
        return per_bit.select(F.col(id_col), pack(0, bits).alias("simhash"))
    return per_bit.select(
        F.col(id_col),
        pack(64, bits).alias("simhash_hi"),
        pack(0, 64).alias("simhash_lo"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 16,
    block_col: str | None = None,
    bands: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance.

    Candidate generation, cheapest applicable first:

    - ``bands=k`` — the production scale path: split the signature
      into ``k`` contiguous bit bands; by pigeonhole any pair with
      hamming <= ``bands - 1`` agrees EXACTLY on at least one band, so
      an equi-join on (band_index, band_value) is lossless whenever
      ``bands >= max_hamming + 1`` (enforced). One shuffle keyed by
      small ints instead of a per-block cross join.
    - ``block_col`` — restrict pairs to a natural partition (lang /
      source); composes with ``bands`` (band key includes the block).
    - neither — full cross join; only for small corpora / oracles.

    Candidates are always verified with the exact
    ``bit_count(xor)``. Returns (id_a, id_b, hamming <= max_hamming).

    Sizing: expected bucket occupancy is ``n / 2^(bits/bands)``, and
    candidate count grows as ``bands * n^2 / 2^(bits/bands)`` for
    unrelated docs — so BITS MUST SCALE WITH CORPUS SIZE. Keep
    ``2^(bits/bands)`` a few times larger than ``n``: 32-bit/4-band
    (8-bit buckets) is fine to ~10k docs, 64-bit/4-band (16-bit
    buckets) to ~1M; ``bits=128`` (two-long signature, e.g. 8 bands
    of 16 -> pigeonhole radius 7, or 4 bands of 32 -> 4-billion-value
    buckets at radius 3) is the 1e8-1e9-doc configuration, composable
    with a ``block_col`` shard beyond that. Measured (BASELINE.md,
    100k docs): 32/4 costs 29 s, 64/4 costs ~7 s — the band width,
    not the data, was the cost."""
    cols = [id_col] + ([block_col] if block_col else [])
    sigs = simhash(df.select(*cols, text_col), id_col, text_col, bits)
    sig_cols = ["simhash"] if bits <= 64 else ["simhash_hi", "simhash_lo"]
    if block_col:
        sigs = sigs.join(df.select(id_col, block_col), on=id_col)
    sigs = sigs.localCheckpoint(eager=False)  # self-joined below; releases on GC (lazy: r13)
    if bands is not None:
        if bands <= max_hamming:
            raise ValueError(
                f"bands={bands} loses pairs at max_hamming={max_hamming}; "
                f"need bands >= max_hamming + 1"
            )
        if bits <= 64:
            # near-equal band widths covering all ``bits``
            base, extra = divmod(bits, bands)
            widths = [base + (1 if i < extra else 0) for i in range(bands)]
            starts = [sum(widths[:i]) for i in range(bands)]
            band_vals = F.array(
                *[
                    F.shiftright(F.col("simhash"), s).bitwiseAND(
                        F.lit((1 << w) - 1).cast("long")
                    )
                    for s, w in zip(starts, widths)
                ]
            )
        else:
            # two-long signature: slice only the COVERED ``bits``
            # (lo = bits 0..63, hi = bits 64..bits-1). Slicing the
            # full 128-bit layout here was the round-5 advisory bug:
            # for 64 < bits < 128 every band over the always-zero
            # region above ``bits`` was constant 0 for all rows, so
            # each became an all-pairs bucket and candidate
            # generation degenerated to O(n^2). The near-equal-width
            # geometry over the covered concatenation (same rule as
            # the single-long branch) keeps every band informative
            # and preserves pigeonhole: bands are disjoint and cover
            # exactly bits 0..bits-1.
            band_vals = F.array(
                *_covered_band_slices("simhash_lo", "simhash_hi", bits, bands)
            )
        # the signature is 8/16 bytes — carry it through the band join
        # and verify inline, instead of distinct-ing candidates and
        # joining the signature table back twice
        bucketed = sigs.select(
            id_col,
            *sig_cols,
            *([block_col] if block_col else []),
            F.posexplode(band_vals).alias("__bi", "__bv"),
        )
        key = ["__bi", "__bv"] + ([block_col] if block_col else [])
        bucketed = _cap_buckets(bucketed, key, max_bucket_size)
        xa = bucketed.select(
            F.col(id_col).alias("id_a"),
            *[F.col(c).alias(f"__sa{j}") for j, c in enumerate(sig_cols)],
            *key,
        )
        xb = bucketed.select(
            F.col(id_col).alias("id_b"),
            *[F.col(c).alias(f"__sb{j}") for j, c in enumerate(sig_cols)],
            *key,
        )
        pairs = (
            xa.join(xb, on=key)
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                _hamming("__sa", "__sb", len(sig_cols)).alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
        )
        return (
            pairs.groupBy("id_a", "id_b")
            .agg(F.first("hamming").alias("hamming"))
            .orderBy("id_a", "id_b")
        )
    a = sigs.select(*[F.col(c).alias(f"{c}_a") for c in sigs.columns])
    b = sigs.select(*[F.col(c).alias(f"{c}_b") for c in sigs.columns])
    on = (
        [F.col(f"{block_col}_a") == F.col(f"{block_col}_b")] if block_col else [F.lit(True)]
    )
    ham = F.bit_count(
        F.col(f"{sig_cols[0]}_a").bitwiseXOR(F.col(f"{sig_cols[0]}_b"))
    )
    for c in sig_cols[1:]:
        ham = ham + F.bit_count(F.col(f"{c}_a").bitwiseXOR(F.col(f"{c}_b")))
    pairs = (
        a.join(b, on=on)
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .select(
            F.col(f"{id_col}_a").alias("id_a"),
            F.col(f"{id_col}_b").alias("id_b"),
            ham.alias("hamming"),
        )
    )
    return pairs.filter(F.col("hamming") <= max_hamming).orderBy("id_a", "id_b")


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    max_distance: int = 2,
    block_chars: int = 1,
) -> DataFrame:
    """Fuzzy string matching: distinct values of ``col`` paired when
    levenshtein distance <= ``max_distance``, blocked on the first
    ``block_chars`` characters (the recall/cost knob: pairs differing
    in their prefix are not candidates — state this in the product
    contract). The length-difference pre-filter is lossless:
    ``lev(a,b) >= abs(len(a)-len(b))``, so it only drops pairs the
    distance filter would drop anyway, before the quadratic step.
    Per-block self-join keeps the candidate space sum(block^2), never
    n^2; values (not rows) are joined, so upstream duplicates cost
    nothing."""
    vals = (
        df.select(F.col(col).alias("val"))
        .where(F.col("val").isNotNull())
        .distinct()
        .select("val", F.substring("val", 1, block_chars).alias("__blk"))
        .localCheckpoint()
    )
    a = vals.select(F.col("val").alias("val_a"), "__blk")
    b = vals.select(F.col("val").alias("val_b"), "__blk")
    return (
        a.join(b, "__blk")
        .filter(F.col("val_a") < F.col("val_b"))
        .filter(
            F.abs(F.length("val_a") - F.length("val_b")) <= max_distance
        )
        .select(
            "val_a",
            "val_b",
            F.levenshtein("val_a", "val_b").alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
        .orderBy("val_a", "val_b")
    )


def dedup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_words: int = 5,
    max_docs: int = 1,
    hash_spans: bool = False,
) -> DataFrame:
    """Cross-document duplicated-span removal (C4/RefinedWeb style).

    Splits each document into NON-overlapping ``span_words``-word
    chunks, counts how many DISTINCT documents each chunk appears in
    corpus-wide, drops every chunk seen in more than ``max_docs``
    documents, and reassembles the surviving chunks in original order.
    This is the "remove any span that occurs verbatim elsewhere in the
    corpus" cleanup step of LLM pretraining pipelines (C4 uses
    three-sentence spans; this corpus has no sentence boundaries, so
    the span unit is a fixed word count). Non-overlapping spans make
    reassembly lossless; within-document repeats are kept (the rule
    fires on cross-document duplication only).

    Output: ``(id_col, clean_text, n_dropped, n_spans)``. NULL-text
    documents produce no spans and are absent from the output.
    Empty-STRING text is one empty token (``split('') == ['']``, the
    SQL convention both engines share), so such docs appear with one
    empty span — and two empty docs duplicate each other's '' span
    and get it dropped like real text. Filter empty/NULL texts
    upstream if either behavior is unwanted.

    Scale shape (100 TB): one explode -> grouped distinct-count on the
    span key -> one join back -> one grouped reassembly; never a cross
    join. With ``hash_spans=True`` the count/join key is
    ``xxhash64(span)`` (8 bytes instead of the span text, ~5x less
    frequency-shuffle traffic; collision odds ~n^2/2^64 — a collision
    can only over-drop, never corrupt). Default keys on the span text
    itself so the result is bit-identical to the DuckDB oracle. The
    duplicated-span set is typically tiny relative to the corpus (only
    spans repeated across documents), so the join back is
    broadcast-eligible and AQE converts it at runtime.
    """
    toks = tokens(text_col)
    n_spans = F.ceil(F.size(toks) / F.lit(span_words)).cast("int")
    spans = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.struct(
                i.alias("ord"),
                F.concat_ws(
                    " ", F.slice(toks, i * span_words + 1, span_words)
                ).alias("span"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<ord:int,span:string>>"))

    # exploded feeds TWO full passes (the dup-set aggregate and the
    # flag join-back); without truncation each pass re-runs the span
    # construction (tokenize + per-span concat) over the whole corpus.
    # Lazy localCheckpoint materializes the span table once — the
    # guide's decide-on-small/write-once trade: one disk/memory-backed
    # materialization of the exploded spans against a second full
    # compute (measured 2.1 -> 1.5 s at 5k docs, 2.9 -> 2.1 s at 100k;
    # optimization r13).
    exploded = df.select(
        F.col(id_col).alias("__id"), F.explode(spans).alias("s")
    ).select(
        "__id", F.col("s.ord").alias("__ord"), F.col("s.span").alias("__span")
    ).localCheckpoint(eager=False)

    key = F.xxhash64("__span") if hash_spans else F.col("__span")
    dup = (
        exploded.groupBy(key.alias("__k"))
        .agg(F.countDistinct("__id").alias("__nd"))
        .filter(F.col("__nd") > max_docs)
        .select("__k")
        .withColumn("__dup", F.lit(True))
    )
    flagged = exploded.join(dup, on=key == dup["__k"], how="left").drop("__k")
    return (
        flagged.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__dup").isNull(),
                                F.struct(F.col("__ord"), F.col("__span")),
                            )
                        )
                    ),
                    lambda s: s["__span"],
                ),
                " ",
            ).alias("clean_text"),
            F.sum(F.when(F.col("__dup"), 1).otherwise(0)).alias("n_dropped"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )


def _sig_cols(sig_col: str | Sequence[str]) -> list[str]:
    return [sig_col] if isinstance(sig_col, str) else list(sig_col)


def _band_slices(cols: list[str], bands: int) -> list:
    """Band-value slice expressions over a 1- or multi-long signature
    — the full-coverage banding geometry used by ``_band_explode``
    (``simhash_pairs``' wide branch with partial bit coverage uses
    ``_covered_band_slices`` instead).

    Single long: ``width = 64 // bands`` (floor — any band count up
    to 64 works, as it always has; bits past ``bands * width`` stay
    out of every band, which PRESERVES the pigeonhole guarantee:
    hamming differences confined to uncovered bits leave every band
    equal, so the pair still collides). Multi-long: ``bands`` must cut
    the concatenation into equal slices that each fit one word, so a
    slice stays a shift+mask expression."""
    k = len(cols)
    total = 64 * k
    if k == 1:
        width = 64 // bands
    else:
        if total % bands or 64 % (total // bands):
            raise ValueError(
                f"bands={bands} must divide the {total}-bit signature "
                f"into equal slices that each fit within one 64-bit word"
            )
        width = total // bands
    slices = []
    for i in range(bands):
        c = F.col(cols[(i * width) // 64])
        shift = (i * width) % 64
        if width == 64:
            slices.append(c)
        else:
            mask = (1 << width) - 1
            slices.append(F.shiftrightunsigned(c, shift).bitwiseAND(mask))
    return slices


def _covered_band_slices(
    lo_col: str, hi_col: str | None, bits: int, bands: int
) -> list:
    """Band-value slice expressions over the COVERED ``bits`` of a
    one- or two-long signature (``lo_col`` holds bits 0..63,
    ``hi_col`` bits 64..``bits``-1 packed from position 0; ``hi_col``
    is ``None`` iff ``bits <= 64``) — the near-equal-width geometry
    shared by ``simhash_pairs``' wide branch and (round 7) the public
    banded-hamming backend's ``bits`` contract.
    Widths are ``divmod(bits, bands)``-balanced; a band straddling
    the word boundary is assembled as ``(lo >>> s) | (hi << (64-s))``
    then masked, so every slice stays a codegen-friendly shift/mask
    expression. Round-6 advisory fix: slicing the full 128-bit layout
    for ``bits < 128`` made the bands above ``bits`` constant zero —
    all-pairs buckets."""
    if bands > bits:
        raise ValueError(f"bands={bands} exceeds the {bits}-bit signature")
    if (hi_col is None) != (bits <= 64):
        raise ValueError(
            f"bits={bits} needs {'one long column' if bits <= 64 else 'two long columns'}"
        )
    base, extra = divmod(bits, bands)
    widths = [base + (1 if i < extra else 0) for i in range(bands)]
    if widths[0] > 64:
        raise ValueError(
            f"bands={bands} gives {widths[0]}-bit band values over a "
            f"{bits}-bit signature; need <= 64 bits per band "
            f"(use more bands)"
        )
    lo = F.col(lo_col)
    hi = F.col(hi_col) if hi_col is not None else None
    slices = []
    start = 0
    for w in widths:
        end = start + w
        if end <= 64:
            v = F.shiftrightunsigned(lo, start)
        elif start >= 64:
            v = F.shiftrightunsigned(hi, start - 64)
        else:
            # straddles the word boundary: low part from lo's top,
            # high part from hi's bottom (shiftleft drops overflow)
            v = F.shiftrightunsigned(lo, start).bitwiseOR(
                F.shiftleft(hi, 64 - start)
            )
        if w < 64:
            v = v.bitwiseAND(F.lit((1 << w) - 1).cast("long"))
        slices.append(v)
        start = end
    return slices


def _band_explode(
    sigs: DataFrame,
    id_col: str,
    sig_col: str | Sequence[str],
    bands: int,
    bits: int | None = None,
) -> DataFrame:
    """(id, sig...) -> one row per (band index, band value) slice of
    the signature — the shared candidate-key derivation for the
    self-join (``banded_hamming_pairs``) and the cross-table join
    (``banded_hamming_join``). ``sig_col`` may be a list of long
    columns for signatures wider than 64 bits (e.g. a 128-bit
    perceptual hash as two longs): the concatenation is sliced into
    ``bands`` equal pieces, so widening the signature widens each
    band's value space — the knob that keeps expected bucket
    collisions ~ n^2 / 2^width sub-quadratic as the corpus grows.

    ``bits`` (round-7, from the r6 verdict's residual-edge finding):
    when the signature populates only the low ``bits`` of the
    concatenation (e.g. raw 96-bit simhash columns), pass it so the
    near-equal-width slicer covers exactly bits 0..``bits``-1 —
    otherwise bands over the always-zero region are constant for all
    rows and each becomes an all-pairs bucket (the exact degeneration
    the r6 ``simhash_pairs`` fix closed inside that entry point).
    With ``bits`` set, ``sig_col`` must be in concatenation order:
    the fully-populated low long first, the partial top long last."""
    cols = _sig_cols(sig_col)
    if bits is None:
        slices = _band_slices(cols, bands)
    else:
        if len(cols) > 2:
            raise ValueError(
                "bits is only supported for 1- or 2-long signatures"
            )
        if not 64 * (len(cols) - 1) < bits <= 64 * len(cols):
            raise ValueError(
                f"bits={bits} does not fit {len(cols)} long column(s): "
                f"need {64 * (len(cols) - 1)} < bits <= {64 * len(cols)}"
            )
        slices = _covered_band_slices(
            cols[0], cols[1] if len(cols) > 1 else None, bits, bands
        )
    return sigs.select(
        F.col(id_col).alias("__id"),
        *[F.col(c).alias(f"__sig{j}") for j, c in enumerate(cols)],
        F.posexplode(F.array(*slices)).alias("__band", "__val"),
    )


def _hamming(prefix_a: str, prefix_b: str, n_parts: int):
    """Exact hamming distance between two (possibly multi-long)
    signatures: sum of per-long popcounts of the XOR."""
    parts = [
        F.bit_count(
            F.col(f"{prefix_a}{j}").bitwiseXOR(F.col(f"{prefix_b}{j}"))
        )
        for j in range(n_parts)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def _check_band_args(
    bands: int, max_hamming: int, n_sig_cols: int = 1,
    bits: int | None = None,
) -> None:
    total = bits if bits is not None else 64 * n_sig_cols
    if not 0 <= max_hamming < bands:
        raise ValueError(
            f"pigeonhole guarantee needs 0 <= max_hamming < bands, "
            f"got {max_hamming} vs {bands}"
        )
    if bands > total:
        # width would floor to 0 -> every band value 0 -> the band
        # join degenerates to an all-pairs self-join (review r04)
        raise ValueError(
            f"bands={bands} exceeds the {total}-bit signature"
        )
    # multi-long slice geometry (equal slices within one word) is
    # validated by _band_slices — the one definition of the geometry;
    # single-long keeps the historical any-band-count floor-width
    # behavior (round-5 review: the equal-slice rule must not reject
    # previously-valid single-long configurations like bands=5)


def banded_hamming_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_sig: str | Sequence[str],
    right_id: str,
    right_sig: str | Sequence[str],
    bands: int = 4,
    max_hamming: int = 3,
    bits: int | None = None,
) -> DataFrame:
    """Cross-table variant of :func:`banded_hamming_pairs`: every
    (left, right) pair within ``max_hamming`` bits, candidates from
    the shared-band equi-join (pigeonhole-lossless for
    ``max_hamming < bands``). Returns (id_l, id_r, hamming).

    The incremental-dedup primitive: probe a small batch (left)
    against a standing signature registry (right) — per-batch cost is
    O(batch x collision rate), the registry is never self-joined. No
    bucket cap here: capping would silently drop registry matches,
    and the batch side bounds the join anyway (broadcast when small).

    Pass ``bits`` when the signatures populate only the low ``bits``
    of the concatenation (see :func:`banded_hamming_pairs`)."""
    lcols, rcols = _sig_cols(left_sig), _sig_cols(right_sig)
    if len(lcols) != len(rcols):
        raise ValueError(
            f"signature widths differ: {len(lcols)} vs {len(rcols)} longs"
        )
    k = len(lcols)
    _check_band_args(bands, max_hamming, k, bits)
    a = _band_explode(left, left_id, lcols, bands, bits).select(
        F.col("__id").alias("id_l"),
        *[F.col(f"__sig{j}").alias(f"__hl{j}") for j in range(k)],
        "__band", "__val",
    )
    b = _band_explode(right, right_id, rcols, bands, bits).select(
        F.col("__id").alias("id_r"),
        *[F.col(f"__sig{j}").alias(f"__hr{j}") for j in range(k)],
        "__band", "__val",
    )
    carry = [f"__hl{j}" for j in range(k)] + [f"__hr{j}" for j in range(k)]
    return (
        a.join(b, ["__band", "__val"])
        .select("id_l", "id_r", *carry)
        .distinct()
        .withColumn("hamming", _hamming("__hl", "__hr", k))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_l", "id_r", "hamming")
    )


def banded_hamming_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str | Sequence[str],
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    bits: int | None = None,
) -> DataFrame:
    """Near-dup pairs from PRE-COMPUTED 64-bit (one long column) or
    wider (list of long columns) signatures: split the concatenated
    signature into ``bands`` equal slices, candidates share at least
    one slice (pigeonhole-lossless for ``max_hamming < bands``), exact
    ``bit_count(xor)`` verifies. Returns (id_a, id_b, hamming).

    ``bits`` (round-7, closing the r6 verdict's residual edge): the
    default geometry assumes the signature covers all 64*k bits of
    its column(s). When only the low ``bits`` are populated (e.g. raw
    96-bit simhash columns passed directly, rather than through
    ``simhash_pairs`` which routes its own covered-bits slicer), pass
    ``bits`` so banding covers exactly bits 0..``bits``-1 — otherwise
    every band over the always-zero top region is constant for all
    rows and degenerates to an all-pairs bucket (O(n^2) candidates).
    With ``bits``, ``sig_col`` must be in concatenation order: low
    long first, partial top long last.

    The shared pairing backend for every fixed-width-signature tier —
    simhash-style text signatures, perceptual image/audio hashes
    (``multimodal.media_near_dup``) — so the banding/pigeonhole logic
    and the ``max_bucket_size`` hot-bucket cap (degenerate signatures,
    e.g. constant-color images all hashing to 0, would otherwise make
    one bucket's self-join quadratic) live in ONE place.

    Band-width sizing is the scale lever: expected bucket collisions
    grow ~ n^2 / 2^width per band, so a corpus big enough to crowd
    8-bit buckets needs a WIDER signature (128-bit hash -> 16-bit
    bands at bands=8), not fewer bands — fewer bands would shrink the
    pigeonhole-lossless hamming radius instead.
    """
    cols = _sig_cols(sig_col)
    k = len(cols)
    _check_band_args(bands, max_hamming, k, bits)
    banded = _band_explode(sigs, id_col, cols, bands, bits)
    banded = _cap_buckets(banded, ["__band", "__val"], max_bucket_size)
    a = banded.select(
        F.col("__id").alias("id_a"),
        *[F.col(f"__sig{j}").alias(f"__ha{j}") for j in range(k)],
        "__band", "__val",
    )
    b = banded.select(
        F.col("__id").alias("id_b"),
        *[F.col(f"__sig{j}").alias(f"__hb{j}") for j in range(k)],
        "__band", "__val",
    )
    carry = [f"__ha{j}" for j in range(k)] + [f"__hb{j}" for j in range(k)]
    return (
        a.join(b, ["__band", "__val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *carry)
        .distinct()
        .withColumn("hamming", _hamming("__ha", "__hb", k))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def cross_source_dup_matrix(
    df: DataFrame,
    source_col: str,
    text_col: str,
) -> DataFrame:
    """Cross-source duplicate-leakage matrix: for every unordered
    source pair, how many distinct exact-duplicate groups span BOTH
    sources — the provenance-contamination audit a multi-source
    corpus runs before attributing quality or deduplicating by
    priority (a benchmark set leaking through a web crawl, a wiki
    dump mirrored inside CommonCrawl, two crawls overlapping). The
    diagonal (``source_a == source_b``) counts groups with >= 2
    copies INSIDE one source — its internal duplication.

    Output: ``(source_a, source_b, dup_groups, dup_docs)`` with
    ``source_a <= source_b`` (binary string order); ``dup_groups``
    = distinct content groups in that cell, ``dup_docs`` = copies
    those groups contribute on the pair's sides (diagonal: copies
    within the source; off-diagonal: copies in both sources
    combined). Pairs with no leakage emit nothing.

    NULL sources fold into ONE unattributed class (rendered as the
    ``\\x00null`` sentinel, the privacy-trio convention): without
    the fold, the diagonal would count NULL-source groups while the
    off-diagonal ``<`` comparison silently dropped every pair
    involving them — under-reporting exactly the unattributed
    documents the audit should flag (review r12).

    Scale shape (100 TB): exact-hash groupBy((md5, source)) — one
    map-side-combined aggregate whose key space is content-groups x
    sources; the pair expansion self-joins THOSE cells on the hash,
    fanning out at most sources^2 per group (sources are a bounded
    dimension — the crosstab vocabulary argument), then one grouped
    count per cell. Bodies never shuffle (32-hex keys only, the
    dedup_exact argument). No window, no collect.
    """
    cells = (
        df.groupBy(
            exact_hash(F.col(text_col)).alias("__h"),
            F.coalesce(
                F.col(source_col).cast("string"), F.lit("\x00null")
            ).alias("__src"),
        )
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint()  # two consumers: diagonal + pair join
    )
    diag = (
        cells.filter(F.col("__c") >= 2)
        .groupBy(F.col("__src").alias("source_a"))
        .agg(
            F.count(F.lit(1)).alias("dup_groups"),
            F.sum("__c").alias("dup_docs"),
        )
        .withColumn("source_b", F.col("source_a"))
    )
    a = cells.select(
        F.col("__h"), F.col("__src").alias("source_a"),
        F.col("__c").alias("__ca"),
    )
    b = cells.select(
        F.col("__h").alias("__hb"), F.col("__src").alias("source_b"),
        F.col("__c").alias("__cb"),
    )
    off = (
        a.join(b, (a["__h"] == b["__hb"]) & (a.source_a < b.source_b))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("dup_groups"),
            F.sum(F.col("__ca") + F.col("__cb")).alias("dup_docs"),
        )
    )
    return diag.select(
        "source_a", "source_b", "dup_groups", "dup_docs"
    ).unionByName(
        off.select("source_a", "source_b", "dup_groups", "dup_docs")
    )


def dedup_priority(
    df: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
    priority: Sequence[str],
) -> DataFrame:
    """Exact dedup that keeps the HIGHEST-PRIORITY source's copy —
    the multi-source curation practice (The Pile / RefinedWeb): when
    the same document appears in a curated dump AND a web crawl,
    keep the curated copy, not an arbitrary one. ``priority`` lists
    source values best-first; sources not listed (and NULL sources)
    rank after every listed one, and ties inside a rank break by
    lowest ``id_col`` — the kept set is a pure function of (table,
    priority), reproducible across engines and partitionings.

    Rows whose ``text_col`` is NULL form ONE group (the
    ``dedup_exact`` convention: dropDuplicates also treats NULLs as
    equal) — exactly one NULL-text row survives.

    Scale shape (100 TB): one map-side-combined min-struct aggregate
    per content hash (output = distinct contents) + one slim
    keep-set semi join back on the id; bodies never reship (32-hex
    keys only). No window — a viral document duplicated across the
    whole corpus is a corpus-sized group, absorbed map-side.
    """
    rank: Column | None = None
    for i, s in enumerate(priority):
        cond = F.col(source_col) == s
        rank = (
            F.when(cond, i) if rank is None else rank.when(cond, i)
        )
    rank = (
        F.lit(len(priority))
        if rank is None
        else rank.otherwise(len(priority))
    )
    hashed = df.withColumn("__h", exact_hash(F.col(text_col)))
    keep = (
        hashed.groupBy("__h")
        .agg(
            F.min(
                F.struct(
                    rank.alias("pr"), F.col(id_col).alias("i")
                )
            ).alias("__k")
        )
        .select(
            F.col("__h").alias("__kh"),
            F.col("__k.i").alias("__keep_id"),
        )
    )
    # semi join on (content hash, winner id), NOT the id alone
    # (review r13): an id-only eqNullSafe join let one group's NULL
    # winner id match every NULL-id row across ALL groups, so losing
    # duplicates survived. Scoping the match to the group's hash
    # bounds any NULL-id ambiguity to its own group (and ids should
    # be unique non-NULL anyway — a NULL id also sorts FIRST in the
    # engine's min-struct while an ORDER BY in most oracles sorts it
    # last, so NULL ids are outside the determinism contract).
    return (
        hashed.join(
            keep,
            hashed["__h"].eqNullSafe(F.col("__kh"))
            & hashed[id_col].eqNullSafe(F.col("__keep_id")),
            "left_semi",
        ).drop("__h")
    )


def neardup_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold_ppm: int = 500_000,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
    mode: str = "flag",
) -> DataFrame:
    """NEAR-duplicate decontamination: flag (or drop) corpus
    documents that are MinHash-near-duplicates of a benchmark/eval
    document — the paraphrase-leakage tier the n-gram-overlap
    decontaminators (q76/q147/q165) cannot see, because a reworded
    benchmark item shares few exact grams but most of its shingle
    set. Both frames carry ``(id_col, text_col)``; BENCH ids must
    be numeric (the argmax tie-break negates them — the
    preference_pairs doctrine) and ids unique per frame; corpus ids
    ride equi-joins only, so string crawl ids are fine.

    Candidates = corpus docs sharing ANY band bucket with a bench
    doc (the q29/q191 banding, same hash family both sides, with
    the ``max_bucket_size`` cap); each candidate pair verifies with
    the exact shingle jaccard in integer ppm; a corpus doc's verdict
    comes from its BEST match (highest jaccard, ties by lowest
    bench id). Output in ``mode="flag"``: every corpus row +
    ``(contaminated, jaccard_ppm, best_bench_id)`` — the last two
    NULL when no band collision occurred at all; ``mode="filter"``
    returns only clean rows (columns unchanged).

    Scale shape (100 TB): the benchmark side is eval-sized —
    bounded; corpus and bench each pay ONE tokenize+signature
    aggregate; the band join's fan-out is bounded by banding
    selectivity and the bucket cap; shingle sets join candidates
    only (never the corpus cross bench); the per-doc verdict is one
    map-side max-struct aggregate. No window, no cartesian.
    """
    if mode not in ("flag", "filter"):
        raise ValueError(f"mode must be flag|filter, got {mode!r}")
    # only the BENCH id feeds the argmax negation (review r13:
    # corpus ids ride equi-joins only — string crawl ids are fine)
    bid_type = bench.schema[id_col].dataType.typeName()
    if bid_type not in (
        "byte", "short", "integer", "long", "float", "double",
        "decimal",
    ):
        raise ValueError(
            f"bench id_col must be numeric for the deterministic"
            f" best-match tie-break, got {bid_type}"
        )
    shingle_expr = (
        word_shingles(text_col, shingle_n)
        if shingle_n > 1
        else distinct_tokens(text_col)
    )

    def prep(df: DataFrame) -> tuple[DataFrame, DataFrame]:
        # the SAME signature aggregate + band-bucket construction
        # q29/q191 ride (shared helpers — review r13)
        tok = df.select(
            F.col(id_col).alias("__id"),
            F.explode(shingle_expr).alias("__t"),
        )
        sigs = _minhash_sig_agg(tok, num_hashes)
        bands = sigs.select(
            "__id", _band_bucket_expr(num_hashes, band_size)
        )
        return sigs, bands

    csigs, cbands = prep(corpus)
    bsigs, bbands = prep(bench)
    cbands = _cap_buckets(cbands, ["__bucket"], max_bucket_size)
    cand = (
        cbands.select(F.col("__id").alias("__cid"), "__bucket")
        .join(
            bbands.select(F.col("__id").alias("__bid"), "__bucket"),
            "__bucket",
        )
        .select("__cid", "__bid")
        .distinct()
    )
    ct = csigs.select(
        F.col("__id").alias("__cid"), F.col("__ts").alias("__cts")
    )
    bt = bsigs.select(
        F.col("__id").alias("__bid"), F.col("__ts").alias("__bts")
    )
    # |A∪B| via sizes (sets are distinct by construction) — one
    # hash-set pass per pair, not two; codegen's common-subexpression
    # elimination evaluates the intersect once (optimization r13)
    jppm = F.expr(
        "(CAST(size(array_intersect(__cts, __bts)) AS BIGINT)"
        " * 1000000)"
        " div (size(__cts) + size(__bts)"
        "      - size(array_intersect(__cts, __bts)))"
    )
    verdicts = (
        cand.join(ct, "__cid")
        .join(bt, "__bid")
        .select("__cid", "__bid", jppm.alias("__j"))
        .groupBy("__cid")
        .agg(
            F.max(
                F.struct(
                    F.col("__j").alias("j"),
                    (-F.col("__bid")).alias("ni"),
                )
            ).alias("__best")
        )
        .select(
            "__cid",
            F.col("__best.j").alias("jaccard_ppm"),
            (-F.col("__best.ni")).alias("best_bench_id"),
        )
    )
    out = (
        corpus.join(
            verdicts, corpus[id_col] == verdicts["__cid"], "left"
        )
        .drop("__cid")
        .withColumn(
            "contaminated",
            F.coalesce(
                F.col("jaccard_ppm") >= threshold_ppm, F.lit(False)
            ),
        )
    )
    if mode == "filter":
        return out.filter(~F.col("contaminated")).drop(
            "contaminated", "jaccard_ppm", "best_bench_id"
        )
    return out


def cross_source_neardup_matrix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.7,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """NEAR-duplicate tier of :func:`cross_source_dup_matrix`: which
    unordered source pairs share near-duplicate content — the
    provenance audit that catches PARAPHRASED benchmark leakage and
    lightly-edited mirrors, which the exact-hash matrix cannot see.
    Near-dup pairs come from :func:`minhash_lsh_pairs` (shingle ->
    minhash -> band -> bucket-join -> exact-jaccard verify, with the
    same banding/cap/threshold contract); each verified pair is then
    labeled with its two sources and counted per unordered source
    cell.

    Output: ``(source_a, source_b, dup_pairs, dup_docs)`` with
    ``source_a <= source_b`` (binary string order); ``dup_pairs`` =
    verified near-dup pairs in the cell (diagonal: both sides in one
    source), ``dup_docs`` = distinct documents those pairs touch in
    the cell. Cells with no leakage emit nothing. NULL sources fold
    into the ``\\x00null`` sentinel class (the q184 convention — an
    equality/comparison on a NULL source must not silently drop the
    unattributed documents the audit exists to flag).

    Scale shape (100 TB): the pair set is banding-bounded (S-curve
    selectivity + ``max_bucket_size``), orders of magnitude under
    the corpus; the two source lookups are slim equi joins on the id
    (id -> source projection only — bodies never reship); the cell
    aggregate's key space is at most sources^2 (bounded dimension).
    One explode (2 rows per pair) feeds the distinct-doc count. No
    window, no collect.
    """
    pairs = minhash_lsh_pairs(
        df,
        id_col,
        text_col,
        num_hashes=num_hashes,
        band_size=band_size,
        threshold=threshold,
        shingle_n=shingle_n,
        max_bucket_size=max_bucket_size,
    )
    src = df.select(
        F.col(id_col).alias("__sid"),
        F.coalesce(
            F.col(source_col).cast("string"), F.lit("\x00null")
        ).alias("__s"),
    )
    labeled = (
        pairs.join(src, pairs["id_a"] == src["__sid"])
        .withColumnRenamed("__s", "__sa")
        .drop("__sid")
        .join(src, pairs["id_b"] == src["__sid"])
        .withColumnRenamed("__s", "__sb")
        .drop("__sid")
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
            "id_a",
            "id_b",
        )
        .localCheckpoint()  # two consumers: pair count + doc count
    )
    cells = labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("dup_pairs")
    )
    docs = (
        labeled.select(
            "source_a",
            "source_b",
            F.explode(F.array("id_a", "id_b")).alias("__d"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.countDistinct("__d").alias("dup_docs"))
    )
    return cells.join(docs, ["source_a", "source_b"])


def dedup_common_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    exempt_below_chars: int = 1,
) -> DataFrame:
    """Cross-document line-level dedup (CCNet, Wenzek et al. 2019
    §4.1; the FineWeb boilerplate scrub): drop every line whose
    normalized form appears in >= ``min_docs`` DISTINCT documents,
    and rebuild each document from its surviving lines. This is the
    data-driven complement to :func:`~..c4.c4_clean`'s rule-based
    line filters — navigation bars, cookie banners and footers are
    exactly the lines shared across many pages of a crawl.

    Normalization (identical expression in the DuckDB oracle):
    ``lower(trim(regexp_replace(line, '[ \\t\\n\\r]+', ' ')))`` —
    the explicit class, not ``\\s``, because Java's ``\\s`` matches
    vertical tab while RE2's does not (the ``url_host`` convention:
    only the engine-identical regex subset). Lines whose
    normalized form is shorter than ``exempt_below_chars`` (default:
    empty lines) are exempt — they neither count toward frequency
    nor get dropped, so blank-line document structure survives.

    Output: one row per distinct ``id_col`` value — ``(id_col,
    text_clean, n_lines, n_dropped)``. ``text_clean`` re-joins kept
    lines on ``\\n`` ('' when every line was dropped); NULL-text
    documents pass through with ``text_clean`` NULL and zero counts.
    All NULL-id rows form ONE group (the ``cap_per_group`` NULL
    doctrine: grouped, never silently dropped) — but NULL ids are
    INVISIBLE to the frequency count (``countDistinct`` skips NULL
    in both engines), so a line shared only with the NULL-id group
    never reaches ``min_docs`` on that group's account. Ids are
    expected unique per document — duplicate-id rows merge into one
    output, position ties broken by line content (the oracle orders
    ``pos, line`` to match).

    Scale (100 TB): one posexplode; the frequency aggregate and the
    verdict join ride a 32-char ``md5(norm)`` key, never the line
    body (the ``dedup_exact`` shuffle-key rule) — and md5 is
    cross-engine identical, so the oracle groups on the same key and
    collisions cannot diverge the engines. The common-line table is
    NOT force-broadcast (a boilerplate-heavy crawl makes it
    unboundedly large — the ``dup_downweight`` lesson): AQE picks
    the strategy. Per-document reassembly is one grouped
    collect_list bounded by document size, the same contract as
    pack assembly.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if exempt_below_chars < 0:
        raise ValueError(
            f"exempt_below_chars must be >= 0, got {exempt_below_chars}"
        )
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "__pos", "__line"
        ),
    ).withColumn(
        # own projected column: consumed by BOTH __lh and __eligible
        # (the span-corruption rule — inlined copies re-evaluate)
        "__norm",
        F.lower(F.trim(F.regexp_replace("__line", r"[ \t\n\r]+", " "))),
    ).withColumn(
        "__lh", F.md5("__norm")
    ).withColumn(
        "__eligible", F.length("__norm") >= exempt_below_chars
    )
    common = (
        lines.where("__eligible")
        .groupBy("__lh")
        .agg(F.countDistinct("__id").alias("__doc_freq"))
        .where(F.col("__doc_freq") >= min_docs)
        .select("__lh")
        .withColumn("__common", F.lit(True))
    )
    verdict = lines.join(common, "__lh", "left").withColumn(
        "__dropped", F.col("__eligible") & F.col("__common").isNotNull()
    )
    agg = verdict.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__dropped"),
                            F.struct("__pos", "__line"),
                        )
                    )
                ),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.when(F.col("__dropped"), 1)).alias("n_dropped"),
    )
    base = df.select(F.col(id_col)).distinct()
    return (
        base.join(
            agg, F.col(id_col).eqNullSafe(F.col("__id")), "left"
        )
        .select(
            F.col(id_col),
            "text_clean",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        )
    )

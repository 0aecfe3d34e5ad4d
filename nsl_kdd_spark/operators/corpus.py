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

from pyspark.sql import Column, DataFrame, Window
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
    # left_anti is EXISTS-semantics: duplicate id_b rows (one per
    # partner) change nothing, so the distinct's exchange+aggregate
    # was pure overhead (optimization r14, guide §2.4)
    drop = pairs.select(F.col("id_b").alias(id_col))
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


_TEMP_ALPHAS = (0.25, 0.5, 0.75, 1.0)


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_total: int | None = None,
    salt: str = "",
    exact: bool = False,
    epoch_col: str = "epoch",
    weight_col: str | Column | None = None,
) -> DataFrame:
    """Temperature-balanced mixture sampling — the multilingual /
    multi-source pretrain-mix step (XLM's alpha-smoothed language
    sampling, Conneau & Lample 2019; mT5 / XLM-R sample languages
    with p_g ∝ n_g^alpha, alpha < 1 upweights low-resource groups):
    build a corpus of ``target_total`` units (default: the corpus
    size) where group g contributes ``take_g = target_total *
    n_g^alpha / Σ n^alpha`` units — DOWNSAMPLING over-represented
    groups and UPSAMPLING (replicating: multiple training epochs
    over the same documents, the published mechanics)
    under-represented ones. Output = the input columns +
    ``epoch_col`` numbering each copy 1..k, so downstream
    shuffles/shards can tell copies apart.

    ``weight_col`` (round-10 verdict): the group mass ``n_g``. By
    default groups weigh by DOC COUNT (units = rows); pass a per-doc
    non-negative integer weight — a token count — and groups weigh
    by CORPUS SIZE ``n_g = Σ weight`` (units = tokens), the published
    basis (mT5 §3.1 / XLM-R §3.1 sample languages by data size, not
    document count; doc-count balancing over-weights short-doc
    languages). Epoch semantics are unchanged and per-GROUP: every
    doc in group g gets ``e_g = take_g div n_g`` full copies — a
    doc's copy count never depends on other docs' lengths — and the
    remainder ``take_g mod n_g`` (tokens) becomes a uniform doc-rate
    ``rem/n_g`` hash set whose EXPECTED token mass is exactly rem_g.
    Docs with weight 0 ride along in full epochs (a pass over the
    group is a pass); a group whose total mass is 0 allocates
    nothing and is dropped.

    Everything is integer-exact so a SQL engine replays it
    bit-identically (the repo's oracle convention):

    - ``alpha`` is restricted to the quarter grid {0.25, 0.5, 0.75,
      1.0} — the oracle-exact quantization of published practice
      (0.3 mT5 / 0.5 XLM / 0.7 XLM-R round to it). Weights are
      ``w_g = floor(n^alpha * 1e6)`` computed via IEEE ``sqrt``
      chains (sqrt, sqrt∘sqrt, and their product): sqrt and multiply
      are correctly-rounded IEEE-754 operations, so ANY compliant
      engine produces the identical double, hence the identical
      floor — no cross-engine pow() trust required. A sqrt-chain
      value that would itself overflow BIGINT (alpha=0.75 needs a
      single group past ~2e17 tokens) raises loudly.
    - ``take_g = (target_total * w_g) div Σw`` in DECIMAL(38,0) —
      exact integral division, and since BIGINT * BIGINT < 10^38 the
      product can NEVER overflow the decimal, which retires the
      round-10 BIGINT raise_error guard entirely (token-scale
      targets * 1e6-scaled weights overflowed BIGINT at exactly the
      corpus sizes weight_col exists for). The cross-group sums
      Σw / Σn run in DECIMAL(38,0) as well (k per-group BIGINTs can
      wrap a BIGINT sum even when each fits — round-11 review).
      DuckDB replays both as HUGEINT (its integer SUM already is
      one).
    - epochs ``e_g = take_g div n_g``; the remainder ``take_g mod
      n_g`` comes from the md5 layout every sampler here shares.

    ``exact=False`` (default, the 100 TB path): the remainder is the
    deterministic hash-rate set ``md5_bucket32(id, salt) <
    (2^32 * rem) div n_g`` (the cut in DECIMAL(38,0) — 2^32 * a
    token-scale remainder overflows BIGINT) — NO window, NO extra
    shuffle; the whole operator is one k-row aggregate + a broadcast
    alloc join + an explode in the scan stage. 32-bit, not 16
    (round-10 verdict): the 16-bit cut ``(65536*rem) div n``
    truncation systematically undershot heavy downsampling (take/n =
    1e-4 ran ~8% short); at 32 bits the worst undershoot is
    ~2.3e-10. Remainder size is binomially noisy around rem_g (the
    ``sample_hash`` contract). ``exact=True`` ranks each group by
    md5 digest and takes exactly rem_g rows (doc-count mode, the
    ``sample_exact_n`` contract) or the longest digest-ordered
    prefix whose cumulative weight fits rem_g (weighted mode —
    greedy prefix packing) — one window over each group partition,
    so it inherits that function's caveat: fine for many bounded
    strata, NOT for a few corpus-sized groups (a language IS a
    corpus-sized group at 100 TB — which is why it is not the
    default).
    """
    from nsl_kdd_spark.operators.relational import md5_bucket32, md5_key

    alloc = _mixture_allocation(
        df, group_col, alpha, target_total, weight_col
    ).select(
        group_col,
        "__n",
        F.expr("__take div __n").alias("__ep"),
        (F.col("__take") % F.col("__n")).alias("__rem"),
        F.expr(
            "(CAST(4294967296 AS DECIMAL(38,0)) * (__take % __n))"
            " div __n"
        ).alias("__cut"),
    )
    wrow = (
        None
        if weight_col is None
        else (
            F.col(weight_col) if isinstance(weight_col, str)
            else weight_col
        ).cast("long")
    )
    joined = df.join(F.broadcast(alloc), on=group_col)
    if exact:
        from pyspark.sql import Window

        wo = Window.partitionBy(group_col).orderBy(
            md5_key(id_col, salt), F.col(id_col)
        )
        if weight_col is None:
            in_rem = F.row_number().over(wo) <= F.col("__rem")
        else:
            # greedy prefix packing: longest digest-ordered prefix
            # whose cumulative token mass fits the remainder budget
            cum = F.sum(wrow).over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            )
            in_rem = cum <= F.col("__rem")
    else:
        in_rem = md5_bucket32(id_col, salt) < F.col("__cut")
    copies = (F.col("__ep") + in_rem.cast("long")).alias("__k")
    return (
        joined.withColumn("__k", copies)
        .filter(F.col("__k") > 0)
        .withColumn(
            epoch_col, F.explode(F.sequence(F.lit(1), F.col("__k")))
        )
        .drop("__n", "__ep", "__rem", "__cut", "__k")
    )


def _mixture_allocation(
    df: DataFrame,
    group_col: str,
    alpha: float,
    target_total: int | None,
    weight_col: str | Column | None,
) -> DataFrame:
    """The temperature-mixture allocation core, shared by
    :func:`temperature_mixture` (which explodes it into epoch
    copies) and :func:`epoch_budget_report` (which accounts its
    repetition value): per group, mass ``__n`` and allocated units
    ``__take = (target * floor(n^alpha * 1e6)) div Σw`` — the
    sqrt-chain weights and DECIMAL(38,0) arithmetic documented on
    temperature_mixture. Mass-0 groups are dropped. Output:
    ``(group_col, __n, __take)``, k rows."""
    if alpha not in _TEMP_ALPHAS:
        raise ValueError(
            f"alpha must be one of {_TEMP_ALPHAS} (the oracle-exact "
            f"sqrt-chain grid), got {alpha}"
        )
    if target_total is not None and target_total < 1:
        raise ValueError(
            f"target_total must be >= 1, got {target_total}"
        )
    if weight_col is None:
        mass = F.count(F.lit(1))
    else:
        wrow = (
            F.col(weight_col) if isinstance(weight_col, str)
            else weight_col
        ).cast("long")
        # negative masses would corrupt the allocation silently, and
        # NULL weights would silently count as 0 (min/sum skip
        # nulls — round-11 review) — surface both at the (cheap,
        # k-row) aggregate instead
        mass = F.when(
            F.min(wrow) < 0,
            F.raise_error(
                F.lit("temperature_mixture: weight_col is negative")
            ).cast("long"),
        ).when(
            F.max(wrow.isNull().cast("int")) == 1,
            F.raise_error(
                F.lit("temperature_mixture: weight_col is NULL")
            ).cast("long"),
        ).otherwise(F.sum(wrow))
    # localCheckpoint the k-row mass table: both consumers below (the
    # Σw/Σn totals and the per-group take) would otherwise re-plan it
    # from the corpus — TWO full corpus scans for a k-row aggregate
    # (round-12 plan read; the dsir fused-path precedent)
    counts = df.groupBy(group_col).agg(mass.alias("__n")).localCheckpoint()
    nd = F.col("__n").cast("double")
    # alpha=1 needs no fixed-point scale at all (w = n is exact, and
    # floor(t*n*1e6 / (sum(n)*1e6)) == floor(t*n / sum(n)) — the
    # shared factor cancels)
    if alpha == 1.0:
        w = F.col("__n")
    else:
        if alpha == 0.5:
            wd = F.sqrt(nd) * F.lit(1000000.0)
        elif alpha == 0.25:
            wd = F.sqrt(F.sqrt(nd)) * F.lit(1000000.0)
        else:  # 0.75
            wd = F.sqrt(nd) * F.sqrt(F.sqrt(nd)) * F.lit(1000000.0)
        # floor(wd) past BIGINT would wrap silently with ANSI off;
        # reachable for alpha=0.75 once ONE group masses ~2e17 —
        # raise loudly (the doc-count path can't hit it: 9.2e18 rows
        # would overflow the count first)
        w = F.when(
            wd >= F.lit(9.223372036854776e18),
            F.raise_error(
                F.lit(
                    "temperature_mixture: n_g^alpha * 1e6 overflows "
                    "BIGINT; rescale weight_col units"
                )
            ).cast("long"),
        ).otherwise(F.floor(wd))
    wt = counts.withColumn("__w", w.cast("long"))
    # the SUMS run in DECIMAL(38,0) too (round-11 review): per-group
    # weights each fit BIGINT under the guard above, but Σw across
    # groups can wrap it (alpha=0.75, a handful of ~3.5e16-mass
    # groups) — with ANSI off that wrap is SILENT, every take goes
    # negative and the mixture returns zero rows; the decimal sum
    # (like DuckDB's HUGEINT SUM in the oracle) cannot
    tot = wt.agg(
        F.sum(F.col("__w").cast("decimal(38,0)")).alias("__sw"),
        F.sum(F.col("__n").cast("decimal(38,0)")).alias("__sn"),
    )
    tgt = (
        F.lit(int(target_total)).cast("decimal(38,0)")
        if target_total is not None
        else F.col("__sn")
    )
    # DECIMAL(38,0) alloc arithmetic: exact integral `div`, immune to
    # BIGINT overflow by construction (see docstring); everything
    # downstream (__take, __ep, __rem, __cut) is back in BIGINT
    return (
        wt.crossJoin(F.broadcast(tot))  # k rows x 1 row
        .withColumn("__tgt", tgt)
        .withColumn(
            "__take",
            F.expr(
                "CAST((CAST(__tgt AS DECIMAL(38,0)) * __w) div __sw"
                " AS BIGINT)"
            ),
        )
        .filter(F.col("__n") > 0)  # mass-0 group: nothing to copy
        .select(group_col, "__n", "__take")
    )


def epoch_budget_report(
    df: DataFrame,
    group_col: str,
    budget: int,
    alpha: float = 1.0,
    weight_col: str | Column | None = None,
    max_epochs_ppm: int | None = None,
    r_star_ppm: int = 15_390_000,
) -> DataFrame:
    """Data-constrained epoch budgeting (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): when the token
    budget a mixture allocates to a group exceeds its UNIQUE data,
    the group trains for multiple epochs — and repeated tokens decay
    in value. The paper's fit: with U unique tokens and R repeat
    epochs beyond the first, the effective unique data is

        D' = S + S * R* * (1 - exp(-R / R*)),   R* = 15.39

    with S = min(take, U) — the unique tokens actually CONSUMED:
    the paper's data half of eq. 3 presumes the data-constrained
    regime (all of U seen at least once); in the sub-1-epoch regime
    a group's effective data is what it trains on, not its corpus
    mass (review r12: reporting U there overstated by up to
    U/take). The first ~4 repeat epochs are nearly free, ~16+ add
    nothing. This report composes on the
    temperature-mixture allocation (same sqrt-chain weights, same
    DECIMAL(38,0) take — ONE shared `_mixture_allocation` core) and
    accounts, per group: the allocation, the epoch count it implies,
    the effective tokens after repetition decay, and — when
    ``max_epochs_ppm`` caps repetition (published practice caps near
    the 4-epoch knee) — the excess tokens a capped run would free
    for redistribution.

    Output (k rows, one per group): ``(group_col, n_tokens,
    take_tokens, epochs_ppm, repeats_ppm, decay_ppm,
    effective_tokens[, over_cap, excess_tokens])`` where epochs_ppm
    = 1e6 * take div n and effective_tokens applies the decay
    formula.

    Determinism: everything is integer arithmetic in DECIMAL(38,0)
    except the single ``exp()`` — its input ``-repeats_ppm /
    r_star_ppm`` is an exact-integer IEEE division (identical in any
    engine) and its output is quantized immediately to integer ppm
    (``round(1e6 * exp(x))``), the dsir ``_lu_u`` precedent: the one
    libm-trust step, on k rows, documented rather than hidden.

    Scale shape: one k-row allocation aggregate + scan-stage
    arithmetic on those k rows. Nothing touches the corpus twice.
    """
    if r_star_ppm < 1:
        raise ValueError(f"r_star_ppm must be >= 1, got {r_star_ppm}")
    if max_epochs_ppm is not None and max_epochs_ppm < 1_000_000:
        raise ValueError(
            f"max_epochs_ppm caps whole epochs (>= 1e6),"
            f" got {max_epochs_ppm}"
        )
    alloc = _mixture_allocation(df, group_col, alpha, budget, weight_col)
    rep = (
        alloc.withColumnRenamed("__n", "n_tokens")
        .withColumnRenamed("__take", "take_tokens")
        .withColumn(
            "epochs_ppm",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * take_tokens)"
                " div n_tokens AS BIGINT)"
            ),
        )
        .withColumn(
            "repeats_ppm",
            F.greatest(
                F.col("epochs_ppm") - F.lit(1_000_000),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn(
            # the single libm step, quantized on an exact-division
            # input (see docstring)
            "decay_ppm",
            F.round(
                F.exp(
                    -(F.col("repeats_ppm").cast("double"))
                    / F.lit(float(r_star_ppm))
                )
                * F.lit(1_000_000.0)
            ).cast("long"),
        )
        .withColumn(
            # S + (S * R*_ppm * (1e6 - decay_ppm)) div 1e12 with
            # S = least(take, n) — exact in DECIMAL(38,0):
            # S<=9e18 * 1.5e7 * 1e6 ~ 1e32 < 1e38
            "effective_tokens",
            F.least(F.col("take_tokens"), F.col("n_tokens"))
            + F.expr(
                f"CAST((CAST(LEAST(take_tokens, n_tokens)"
                f" AS DECIMAL(38,0))"
                f" * {r_star_ppm} * (1000000 - decay_ppm))"
                f" div 1000000000000 AS BIGINT)"
            ),
        )
    )
    if max_epochs_ppm is None:
        return rep.orderBy(group_col)
    return (
        rep.withColumn(
            "over_cap", F.col("epochs_ppm") > F.lit(max_epochs_ppm)
        )
        .withColumn(
            "excess_tokens",
            F.when(
                F.col("over_cap"),
                F.expr(
                    f"CAST((CAST(n_tokens AS DECIMAL(38,0))"
                    f" * (epochs_ppm - {max_epochs_ppm}))"
                    f" div 1000000 AS BIGINT)"
                ),
            ).otherwise(F.lit(0).cast("long")),
        )
        .orderBy(group_col)
    )


_FIM_MODES = ("psm", "spm")


def fim_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rate: float = 0.5,
    salt: str = "",
    mode: str = "psm",
    pre_tok: str = "<PRE>",
    suf_tok: str = "<SUF>",
    mid_tok: str = "<MID>",
    out_col: str = "text_fim",
) -> DataFrame:
    """Fill-in-the-middle corpus transform (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle" —
    the FIM preprocessing every modern code-pretrain pipeline
    applies): with probability ``rate`` a document is split at two
    token positions into (prefix, middle, suffix) and re-serialized
    with sentinel tokens in PSM order ``<PRE> prefix <SUF> suffix
    <MID> middle`` (or the paper's SPM variant ``<SUF> suffix <PRE>
    prefix <MID> middle``); the rest pass through unchanged. Output =
    input columns + ``(out_col, fim_applied)``.

    Everything is a pure function of ``(salt, id)`` — the engine's
    deterministic-sampling doctrine instead of RNG state: the FIM
    decision is the shared md5-bucket cut (same truncation convention
    as ``sample_hash``/``upsample_hash``), and the two split points
    are independent 32-bit md5 buckets (salted ``a``/``b``) taken mod
    (n_tokens + 1), so re-runs, repartitionings and incremental
    re-ingests transform each document identically — and a SQL engine
    replays the whole thing bit-exactly (token-boundary splits keep
    the oracle in the portable string_split algebra).

    Split-point resolution (round-10 verdict fix): the points draw
    from ``md5_bucket32``, not the 16-bit bucket — at 16 bits a
    100k-token document could never split past position 65,535 (the
    tail of exactly the long code/book files FIM targets) and the
    mod carried a ~2:1 bias over the low positions once L+1 crossed
    32,768. At 32 bits positions to 4.3e9 are reachable and the
    per-position bias is ~(L+1)/2^32. The APPLY decision stays
    16-bit on purpose: it shares ``sample_hash``'s truncation
    convention, so ``fim_transform(rate)`` transforms the identical
    doc set ``sample_hash(rate)`` selects under the same salt.

    Scale shape: zero shuffles, zero joins — the split positions,
    segment slices and sentinel re-serialization are all scan-stage
    JVM expressions (array slice + concat, no explode of the token
    table, no Python).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if mode not in _FIM_MODES:
        raise ValueError(f"mode must be one of {_FIM_MODES}, got {mode!r}")
    from nsl_kdd_spark.functions.text import tokens
    from nsl_kdd_spark.operators.relational import (
        md5_bucket16,
        md5_bucket32,
    )

    # int() truncation, NOT round(): the sample_hash convention, so
    # fim_transform(rate) selects the identical doc set as
    # sample_hash(rate) under the same salt
    cut = int(rate * 65536)
    tk = tokens(text_col)
    L = F.size(tk)
    # cast back to int after the mod (the result is < L+1, an int):
    # slice()'s start/length arguments type-check as int
    c1 = (
        md5_bucket32(id_col, salt + "a") % (L + F.lit(1)).cast("long")
    ).cast("int")
    c2 = (
        md5_bucket32(id_col, salt + "b") % (L + F.lit(1)).cast("long")
    ).cast("int")
    lo = F.least(c1, c2)
    hi = F.greatest(c1, c2)
    prefix = F.slice(tk, 1, lo)
    middle = F.slice(tk, lo + 1, hi - lo)
    suffix = F.slice(tk, hi + 1, L - hi)
    if mode == "psm":
        parts = (
            F.array(F.lit(pre_tok)), prefix,
            F.array(F.lit(suf_tok)), suffix,
            F.array(F.lit(mid_tok)), middle,
        )
    else:
        parts = (
            F.array(F.lit(suf_tok)), suffix,
            F.array(F.lit(pre_tok)), prefix,
            F.array(F.lit(mid_tok)), middle,
        )
    applied = md5_bucket16(id_col, salt) < F.lit(cut)
    return df.withColumn(
        "fim_applied", applied
    ).withColumn(
        out_col,
        F.when(
            F.col("fim_applied"),
            F.array_join(F.concat(*parts), " "),
        ).otherwise(F.col(text_col)),
    )



def _serialize_masked_runs(
    df: DataFrame,
    tk: Column,
    select_pred,
    sentinel_prefix: str,
    sentinel_suffix: str,
    input_col: str,
    target_col: str,
) -> DataFrame:
    """Shared masked-run serializer behind
    :func:`span_corruption_transform` and
    :func:`mixture_of_denoisers`: given a per-position mask predicate
    ``select_pred(pos) -> Column``, recover the maximal masked runs
    and emit the T5 sentinel input/target serialization. Each
    intermediate lands in its OWN column: the per-token selection is
    the expensive expression and every consumer below references it,
    so leaving it inline would make Catalyst re-evaluate the hash
    chain once per consumer (~6x the md5 work — measured 16x wall on
    the bench tier). Project collapsing keeps multiply-referenced
    non-cheap aliases un-inlined, so each column evaluates once per
    row. Zero shuffles/joins/explodes.
    """
    selpos_col = F.filter(
        F.sequence(F.lit(1), F.size(F.col("__tk"))), select_pred
    )
    selpos = F.col("__sel")
    n_sel = F.size(selpos)
    # run boundaries: a selected position starts a maximal run iff its
    # predecessor in selpos isn't pos-1, ends one iff its successor
    # isn't pos+1. Lambda index j is 0-based, element_at is 1-based,
    # so element_at(selpos, j) / element_at(selpos, j+2) are the
    # neighbours; greatest/least keep the index legal on the branch
    # the leading disjunct already decides (codegen may evaluate both).
    starts = F.filter(
        selpos,
        lambda p, j: (j == F.lit(0))
        | (F.element_at(selpos, F.greatest(j, F.lit(1))) != p - 1),
    )
    ends = F.filter(
        selpos,
        lambda p, j: (j == n_sel - 1)
        | (
            F.element_at(selpos, F.least(j + F.lit(2), n_sel))
            != p + 1
        ),
    )
    spans = F.zip_with(
        F.col("__starts"), ends, lambda s, e: F.struct(
            s.alias("s"), e.alias("e")
        )
    )
    n_spans = F.size(F.col("__starts"))

    def sent(k: Column) -> Column:
        return F.concat(
            F.lit(sentinel_prefix), k.cast("string"), F.lit(sentinel_suffix)
        )

    def gap_start(j: Column) -> Column:
        # first unmasked position after the previous span (1 for j=0);
        # greatest() keeps element_at legal if codegen evaluates both
        # branches of the when()
        prev_e = F.element_at(
            F.col("__spans"), F.greatest(j, F.lit(1))
        )["e"]
        return F.when(j == 0, F.lit(1)).otherwise(prev_e + 1)

    inp_segs = F.transform(
        F.col("__spans"),
        lambda sp, j: F.concat(
            F.slice(F.col("__tk"), gap_start(j), sp["s"] - gap_start(j)),
            F.array(sent(j)),
        ),
    )
    last_e = F.when(
        F.col("__nsp") > 0,
        F.element_at(
            F.col("__spans"), F.greatest(F.col("__nsp"), F.lit(1))
        )["e"],
    ).otherwise(F.lit(0))
    tail = F.slice(
        F.col("__tk"), last_e + 1, F.size(F.col("__tk")) - last_e
    )
    tgt_segs = F.transform(
        F.col("__spans"),
        lambda sp, j: F.concat(
            F.array(sent(j)), F.slice(F.col("__tk"), sp["s"], sp["e"] - sp["s"] + 1)
        ),
    )
    return (
        df.withColumn("__tk", tk)
        .withColumn("__sel", selpos_col)
        .withColumn("__starts", starts)
        .withColumn("__spans", spans)
        .withColumn("__nsp", n_spans)
        .withColumn("n_spans", F.col("__nsp"))
        .withColumn("corrupted_tokens", n_sel)
        .withColumn(
            input_col,
            F.array_join(F.concat(F.flatten(inp_segs), tail), " "),
        )
        .withColumn(
            target_col,
            F.array_join(
                F.concat(
                    F.flatten(tgt_segs),
                    F.array(sent(F.col("__nsp"))),
                ),
                " ",
            ),
        )
        .drop("__tk", "__sel", "__starts", "__spans", "__nsp")
    )


def span_corruption_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rate: float = 0.15,
    span_len: int = 3,
    salt: str = "",
    sentinel_prefix: str = "<extra_id_",
    sentinel_suffix: str = ">",
    input_col: str = "text_input",
    target_col: str = "text_target",
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4; the UL2
    R/X denoisers of Tay et al. 2022 are the same transform at other
    (rate, span_len) points): ~``rate`` of each document's tokens are
    masked in spans of mean length ``span_len``, each maximal masked
    run replaced in the input by one sentinel ``<extra_id_k>`` (k in
    document order from 0), and the target serialized as
    ``<extra_id_0> span0 <extra_id_1> span1 … <extra_id_K>`` with the
    trailing K = n_spans final sentinel — the published seq2seq
    denoising objective every T5/UL2 pretrain pipeline feeds.

    Deterministic span placement, the engine's doctrine instead of
    RNG state (the FIM convention): tokens are grouped into
    fixed-width units of ``span_len`` and unit u of document d is
    masked iff ``md5_bucket16(d || '-' || u, salt) < rate * 65536``
    — so the masked-token fraction is ``rate`` exactly in
    expectation, spans average ``span_len`` (adjacent masked units
    merge into one maximal run, mirroring the paper's span merging),
    and re-runs / repartitionings / incremental re-ingests corrupt
    each document identically. A SQL engine replays the whole thing
    bit-exactly from the same md5 arithmetic.

    Output = input columns + ``(input_col, target_col, n_spans,
    corrupted_tokens)``. A document with no masked unit passes its
    text through and targets the bare final sentinel
    ``<extra_id_0>`` (the K = 0 case of the same serialization).

    Scale shape: zero shuffles, zero joins, zero explodes — the unit
    selection, maximal-run recovery (boundary scans over the
    selected-position array, each O(tokens)) and both serializations
    are scan-stage JVM higher-order expressions, so the transform
    rides whatever partitioning the corpus already has, exactly like
    ``fim_transform``. No per-step array append anywhere: every
    array is built by one ``filter``/``transform``/``zip_with`` pass
    (an ``aggregate``-with-append accumulator would be O(tokens²)
    per document — rejected for the 100k-token files this targets).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if span_len < 1:
        raise ValueError(f"span_len must be >= 1, got {span_len}")
    from nsl_kdd_spark.functions.text import tokens
    from nsl_kdd_spark.operators.relational import md5_bucket16

    # int() truncation: the sample_hash/fim_transform cut convention
    cut = int(rate * 65536)
    tk = tokens(text_col)

    def unit_key(pos: Column) -> Column:
        # unit = (pos-1) div span_len; key = "<id>-<unit>" (the
        # md5_key salt prefixes the whole string)
        u = ((pos - 1) / F.lit(span_len)).cast("int")
        return F.concat(
            F.col(id_col).cast("string"), F.lit("-"), u.cast("string")
        )

    return _serialize_masked_runs(
        df,
        tk,
        lambda p: md5_bucket16(unit_key(p), salt) < F.lit(cut),
        sentinel_prefix,
        sentinel_suffix,
        input_col,
        target_col,
    )


def dup_downweight(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    node_col: str = "node",
    comp_col: str = "comp",
    weight_col: str = "dup_weight_ppm",
) -> DataFrame:
    """SOFT dedup: keep every copy but downweight it by its
    duplicate-cluster size — ``weight = 1e6 / cluster_size`` ppm, so
    each distinct content contributes ONE document's worth of
    training mass no matter how many times it was crawled (the
    sampling-weight alternative to dropping copies: hard dedup
    destroys natural-distribution signal some mixtures want to keep,
    and a weight column composes with ``sample_hash_weighted`` /
    ``mix_corpora`` instead of deciding for them). Singletons weigh
    exactly 1e6. Integer ppm (``div``), so the weights are bit-exact
    in any engine.

    Scale shape: cluster sizes are one count aggregate over the
    pair-derived component table (much smaller than the corpus);
    one equi-join attaches (comp, weight) to the corpus scan — NOT
    broadcast-hinted (review r13: a heavily duplicated crawl can
    carry corpus-scale many small clusters, so the size table is
    unbounded; AQE promotes the join to broadcast whenever it
    actually fits). No window, no shuffle of document bodies.
    """
    comp = components.select(
        F.col(node_col).alias("__did"), F.col(comp_col).alias("comp")
    )
    sizes = comp.groupBy("comp").agg(
        F.count(F.lit(1)).alias("__csz")
    )
    lab = comp.join(sizes, "comp")
    return (
        docs.join(lab, docs[id_col] == lab["__did"], "left")
        .drop("__did")
        .withColumn(
            weight_col,
            F.expr("1000000 div coalesce(__csz, 1)").cast("long"),
        )
        .drop("__csz")
    )


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


def mixture_of_denoisers(
    df: DataFrame,
    id_col: str,
    text_col: str,
    salt: str = "",
    r_denoiser: tuple[float, int] = (0.15, 3),
    x_denoiser: tuple[float, int] = (0.5, 8),
    weights: tuple[float, float, float] = (0.5, 0.25, 0.25),
    sentinel_prefix: str = "<extra_id_",
    sentinel_suffix: str = ">",
    input_col: str = "text_input",
    target_col: str = "text_target",
) -> DataFrame:
    """UL2 mixture-of-denoisers (Tay et al. 2022, "UL2: Unifying
    Language Learning Paradigms"): every document routes to ONE of
    the three published objectives — R (regular span corruption,
    T5's point), X (extreme denoising: higher rate and/or longer
    spans), or S (sequential / prefix-LM denoising: the document
    splits at one point and the whole suffix is the target) — so a
    single preprocessing pass emits the mixed training objective.

    Deterministic throughout (the engine's doctrine): the route is a
    16-bit md5 bucket over ``(salt+"route", id)`` cut at the
    cumulative ``weights``; R/X mask units exactly like
    :func:`span_corruption_transform` (independent unit streams via
    the shared ``salt+"u"`` key — span_len differs, so unit keys
    differ); S's split point is a 32-bit bucket mod (L+1) (the FIM
    long-doc convention). All three routes share ONE maximal-run
    serializer, so the output schema is uniform: ``(denoiser,
    n_spans, corrupted_tokens, input_col, target_col)`` with the S
    route appearing as the single suffix span (an S doc whose split
    lands at L masks nothing and serializes as the K=0 case — the
    same convention as an R doc with no masked unit).

    Scale shape: ONE scan-stage pass — the routed predicate chooses
    per position inside the same selection filter, so no branch
    computes a transform the row doesn't take; zero shuffles, zero
    joins, like the single-objective transforms.
    """
    if len(weights) != 3 or any(w < 0 for w in weights) or sum(weights) <= 0:
        raise ValueError(f"weights must be 3 non-negatives, got {weights}")
    for name, (rate, span_len) in (("r", r_denoiser), ("x", x_denoiser)):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"{name} rate must be in [0,1], got {rate}")
        if span_len < 1:
            raise ValueError(
                f"{name} span_len must be >= 1, got {span_len}"
            )
    from nsl_kdd_spark.functions.text import tokens
    from nsl_kdd_spark.operators.relational import (
        md5_bucket16,
        md5_bucket32,
    )

    total = float(sum(weights))
    cut_r = int(weights[0] / total * 65536)
    cut_rx = int((weights[0] + weights[1]) / total * 65536)
    cut_rate_r = int(r_denoiser[0] * 65536)
    cut_rate_x = int(x_denoiser[0] * 65536)
    tk = tokens(text_col)
    route_b = md5_bucket16(id_col, salt + "route")
    route = (
        F.when(route_b < F.lit(cut_r), "R")
        .when(route_b < F.lit(cut_rx), "X")
        .otherwise("S")
    )
    # S split point: 32-bit mod (L+1), reachable past 65,536 tokens
    s_cut = (
        md5_bucket32(id_col, salt + "s")
        % (F.size(F.col("__tk")) + F.lit(1)).cast("long")
    ).cast("int")

    def unit_key(pos: Column, span_len: int) -> Column:
        u = ((pos - 1) / F.lit(span_len)).cast("int")
        return F.concat(
            F.col(id_col).cast("string"), F.lit("-"), u.cast("string")
        )

    def pred(p: Column) -> Column:
        r = F.col("__route")
        return (
            F.when(r == "S", p > F.col("__scut"))
            .when(
                r == "R",
                md5_bucket16(unit_key(p, r_denoiser[1]), salt + "u")
                < F.lit(cut_rate_r),
            )
            .otherwise(
                md5_bucket16(unit_key(p, x_denoiser[1]), salt + "u")
                < F.lit(cut_rate_x)
            )
        )

    out = _serialize_masked_runs(
        df.withColumn("__route", route)
        .withColumn("__tk", tk)
        .withColumn("__scut", s_cut)
        .drop("__tk"),
        tk,
        pred,
        sentinel_prefix,
        sentinel_suffix,
        input_col,
        target_col,
    )
    return (
        out.withColumn("denoiser", F.col("__route"))
        .drop("__route", "__scut")
    )

"""fastText-style linear text classifier — INFERENCE (round-10
growth item, r9 verdict task 5).

The standard public shape for pretrain-corpus quality filtering
(Joulin et al. 2016, "Bag of Tricks for Efficient Text
Classification"; the CCNet / LLaMA / GPT-3 pipelines all gate
documents with a linear fastText classifier): hashed bag of word
n-grams -> per-class weight lookup -> pooled dot product + bias ->
argmax (or a threshold on the top-class margin). Training is out of
scope — weights arrive as a table (exported from any fastText
training run, quantized to fixed-point micro-units); this module
makes INFERENCE a pure Spark plan so the filter runs inline in a
100 TB curation pipeline instead of shipping every document through
a Python process.

Complements the engine's other quality tiers: heuristic rule scores
(functions/quality.py), LM perplexity (ml/text_features.py) — this
is the learned-classifier leg of the usual three-legged quality
gate.

Fixed-point contract (the q123 convention, division-free here):
fastText scores a document as ``bias_c + mean(w_c[bucket(g)])`` over
its grams. For every document the gram count ``n`` is constant
across classes, so ``argmax_c (bias_c + sum_w/n) == argmax_c
(n * bias_c + sum_w)`` — and the latter needs NO division at all.
We therefore report ``margin_u = n * bias_u + sum(w_u)`` (micro-unit
weights, n-scaled): bit-identical in any engine, argmax- and
threshold-order-identical per document to the float mean form.

Spark shape (100 TB):
- gram generation + 16-bit md5 bucketing happen in the scan-stage
  projection (the winnowing pattern: materialize the gram array as
  a column, then posexplode);
- the weight table is BROADCAST (dense float32->micro-unit weights
  for 65,536 buckets x k classes are a few MB — fastText.zip's
  hashing trick exists precisely so the model stays this small) and
  joined bucket->rows with no exchange below the join;
- ONE map-side-combined groupBy((id, label)) sums the contributions
  — the single big-table shuffle in the plan;
- biases attach via a broadcast cross join against the per-doc gram
  counts (k rows per doc, the repo's broadcast-tiny cross pattern),
  so sparse weight tables and gram-less documents still score every
  class;
- the argmax is a per-document window over k rows (bounded, never
  hot), ties broken on the label string.

Reference parity: the reference notebook (README.md) has no text
classifier; this extends the curation surface alongside the quality
heuristics per the BASELINE.md north-star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.text import tokens
from nsl_kdd_spark.operators.relational import md5_bucket16


def word_ngram_array(tk: Column, word_ngrams: int = 2) -> Column:
    """Array of space-joined word n-grams for n = 1..``word_ngrams``
    over a token-array column — fastText's ``-wordNgrams`` feature
    set (unigrams always included). Empty array when the doc has no
    tokens; n-grams longer than the doc contribute nothing."""
    # closure factory, NOT a default-arg lambda: F.transform counts
    # the callable's parameters (defaults included) to pick the
    # (element) vs (element, index) calling convention, so a
    # `lambda i, n=n:` silently becomes positional and breaks
    def gram_at(n: int):
        return lambda i: F.concat_ws(" ", F.slice(tk, i, n))

    parts = []
    for n in range(1, word_ngrams + 1):
        if n == 1:
            parts.append(tk)
            continue
        parts.append(
            F.when(
                F.size(tk) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                    gram_at(n),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def ngram_count_expr(text_col: str, word_ngrams: int) -> Column:
    """Total 1..n-gram count as arithmetic over the token count —
    ``Σ_j max(L - (j-1), 0)`` — instead of building the gram array a
    second time just to size it. ONE definition (round-11 review):
    linear_text_scores and dsir's fused margin both multiply this by
    the bias, so a drift here would silently unbalance scores."""
    L = F.size(tokens(text_col))
    n_grams = L
    for j in range(2, word_ngrams + 1):
        n_grams = n_grams + F.greatest(L - (j - 1), F.lit(0))
    return n_grams


def linear_text_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    biases: DataFrame,
    word_ngrams: int = 2,
    n_buckets: int = 65536,
) -> DataFrame:
    """Per-(document, class) fixed-point margins: ``(id_col, label,
    margin_u)`` with ``margin_u = n_grams * bias_u + sum over grams
    of w_u[bucket(gram), label]`` (see the module docstring for why
    this division-free form is argmax-identical to fastText's
    mean-pooled score).

    ``weights``: (bucket int, label string, w_u long) — sparse is
    fine, missing (bucket, label) pairs contribute 0. ``biases``:
    (label string, bias_u long) — defines the class set; every
    document scores every class listed here, gram-less documents
    score ``0``. Buckets are the engine's shared 16-bit md5 layout
    (relational.md5_bucket16) mod ``n_buckets``.
    """
    if word_ngrams < 1:
        raise ValueError(f"word_ngrams must be >= 1, got {word_ngrams}")
    if not 1 <= n_buckets <= 65536:
        raise ValueError(
            f"n_buckets must be in [1, 65536], got {n_buckets}"
        )
    grams = (
        df.select(F.col(id_col), tokens(text_col).alias("__tk"))
        .withColumn("__gr", word_ngram_array(F.col("__tk"), word_ngrams))
        .select(F.col(id_col), F.explode("__gr").alias("__g"))
        .withColumn(
            "bucket",
            (md5_bucket16(F.col("__g")) % F.lit(n_buckets)).cast("int"),
        )
    )
    sums = (
        grams.join(F.broadcast(weights), on="bucket")
        .groupBy(id_col, "label")
        .agg(F.sum("w_u").alias("__sw"))
    )
    # gram count computed arithmetically from the token count
    # (round-10 review; the q157 oracle's `nn` CTE uses the same
    # identity) — shared with dsir's fused margin via ngram_count_expr
    n_grams = ngram_count_expr(text_col, word_ngrams)
    base = (
        df.select(F.col(id_col), n_grams.alias("__n"))
        .crossJoin(F.broadcast(biases))  # k rows per doc: class frame
    )
    return (
        base.join(sums, on=[id_col, "label"], how="left")
        .select(
            F.col(id_col),
            "label",
            (
                F.col("__n").cast("long") * F.col("bias_u")
                + F.coalesce("__sw", F.lit(0))
            ).alias("margin_u"),
        )
    )


def classify_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    biases: DataFrame,
    word_ngrams: int = 2,
    n_buckets: int = 65536,
) -> DataFrame:
    """Top-class prediction per document: ``(id_col, label,
    margin_u)`` — the argmax over :func:`linear_text_scores`, ties
    broken on the lexicographically smallest label (engine-portable
    total order). The quality-gate usage is a filter on this result:
    ``classify_text(...).filter((col('label') == 'keep') &
    (col('margin_u') >= tau_u))``."""
    if word_ngrams < 1:
        raise ValueError(f"word_ngrams must be >= 1, got {word_ngrams}")
    if not 1 <= n_buckets <= 65536:
        raise ValueError(
            f"n_buckets must be in [1, 2^16], got {n_buckets}"
        )
    # Optimization r13: the argmax no longer rides a per-(doc, class)
    # row frame + rank window (plan: (id,label)-keyed SortMergeJoin +
    # 2 window sorts). The class set is k-bounded by contract (biases
    # DEFINES it), so collect it once — the knn_ivf centroid
    # precedent — and compute all k per-class sums as conditional
    # counters in ONE per-document aggregate; the argmax then folds
    # into the projection. The weight lookup stays the UNTOUCHED
    # broadcast of the caller's weights table (a first attempt
    # pivoted weights to one row per bucket, which cost a per-call
    # model-table shuffle + broadcast rebuild and measured SLOWER at
    # the bench fixture). Values, tie-breaks (smallest label) and
    # NULL-text behavior (NULL margin, smallest label) are pinned
    # identical to the scores+window form by tests/test_linear_text.py.
    brows = sorted(
        (r["label"], int(r["bias_u"])) for r in biases.collect()
    )
    if not brows:
        # empty class frame -> empty result, same schema as before
        return df.select(
            F.col(id_col),
            F.lit(None).cast("string").alias("label"),
            F.lit(None).cast("long").alias("margin_u"),
        ).filter(F.lit(False))
    labels = [l for l, _ in brows]
    grams = (
        df.select(F.col(id_col), tokens(text_col).alias("__tk"))
        .withColumn("__gr", word_ngram_array(F.col("__tk"), word_ngrams))
        .select(F.col(id_col), F.explode("__gr").alias("__g"))
        .withColumn(
            "bucket",
            (md5_bucket16(F.col("__g")) % F.lit(n_buckets)).cast("int"),
        )
    )
    # inner broadcast join exactly as linear_text_scores: a gram whose
    # (bucket, label) cell is absent from the sparse weights simply
    # feeds no row into that label's conditional sum -> contributes 0
    sums = (
        grams.join(F.broadcast(weights), on="bucket")
        .groupBy(id_col)
        .agg(*[
            F.sum(
                F.when(F.col("label") == lbl, F.col("w_u"))
            ).alias(f"__sw{i}")
            for i, lbl in enumerate(labels)
        ])
    )
    scored = df.select(
        F.col(id_col), ngram_count_expr(text_col, word_ngrams).alias("__n")
    ).join(sums, on=id_col, how="left")

    def margin(i: int) -> Column:
        return (
            F.col("__n").cast("long") * F.lit(brows[i][1])
            + F.coalesce(F.col(f"__sw{i}"), F.lit(0))
        )

    # strict-greater replace over the ascending-sorted label list ==
    # (margin desc, label asc) rank 1; all-NULL margins (NULL text)
    # keep the first (smallest) label with a NULL margin, matching
    # desc_nulls_last + label-asc ordering
    best = F.struct(
        margin(0).alias("m"), F.lit(labels[0]).alias("l")
    )
    for i in range(1, len(labels)):
        best = F.when(
            margin(i) > best["m"],
            F.struct(margin(i).alias("m"), F.lit(labels[i]).alias("l")),
        ).otherwise(best)
    return scored.select(
        F.col(id_col),
        best["l"].alias("label"),
        best["m"].alias("margin_u"),
    )


def demo_weights(
    spark,
    labels: tuple[str, ...],
    n_buckets: int = 65536,
    seed: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic dense fixture model ``(weights, biases)`` for
    tests/benchmarks/oracles — a stand-in for a real exported
    fastText model, with the same shapes and dtypes. Pure integer
    LCG-style arithmetic (BIGINT-safe, no overflow at 16-bit buckets)
    so a SQL engine regenerates it bit-identically:

      w_u(bucket, i) = (bucket*1103515245 + i*2654435761 + seed*97
                        + 12345) % 2001 - 1000
      bias_u(i)      = (i*997 + seed*31) % 401 - 200

    where ``i`` is the 0-based index into the sorted label list."""
    rows = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    wparts = []
    bparts = []
    for i, lbl in enumerate(sorted(labels)):
        wparts.append(
            rows.select(
                "bucket",
                F.lit(lbl).alias("label"),
                (
                    (
                        F.col("bucket").cast("long") * 1103515245
                        + F.lit(i * 2654435761 + seed * 97 + 12345)
                    )
                    % 2001
                    - 1000
                ).alias("w_u"),
            )
        )
        bparts.append((lbl, (i * 997 + seed * 31) % 401 - 200))
    weights = wparts[0]
    for p in wparts[1:]:
        weights = weights.unionByName(p)
    biases = spark.createDataFrame(
        bparts, "label string, bias_u long"
    )
    return weights, biases


def demo_weights_sql(
    labels: tuple[str, ...], n_buckets: int = 65536, seed: int = 0
) -> tuple[str, str]:
    """The DuckDB twins of :func:`demo_weights` as CTE bodies
    ``(weights_sql, biases_sql)`` — kept next to the generator so
    the two layouts can never drift."""
    wsel = []
    bsel = []
    for i, lbl in enumerate(sorted(labels)):
        wsel.append(
            f"SELECT CAST(b.n AS INTEGER) AS bucket, '{lbl}' AS label,"
            f" CAST((b.n * 1103515245 + {i * 2654435761 + seed * 97 + 12345})"
            f" % 2001 - 1000 AS BIGINT) AS w_u"
            f" FROM (SELECT unnest(generate_series(0, {n_buckets - 1}))"
            f" AS n) b"
        )
        bsel.append(
            f"SELECT '{lbl}' AS label,"
            f" CAST({(i * 997 + seed * 31) % 401 - 200} AS BIGINT)"
            f" AS bias_u"
        )
    return (
        " UNION ALL ".join(wsel),
        " UNION ALL ".join(bsel),
    )

"""pyspark.ml text-feature surface (SURVEY.md §2.13): tokenize ->
stopword-filter -> n-grams -> TF(-IDF) vectors, as thin seed-free
wrappers plus a TF-IDF cosine retrieval flow.

These complement ``functions/text.py``: the expression layer is for
scan-speed scoring/dedup; this layer produces ml Vectors for
downstream estimators (clustering documents, training classifiers on
text). CountVectorizer carries a real vocabulary (invertible);
HashingTF is the fixed-memory scale default.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    HashingTF,
    NGram,
    RegexTokenizer,
    StopWordsRemover,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.vector import cosine_prenorm, norm


def tfidf_pipeline(
    text_col: str = "text",
    n_features: int = 1 << 14,
    ngram: int | None = None,
    use_count_vectorizer: bool = False,
    min_df: float = 1.0,
) -> Pipeline:
    """Tokenizer -> StopWordsRemover -> [NGram] -> TF -> IDF."""
    stages = [
        RegexTokenizer(inputCol=text_col, outputCol="__tokens", pattern="\\s+"),
        StopWordsRemover(inputCol="__tokens", outputCol="__filtered"),
    ]
    feat_in = "__filtered"
    if ngram is not None:
        stages.append(NGram(n=ngram, inputCol="__filtered", outputCol="__ngrams"))
        feat_in = "__ngrams"
    if use_count_vectorizer:
        stages.append(
            CountVectorizer(inputCol=feat_in, outputCol="__tf", minDF=min_df)
        )
    else:
        stages.append(
            HashingTF(inputCol=feat_in, outputCol="__tf", numFeatures=n_features)
        )
    stages.append(IDF(inputCol="__tf", outputCol="tfidf"))
    return Pipeline(stages=stages)


def fit_tfidf(df: DataFrame, **kwargs) -> PipelineModel:
    return tfidf_pipeline(**kwargs).fit(df)


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_pattern: str = "[^a-z0-9]+",
    round_to: int = 6,
) -> DataFrame:
    """Exact relational TF-IDF (the oracle-able sibling of the hashed
    MLlib pipeline above): top-k terms per document by
    ``tf * ln((N+1)/(df+1))``, ties broken by token.

    Scale shape: one scan + one shuffle on (doc, token) builds TF,
    which is persisted so the document-frequency pass reads it instead
    of rescanning the corpus (Spark does not reuse the exchange across
    the two consumers — verified on the executed plan). DF aggregates
    map-side per partition, so hot tokens ("the" in every doc) cannot
    skew it — the reason a `count over Window(token)` variant is wrong
    at scale. The vocabulary and one-row corpus count broadcast back,
    so the big TF table never shuffles again. Score is rounded before
    ranking so ordering is stable across engines.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), token_pattern)).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf_count")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_count"))
    n = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "token",
            "tf_count",
            "df_count",
            F.round(
                F.col("tf_count")
                * F.log((F.col("__n") + 1.0) / (F.col("df_count") + 1.0)),
                round_to,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .orderBy(id_col, "rnk")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    scale: int = 1_000_000,
    token_pattern: str = "[^a-z0-9]+",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query
    terms — the ranking function behind classic search retrieval and a
    standard corpus-vs-query relevance filter for pretraining data.

    Output: (id, n_terms, bm25_u) for documents matching >=1 term,
    where ``bm25_u`` is the BM25 score in integer micro-units:
    per-(doc, term) partial scores are quantized to micro-units BEFORE
    the per-doc sum, so the aggregate is an integer sum —
    order-independent and bit-identical across engines (the q95
    fixed-point pattern). Per-term formula (idf per Robertson/Sparck
    Jones, +1 so it stays positive):

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(d, t) = idf(t) * tf * (k1 + 1)
                  / (tf + k1 * (1 - b + b * dl / avgdl))

    Scale shape (100 TB): one token explode feeds two grouped counts
    (per-doc length, per-doc-term tf — both map-side combined); the
    df table is query-sized and the corpus stats are one row, so both
    broadcast back onto the tf table. The corpus never shuffles on
    anything but (doc, token); no windows, no driver collect.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), token_pattern)).alias("token"),
    ).filter(F.col("token") != "")
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("token").isin(list(query_terms)))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("dl").alias("__total")
    )
    # written as the exact expression tree the oracle SQL states, so
    # the double math is IEEE-identical before quantization
    idf = F.log(
        1.0
        + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    avgdl = F.col("__total").cast("double") / F.col("__n").cast("double")
    denom = F.col("tf") + F.lit(k1) * (
        1.0 - F.lit(b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    term_score = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "token",
            F.round(term_score * F.lit(float(scale))).cast("long").alias("__su"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("__su").alias("bm25_u"),
        )
    )


def tfidf_similarity(
    model: PipelineModel,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF cosine retrieval: transform both sides, broadcast
    the query vectors, per-query top-k — same plan shape as
    ``similarity.knn_bruteforce`` (corpus never shuffles)."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import Window

    # norms hoisted below the join (optimization r13): TF-IDF vectors
    # are vocab-width, so the per-pair norm folds dominated scoring —
    # one fold per document/query now; cosine_prenorm is bit-identical
    c = model.transform(corpus).select(
        F.col(id_col), vector_to_array("tfidf").alias("__cv")
    ).withColumn("__cn", norm(F.col("__cv")))
    q = model.transform(queries).select(
        F.col(id_col).alias("query_id"), vector_to_array("tfidf").alias("__qv")
    ).withColumn("__qn", norm(F.col("__qv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", id_col,
            cosine_prenorm(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def build_vocab(
    df: DataFrame, text_col: str, size: int, min_freq: int = 1
) -> DataFrame:
    """Top-``size`` token vocabulary by (freq DESC, token ASC):
    (token, token_id 0..size-1, freq). The frequency agg and the top-k
    selection are fully distributed (orderBy+limit = TakeOrdered, no
    global window); the RANK assignment runs a single-partition window
    only over the already-LIMITED result — bounded by ``size`` by
    construction, so the one-task stage holds a vocabulary, never a
    corpus."""
    from pyspark.sql import Window

    from nsl_kdd_spark.functions.text import tokens

    freq = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(size)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return freq.withColumn("token_id", (F.row_number().over(w) - 1).cast("long"))


def encode_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    unk_id: int = -1,
) -> DataFrame:
    """Text -> token-id arrays via the vocabulary: (id, token_ids,
    n_tokens, n_unk). The tokenizer step of a training-data pipeline:
    posexplode keeps positions, the vocab joins BROADCAST (it is
    size-bounded), and the array reassembles in position order inside
    one grouped agg — corpus shuffles once, keyed by doc id."""
    from nsl_kdd_spark.functions.text import tokens

    pos = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("__pos", "token")
    )
    joined = pos.join(
        F.broadcast(vocab.select("token", "token_id")), on="token", how="left"
    ).withColumn("__tid", F.coalesce(F.col("token_id"), F.lit(unk_id)))
    return (
        joined.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__tid"))),
                lambda s: s["__tid"],
            ).alias("token_ids"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("__tid") == unk_id).cast("long")).alias("n_unk"),
        )
    )


def ngram_topk(
    df: DataFrame, text_col: str, n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-wide heavy hitters: the ``k`` most frequent word
    n-grams, ties broken lexicographically so the cut at rank k is
    deterministic. Output: (gram, freq).

    Scale shape (100 TB): explode -> hash-partial count (map-side
    combine collapses each executor's repeats before the shuffle) ->
    TakeOrderedAndProject for the global top-k — no global sort, no
    window. The shuffle volume is the DISTINCT n-gram count, not the
    corpus token count. When even that is too wide (n >= 5 on web
    text), cap the key space first with a frequency floor
    (``HAVING count >= f``) or a count-min-sketch pre-pass; the exact
    tier here is the oracle-checkable ground truth.
    """
    from nsl_kdd_spark.functions.text import word_ngrams

    return (
        df.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("gram"))
        .limit(k)
    )


def ngram_diversity_report(
    df: DataFrame, text_col: str, ns: tuple[int, ...] = (1, 2, 3)
) -> DataFrame:
    """Corpus n-gram diversity report — the distinct-n measure of Li
    et al. 2016 ("A Diversity-Promoting Objective Function for Neural
    Conversation Models": distinct-1/distinct-2 = distinct n-grams
    over total n-grams) plus the hapax share (n-grams occurring
    exactly once — the classic lexical-richness statistic), per gram
    order. The corpus-level observability twin of the per-document
    Gopher repetition rules (``operators/repetition.py``): a
    synthetic-data or dedup pipeline watches these numbers to detect
    mode collapse / template flooding BEFORE training.

    Output: one row per n in ``ns`` — ``(n, total_grams,
    distinct_grams, singleton_grams, distinct_ppm, singleton_ppm)``
    with the ppm ratios integer-exact (``1e6 * x div total``, the
    q100 convention — no float division to diverge between engines).

    Scale shape (100 TB): per gram order, explode -> ONE map-side
    combined groupBy(gram) count -> a single-row aggregate; the
    shuffle volume is the distinct-gram count, never the token
    count, and the report is len(ns) rows. The same frequency-floor
    / sketch escape hatches as ``ngram_topk`` apply when the n >= 5
    key space gets too wide.
    """
    if not ns:
        raise ValueError("ns must name at least one gram order")
    if any(n < 1 for n in ns):
        raise ValueError(f"gram orders must be >= 1, got {ns}")
    from nsl_kdd_spark.functions.text import word_ngrams

    parts = []
    for n in ns:
        counts = (
            df.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        parts.append(
            counts.agg(
                F.coalesce(F.sum("c"), F.lit(0).cast("long")).alias(
                    "total_grams"
                ),
                F.count(F.lit(1)).alias("distinct_grams"),
                F.count_if(F.col("c") == 1).alias("singleton_grams"),
            ).select(F.lit(n).cast("int").alias("n"), "*")
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    # DECIMAL(38,0) for the 1e6-scaled step: past ~9.2e12 grams (the
    # 100 TB design point) 1e6 * count wraps BIGINT silently in Spark
    # while DuckDB raises — the datacard_report precedent (review
    # r11); the quotient is <= 1e6, so the cast back is always safe
    ppm = lambda c: F.when(  # noqa: E731
        F.col("total_grams") > 0,
        F.expr(
            f"CAST((CAST(1000000 AS DECIMAL(38,0)) * {c})"
            f" div total_grams AS BIGINT)"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return (
        rep.withColumn("distinct_ppm", ppm("distinct_grams"))
        .withColumn("singleton_ppm", ppm("singleton_grams"))
        .orderBy("n")
    )


def tokenizer_fertility_report(
    df: DataFrame,
    group_col: str,
    text_col: str,
    token_count_col: str | None = None,
) -> DataFrame:
    """Tokenizer fertility per group (Rust et al. 2021, "How Good is
    Your Tokenizer?" — fertility = subword tokens per word, THE
    multilingual tokenizer-equity metric: a language whose fertility
    runs high pays more compute per word and fits less context). Per
    ``group_col`` (typically language): document/word/token/char
    totals plus integer-ppm ``fertility_ppm`` (tokens per word) and
    ``chars_per_token_ppm`` (compression) — the q100 fixed-point
    convention, no float division.

    Token counts default to the BPE-ish regex tier
    (``regex_token_count``: letter runs + digit runs — the
    oracle-replayable proxy); pass ``token_count_col`` (e.g. the
    length of a ``bpe_encode`` output) to measure a REAL trained
    tokenizer — same report, rows-only correctness tier (the q132
    class).

    Scale shape: per-doc counts are scan-stage expressions; ONE
    map-side-combined groupBy emits a group-count-sized report. No
    window, no join, no Python.
    """
    from nsl_kdd_spark.functions.text import (
        regex_token_count,
        token_count,
    )

    toks = (
        F.col(token_count_col)
        if token_count_col
        else regex_token_count(text_col)
    )
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col).cast("long")).alias("n_words"),
        F.sum(toks.cast("long")).alias("n_tokens"),
        F.sum(F.length(text_col).cast("long")).alias("n_chars"),
    )
    # DECIMAL(38,0): 1e6 * n_tokens wraps BIGINT past ~9.2e12 tokens
    # — exactly the corpus size the docstring advertises (review r11;
    # the datacard_report precedent); quotients are small
    div_ppm = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0,
        F.expr(
            f"CAST((CAST(1000000 AS DECIMAL(38,0)) * {num})"
            f" div {den} AS BIGINT)"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return (
        agg.withColumn("fertility_ppm", div_ppm("n_tokens", "n_words"))
        .withColumn(
            "chars_per_token_ppm", div_ppm("n_chars", "n_tokens")
        )
        .orderBy(group_col)
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str, scale: int = 1_000_000
) -> DataFrame:
    """Unigram language-model quality score: per-document average
    negative log-likelihood under the CORPUS's own unigram
    distribution — the cheap KenLM-perplexity stand-in used to rank
    pretraining documents (high avg NLL = rare-token-heavy / noisy).

    Output: (id, n_tokens, nll_mnats, avg_nll) where ``nll_mnats`` is
    the total NLL in micro-nats. Per-token log-probs are quantized to
    integer micro-nats BEFORE aggregation, so the document sum is an
    integer sum — order-independent, bit-identical across engines,
    partitionings and retries (the fixed-point twin of the decimal
    ``exact_*`` tier; a float sum of logs would differ at 1e-16 by
    accumulation order). Quantization error is bounded by
    0.5e-6 nat/token.

    Scale shape (100 TB): token explode -> one grouped count for the
    distribution (map-side combine), one scalar total, one equi-join
    tokens->log-probs (vocab-sized right side: broadcast when it fits,
    shuffle join + AQE otherwise), one grouped doc sum. No windows, no
    collect of anything row-scaled.
    """
    from nsl_kdd_spark.functions.text import tokens

    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    # freq is vocab-sized: materialize it (eager localCheckpoint, so
    # blocks release when the caller drops the result — persist would
    # pin a cache entry per call with no safe unpersist site) and the
    # total, log-prob table, and join probe all reuse ONE corpus
    # aggregation (the corpus-sized `tok` stays unmaterialized by
    # design — two scans beat caching 100 TB)
    freq = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("__f"))
        # lazy (optimization r13): the scalar collect right below is
        # the first consumer, so the blocks build inside it instead
        # of a separate construction-time job
        .localCheckpoint(eager=False)
    )
    total = freq.agg(F.sum("__f")).collect()[0][0] or 1  # scalar; 1 on empty
    lp = freq.select(
        "token",
        F.round(
            F.log(F.col("__f").cast("double") / F.lit(float(total)))
            * F.lit(float(scale))
        )
        .cast("long")
        .alias("__iln"),
    )
    return (
        tok.join(lp, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum("__iln")).alias("nll_mnats"),
            (
                (-F.sum("__iln")).cast("double")
                / F.lit(float(scale))
                / F.count(F.lit(1))
            ).alias("avg_nll"),
        )
    )


def bigram_logprob(
    df: DataFrame, id_col: str, text_col: str, scale: int = 1_000_000
) -> DataFrame:
    """Bigram-conditional LM quality score: per-document average
    negative log of P(w_i | w_{i-1}) = count(w_{i-1} w_i) /
    count_as_prefix(w_{i-1}), estimated from the corpus itself — one
    modeling step up from ``unigram_logprob`` (it scores token ORDER,
    so shuffled or template-stitched text ranks as improbable even
    when its token frequencies look natural). The first token of each
    document has no predecessor and is skipped; documents with < 2
    tokens emit n_bigrams = 0 and a NULL avg_nll.

    The same fixed-point contract as the unigram tier: per-bigram
    log-probs quantize to integer micro-nats BEFORE the sum, so the
    aggregate is order-independent and bit-identical across engines.
    The denominator counts w_{i-1} AS A PREFIX (i.e. bigram
    occurrences grouped by first token), so probabilities are properly
    normalized: sum_w P(w | prev) = 1.

    Scale shape (100 TB): one explode to bigram pairs, one grouped
    count for the bigram table, one derived prefix count (second
    grouped agg over the bigram table — vocab^2-bounded, not corpus-
    bounded), one join back, one grouped doc sum. The bigram table is
    materialized once (eager localCheckpoint, ContextCleaner-released)
    and feeds both the probability table and nothing else corpus-sized.
    """
    from nsl_kdd_spark.functions.text import word_ngrams

    pairs = df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, 2)).alias("bigram")
    )
    bfreq = (
        pairs.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("__bf"))
        # lazy (optimization r13): blocks build inside the first
        # consuming job (the prefix-count aggregate) instead of a
        # construction-time materialization job
        .localCheckpoint(eager=False)
    )
    prefix = F.substring_index(F.col("bigram"), " ", 1)
    pfreq = bfreq.groupBy(prefix.alias("__p")).agg(
        F.sum("__bf").alias("__pf")
    )
    lp = (
        bfreq.join(pfreq, on=prefix == F.col("__p"))
        .select(
            "bigram",
            F.round(
                F.log(
                    F.col("__bf").cast("double") / F.col("__pf").cast("double")
                )
                * F.lit(float(scale))
            )
            .cast("long")
            .alias("__iln"),
        )
    )
    scored = (
        pairs.join(lp, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.sum("__iln")).alias("nll_mnats"),
            (
                (-F.sum("__iln")).cast("double")
                / F.lit(float(scale))
                / F.count(F.lit(1))
            ).alias("avg_nll"),
        )
    )
    # docs with < 2 tokens produce no pairs — join them back so the
    # output covers every input id (n_bigrams 0, NULL scores)
    return (
        df.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0)))
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
    max_postings: int | None = None,
    token_pattern: str = "[^a-z0-9]+",
) -> DataFrame:
    """Build an inverted index: one row per term with its document
    frequency, total term frequency, and the sorted posting list of
    document ids — the retrieval-side structure BM25/TF-IDF queries
    probe, and the exact-dedup primitive for "which docs contain this
    shingle".

    Output: (token, df_count, cf_count, postings) with ``postings`` a
    sorted array<id>. ``min_df``/``max_df`` drop rare/stopword terms
    (the vocabulary-pruning knob); ``max_postings`` truncates each
    list to the first k doc ids AFTER sorting — a documented cap, not
    a silent one, for hot terms whose full posting list would blow a
    single row at corpus scale.

    Scale shape: one (doc, token) grouped count (map-side combined),
    then one token-keyed aggregation building the list. Posting lists
    for planet-scale hot terms should instead stay EXPLODED (keep the
    (token, doc) table bucketed by token) — this materialized-array
    form is for vocabulary-bounded indexes; the cap keeps the row
    bounded either way.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), token_pattern)).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))
    idx = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df_count"),
        F.sum("tf").alias("cf_count"),
        F.sort_array(F.collect_list(F.col(id_col))).alias("postings"),
    )
    if max_df is not None:
        idx = idx.filter(F.col("df_count") <= max_df)
    idx = idx.filter(F.col("df_count") >= min_df)
    if max_postings is not None:
        idx = idx.withColumn("postings", F.slice("postings", 1, max_postings))
    return idx.orderBy("token")


def _bpe_merge_fold(syms, left: str, right: str, merged: str):
    """Greedy leftmost non-overlapping merge of one (left, right)
    pair over a symbol array, as a pure fold: append x unless
    (last == left and x == right and the last element was not itself
    produced by a merge this round) — tracked by folding
    (symbols, flags) in lockstep. Chains: pass the previous fold's
    Column as ``syms`` to apply several merges in rank order within
    ONE projection."""
    lit_l, lit_r, lit_m = F.lit(left), F.lit(right), F.lit(merged)
    return F.aggregate(
        syms,
        F.struct(
            F.lit([]).cast("array<string>").alias("res"),
            F.lit(False).alias("last_merged"),
        ),
        lambda acc, x: F.when(
            # try_element_at: the size>0 conjunct does NOT protect
            # element_at(-1) under ANSI mode — the optimizer may
            # reorder conjuncts, and And() evaluates both sides
            (F.size(acc.res) > 0)
            & ~acc.last_merged
            & (F.try_element_at(acc.res, F.lit(-1)) == lit_l)
            & (x == lit_r),
            F.struct(
                F.concat(
                    F.slice(acc.res, 1, F.size(acc.res) - 1),
                    F.array(lit_m),
                ).alias("res"),
                F.lit(True).alias("last_merged"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc.res, F.array(x)).alias("res"),
                F.lit(False).alias("last_merged"),
            )
        ),
        lambda acc: acc.res,
    )


def _select_batch(
    top: list[tuple[str, str, int]],
    take: int,
    min_pair_freq: int,
    truncated_prefix: bool,
) -> list[tuple[str, str, int]]:
    """The batch admission rule, as a pure function of the sorted
    (freq desc, l, r) pair-table prefix — shared by the Spark trainer
    and the hypothesis property test that adversarially checks the
    batched == serial guarantee against the pure-Python reference.

    Admits a CONTIGUOUS prefix of candidates (``top[:take]``) such
    that each one is symbol-disjoint from every earlier admitted pair
    and its frequency STRICTLY exceeds every earlier pair's new-pair
    cap; truncates at the first violation. ``truncated_prefix`` says
    whether ``top`` is a cut of a larger table, in which case any
    unseen pair's frequency is bounded by the last row's."""
    selected = [top[0]]
    if take <= 1 or len(top) <= 1:
        return selected
    bound = top[-1][2] if truncated_prefix else 0
    end_max: dict[str, int] = {}
    start_max: dict[str, int] = {}
    for left, right, freq in top:
        end_max[right] = max(end_max.get(right, 0), freq)
        start_max[left] = max(start_max.get(left, 0), freq)

    def cap_of(left: str, right: str) -> int:
        # merging (left, right) can only create pairs whose frequency
        # is bounded by the max pre-merge freq of pairs ENDING in
        # `left` / STARTING in `right`
        return max(end_max.get(left, 0), start_max.get(right, 0), bound)

    used: set[str] = {top[0][0], top[0][1], top[0][0] + top[0][1]}
    cap = cap_of(top[0][0], top[0][1])
    for left, right, freq in top[1:take]:
        if freq < min_pair_freq:
            break                          # serial would stop here
        merged_c = left + right
        if (
            left in used
            or right in used
            or merged_c in used
            or freq <= cap                 # a batch-born pair could
        ):                                 # outrank it serially
            break
        selected.append((left, right, freq))
        used.update((left, right, merged_c))
        cap = max(cap, cap_of(left, right))
    return selected


def train_bpe(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_merges: int = 16,
    min_pair_freq: int = 2,
    token_pattern: str = "[^a-z0-9]+",
    batch: int = 1,
    stats: dict | None = None,
    vocab_out: dict | None = None,
) -> DataFrame:
    """Learn a byte-pair-encoding merge table from the corpus — the
    TRAINING side of the tokenizer surface (``build_vocab`` /
    ``encode_tokens`` cover encoding with a fixed vocabulary).

    Classic word-level BPE: words start as character sequences; each
    round merges the globally most frequent adjacent symbol pair
    (ties broken lexicographically), greedy leftmost non-overlapping
    within a word. Returns (rank, left, right, merged, pair_freq),
    rank 0 first. Stops early when no pair reaches ``min_pair_freq``.

    Spark-first shape (the 100 TB property): everything after the
    first aggregation runs on the WORD VOCABULARY weighted by count —
    corpus-sized data is touched exactly once, by the word count.
    Each round is one explode+grouped-sum over the vocab (map-side
    combined) and one expression-only array rewrite (``F.aggregate``
    fold — greedy merge without leaving codegen); the collected rows
    per round are the argmax pairs (driver control flow, the
    sanctioned tiny collect). Vocab tables localCheckpoint per
    round to truncate lineage.

    ``batch`` is the production-training lever (SCALE.md): serial BPE
    costs one Spark job cycle per merge rank — fine at 16 ranks,
    prohibitive at 30k. ``batch=B`` applies up to B merges per count
    cycle while provably reproducing the SERIAL merge table, by
    admitting only a frequency-sorted PREFIX of candidates such that

    1. every candidate is symbol-disjoint from all earlier ones in
       the batch (merging one cannot change another's count, and the
       fold rewrites cannot conflate symbols), and
    2. every candidate's frequency STRICTLY exceeds every earlier
       candidate's new-pair cap — merging (a, b) can only create
       pairs (s, ab) / (ab, s) whose frequency is bounded by the
       max pre-merge frequency of pairs ending in ``a`` / starting
       in ``b``, both computable from the SAME pair table — so no
       pair born inside the batch could have outranked a later
       candidate in serial order.

    The batch truncates at the first violation (the remaining merges
    just land in the next cycle), so output == serial ALWAYS — the
    knob trades nothing but driver round-trips (~B fewer). Candidates
    AND caps come from ONE sorted collect per cycle (a ~256-row
    prefix of the pair table: rows past the candidates price the
    caps, and anything outside the prefix is bounded by the last
    row's frequency) — a batched cycle costs exactly the jobs a
    serial cycle does. Measured at sf0.1: 32 ranks in 20 cycles,
    ~2.3x faster wall-clock than serial.

    ``stats``: optional caller-owned dict; on return,
    ``stats["cycles"]`` holds the number of driver count-cycles the
    run took — the batching lever's observable (bench/tests read it).

    ``vocab_out`` (optimization r13): optional caller-owned dict; on
    return, ``vocab_out["vocab"]`` holds the final ``(word, syms)``
    vocabulary — every distinct corpus word already folded through
    the returned merge table, a free by-product of the training loop
    (the per-cycle rewrite ends exactly at the fully-merged state).
    :func:`bpe_encode` accepts it via its ``vocab`` parameter so a
    train-then-encode pipeline over the SAME corpus (q132's shape)
    skips re-deriving the vocabulary and re-applying every merge —
    the dsir fused-path precedent. Costs one extra string column
    through the per-cycle checkpoints when requested; default None
    keeps the training table narrow.

    Rows-only in the driver gate (no SQL twin for the iterative
    argmax); correctness is pinned against a pure-Python reference
    implementation in tests/test_text_features.py (batched == serial
    == reference).
    """
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    words = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), token_pattern)
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        # split-at-every-boundary leaves a trailing "" element
        # (Java split keeps trailing empties at limit -1) — drop it
        .select(
            *(["word"] if vocab_out is not None else []),
            F.filter(
                F.split("word", "(?!^)"), lambda x: x != ""
            ).alias("syms"),
            "wc",
        )
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    cycles = 0
    while len(merges) < num_merges:
        cycles += 1
        pairs = (
            words.select(
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.size("syms") - 1).alias("l"),
                        F.slice(
                            "syms", 2, F.size("syms") - 1
                        ).alias("r"),
                    )
                ).alias("p"),
                "wc",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("freq"))
        )
        take = min(batch, num_merges - len(merges))
        # one sorted collect per cycle, same as serial — but a DEEPER
        # prefix: the first `take` rows are the merge candidates, and
        # the rest of the prefix prices the new-pair caps. Any pair
        # OUTSIDE the collected prefix has freq <= the last collected
        # row's, so max(matching collected freqs, that boundary) is a
        # sound upper bound on max freq(., a) / freq(b, .) without a
        # second aggregation job.
        k_prefix = take if take == 1 else max(8 * take, 256)
        top = (
            pairs.orderBy(F.desc("freq"), "l", "r")
            .limit(k_prefix)
            .collect()
        )
        if not top or top[0].freq < min_pair_freq:
            break
        selected = _select_batch(
            [(r.l, r.r, r.freq) for r in top],
            take=take,
            min_pair_freq=min_pair_freq,
            truncated_prefix=len(top) == k_prefix,
        )
        # apply the selected merges in rank order inside ONE
        # projection: each fold consumes the previous fold's output,
        # exactly the serial rewrite sequence
        folded = F.col("syms")
        for left, right, _freq in selected:
            folded = _bpe_merge_fold(folded, left, right, left + right)
        words = words.select(
            *(["word"] if vocab_out is not None else []),
            folded.alias("syms"),
            "wc",
        ).localCheckpoint()
        for left, right, freq in selected:
            merges.append((len(merges), left, right, left + right, freq))
    spark = docs.sparkSession
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("rank", LongType()),
        StructField("left", StringType()),
        StructField("right", StringType()),
        StructField("merged", StringType()),
        StructField("pair_freq", LongType()),
    ])
    # observable round count: the batching lever's whole point is
    # fewer driver count-cycles — bench/tests read this to record the
    # win. Reported through the caller-owned ``stats`` out-param
    # (round-6 advisory: the previous function-attribute channel was
    # shared mutable state — raced across concurrent callers and
    # stale after a mid-loop raise).
    if stats is not None:
        stats["cycles"] = cycles
    if vocab_out is not None:
        vocab_out["vocab"] = words.select("word", "syms")
    return spark.createDataFrame(merges, schema)


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_pattern: str = "[^a-z0-9]+",
    method: str = "auto",
    checkpoint_every: int = 6,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Apply a trained BPE merge table (:func:`train_bpe`'s output)
    to a corpus — the ENCODING side of subword tokenization. Returns
    (id, bpe_tokens array<string>, n_pieces), pieces in word order
    with each word independently merged (greedy leftmost, merges in
    rank order — byte-identical to the training fold). Documents that
    tokenize to ZERO words (empty/whitespace-only text) are absent
    from the output — left-join against the source and coalesce to an
    empty array if every input id must appear.

    Scale shape (100 TB): BPE is computed once per DISTINCT word, not
    once per occurrence — the corpus is touched exactly twice (the
    tokenize scan and the word->pieces join); all merge applications
    run on the word vocabulary, which is Zipf-small relative to the
    corpus. The join back is broadcast-hinted (a word vocabulary in
    the tens of millions still broadcasts at ~100s of MB; beyond
    that AQE falls back to shuffle on the 8-byte word hash).

    ``method``:

    - ``"expr"``: each merge rank is the same expression-only
      ``F.aggregate`` fold used by training, chained on the vocab
      table with a ``localCheckpoint`` every ``checkpoint_every``
      ranks to bound expression depth (vocab-sized materialization,
      cheap). Whole-stage codegen end to end; right for the small
      merge tables the oracle tier uses.
    - ``"arrow"``: one ``mapInPandas`` pass over the vocab applying
      all merges per word in Python — the production path for real
      merge tables (30k+ ranks, where chaining 30k folds is not a
      plan). Corpus-side plumbing identical.
    - ``"auto"``: expr for <= 24 merges, arrow beyond.

    ``vocab`` (optimization r13): a precomputed, FULLY-MERGED
    ``(word, syms)`` vocabulary — :func:`train_bpe`'s ``vocab_out``
    by-product. When given, the distinct-word shuffle and the whole
    merge-fold chain (plus its per-``checkpoint_every``
    materializations) are skipped; the corpus goes straight to the
    broadcast word->pieces join. The caller owns the contract that
    ``vocab`` covers every word this corpus tokenizes to under the
    SAME ``token_pattern``/lowercasing (the train-then-encode
    pipeline over one corpus, q132's shape) — a missing word would
    silently drop its occurrences at the inner join, so pass it only
    for the same-corpus case it exists for.
    """
    wordpos = (
        docs.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.lower(F.col(text_col)), token_pattern)
            ).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
    )
    if vocab is None:
        rows = sorted(
            merges.select("rank", "left", "right").collect(),
            key=lambda r: r["rank"],
        )  # tiny by construction: the merge table IS the model
        vocab = wordpos.select("word").distinct().select(
            "word",
            F.filter(
                F.split("word", "(?!^)"), lambda x: x != ""
            ).alias("syms"),
        )
        vocab = apply_bpe_merges_to_vocab(
            vocab, rows, method=method, checkpoint_every=checkpoint_every
        )
    joined = wordpos.join(F.broadcast(vocab), "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "syms"))
                    ),
                    lambda s: s.syms,
                )
            ).alias("bpe_tokens")
        )
        .select(
            id_col,
            "bpe_tokens",
            F.size("bpe_tokens").alias("n_pieces"),
        )
    )


def apply_bpe_merges_to_vocab(
    vocab: DataFrame,
    rows: list,
    method: str = "auto",
    checkpoint_every: int = 6,
) -> DataFrame:
    """Apply a rank-sorted merge list to a ``(word, syms)`` vocabulary
    table — the shared merge-fold core of :func:`bpe_encode`, exposed
    so span-conversion (``sft.char_spans_to_bpe_token_spans``) applies
    the IDENTICAL greedy-leftmost fold to its field vocabulary.
    ``rows`` is the collected, rank-sorted merge table (each row with
    left/right); ``vocab`` carries ``word`` plus ``syms``
    (array<string>, the word's current symbol sequence). Returns the
    vocab with ``syms`` fully merged. See :func:`bpe_encode` for the
    expr/arrow method contract."""
    if method == "auto":
        method = "expr" if len(rows) <= 24 else "arrow"
    if method not in ("expr", "arrow"):
        raise ValueError(f"method must be expr|arrow|auto, got {method!r}")

    if method == "expr":
        since_ckpt = 0
        for i, r in enumerate(rows):
            lit_l, lit_r = F.lit(r["left"]), F.lit(r["right"])
            lit_m = F.lit(r["left"] + r["right"])
            folded = F.aggregate(
                "syms",
                F.struct(
                    F.lit([]).cast("array<string>").alias("res"),
                    F.lit(False).alias("last_merged"),
                ),
                lambda acc, x: F.when(
                    # try_element_at: ANSI-safe on the empty
                    # accumulator (see _bpe_merge_fold)
                    (F.size(acc.res) > 0)
                    & ~acc.last_merged
                    & (F.try_element_at(acc.res, F.lit(-1)) == lit_l)
                    & (x == lit_r),
                    F.struct(
                        F.concat(
                            F.slice(acc.res, 1, F.size(acc.res) - 1),
                            F.array(lit_m),
                        ).alias("res"),
                        F.lit(True).alias("last_merged"),
                    ),
                ).otherwise(
                    F.struct(
                        F.concat(acc.res, F.array(x)).alias("res"),
                        F.lit(False).alias("last_merged"),
                    )
                ),
                lambda acc: acc.res,
            )
            vocab = vocab.select("word", folded.alias("syms"))
            since_ckpt += 1
            # truncate only when MORE folds will chain on top: a
            # checkpoint landing on the final rank would materialize
            # the finished vocab once just so the consumer can read
            # the blocks back — one whole wasted vocab job
            # (optimization r13)
            if since_ckpt >= checkpoint_every and i + 1 < len(rows):
                vocab = vocab.localCheckpoint()
                since_ckpt = 0
    else:
        import pandas as pd

        merge_list = [(r["left"], r["right"]) for r in rows]

        def apply_merges(batches):
            for pdf in batches:
                out = []
                for syms in pdf["syms"]:
                    syms = list(syms)
                    for left, right in merge_list:
                        res: list[str] = []
                        i = 0
                        while i < len(syms):
                            if (
                                i + 1 < len(syms)
                                and syms[i] == left
                                and syms[i + 1] == right
                            ):
                                res.append(left + right)
                                i += 2
                            else:
                                res.append(syms[i])
                                i += 1
                        syms = res
                    out.append(syms)
                yield pd.DataFrame({"word": pdf["word"], "syms": out})

        vocab = vocab.mapInPandas(
            apply_merges, schema="word string, syms array<string>"
        )

    return vocab

"""pyspark.ml text-feature layer: TF-IDF vectors + retrieval."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsl_kdd_spark.ml.text_features import fit_tfidf, tfidf_similarity
from nsl_kdd_spark.sources.parquet import load_tables
from tests.conftest import SF_SMOKE


def test_tfidf_vectors_and_retrieval(spark):
    docs = load_tables(spark, SF_SMOKE).documents
    model = fit_tfidf(docs, n_features=1 << 12)
    out = model.transform(docs)
    assert "tfidf" in out.columns
    assert out.count() == docs.count()

    queries = docs.filter(F.col("doc_id") < 3)
    top = tfidf_similarity(model, docs, queries, k=5)
    rows = top.collect()
    assert len(rows) == 15  # 3 queries x 5
    # ranked descending per query, self excluded
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["doc_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r["cos_sim"])
    for sims in by_q.values():
        assert sims == sorted(sims, reverse=True)


def test_count_vectorizer_and_ngrams(spark):
    docs = load_tables(spark, SF_SMOKE).documents
    model = fit_tfidf(docs, use_count_vectorizer=True, ngram=2)
    cv = [s for s in model.stages if type(s).__name__ == "CountVectorizerModel"][0]
    assert len(cv.vocabulary) > 10  # real bigram vocabulary
    assert all(" " in term for term in cv.vocabulary[:10])  # bigrams


def test_tfidf_top_terms_exact(spark):
    from nsl_kdd_spark.ml.text_features import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles Data; spark broadcasts"),
            (2, "data data everywhere"),
            (3, "the spark engine"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, k=2)
    rows = {(r.doc_id, r.rnk): r for r in out.collect()}
    # doc 1: "spark" tf=2 but df=2; exclusive terms (broadcasts,
    # shuffles, df=1) score ln(2) each = 0.693147; spark scores
    # 2*ln(4/3) = 0.575364 -> alphabetical tie-break wins
    assert rows[(1, 1)].token == "broadcasts"
    assert rows[(1, 2)].token == "shuffles"
    assert rows[(1, 1)].score == 0.693147
    # doc 2: "everywhere" (df=1) beats "data" tf=2 df=2 (2*ln(4/3))
    assert rows[(2, 1)].token == "everywhere"
    assert rows[(2, 2)].token == "data"
    assert rows[(2, 2)].score == round(2 * 0.2876820724517809, 6)
    # per-doc cap respected, case folded + punctuation split
    assert out.count() == 6
    assert out.filter(F.col("token") == "Data").count() == 0


def _reference_bpe(word_counts, num_merges, min_pair_freq=2):
    """Pure-Python BPE: the textbook algorithm the distributed
    trainer must reproduce exactly (incl. lexicographic tie-break and
    greedy leftmost non-overlapping merging)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(num_merges):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get(
                    (syms[i], syms[i + 1]), 0
                ) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), freq = best
        if freq < min_pair_freq:
            break
        merged = l + r
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
        merges.append((rank, l, r, merged, freq))
    return merges


def test_train_bpe_matches_reference(spark):
    from nsl_kdd_spark.ml.text_features import train_bpe

    texts = [
        "low lower lowest", "low low newer", "newest newer wider",
        "low wider new", "aaaa aaa",  # overlap case: greedy leftmost
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    counts = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    want = _reference_bpe(counts, num_merges=8)
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_freq)
        for r in train_bpe(docs, num_merges=8).orderBy("rank").collect()
    ]
    assert got == want
    assert len(got) >= 4  # corpus is rich enough to actually learn


def test_train_bpe_min_freq_stops_early(spark):
    from nsl_kdd_spark.ml.text_features import train_bpe

    docs = spark.createDataFrame([(0, "ab cd")], ["doc_id", "text"])
    out = train_bpe(docs, num_merges=10, min_pair_freq=2).collect()
    assert out == []  # every pair occurs once; nothing reaches 2


def _reference_bpe_encode(text, merges):
    """Pure-Python encode: apply the merge list in rank order to each
    word (greedy leftmost non-overlapping), pieces in word order."""
    import re

    out = []
    for w in re.split("[^a-z0-9]+", text.lower()):
        if not w:
            continue
        syms = list(w)
        for _, l, r, merged, _freq in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        out.extend(syms)
    return out


def test_bpe_encode_expr_and_arrow_match_reference(spark):
    from nsl_kdd_spark.ml.text_features import bpe_encode, train_bpe

    texts = [
        "low lower lowest", "low low newer", "newest newer wider",
        "low wider new", "aaaa aaa",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges_df = train_bpe(docs, num_merges=8)
    counts = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    ref_merges = _reference_bpe(counts, num_merges=8)

    for method in ("expr", "arrow"):
        got = {
            r.doc_id: (list(r.bpe_tokens), r.n_pieces)
            for r in bpe_encode(docs, merges_df, method=method,
                                checkpoint_every=3).collect()
        }
        for i, t in enumerate(texts):
            want = _reference_bpe_encode(t, ref_merges)
            assert got[i] == (want, len(want)), (method, i, got[i], want)

    # pieces concatenate back to the original words (lossless)
    joined = "".join(got[0][0])
    assert joined == "lowlowerlowest"

    import pytest
    with pytest.raises(ValueError, match="expr|arrow"):
        bpe_encode(docs, merges_df, method="bogus")


def test_script_counts_mixed_scripts(spark):
    """Charset profile classifies mixed-script text exactly: latin,
    digits, CJK (han/kana/hangul), cyrillic, arabic, whitespace, and
    a residual 'other' for punctuation/symbols."""
    from nsl_kdd_spark.functions.text import script_counts

    rows = [
        (1, "Hello мир 你好 123!"),
        (2, "काka"),                     # devanagari -> other
        (3, "ひらがな한글"),              # kana + hangul count as cjk
        (4, "مرحبا"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {
        r.id: r for r in df.select(
            "id", *[v.alias(k) for k, v in script_counts("t").items()]
        ).collect()
    }
    r1 = out[1]
    assert (r1.latin, r1.cyrillic, r1.cjk, r1.digit) == (5, 3, 2, 3)
    assert r1.other == 1 and r1.whitespace == 3       # the '!'
    assert r1.n_chars == len(rows[0][1])
    assert out[2].other == 2 and out[2].latin == 2
    assert out[3].cjk == 6 and out[3].other == 0
    assert out[4].arabic == 5


def test_train_bpe_batched_equals_serial_and_reference(spark):
    """Merge-batching (the SCALE.md production-training lever): batch=B
    applies up to B merges per count cycle but must reproduce the
    SERIAL merge table exactly — the admission rule (contiguous
    frequency-sorted prefix, symbol-disjoint, strictly above every
    earlier member's new-pair cap) truncates rather than diverge.
    Pinned against the pure-Python reference on a corpus rich enough
    to sustain dozens of ranks, plus the round-count win."""
    import numpy as np

    from nsl_kdd_spark.ml.text_features import train_bpe

    # synthetic corpus with many independent frequent words so batches
    # actually fill: Zipf-weighted draws from a 60-word vocabulary
    rng = np.random.default_rng(17)
    vocab = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
        "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
        "victor", "whiskey", "xray", "yankee", "zulu", "spark", "query",
        "shuffle", "parquet", "column", "vector", "tensor", "matrix",
        "kernel", "thread", "buffer", "stream", "window", "filter",
        "reduce", "gather", "scatter", "branch", "memory", "driver",
        "worker", "lineage", "codegen", "barrier", "salted", "bucket",
        "minhash", "simhash", "jaccard", "cosine", "euclid", "manhattan",
        "zscore", "digest",
    ]
    w = 1.0 / np.arange(1, len(vocab) + 1)
    texts = [
        " ".join(rng.choice(vocab, size=30, p=w / w.sum()))
        for _ in range(200)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    counts = {}
    for t in texts:
        for word in t.split():
            counts[word] = counts.get(word, 0) + 1
    want = _reference_bpe(counts, num_merges=48)
    assert len(want) == 48   # corpus sustains every rank

    serial_stats: dict = {}
    serial = [
        (r.rank, r.left, r.right, r.merged, r.pair_freq)
        for r in train_bpe(docs, num_merges=48, stats=serial_stats)
        .orderBy("rank").collect()
    ]
    assert serial == want
    serial_cycles = serial_stats["cycles"]
    assert serial_cycles == 48

    batched_stats: dict = {}
    batched = [
        (r.rank, r.left, r.right, r.merged, r.pair_freq)
        for r in train_bpe(docs, num_merges=48, batch=16, stats=batched_stats)
        .orderBy("rank").collect()
    ]
    assert batched == want
    assert batched_stats["cycles"] < serial_cycles   # round-trips saved

    import pytest
    with pytest.raises(ValueError, match="batch"):
        train_bpe(docs, batch=0)


def test_normalize_text_strips_boilerplate_in_contract_order(spark):
    """normalize_text: tags stripped, entities decoded AFTER tags (an
    entity-encoded tag stays literal text), URLs/emails removed,
    whitespace collapsed, optional lowercase last."""
    from nsl_kdd_spark.functions.text import normalize_text

    raw = ('<div class="x">Hello &amp; <b>World</b></div>\n\n'
           'See https://ex.com/a?b=1#f and &lt;em&gt;keep&lt;/em&gt; '
           'mail Bob.Smith@corp.example.com  today &nbsp;&#39;quoted&#39;')
    df = spark.createDataFrame(
        [(1, raw), (2, "  plain   text  "),
         (3, "author escaped: 5 &amp;lt; 6 stays escaped")],
        "id long, t string")
    got = {r.id: r.c for r in df.select(
        "id", normalize_text("t").alias("c")).collect()}
    assert got[1] == "Hello & World See and <em>keep</em> mail today 'quoted'"
    assert got[2] == "plain text"
    # &amp; decodes LAST: "&amp;lt;" is the author writing a literal
    # "&lt;" — one decode, never two (round-5 review regression)
    assert got[3] == "author escaped: 5 &lt; 6 stays escaped"
    low = df.filter("id = 1").select(
        normalize_text("t", lowercase=True).alias("c")).first().c
    assert low == got[1].lower()


def _py_apply_merge(vocab, left, right, merged):
    new_vocab = {}
    for syms, c in vocab.items():
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
    return new_vocab


def _py_bpe_batched(word_counts, num_merges, batch, min_pair_freq, k_prefix):
    """Pure-Python twin of the Spark trainer's batched loop, driven by
    the SAME _select_batch admission rule — lets hypothesis hammer the
    batched == serial claim without Spark in the loop."""
    from nsl_kdd_spark.ml.text_features import _select_batch

    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    while len(merges) < num_merges:
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get(
                    (syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        take = min(batch, num_merges - len(merges))
        kp = take if take == 1 else k_prefix
        ordered = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:kp]
        top = [(lr[0], lr[1], f) for lr, f in ordered]
        if not top or top[0][2] < min_pair_freq:
            break
        selected = _select_batch(
            top, take=take, min_pair_freq=min_pair_freq,
            truncated_prefix=len(top) == kp,
        )
        for left, right, freq in selected:
            vocab = _py_apply_merge(vocab, left, right, left + right)
            merges.append((len(merges), left, right, left + right, freq))
    return merges


def test_bpe_batch_admission_rule_is_serial_equal_property():
    """Adversarial check of the batch admission rule: on random tiny
    corpora (small alphabets maximize symbol interaction — the regime
    where unsound batching diverges), batched selection must ALWAYS
    reproduce the serial merge table, for every batch size and even
    pathologically short cap prefixes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    corpus = st.dictionaries(word, st.integers(1, 6), min_size=1, max_size=8)

    @settings(max_examples=300, deadline=None)
    @given(
        counts=corpus,
        num_merges=st.integers(1, 8),
        batch=st.integers(2, 6),
        min_pair_freq=st.integers(1, 3),
        k_prefix=st.sampled_from([2, 3, 5, 1000]),
    )
    def check(counts, num_merges, batch, min_pair_freq, k_prefix):
        want = _reference_bpe(counts, num_merges, min_pair_freq)
        got = _py_bpe_batched(
            counts, num_merges, batch, min_pair_freq, k_prefix
        )
        assert got == want

    check()


def test_url_host_normalizes_case_port_www(spark):
    from nsl_kdd_spark.functions.text import url_host

    df = spark.createDataFrame(
        [(1, "HTTPS://WWW.Ex.COM:8080/p?q=1"),
         (2, "https://ex.com/other"),
         (3, "ftp://files.ex.com:21/x"),
         (4, "not a url"),
         (5, None),
         (6, "https://user@sub.ex.com/w"),
         (7, "https://fqdn.ex.com./p")],
        "id long, url string",
    )
    got = {r.id: r.h for r in df.select(
        "id", url_host("url").alias("h")).collect()}
    assert got[1] == "ex.com" and got[2] == "ex.com"
    assert got[3] == "files.ex.com"
    assert got[4] is None and got[5] is None
    assert got[6] == "sub.ex.com"       # userinfo stripped
    assert got[7] == "fqdn.ex.com"      # trailing FQDN dot stripped


def test_ngram_diversity_report_known_values(spark):
    from nsl_kdd_spark.ml.text_features import ngram_diversity_report

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "id long, text string",
    )
    rows = {r["n"]: r for r in ngram_diversity_report(
        df, "text", ns=(1, 2)).collect()}
    # unigrams: a a a b b b c x -> total 8, distinct 4, singletons c,x
    r1 = rows[1]
    assert (r1["total_grams"], r1["distinct_grams"],
            r1["singleton_grams"]) == (8, 4, 2)
    assert r1["distinct_ppm"] == (1_000_000 * 4) // 8
    assert r1["singleton_ppm"] == (1_000_000 * 2) // 8
    # bigrams: "a b","b a","a b" + "a b","b c"; doc 3 too short
    r2 = rows[2]
    assert (r2["total_grams"], r2["distinct_grams"],
            r2["singleton_grams"]) == (5, 3, 2)


def test_ngram_diversity_report_empty_tier_is_zero(spark):
    from nsl_kdd_spark.ml.text_features import ngram_diversity_report

    df = spark.createDataFrame([(1, "a b")], "id long, text string")
    rows = {r["n"]: r for r in ngram_diversity_report(
        df, "text", ns=(5,)).collect()}
    r5 = rows[5]
    assert (r5["total_grams"], r5["distinct_grams"],
            r5["singleton_grams"]) == (0, 0, 0)
    assert r5["distinct_ppm"] == 0 and r5["singleton_ppm"] == 0


def test_ngram_diversity_report_rejects_empty_ns(spark):
    import pytest as _pytest

    from nsl_kdd_spark.ml.text_features import ngram_diversity_report

    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with _pytest.raises(ValueError):
        ngram_diversity_report(df, "text", ns=())


def test_tokenizer_fertility_known_values(spark):
    from nsl_kdd_spark.ml.text_features import tokenizer_fertility_report

    df = spark.createDataFrame(
        [(1, "ab12cd xy", "en"),   # words 2; regex tokens ab,12,cd,xy = 4
         (2, "hello", "en"),       # words 1; tokens 1
         (3, "a-b c", "fr")],      # words 2; tokens a,b,c = 3
        "id long, text string, lang string",
    )
    rows = {r["lang"]: r for r in tokenizer_fertility_report(
        df, "lang", "text").collect()}
    en, fr = rows["en"], rows["fr"]
    assert (en["n_docs"], en["n_words"], en["n_tokens"], en["n_chars"]) \
        == (2, 3, 5, 14)
    assert en["fertility_ppm"] == (1_000_000 * 5) // 3
    assert en["chars_per_token_ppm"] == (1_000_000 * 14) // 5
    assert (fr["n_words"], fr["n_tokens"]) == (2, 3)


def test_tokenizer_fertility_custom_token_col(spark):
    from pyspark.sql import functions as F

    from nsl_kdd_spark.ml.text_features import tokenizer_fertility_report

    df = spark.createDataFrame(
        [(1, "a b", "en", 7), (2, "c", "en", 3)],
        "id long, text string, lang string, bpe_len long",
    )
    r = tokenizer_fertility_report(
        df, "lang", "text", token_count_col="bpe_len").collect()[0]
    assert r["n_tokens"] == 10 and r["n_words"] == 3
    assert r["fertility_ppm"] == (1_000_000 * 10) // 3


def test_ngram_diversity_report_rejects_bad_order(spark):
    import pytest as _pytest

    from nsl_kdd_spark.ml.text_features import ngram_diversity_report

    df = spark.createDataFrame([(1, "a b")], "id long, text string")
    with _pytest.raises(ValueError):
        ngram_diversity_report(df, "text", ns=(0, 2))


def test_bpe_encode_fused_vocab_matches_unfused(spark):
    """Optimization r13: encoding with train_bpe's vocab_out
    by-product (skipping the re-derived vocabulary and merge folds)
    must reproduce the unfused encode exactly, row for row."""
    from nsl_kdd_spark.ml.text_features import bpe_encode, train_bpe
    from nsl_kdd_spark.sources.parquet import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE).documents
    vocab_out: dict = {}
    merges = train_bpe(docs, num_merges=6, batch=4, vocab_out=vocab_out)
    unfused = bpe_encode(docs, merges, method="expr")
    fused = bpe_encode(
        docs, merges, method="expr", vocab=vocab_out["vocab"]
    )
    assert fused.schema == unfused.schema
    a = sorted([tuple(r) for r in unfused.collect()])
    b = sorted([tuple(r) for r in fused.collect()])
    assert a == b

"""Property-based invariants (hypothesis): the determinism and
algebraic claims the engine's correctness strategy rests on.

Each property runs a whole generated batch through one Spark job
(max_examples kept low — Spark's per-job overhead dominates)."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.scalar import exact_stddev, exact_sum

money = st.integers(min_value=-10_000_000, max_value=10_000_000).map(
    lambda cents: cents / 100.0
)


@settings(max_examples=5, deadline=None)
@given(st.lists(money, min_size=1, max_size=300))
def test_exact_sum_matches_decimal_arithmetic_and_partitioning(values):
    spark = _spark()
    df = spark.createDataFrame([(v,) for v in values], "x double")
    want = float(sum(Decimal(str(round(v, 2))) for v in values))
    got_1 = df.coalesce(1).agg(exact_sum("x").alias("s")).first()["s"]
    got_n = df.repartition(7).agg(exact_sum("x").alias("s")).first()["s"]
    # bit-identical across partitionings AND equal to exact decimal math
    assert got_1 == got_n == want


@settings(max_examples=5, deadline=None)
@given(st.lists(money, min_size=2, max_size=300))
def test_exact_stddev_partition_invariant(values):
    spark = _spark()
    df = spark.createDataFrame([(v,) for v in values], "x double")
    a = df.coalesce(1).agg(exact_stddev("x").alias("s")).first()["s"]
    b = df.repartition(5).agg(exact_stddev("x").alias("s")).first()["s"]
    assert a == b or (a is None and b is None) or (a != a and b != b)  # NaN ok


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdef ", min_size=1, max_size=60),
        min_size=2, max_size=30,
    )
)
def test_dedup_exact_idempotent_and_keeps_lowest_id(texts):
    from nsl_kdd_spark.operators.dedup import dedup_exact

    spark = _spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = dedup_exact(df, "text", "doc_id")
    twice = dedup_exact(once, "text", "doc_id")
    got_once = sorted(map(tuple, once.collect()))
    assert got_once == sorted(map(tuple, twice.collect()))
    # keeps exactly one row per distinct text, the lowest id
    want = {}
    for i, t in enumerate(texts):
        want.setdefault(t, i)
    assert got_once == sorted((i, t) for t, i in want.items())


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=1, max_size=200
    )
)
def test_binary_metrics_formulas(pairs):
    from nsl_kdd_spark.ml.metrics import binary_metrics

    spark = _spark()
    df = spark.createDataFrame(
        [(float(y), float(p)) for y, p in pairs], "y double, p double"
    )
    m = binary_metrics(df, "y", "p").first()
    tp = sum(1 for y, p in pairs if y and p)
    tn = sum(1 for y, p in pairs if not y and not p)
    fp = sum(1 for y, p in pairs if not y and p)
    fn = sum(1 for y, p in pairs if y and not p)
    assert (m["tp"], m["tn"], m["fp"], m["fn"]) == (tp, tn, fp, fn)
    assert m["accuracy"] == (tp + tn) / len(pairs)
    if fp + tn:
        assert m["false_alarm_rate"] == fp / (fp + tn)
    if tp + fn:
        assert m["detection_rate"] == tp / (tp + fn)


def test_simhash_identical_texts_collide(spark):
    from nsl_kdd_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "completely different words here")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(df, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]


_session = None


def _spark():
    global _session
    if _session is None:
        from nsl_kdd_spark.session import get_session

        _session = get_session(
            app_name="nsl-kdd-spark-tests", master="local[4]", shuffle_partitions=4
        )
    return _session


# --- codec properties (pure numpy — no Spark job per example, so
# hypothesis can afford real example counts) ---

img_dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


@settings(max_examples=50, deadline=None)
@given(img_dims, st.integers(0, 2**32 - 1))
def test_ppm_bmp_roundtrip_any_shape(dims, seed):
    import numpy as np

    from nsl_kdd_spark.multimodal.codecs import (
        bmp_decode, bmp_encode, ppm_decode, ppm_encode,
    )

    h, w = dims
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(ppm_decode(ppm_encode(img)), img)
    assert np.array_equal(bmp_decode(bmp_encode(img)), img)


@settings(max_examples=25, deadline=None)
@given(img_dims, img_dims, st.integers(0, 2**32 - 1))
def test_resize_shape_and_identity(src_dims, dst_dims, seed):
    import numpy as np

    from nsl_kdd_spark.multimodal.codecs import resize_nearest

    (h, w), (th, tw) = src_dims, dst_dims
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = resize_nearest(img, tw, th)
    assert out.shape == (th, tw, 3)
    # resizing to the same shape is the identity (pixel-center mapping)
    assert np.array_equal(resize_nearest(img, w, h), img)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=12),
        min_size=1,
        max_size=25,
    )
)
def test_dedup_spans_reassembly_and_partition_invariance(token_lists):
    from nsl_kdd_spark.operators.dedup import dedup_spans

    spark = _spark()
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "id long, text string")
    out1 = {r["id"]: tuple(r)[1:] for r in
            dedup_spans(df.coalesce(1), "id", "text", span_words=2).collect()}
    out7 = {r["id"]: tuple(r)[1:] for r in
            dedup_spans(df.repartition(7), "id", "text", span_words=2).collect()}
    # layout never changes the result
    assert out1 == out7
    originals = dict(rows)
    for i, (clean, n_dropped, n_spans) in out1.items():
        toks, kept = originals[i].split(" "), clean.split(" ") if clean else []
        # surviving text is a subsequence of the original tokens
        it = iter(toks)
        assert all(any(k == t for t in it) for k in kept)
        # with a duplication threshold no doc can exceed, nothing drops
    hi = {r["id"]: r["clean_text"] for r in
          dedup_spans(df, "id", "text", span_words=2, max_docs=10**6).collect()}
    for i, text in rows:
        if text:
            assert hi[i] == text


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),            # key
            st.integers(0, 50),           # ts
            st.sampled_from(["A", "B", None]),  # attr
        ),
        min_size=1,
        max_size=40,
    )
)
def test_scd2_history_covers_timeline_without_overlap(events):
    from nsl_kdd_spark.operators.merge import scd2_history

    spark = _spark()
    rows = [(k, t, a, i) for i, (k, t, a) in enumerate(events)]
    df = spark.createDataFrame(rows, "k long, ts long, attr string, seq long")
    out = scd2_history(df, ["k"], "ts", ["attr"], tiebreak_col="seq") \
        .orderBy("k", "effective_from", "seq").collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, versions in by_key.items():
        # versions tile the key's timeline: each closes where next opens
        for a, b in zip(versions, versions[1:]):
            assert a["effective_to"] == b["effective_from"]
            assert not a["is_current"]
        assert versions[-1]["is_current"] and versions[-1]["effective_to"] is None
        # consecutive versions always differ in the tracked attribute
        for a, b in zip(versions, versions[1:]):
            if a["effective_from"] != b["effective_from"]:  # real transition
                assert a["attr"] != b["attr"]


def test_upsample_superset_property(spark):
    """Raising the factor must keep every existing copy: copies at
    factor f1 are a per-key lower bound of copies at f2 > f1 (the
    mixture-rebalance contract — same md5 stream, higher cut)."""
    from nsl_kdd_spark.operators.relational import upsample_hash

    df = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    c1 = {r.k: r["count"] for r in upsample_hash(df, "k", 1.3)
          .groupBy("k").count().collect()}
    c2 = {r.k: r["count"] for r in upsample_hash(df, "k", 2.7)
          .groupBy("k").count().collect()}
    for k in c1:
        assert c2[k] >= c1[k]
    # and the fractional extra goes to the SAME keys at equal frac
    e1 = {k for k, c in c1.items() if c == 2}
    e2 = {k for k, c in
          {r.k: r["count"] for r in upsample_hash(df, "k", 2.3)
           .groupBy("k").count().collect()}.items() if c == 3}
    assert e1 == e2  # frac .3 picks identical md5 buckets at any base


def test_table_digest_partition_and_union_order_invariance(spark):
    from nsl_kdd_spark.operators.quality import table_digest

    a = spark.createDataFrame([(i, f"v{i}") for i in range(50)], ["id", "v"])
    b = spark.createDataFrame([(i, f"v{i}") for i in range(50, 80)], ["id", "v"])
    d_ab = tuple(table_digest(a.unionByName(b)).collect()[0])
    d_ba = tuple(table_digest(b.unionByName(a).repartition(13)).collect()[0])
    assert d_ab == d_ba


@settings(max_examples=40, deadline=None)
@given(img_dims, st.integers(0, 2**32 - 1))
def test_png_roundtrip_any_shape(dims, seed):
    import numpy as np

    from nsl_kdd_spark.multimodal.codecs import png_decode, png_encode

    h, w = dims
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)  # lossless


@settings(max_examples=15, deadline=None)
@given(
    st.tuples(st.integers(8, 40), st.integers(8, 40)),
    st.integers(0, 2**32 - 1),
    st.booleans(),
)
def test_jpeg_roundtrip_bounded_error_smooth_images(dims, seed, subsample):
    """JPEG is lossy, so the property is a BOUND: on smooth (low
    spatial frequency) images at quality 95, every pixel round-trips
    within a small number of levels at 4:4:4, slightly looser with
    chroma subsampling. Random noise images intentionally excluded —
    quantization error there is unbounded by design."""
    import numpy as np

    from nsl_kdd_spark.multimodal.codecs import jpeg_decode, jpeg_encode

    h, w = dims
    rng = np.random.default_rng(seed)
    # smooth image: low-frequency plane gradients with random slopes
    yy, xx = np.mgrid[0:h, 0:w]
    chans = []
    for _ in range(3):
        a, b, c = rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(0, 255)
        chans.append(np.clip(a * xx + b * yy + c, 0, 255))
    img = np.stack(chans, axis=-1).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=95, subsample=subsample))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= (14 if subsample else 8), err.max()


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["the", "cat", "sat", "mat", "dog",
                                  "ran", "far", "big"]),
                 min_size=5, max_size=14),
        min_size=3, max_size=12,
    )
)
def test_jaccard_order_tiers_equivalent_on_random_corpora(word_lists):
    """freq- and hash-order prefix filtering are both lossless: on any
    random corpus they must emit identical (pair, value) sets."""
    from nsl_kdd_spark.operators.dedup import jaccard_pairs

    spark = _spark()
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(word_lists)],
        ["doc_id", "text"],
    )
    got = {}
    for order in ("freq", "hash"):
        got[order] = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in jaccard_pairs(
                df, "doc_id", "text", n=2, threshold=0.4, order=order
            ).collect()
        )
    assert got["freq"] == got["hash"]


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "ab", "ba", "abc", "cab",
                                  "bb", "aab"]),
                 min_size=2, max_size=8),
        min_size=2, max_size=8,
    )
)
def test_bpe_encode_tiers_match_pure_python(word_lists):
    """expr and arrow BPE tiers must both equal the textbook encode
    for merges trained on the same corpus."""
    from nsl_kdd_spark.ml.text_features import bpe_encode, train_bpe
    from tests.test_text_features import (
        _reference_bpe, _reference_bpe_encode,
    )

    spark = _spark()
    texts = [" ".join(ws) for ws in word_lists]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges_df = train_bpe(docs, num_merges=5)
    counts = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    ref_merges = _reference_bpe(counts, num_merges=5)
    for method in ("expr", "arrow"):
        got = {
            r.doc_id: list(r.bpe_tokens)
            for r in bpe_encode(docs, merges_df, method=method).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _reference_bpe_encode(t, ref_merges), (
                method, i, t)

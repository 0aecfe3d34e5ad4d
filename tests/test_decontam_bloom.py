"""Bloom-gated decontamination (operators/decontam.py round-8):
geometry sizing, build/probe arithmetic parity against a pure-Python
reference, bit-exactness of the two-phase plan vs the exact path
(including a forced-false-positive filter), the empirical FP rate vs
the target, and the n-mismatch guard."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.bloom import bloom_geometry
from nsl_kdd_spark.operators.bloom import bloom_positions as _bloom_positions
from nsl_kdd_spark.operators.decontam import (
    GramBloom,
    build_gram_bloom,
    contaminated_ids,
    contaminated_ids_bloom,
)
from nsl_kdd_spark.sources.parquet import load_tables
from tests.conftest import SF_SMOKE


def test_bloom_geometry_standard_sizing():
    m, k = bloom_geometry(1_000, 0.01)
    # textbook: ~9.59 bits/item, ~7 hashes at 1%
    assert 9_000 <= m <= 10_000 and k == 7
    m2, _ = bloom_geometry(1_000, 0.001)
    assert m2 > m  # tighter fpp -> bigger filter
    assert bloom_geometry(0, 0.01)[0] >= 64  # degenerate input floor


def test_bloom_positions_match_python_reference():
    rng = np.random.default_rng(7)
    h1 = rng.integers(-(2**63), 2**63 - 1, size=50, dtype=np.int64)
    h2 = rng.integers(-(2**63), 2**63 - 1, size=50, dtype=np.int64)
    m, k = 9_586, 7
    got = _bloom_positions(h1, h2, m, k)
    for r in range(50):
        for i in range(k):
            # wrapping int64 (Java long semantics), floored mod
            raw = (int(h1[r]) + i * int(h2[r]) + 2**63) % 2**64 - 2**63
            assert got[r, i] == raw % m
    assert got.min() >= 0 and got.max() < m


def test_bloom_build_sets_exactly_member_bits(spark):
    # tiny benchmark -> verify every inserted gram probes positive
    # directly against the packed bitmap (build/probe parity without
    # going through the join)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "id int, text string"
    )
    bloom = build_gram_bloom(df, "text", n=3, fpp=0.01)
    assert bloom.n_items == 3  # 3 distinct 3-grams
    grams = ["alpha beta gamma", "beta gamma delta", "gamma delta epsilon"]
    buf = np.frombuffer(bloom.bits, dtype=np.uint8)
    # key derivation since optimization r13: h1 is the word-wise
    # combined gram hash (xxhash64 over the n token hashes), h2 its
    # seeded re-hash — mirror it here for build/probe parity
    h = (
        spark.createDataFrame([(g,) for g in grams], "g string")
        .select(
            F.xxhash64(
                *[
                    F.xxhash64(F.split("g", " ")[i])
                    for i in range(3)
                ]
            ).alias("h1")
        )
        .select("h1", F.xxhash64("h1", F.lit(1)).alias("h2"))
        .collect()
    )
    for h1, h2 in h:
        pos = _bloom_positions([h1], [h2], bloom.m, bloom.k)[0]
        assert all(buf[p // 8] >> (p % 8) & 1 for p in pos)


def _split(docs):
    return (
        docs.filter(F.col("doc_id") % 41 != 0),
        docs.filter(F.col("doc_id") % 41 == 0),
    )


def test_bloom_path_bit_identical_to_exact(spark):
    corpus, bench = _split(load_tables(spark, SF_SMOKE).documents)
    exact = {
        (r.doc_id, r.hits)
        for r in contaminated_ids(
            corpus, bench, "doc_id", "text", "doc_id", "text",
            n=3, min_hits=2,
        ).collect()
    }
    got = {
        (r.doc_id, r.hits)
        for r in contaminated_ids_bloom(
            corpus, bench, "doc_id", "text", "text", n=3, min_hits=2
        ).collect()
    }
    assert got == exact and exact  # non-trivial on the fixture


def test_bloom_false_positives_removed_by_recheck(spark):
    # fpp=0.5 forces a dense, nearly useless filter; phase 2 must
    # still deliver the exact answer
    corpus, bench = _split(load_tables(spark, SF_SMOKE).documents)
    loose = build_gram_bloom(bench, "text", n=3, fpp=0.5)
    tight = build_gram_bloom(bench, "text", n=3, fpp=0.01)
    assert loose.n_bytes < tight.n_bytes
    a = {
        (r.doc_id, r.hits)
        for r in contaminated_ids_bloom(
            corpus, bench, "doc_id", "text", "text",
            n=3, min_hits=2, bloom=loose,
        ).collect()
    }
    b = {
        (r.doc_id, r.hits)
        for r in contaminated_ids_bloom(
            corpus, bench, "doc_id", "text", "text",
            n=3, min_hits=2, bloom=tight,
        ).collect()
    }
    assert a == b


def test_bloom_empirical_fpp_near_target(spark):
    # insert 500 synthetic grams, probe 4000 disjoint ones; observed
    # FP rate should be within ~3x of the 1% target (binomial noise)
    member = spark.range(500).select(
        F.concat_ws(
            " ", F.lit("in"), F.col("id").cast("string"), F.lit("x y")
        ).alias("text")
    )
    bloom = build_gram_bloom(member, "text", n=4, fpp=0.01)
    probes = spark.range(4_000).select(
        F.concat_ws(" ", F.lit("out"), F.col("id").cast("string")).alias("g")
    ).select(F.xxhash64("g").alias("h1"), F.xxhash64("g", F.lit(1)).alias("h2"))
    buf = np.frombuffer(bloom.bits, dtype=np.uint8)
    rows = probes.collect()
    pos = _bloom_positions(
        [r.h1 for r in rows], [r.h2 for r in rows], bloom.m, bloom.k
    )
    hits = ((buf[pos // 8] >> (pos % 8).astype(np.uint8)) & 1).all(axis=1)
    assert hits.mean() <= 0.03


def test_bloom_n_mismatch_guard(spark):
    corpus, bench = _split(load_tables(spark, SF_SMOKE).documents)
    bloom = GramBloom(bits=b"\x00" * 8, m=64, k=1, n_items=0, n=13)
    with pytest.raises(ValueError, match="built with n=13"):
        contaminated_ids_bloom(
            corpus, bench, "doc_id", "text", "text", n=3, bloom=bloom
        )

"""Streaming embedding ingest with semantic dedup (round-7): the
SemDedup twin of the text/media registry ingests — exact-cosine
rejection against a standing embedding registry, candidates from
sign-LSH probe buckets, replay-safe __batch_id partitions."""

from __future__ import annotations

import math
import random

import pytest

from nsl_kdd_spark.streaming.ingest import read_corpus
from nsl_kdd_spark.streaming.vector_ingest import (
    _vector_sink,
    ingest_vector_stream,
)

DIM = 8


def _unit(seed: int) -> list[float]:
    rng = random.Random(seed)
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _jitter(v: list[float], eps: float, seed: int) -> list[float]:
    rng = random.Random(seed)
    return [x + rng.gauss(0, eps) for x in v]


# full-probe settings: n_probe = 2^n_planes probes every bucket, so
# recall is exact and the test pins SEMANTICS (cosine threshold,
# keep-lowest, replay) rather than LSH luck
KW = dict(threshold=0.95, dim=DIM, n_planes=3, n_probe=8, seed=42)


def test_vector_ingest_stream_semantic_registry(spark, tmp_path):
    a, b = _unit(1), _unit(2)
    src = tmp_path / "drop"
    spark.createDataFrame(
        [(1, a), (2, b)], "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("append").parquet(str(src))

    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        **KW,
    )
    q = ingest_vector_stream(spark, str(src), **kw)
    q.awaitTermination(120)
    assert {
        r.vec_id for r in read_corpus(spark, kw["corpus_path"]).collect()
    } == {1, 2}

    # second drop: near-redelivery of vector 1 (tiny jitter, cosine
    # ~0.999), one novel, one within-batch near-pair (keep lowest)
    c = _unit(3)
    rows = [
        (10, _jitter(a, 0.005, 7)),
        (11, c),
        (12, _jitter(c, 0.004, 8)),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("append").parquet(str(src))
    q = ingest_vector_stream(spark, str(src), **kw)
    q.awaitTermination(120)

    corpus = {
        r.vec_id for r in read_corpus(spark, kw["corpus_path"]).collect()
    }
    assert corpus == {1, 2, 11}  # 10 = registry dup of 1, 12 ~ 11
    registry = {
        r.vec_id for r in read_corpus(spark, kw["registry_path"]).collect()
    }
    assert registry == corpus


def test_vector_ingest_replay_never_self_dedups(spark, tmp_path):
    """Re-running a batch with the same batch_id (at-least-once
    redelivery after a crash between write and checkpoint commit)
    must reproduce its partitions, not empty-overwrite them."""
    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        **KW,
    )
    a = _unit(1)
    batch0 = spark.createDataFrame(
        [(1, a)], "vec_id long, embedding array<double>"
    )
    _vector_sink(batch0, 0, **kw)
    batch1 = spark.createDataFrame(
        [(10, _jitter(a, 0.005, 3)), (11, _unit(5))],
        "vec_id long, embedding array<double>",
    )
    _vector_sink(batch1, 1, **kw)
    assert {
        r.vec_id for r in read_corpus(spark, kw["corpus_path"]).collect()
    } == {1, 11}

    _vector_sink(batch1, 1, **kw)  # crash-replay of batch 1
    assert {
        r.vec_id for r in read_corpus(spark, kw["corpus_path"]).collect()
    } == {1, 11}
    assert {
        r.vec_id for r in read_corpus(spark, kw["registry_path"]).collect()
    } == {1, 11}


def test_vector_ingest_threshold_boundary(spark, tmp_path):
    """Exact-precision contract: a candidate in the SAME bucket but
    below the cosine threshold is accepted — bucket collision alone
    never rejects."""
    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        **KW,
    )
    a = _unit(1)
    _vector_sink(
        spark.createDataFrame(
            [(1, a)], "vec_id long, embedding array<double>"
        ),
        0, **kw,
    )
    # heavy jitter: same broad direction (often same bucket), cosine
    # clearly below 0.95
    noisy = _jitter(a, 0.6, 9)
    _vector_sink(
        spark.createDataFrame(
            [(20, noisy)], "vec_id long, embedding array<double>"
        ),
        1, **kw,
    )
    assert {
        r.vec_id for r in read_corpus(spark, kw["corpus_path"]).collect()
    } == {1, 20}


def test_vector_ingest_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="threshold"):
        ingest_vector_stream(
            spark, str(tmp_path), str(tmp_path / "c"),
            str(tmp_path / "r"), str(tmp_path / "k"), threshold=1.5,
        )
    with pytest.raises(ValueError, match="n_probe"):
        ingest_vector_stream(
            spark, str(tmp_path), str(tmp_path / "c"),
            str(tmp_path / "r"), str(tmp_path / "k"),
            n_planes=3, n_probe=9,
        )


def test_semantic_dedup_batch_plans_are_equi_joins(spark):
    """Both tiers' candidate joins must be bucket equi-joins — never a
    cartesian: the whole point of the LSH probe is that the registry
    and the batch meet only on bucket keys."""
    from pyspark.sql import functions as F

    from nsl_kdd_spark.functions.vector import sign_bits_hex
    from nsl_kdd_spark.operators.similarity import hyperplanes
    from nsl_kdd_spark.streaming.vector_ingest import semantic_dedup_batch

    batch = spark.createDataFrame(
        [(i, _unit(i)) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    planes = hyperplanes(DIM, 3, 42)
    registry = spark.createDataFrame(
        [(100 + i, _unit(50 + i)) for i in range(20)],
        "vec_id long, embedding array<double>",
    ).withColumn("__bucket", sign_bits_hex(F.col("embedding"), planes))
    out = semantic_dedup_batch(
        batch, registry, threshold=0.95, dim=DIM, n_planes=3, n_probe=4
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

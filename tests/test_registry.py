"""Incremental near-dup registry (operators/registry): one ingest
batch deduped against accumulated signatures + itself, equivalent to
what a full-corpus LSH run would have found for the same pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsl_kdd_spark.operators.dedup import minhash_lsh_pairs
from nsl_kdd_spark.operators.registry import build_registry, dedup_batch

PARAMS = dict(num_hashes=8, band_size=1, threshold=0.5, shingle_n=2)

OLD = [
    (1, "the quick brown fox jumps over the lazy dog in the park"),
    (2, "colorless green ideas sleep furiously under a pale winter moon"),
    (3, "spark dataframes shuffle on their keys when aggregates require it"),
]
NEW = [
    # near-dup of registry doc 1 (one word changed)
    (10, "the quick brown fox jumps over the lazy cat in the park"),
    # within-batch near-dup pair (one word changed)
    (11, "distributed joins broadcast their small side to every executor node"),
    (12, "distributed joins broadcast their tiny side to every executor node"),
    # novel
    (13, "entirely different content about cooking pasta with garlic and olive oil"),
]


def _dfs(spark):
    old = spark.createDataFrame(OLD, ["doc_id", "text"])
    new = spark.createDataFrame(NEW, ["doc_id", "text"])
    return old, new


def test_dedup_batch_exact_verify(spark):
    old, new = _dfs(spark)
    reg = build_registry(old, "doc_id", "text",
                         num_hashes=8, shingle_n=2)
    res = dedup_batch(new, reg, corpus_text=old, **PARAMS)

    cross = {(r.new_id, r.registry_id) for r in res.dup_vs_registry.collect()}
    assert cross == {(10, 1)}
    within = {(r.kept_id, r.dropped_id) for r in res.dup_within_batch.collect()}
    assert within == {(11, 12)}
    assert {r.doc_id for r in res.accepted.collect()} == {11, 13}
    # registry grows by exactly the accepted docs
    assert {r.doc_id for r in res.updated_registry.collect()} == {1, 2, 3, 11, 13}


def test_dedup_batch_estimate_mode_needs_no_text(spark):
    old, new = _dfs(spark)
    reg = build_registry(old, "doc_id", "text", num_hashes=8, shingle_n=2)
    res = dedup_batch(new, reg, **PARAMS)  # no corpus_text
    cross = {(r.new_id, r.registry_id) for r in res.dup_vs_registry.collect()}
    assert cross == {(10, 1)}
    # estimate score is the agreeing-slot fraction, in [0, 1]
    scores = [r.score for r in res.dup_vs_registry.collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_incremental_matches_full_corpus_run(spark):
    """Cross-tier pairs from the incremental path == the old-new pairs
    a full-corpus LSH run finds with the same parameters."""
    old, new = _dfs(spark)
    reg = build_registry(old, "doc_id", "text", num_hashes=8, shingle_n=2)
    res = dedup_batch(new, reg, corpus_text=old, **PARAMS)
    incr = {(r.new_id, r.registry_id, round(r.score, 9))
            for r in res.dup_vs_registry.collect()}

    full = minhash_lsh_pairs(
        old.unionByName(new), "doc_id", "text",
        num_hashes=8, band_size=1, threshold=0.5, shingle_n=2,
    )
    old_ids = {i for i, _ in OLD}
    want = {
        (r.id_b, r.id_a, round(r.jaccard, 9))
        for r in full.collect()
        if r.id_a in old_ids and r.id_b not in old_ids
    }
    assert incr == want


def test_dedup_batch_plans_are_equi_joins(spark):
    old, new = _dfs(spark)
    reg = build_registry(old, "doc_id", "text", num_hashes=8, shingle_n=2)
    res = dedup_batch(new, reg, corpus_text=old, **PARAMS)
    for df in (res.dup_vs_registry, res.accepted):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "CartesianProduct" not in plan


def test_probe_error_classification(spark, tmp_path):
    """is_missing_path_error admits exactly the two nothing-committed
    states — missing path (first batch) and existing-but-empty dir
    (UNABLE_TO_INFER_SCHEMA: a first registry write that crashed
    mid-write, round-7 advisory) — and rejects genuine read failures
    so they fail the micro-batch instead of silently admitting dups."""
    from nsl_kdd_spark.streaming.ingest import is_missing_path_error

    def classify(path: str) -> bool:
        try:
            spark.read.parquet(path).collect()
        except Exception as e:  # noqa: BLE001 - classifying, not handling
            return is_missing_path_error(e)
        raise AssertionError(f"read of {path} unexpectedly succeeded")

    # missing path -> no registry yet
    assert classify(str(tmp_path / "never_written"))

    # existing dir, zero committed parquet files (crashed first write
    # leaves only _temporary) -> equivalent to nothing-committed
    empty = tmp_path / "crashed_first_write"
    (empty / "_temporary").mkdir(parents=True)
    assert classify(str(empty))

    # a real read failure (committed file with corrupt content) must
    # NOT be classified as missing -> propagates, fails the batch
    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"not a parquet file")
    assert not classify(str(corrupt))

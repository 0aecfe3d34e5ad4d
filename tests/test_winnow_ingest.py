"""Streaming winnow-fingerprint ingest (round-8): the substring-level
member of the registry-ingest family — span-containment rejection
against a standing fingerprint registry, keep-lowest within batch,
replay-safe __batch_id partitions, boilerplate stop-fingerprint
guard."""

from __future__ import annotations

import random

from nsl_kdd_spark.streaming.ingest import read_corpus
from nsl_kdd_spark.streaming.winnow_ingest import (
    _winnow_sink,
    ingest_winnow_stream,
    winnow_dedup_batch,
)
from tests.test_winnow import py_winnow

KW = dict(k=4, w=4, min_shared=2, max_fp_df=50)


def _words(seed: int, n: int) -> str:
    rng = random.Random(seed)
    return " ".join(f"w{rng.randrange(10_000)}" for _ in range(n))


A = _words(1, 30)  # registry doc
NOVEL = _words(2, 30)
# contains A verbatim -> shares ALL of A's fingerprints
CONTAINS_A = A + " " + _words(3, 10)
SHORT = "too short here"  # < k+w-1 tokens: no fingerprints, always passes

# the test's rejection premise: A must select >= min_shared distinct
# fingerprint values (true for this fixture, asserted so a fixture
# edit can't silently weaken the test)
assert len({h for _, h in py_winnow(A, 4, 4)}) >= 2


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_dedup_batch_semantics(spark):
    from nsl_kdd_spark.operators.winnow import winnow_fingerprints

    reg_fps = winnow_fingerprints(
        _df(spark, [(1, A)]), "doc_id", "text", 4, 4
    ).select("doc_id", "fp")
    batch = _df(spark, [
        (10, CONTAINS_A),       # registry containment -> rejected
        (11, NOVEL),            # novel -> accepted
        (12, NOVEL + " tail9"), # within-batch dup of 11 -> keep lowest
        (13, SHORT),            # no fingerprints -> passes
    ])
    res = winnow_dedup_batch(batch, reg_fps, **KW)
    got = {r.doc_id for r in res.accepted.collect()}
    assert got == {11, 13}
    # the registry shard comes from the same pass: fingerprints for
    # exactly the fingerprinted survivors (13 is too short to have any)
    assert {r.doc_id for r in res.accepted_fps.collect()} == {11}


def test_winnow_ingest_stream_and_registry(spark, tmp_path):
    src = tmp_path / "drop"
    _df(spark, [(1, A), (2, NOVEL)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        **KW,
    )
    q = ingest_winnow_stream(spark, str(src), **kw)
    q.awaitTermination(120)
    assert {
        r.doc_id for r in read_corpus(spark, kw["corpus_path"]).collect()
    } == {1, 2}

    # second drop: span-containment redelivery of 1, one novel doc,
    # one short doc
    fresh = _words(9, 25)
    _df(spark, [(10, CONTAINS_A), (11, fresh), (12, SHORT)]).coalesce(
        1
    ).write.mode("append").parquet(str(src))
    q = ingest_winnow_stream(spark, str(src), **kw)
    q.awaitTermination(120)
    corpus = {
        r.doc_id for r in read_corpus(spark, kw["corpus_path"]).collect()
    }
    assert corpus == {1, 2, 11, 12}
    # registry holds fingerprints only for fingerprinted survivors
    reg = read_corpus(spark, kw["registry_path"])
    assert {r.doc_id for r in reg.collect()} == {1, 2, 11}


def test_winnow_ingest_replay_idempotent(spark, tmp_path):
    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        **KW,
    )
    _winnow_sink(_df(spark, [(1, A)]), 0, **kw)
    batch1 = _df(spark, [(10, CONTAINS_A), (11, NOVEL)])
    _winnow_sink(batch1, 1, **kw)
    first = sorted(
        (r.doc_id, r.text)
        for r in read_corpus(spark, kw["corpus_path"]).collect()
    )
    # crash-replay: the SAME batch_id re-runs; the probe must not see
    # batch 1's own registry rows (11 would self-reject otherwise)
    _winnow_sink(batch1, 1, **kw)
    again = sorted(
        (r.doc_id, r.text)
        for r in read_corpus(spark, kw["corpus_path"]).collect()
    )
    assert first == again
    assert {d for d, _ in first} == {1, 11}


def test_winnow_first_batch_all_short_docs_no_wedge(spark, tmp_path):
    """Round-9 advisory: a first batch of all short (< w+k-1 token)
    docs is accepted but yields a ZERO-ROW registry write — a dir
    with only _SUCCESS. Stamping the commit marker for that write
    made every later probe raise RegistryLostError (marker present,
    UNABLE_TO_INFER_SCHEMA): a permanent crash loop. The marker must
    only be stamped once a registry shard actually lands data."""
    from nsl_kdd_spark.streaming.ingest import registry_committed

    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        **KW,
    )
    _winnow_sink(_df(spark, [(1, SHORT)]), 0, **kw)
    # corpus accepted the short doc; registry got zero rows -> the
    # marker must NOT exist yet
    assert {r.doc_id for r in read_corpus(spark, kw["corpus_path"])
            .collect()} == {1}
    assert not registry_committed(spark, kw["registry_path"])

    # next batch probes the empty-dir registry: must fall back to
    # empty (not RegistryLostError) and commit normally
    _winnow_sink(_df(spark, [(2, A)]), 1, **kw)
    assert {r.doc_id for r in read_corpus(spark, kw["corpus_path"])
            .collect()} == {1, 2}
    assert registry_committed(spark, kw["registry_path"])

    # and the registry now rejects a containment redelivery
    _winnow_sink(_df(spark, [(3, CONTAINS_A)]), 2, **kw)
    assert {r.doc_id for r in read_corpus(spark, kw["corpus_path"])
            .collect()} == {1, 2}


def test_winnow_registry_boilerplate_guard(spark):
    # handcrafted registry fingerprint table: fp "hot0" sits in 6
    # registry docs (> max_fp_df=3 -> boilerplate, must not count),
    # fps "rare1"/"rare2" in one doc each. A batch doc whose only
    # registry overlap is the hot fp passes; one sharing the two
    # rare fps with a single doc is rejected.
    reg_rows = [(i, "hot0") for i in range(6)]
    reg_rows += [(1, "rare1"), (1, "rare2")]
    reg_fps = spark.createDataFrame(reg_rows, "doc_id long, fp string")

    from unittest import mock

    from nsl_kdd_spark.streaming import winnow_ingest as wi

    batch = _df(spark, [(100, "x"), (101, "y")])
    fake_fps = spark.createDataFrame(
        [(100, 1, "hot0"), (100, 2, "xonly"),
         (101, 1, "rare1"), (101, 2, "rare2")],
        "doc_id long, pos int, fp string",
    )
    # pin the fingerprint extraction so the guard logic is tested in
    # isolation from md5 selection (the two fake docs share no fp, so
    # the real within-batch pair join finds nothing)
    with mock.patch.object(
        wi, "winnow_fingerprints", return_value=fake_fps
    ):
        got = {r.doc_id for r in wi.winnow_dedup_batch(
            batch, reg_fps, k=4, w=4, min_shared=2, max_fp_df=3
        ).accepted.collect()}
    assert got == {100}  # 101 rejected via the two rare fps of doc 1

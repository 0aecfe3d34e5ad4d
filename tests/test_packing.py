"""Sequence packing (operators/packing.py): distributed prefix sum
equivalence and next-fit bin invariants. q82 oracle-checks pack_chunks
against DuckDB's windowed running sum; these tests pin the pieces the
oracle can't see — partition-count independence and the no-split
next-fit contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsl_kdd_spark.operators.packing import (
    pack_chunks,
    pack_next_fit,
    with_global_cumsum,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_cumsum_matches_single_partition_window(spark):
    docs = _docs(spark)
    got = {
        r.doc_id: r.c
        for r in with_global_cumsum(docs, "doc_id", "n_chars", "c").collect()
    }
    rows = sorted(
        docs.select("doc_id", "n_chars").collect(), key=lambda r: r.doc_id
    )
    run = 0
    for r in rows:
        run += r.n_chars
        assert got[r.doc_id] == run


def test_cumsum_partition_count_invariant(spark):
    docs = _docs(spark)
    a = with_global_cumsum(docs, "doc_id", "n_chars", "c", num_partitions=1)
    b = with_global_cumsum(docs, "doc_id", "n_chars", "c", num_partitions=7)
    assert sorted(map(tuple, a.select("doc_id", "c").collect())) == sorted(
        map(tuple, b.select("doc_id", "c").collect())
    )


def test_pack_chunks_covers_stream_without_gaps(spark):
    budget = 1000
    out = pack_chunks(_docs(spark), "doc_id", "n_chars", budget).collect()
    total = sum(r.n_chars for r in out)
    n_bins_expected = (total + budget - 1) // budget
    assert max(r.last_bin for r in out) == n_bins_expected - 1
    for r in out:
        start = r.stream_end - r.n_chars
        assert r.first_bin == start // budget
        assert 0 <= r.offset_in_first < budget
        assert r.n_bins == r.last_bin - r.first_bin + 1


def test_pack_next_fit_respects_budget_and_order(spark):
    budget = 2000
    docs = _docs(spark).filter(F.col("n_chars") <= budget)
    out = pack_next_fit(docs, "doc_id", "n_chars", budget).collect()
    assert len(out) == docs.count()
    fills: dict[int, int] = {}
    for r in out:
        fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_chars
    assert all(v <= budget for v in fills.values())
    # docs in one bin are contiguous in doc_id order: sort rows by
    # doc_id, bin ids must be non-decreasing within a partition
    by_part: dict[int, list] = {}
    for r in sorted(out, key=lambda r: r.doc_id):
        by_part.setdefault(r.bin_id >> 32, []).append(r.bin_id & 0xFFFFFFFF)
    for seq in by_part.values():
        assert seq == sorted(seq)


def test_explode_chunks_reconstructs_documents(spark):
    """Concatenating a doc's pieces in offset order must reproduce the
    doc exactly; concatenating a bin's pieces must fill the budget for
    every bin but the last."""
    from nsl_kdd_spark.operators.packing import assemble_bins, explode_chunks

    budget = 512
    docs = _docs(spark)
    pieces = explode_chunks(docs, "doc_id", "text", budget).collect()
    by_doc: dict[int, list] = {}
    for r in pieces:
        by_doc.setdefault(r.doc_id, []).append(r)
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, rs in by_doc.items():
        rebuilt = "".join(
            r.piece for r in sorted(rs, key=lambda r: r.piece_offset_in_doc)
        )
        assert rebuilt == texts[doc_id]
    bins = assemble_bins(
        explode_chunks(docs, "doc_id", "text", budget), budget
    ).collect()
    last = max(r.bin_id for r in bins)
    for r in bins:
        assert r.n_chars == budget or r.bin_id == last
        assert len(r.text) == r.n_chars


def test_pack_next_fit_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 10)], "id long, sz long"
    )
    out = {r.id: r for r in pack_next_fit(df, "id", "sz", budget=50).collect()}
    assert out[2].bin_id not in (out[1].bin_id, out[3].bin_id)
    assert out[2].bin_fill == 99


def test_sample_hash_monotone_subset_and_determinism(spark):
    """sample_hash(f1) ⊆ sample_hash(f2) for f1 <= f2 (same salt) —
    the md5-bucket threshold is monotone, which is what makes grown
    samples supersets instead of reshuffles; different salts draw
    independent samples."""
    from nsl_kdd_spark.operators.relational import sample_hash

    docs = _docs(spark)
    s10 = {r.doc_id for r in sample_hash(docs, "doc_id", 0.10).select("doc_id").collect()}
    s30 = {r.doc_id for r in sample_hash(docs, "doc_id", 0.30).select("doc_id").collect()}
    assert s10 <= s30
    n = docs.count()
    assert abs(len(s30) / n - 0.30) < 0.10
    again = {r.doc_id for r in sample_hash(docs, "doc_id", 0.10).select("doc_id").collect()}
    assert again == s10
    other = {r.doc_id for r in sample_hash(docs, "doc_id", 0.10, salt="x").select("doc_id").collect()}
    assert other != s10


def test_sample_hash_weighted_extremes(spark):
    """weight 0 keeps nothing, weight 1 keeps everything, and a mixed
    weight column keeps exactly the rows whose bucket clears their own
    threshold."""
    from pyspark.sql import functions as F

    from nsl_kdd_spark.operators.relational import sample_hash, sample_hash_weighted

    docs = _docs(spark)
    assert sample_hash_weighted(docs, "doc_id", F.lit(0.0)).count() == 0
    assert sample_hash_weighted(docs, "doc_id", F.lit(1.0)).count() == docs.count()
    half = sample_hash_weighted(docs, "doc_id", F.lit(0.5))
    assert half.count() == sample_hash(docs, "doc_id", 0.5).count()


def test_packing_and_cumsum_empty_input(spark):
    """Empty corpora must flow through the prefix sum and packers
    without special-casing (day-0 pipelines, filtered-to-empty
    partitions)."""
    from nsl_kdd_spark.operators.packing import (
        pack_chunks,
        pack_next_fit,
        with_global_cumsum,
    )

    empty = _docs(spark).filter("doc_id < 0")
    assert with_global_cumsum(empty, "doc_id", "n_chars", "c").count() == 0
    assert pack_chunks(empty, "doc_id", "n_chars", 100).count() == 0
    assert pack_next_fit(empty, "doc_id", "n_chars", 100).count() == 0


def test_stratified_sample_respects_per_stratum_fractions(spark):
    from nsl_kdd_spark.operators.relational import (
        sample_hash,
        sample_hash_stratified,
    )

    docs = _docs(spark)
    out = sample_hash_stratified(
        docs, "doc_id", "lang", {"en": 0.3}, default=0.0
    )
    got = {r.doc_id for r in out.select("doc_id").collect()}
    en = docs.filter("lang = 'en'")
    want = {r.doc_id for r in sample_hash(en, "doc_id", 0.3).select("doc_id").collect()}
    assert got == want  # non-en strata fully dropped, en matches uniform 0.3


def test_rank_bins_partition_invariant_and_balanced(spark):
    from nsl_kdd_spark.operators.relational import rank_bins

    df = spark.createDataFrame(
        [(i, float((i * 37) % 100)) for i in range(100)], "id long, s double"
    )
    a = {r["id"]: (r["rank"], r["bin"])
         for r in rank_bins(df.repartition(1), "s", "id", 4).collect()}
    b = {r["id"]: (r["rank"], r["bin"])
         for r in rank_bins(df.repartition(7), "s", "id", 4).collect()}
    assert a == b  # bins are a pure function of the data, not layout
    from collections import Counter

    counts = Counter(v[1] for v in a.values())
    assert counts == {0: 25, 1: 25, 2: 25, 3: 25}  # equal-count bins
    # ranks follow (score, id) order
    ordered = sorted(a.items(), key=lambda kv: kv[1][0])
    scores = [((k * 37) % 100, k) for k, _ in ordered]
    assert scores == sorted(scores)


def test_rank_bins_empty_input(spark):
    from nsl_kdd_spark.operators.relational import rank_bins

    df = spark.createDataFrame([], "id long, s double")
    out = rank_bins(df, "s", "id", 4)
    assert out.count() == 0 and {"rank", "bin"} <= set(out.columns)


def test_shuffle_deterministic_is_a_permutation_and_layout_invariant(spark):
    from nsl_kdd_spark.operators.relational import shuffle_deterministic

    df = spark.range(0, 300).withColumnRenamed("id", "k")
    a = {r["k"]: r["shuffle_pos"] for r in
         shuffle_deterministic(df.coalesce(1), "k", salt="e1").collect()}
    b = {r["k"]: r["shuffle_pos"] for r in
         shuffle_deterministic(df.repartition(9), "k", salt="e1").collect()}
    assert a == b                              # layout-invariant
    assert sorted(a.values()) == list(range(1, 301))  # dense permutation
    c = {r["k"]: r["shuffle_pos"] for r in
         shuffle_deterministic(df, "k", salt="e2").collect()}
    assert c != a                              # new salt = new epoch


def test_sliding_chunks_overlap_and_edges(spark):
    """Chunk offsets, overlap reassembly, short-doc single chunk,
    empty-doc omission, and the arg guard."""
    import pytest

    from nsl_kdd_spark.operators.packing import sliding_chunks

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, "")],
        ["doc_id", "text"],
    )
    out = sliding_chunks(docs, "doc_id", "text", size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: len 10 -> ceil((10-4)/3)+1 = 3 chunks at 0,3,6
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [(r.chunk_offset, r.chunk) for r in c1] == [
        (0, "abcd"), (3, "defg"), (6, "ghij")]
    assert all(r.n_chunks == 3 for r in c1)
    # consecutive chunks overlap by size - stride = 1 char
    assert c1[0].chunk[-1] == c1[1].chunk[0]
    # short doc: one chunk, whole text
    assert [(r.chunk_id, r.chunk) for r in by_doc[2]] == [(0, "xy")]
    # empty doc emits nothing
    assert 3 not in by_doc
    # stride > size leaves gaps but is legal; stride 0 is not
    with pytest.raises(ValueError, match="size and stride"):
        sliding_chunks(docs, "doc_id", "text", size=4, stride=0)
    # default stride = size -> disjoint cover
    disjoint = sliding_chunks(docs, "doc_id", "text", size=4).collect()
    d1 = sorted([r for r in disjoint if r.doc_id == 1],
                key=lambda r: r.chunk_id)
    assert "".join(r.chunk for r in d1) == "abcdefghij"

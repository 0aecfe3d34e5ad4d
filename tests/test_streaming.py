"""Structured Streaming path: the SAME windowing operators used by the
batch oracle queries, executed as a real stream (availableNow trigger,
memory sink), must produce the batch answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsl_kdd_spark.functions.scalar import exact_sum
from nsl_kdd_spark.sources.parquet import load_tables
from nsl_kdd_spark.streaming.events import (
    dedup_stream,
    read_events_stream,
    tumbling_agg,
)
from tests.conftest import SF_SMOKE


def _run_to_memory(stream_df, name: str, spark):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_tumbling_equals_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    agg_args = dict(
        ts_col="ts", duration="1 day", keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n"), exact_sum("value").alias("total_value")],
    )
    got = _run_to_memory(
        tumbling_agg(stream, watermark="1 hour", **agg_args), "t_tumble", spark
    )
    want = tumbling_agg(load_tables(spark, SF_SMOKE).events, **agg_args)
    cols = ["window_start", "window_end", "event_type", "n", "total_value"]
    assert sorted(map(tuple, got.select(cols).collect())) == \
           sorted(map(tuple, want.select(cols).collect()))


def test_streaming_dedup_drops_duplicates(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    # events are unique by event_id; dedup by user_id keeps 1 per user
    deduped = dedup_stream(stream, ["user_id"], "ts", watermark="90 days")
    q = (
        deduped.writeStream.format("memory").queryName("t_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(distinct user_id) AS u FROM t_dedup").first()
    n_users = load_tables(spark, SF_SMOKE).events.select("user_id").distinct().count()
    assert got["n"] == got["u"] == n_users


def test_stream_static_enrich_and_foreach_batch_sink(spark, tmp_path):
    """Stream-static broadcast join == batch join; foreachBatch sink is
    idempotent (one __batch_id partition per micro-batch, overwritten
    on replay, exactly-once rows)."""
    from nsl_kdd_spark.streaming.events import (
        enrich_stream, write_stream_foreach_batch,
    )

    events = load_tables(spark, SF_SMOKE).events
    dim = (
        events.select("user_id").distinct()
        .withColumn("tier", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
    )
    stream = read_events_stream(spark, SF_SMOKE)
    enriched = enrich_stream(stream, dim, on="user_id")
    out = str(tmp_path / "out")
    q = write_stream_foreach_batch(enriched, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    want = enrich_stream(events, dim, on="user_id")
    assert got.count() == want.count() == events.count()
    assert sorted(map(tuple, got.select("event_id", "tier").collect())) == \
           sorted(map(tuple, want.select("event_id", "tier").collect()))
    assert got.select("__batch_id").distinct().count() >= 1


def test_stream_stream_interval_join_matches_batch(spark):
    """click -> purchase-within-10-min attribution as a real
    stream-stream join (two file sources, both watermarked, interval
    predicate) must produce exactly the batch join's rows."""
    from nsl_kdd_spark.streaming.events import interval_join

    def split_sides(df):
        return (
            df.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id"),
            df.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id"),
        )

    sl, sr = split_sides(read_events_stream(spark, SF_SMOKE))
    # second independent source: stream self-joins need two sources
    sr = split_sides(read_events_stream(spark, SF_SMOKE))[1]
    joined = interval_join(sl, sr, key="user_id", upper_seconds=600)
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM attrib")

    events = load_tables(spark, SF_SMOKE).events
    bl, br = split_sides(events)
    want = interval_join(bl, br, key="user_id", upper_seconds=600)
    assert want.count() > 0
    assert got.count() == want.count()
    key_cols = ["event_id", "event_id_r"]
    assert got.select(key_cols).subtract(want.select(key_cols)).count() == 0
    assert want.select(key_cols).subtract(got.select(key_cols)).count() == 0


def test_deduplicating_ingest_stream(spark, tmp_path):
    """Streaming registry ingest: JSONL shards drain through
    availableNow batches; redeliveries of already-accepted docs are
    rejected, novel docs accumulate, registry tracks the corpus."""
    import json

    from nsl_kdd_spark.streaming.ingest import ingest_documents_stream, read_corpus

    src = tmp_path / "drop"
    src.mkdir()
    docs1 = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog tonight"},
        {"doc_id": 2, "text": "colorless green ideas sleep furiously beneath the winter moon"},
    ]
    (src / "batch1.jsonl").write_text("\n".join(json.dumps(d) for d in docs1))

    kw = dict(
        schema="doc_id long, text string",
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_hashes=8, band_size=1, threshold=0.5, shingle_n=2,
    )
    q = ingest_documents_stream(spark, str(src), **kw)
    q.awaitTermination(120)
    assert {r.doc_id for r in read_corpus(spark, kw["corpus_path"]).collect()} == {1, 2}

    # second drop: one near-redelivery of doc 1, one novel, one internal dup pair
    docs2 = [
        {"doc_id": 10, "text": "the quick brown fox jumps over the lazy cat tonight"},
        {"doc_id": 11, "text": "entirely new material about tuning shuffle partitions in spark"},
        {"doc_id": 12, "text": "entirely new material about tuning shuffle partitions in flink"},
    ]
    (src / "batch2.jsonl").write_text("\n".join(json.dumps(d) for d in docs2))
    q = ingest_documents_stream(spark, str(src), **kw)
    q.awaitTermination(120)

    corpus = {r.doc_id for r in read_corpus(spark, kw["corpus_path"]).collect()}
    assert corpus == {1, 2, 11}  # 10 = registry dup, 12 = within-batch dup
    registry = {r.doc_id for r in read_corpus(spark, kw["registry_path"]).collect()}
    assert registry == corpus


def test_streaming_scd2_maintenance_equals_one_shot(spark, tmp_path):
    """foreachBatch + merge.scd2_apply_batch maintains a SCD2 table
    from a micro-batched change stream; after the stream drains, the
    table equals the one-shot scd2_history of the full log."""
    import json

    from nsl_kdd_spark.operators.merge import scd2_apply_batch, scd2_history

    events = [
        {"k": k, "ts": t, "attr": ["A", "A", "B", "C", "C"][(t // 10) % 5],
         "seq": k * 1000 + t}
        for k in range(3)
        for t in range(0, 100, 10)
    ]
    src = tmp_path / "scd2_events"
    src.mkdir()
    # two drop files -> at least two micro-batches in arrival order
    half = len(events) // 2
    for i, chunk in enumerate((events[:half], events[half:])):
        (src / f"part{i}.jsonl").write_text(
            "\n".join(json.dumps(e) for e in sorted(chunk, key=lambda e: e["ts"]))
        )

    schema = "k long, ts long, attr string, seq long"
    state = {"history": spark.createDataFrame(
        [], "k long, attr string, effective_from long, "
            "effective_to long, is_current boolean")}

    def apply_batch(batch_df, _batch_id):
        state["history"] = spark.createDataFrame(
            scd2_apply_batch(
                state["history"], batch_df, ["k"], "ts", ["attr"], "seq"
            ).collect(),
            state["history"].schema,
        )

    stream = (
        spark.readStream.format("json").schema(schema)
        .option("maxFilesPerTrigger", 1).load(str(src))
    )
    q = stream.writeStream.foreachBatch(apply_batch) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)

    df = spark.createDataFrame(events)
    cols = ["k", "attr", "effective_from", "effective_to", "is_current"]
    want = sorted(map(tuple, scd2_history(
        df.select("k", "ts", "attr", "seq"), ["k"], "ts", ["attr"], "seq"
    ).select(*cols).collect()))
    got = sorted(map(tuple, state["history"].select(*cols).collect()))
    assert got == want


def test_streaming_windowed_expectations_equals_batch(spark):
    """expect_windowed's docstring claims the aggregation shape is
    watermark/stream-compatible — prove it: the same operator over a
    real stream (availableNow, memory sink) produces the batch rows."""
    from nsl_kdd_spark.operators.quality import expect_windowed

    rules = {"value_under_100": "value <= 100", "not_error": "event_type <> 'error'"}
    stream = read_events_stream(spark, SF_SMOKE)
    got = _run_to_memory(
        expect_windowed(stream.withWatermark("ts", "1 hour"), "ts", rules, "1 day"),
        "t_wexpect",
        spark,
    )
    want = expect_windowed(
        load_tables(spark, SF_SMOKE).events, "ts", rules, "1 day"
    )
    cols = ["window_start", "rule", "n_rows", "n_violations", "violation_ppm"]
    assert sorted(map(tuple, got.select(cols).collect())) == \
           sorted(map(tuple, want.select(cols).collect()))


def test_media_ingest_stream_perceptual_registry(spark, tmp_path):
    """Streaming media ingest: parquet drops drain through
    availableNow batches; a re-encoded copy of an accepted image
    (jpeg of a stored png) is rejected against the registry without
    re-reading payloads, within-batch twins keep the lowest id, and
    novel images accumulate."""
    import numpy as np

    from nsl_kdd_spark.multimodal.binary import MEDIA_SCHEMA
    from nsl_kdd_spark.multimodal.codecs import bmp_encode, jpeg_encode, png_encode
    from nsl_kdd_spark.streaming.ingest import read_corpus
    from nsl_kdd_spark.streaming.media_ingest import ingest_media_stream

    def img(kind):
        yy, xx = np.mgrid[0:16, 0:16]
        if kind == 0:
            return np.stack([(xx * 9) % 256, (yy * 13) % 256,
                             ((xx + yy) * 5) % 256], -1).astype(np.uint8)
        return (((xx // 2 + yy // 2) % 2) * 255).astype(np.uint8)[
            ..., None].repeat(3, 2)

    def media_rows(items):
        return spark.createDataFrame(
            [(i, "image", "image/mixed", len(p), bytearray(p))
             for i, p in items],
            MEDIA_SCHEMA,
        )

    src = tmp_path / "drop"
    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_hamming=6, bands=8,
    )
    # batch 1: gradient (id 1) + checkerboard (id 2) + bmp twin of the
    # gradient (id 3 -> within-batch near-dup, keep lowest id 1)
    media_rows([
        (1, png_encode(img(0))), (2, png_encode(img(1))),
        (3, bmp_encode(img(0))),
    ]).coalesce(1).write.mode("append").parquet(str(src))
    q = ingest_media_stream(spark, str(src), **kw)
    q.awaitTermination(120)
    assert {r.media_id for r in
            read_corpus(spark, kw["corpus_path"]).collect()} == {1, 2}

    # batch 2: jpeg re-encode of the stored gradient (10 -> registry
    # reject) + a genuinely new random image (11)
    rng = np.random.default_rng(3)
    novel = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    media_rows([
        (10, jpeg_encode(img(0), quality=90)), (11, png_encode(novel)),
    ]).coalesce(1).write.mode("append").parquet(str(src))
    q = ingest_media_stream(spark, str(src), **kw)
    q.awaitTermination(120)

    corpus = {r.media_id for r in
              read_corpus(spark, kw["corpus_path"]).collect()}
    assert corpus == {1, 2, 11}
    registry = {r.media_id for r in
                read_corpus(spark, kw["registry_path"]).collect()}
    assert registry == corpus


def test_media_ingest_on_error_skip_quarantines_corrupt(spark, tmp_path):
    """A corrupt payload in the drop must not wedge the stream under
    on_error='skip': the stream drains, the bad blob never enters
    corpus/registry, and the good image in the same batch lands."""
    import numpy as np

    from nsl_kdd_spark.multimodal.binary import MEDIA_SCHEMA
    from nsl_kdd_spark.multimodal.codecs import png_encode
    from nsl_kdd_spark.streaming.ingest import read_corpus
    from nsl_kdd_spark.streaming.media_ingest import ingest_media_stream

    yy, xx = np.mgrid[0:16, 0:16]
    good = png_encode(
        np.stack([(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256],
                 -1).astype(np.uint8))
    corrupt = good[: len(good) // 3]       # truncated png
    src = tmp_path / "drop"
    spark.createDataFrame(
        [(1, "image", "image/png", len(good), bytearray(good)),
         (2, "image", "image/png", len(corrupt), bytearray(corrupt))],
        MEDIA_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(src))

    q = ingest_media_stream(
        spark, str(src),
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_error="skip",
    )
    q.awaitTermination(120)
    assert {r.media_id for r in
            read_corpus(spark, str(tmp_path / "corpus")).collect()} == {1}

    import pytest
    with pytest.raises(ValueError, match="on_error"):
        ingest_media_stream(
            spark, str(src),
            corpus_path=str(tmp_path / "c2"),
            registry_path=str(tmp_path / "r2"),
            checkpoint_dir=str(tmp_path / "k2"),
            on_error="bogus",
        )


def test_media_signatures_bit_exact_under_quarantine(spark):
    """Round-4 advisory regression: a batch holding one undecodable
    payload makes pandas infer float64 for the phash column, and a
    float64->int64 cast garbles every signature in the batch (>=2^63
    saturates to INT64_MIN, others lose low bits). Signatures must
    come through bit-exact — including hashes with bit 63 set — with
    the corrupt payload quarantined."""
    from nsl_kdd_spark.multimodal.binary import MEDIA_SCHEMA
    from nsl_kdd_spark.streaming.media_ingest import _signatures

    hashes = {
        b"a": 18446459269608898560,        # bit 63 set (advisory repro)
        b"b": (1 << 63) | 0x7FF,           # bit 63 + low bits that a
                                           # float64 round-trip drops
        b"c": 1234567890123456789,         # below 2^63, odd low bits
    }

    def fake_hash(payload: bytes) -> int:
        if payload == b"x":
            raise ValueError("corrupt")
        return hashes[bytes(payload)]

    media = spark.createDataFrame(
        [(i, "image", "m", 1, bytearray(p))
         for i, p in enumerate([b"a", b"x", b"b", b"c"])],
        MEDIA_SCHEMA,
    )
    got = {
        r.media_id: r.phash % (1 << 64)    # back to unsigned
        for r in _signatures(media, fake_hash, on_error="skip").collect()
    }
    assert got == {0: hashes[b"a"], 2: hashes[b"b"], 3: hashes[b"c"]}

    # strict mode with a bit-63 hash must not overflow the int64 cast
    ok = media.filter("media_id != 1")
    strict = {
        r.media_id: r.phash % (1 << 64)
        for r in _signatures(ok, fake_hash, on_error="fail").collect()
    }
    assert strict == got


def test_media_ingest_replay_never_self_dedups(spark, tmp_path):
    """Round-4 advisory regression: foreachBatch is at-least-once — a
    batch that crashed after writing its registry partition but before
    the checkpoint commit is re-delivered with the same batch_id. The
    replay must NOT read its own prior signatures back (every survivor
    would self-match at hamming 0 and the dynamic-partition overwrite
    would replace the batch's output with EMPTY partitions)."""
    import numpy as np

    from nsl_kdd_spark.multimodal.binary import MEDIA_SCHEMA
    from nsl_kdd_spark.multimodal.codecs import jpeg_encode, png_encode
    from nsl_kdd_spark.streaming.ingest import read_corpus
    from nsl_kdd_spark.streaming.media_ingest import _media_sink

    yy, xx = np.mgrid[0:16, 0:16]
    grad = np.stack([(xx * 9) % 256, (yy * 13) % 256,
                     ((xx + yy) * 5) % 256], -1).astype(np.uint8)
    rng = np.random.default_rng(5)
    novel = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)

    def rows(items):
        return spark.createDataFrame(
            [(i, "image", "image/mixed", len(p), bytearray(p))
             for i, p in items], MEDIA_SCHEMA)

    from nsl_kdd_spark.multimodal.codecs import phash64

    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        max_hamming=6, bands=8, hash_fn=phash64, on_error="fail",
    )
    _media_sink(rows([(1, png_encode(grad))]), 0, **kw)
    batch1 = rows([
        (10, jpeg_encode(grad, quality=90)),    # registry dup -> reject
        (11, png_encode(novel)),                # novel -> accept
    ])
    _media_sink(batch1, 1, **kw)
    assert {r.media_id for r in
            read_corpus(spark, kw["corpus_path"]).collect()} == {1, 11}

    # crash-replay: same batch_id, registry already holds 11's phash
    _media_sink(batch1, 1, **kw)
    assert {r.media_id for r in
            read_corpus(spark, kw["corpus_path"]).collect()} == {1, 11}
    assert {r.media_id for r in
            read_corpus(spark, kw["registry_path"]).collect()} == {1, 11}


def test_document_ingest_replay_never_self_dedups(spark, tmp_path):
    """Text-ingest twin of the media replay test: re-running a batch
    with the same batch_id (at-least-once redelivery) must reproduce
    its corpus/registry partitions, not empty-overwrite them."""
    from nsl_kdd_spark.streaming.ingest import _document_sink, read_corpus

    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        id_col="doc_id", text_col="text",
        num_hashes=8, band_size=1, threshold=0.5, shingle_n=2,
    )
    batch0 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string")
    _document_sink(batch0, 0, **kw)
    batch1 = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy cat tonight"),
         (11, "entirely new material about tuning shuffle partitions")],
        "doc_id long, text string")
    _document_sink(batch1, 1, **kw)
    assert {r.doc_id for r in
            read_corpus(spark, kw["corpus_path"]).collect()} == {1, 11}

    _document_sink(batch1, 1, **kw)   # crash-replay of batch 1
    assert {r.doc_id for r in
            read_corpus(spark, kw["corpus_path"]).collect()} == {1, 11}
    assert {r.doc_id for r in
            read_corpus(spark, kw["registry_path"]).collect()} == {1, 11}


def test_media_ingest_128bit_registry(spark, tmp_path):
    """bits=128 ingest (the scale signature): same accept/reject
    semantics as the 64-bit path — registry re-encode rejected,
    within-batch twin keeps lowest id, novel accepted — with the
    two-long phash_hi/phash_lo registry layout."""
    import numpy as np

    from nsl_kdd_spark.multimodal.binary import MEDIA_SCHEMA
    from nsl_kdd_spark.multimodal.codecs import bmp_encode, jpeg_encode, png_encode
    from nsl_kdd_spark.streaming.ingest import read_corpus
    from nsl_kdd_spark.streaming.media_ingest import ingest_media_stream

    yy, xx = np.mgrid[0:16, 0:16]
    grad = np.stack([(xx * 9) % 256, (yy * 13) % 256,
                     ((xx + yy) * 5) % 256], -1).astype(np.uint8)
    rng = np.random.default_rng(9)
    novel = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)

    def rows(items):
        return spark.createDataFrame(
            [(i, "image", "image/mixed", len(p), bytearray(p))
             for i, p in items], MEDIA_SCHEMA)

    src = tmp_path / "drop"
    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_hamming=6, bands=8, bits=128,
    )
    rows([(1, png_encode(grad)),
          (2, bmp_encode(grad))]).coalesce(1).write.mode(
        "append").parquet(str(src))
    q = ingest_media_stream(spark, str(src), **kw)
    q.awaitTermination(120)
    assert {r.media_id for r in
            read_corpus(spark, kw["corpus_path"]).collect()} == {1}

    rows([(10, jpeg_encode(grad, quality=85)),
          (11, png_encode(novel))]).coalesce(1).write.mode(
        "append").parquet(str(src))
    q = ingest_media_stream(spark, str(src), **kw)
    q.awaitTermination(120)
    reg = read_corpus(spark, kw["registry_path"])
    assert set(reg.columns) == {"media_id", "phash_hi", "phash_lo"}
    assert {r.media_id for r in reg.collect()} == {1, 11}

    import pytest
    with pytest.raises(ValueError, match="bits"):
        ingest_media_stream(
            spark, str(src), corpus_path=str(tmp_path / "c"),
            registry_path=str(tmp_path / "r"),
            checkpoint_dir=str(tmp_path / "k"), bits=32)


def test_media_signatures_128bit_quarantine_bit_exact(spark):
    """bits=128 signature extraction under quarantine: tuple hashes
    with bit 63 set in either half must fold bit-exactly to the
    two-long layout, corrupt payloads dropped."""
    from nsl_kdd_spark.multimodal.binary import MEDIA_SCHEMA
    from nsl_kdd_spark.streaming.media_ingest import _signatures

    hashes = {
        b"a": (18446459269608898560, 7),
        b"b": ((1 << 63) | 0x7FF, (1 << 64) - 1),
    }

    def fake_hash(payload: bytes):
        if payload == b"x":
            raise ValueError("corrupt")
        return hashes[bytes(payload)]

    media = spark.createDataFrame(
        [(i, "image", "m", 1, bytearray(p))
         for i, p in enumerate([b"a", b"x", b"b"])],
        MEDIA_SCHEMA,
    )
    got = {
        r.media_id: (r.phash_hi % (1 << 64), r.phash_lo % (1 << 64))
        for r in _signatures(
            media, fake_hash, on_error="skip", bits=128
        ).collect()
    }
    assert got == {0: hashes[b"a"], 2: hashes[b"b"]}


def test_streaming_drift_monitor_equals_batch_psi(spark, tmp_path):
    """PSI drift monitor: each micro-batch's report must equal
    batch-mode psi_drift(baseline, that batch) bit-for-bit, reports
    accumulate per batch, and a drifted batch scores higher than an
    in-distribution one."""
    from pyspark.sql import functions as F

    from nsl_kdd_spark.operators.quality import psi_drift
    from nsl_kdd_spark.streaming.drift import (
        monitor_drift_stream, read_drift_reports,
    )

    baseline = spark.range(2000).select(
        (F.pmod(F.col("id") * 37, F.lit(100)) / 10.0).alias("v"))
    src = tmp_path / "drop"
    # drop 1: same generator (in-distribution)
    spark.range(500).select(
        (F.pmod(F.col("id") * 53, F.lit(100)) / 10.0).alias("v")
    ).coalesce(1).write.mode("append").parquet(str(src))
    kw = dict(
        schema="v double", baseline=baseline, value_col="v",
        out_path=str(tmp_path / "monitor"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        lo=0.0, hi=10.0, n_bins=10,
    )
    q = monitor_drift_stream(spark, str(src), **kw)
    q.awaitTermination(120)
    # drop 2: shifted distribution (drifted)
    spark.range(500).select(
        (5.0 + F.pmod(F.col("id") * 53, F.lit(50)) / 10.0).alias("v")
    ).coalesce(1).write.mode("append").parquet(str(src))
    q = monitor_drift_stream(spark, str(src), **kw)
    q.awaitTermination(120)

    reports = read_drift_reports(spark, kw["out_path"])
    totals = {r.batch_id: r.t for r in reports.groupBy("batch_id")
              .agg(F.sum("psi_u").alias("t")).collect()}
    assert set(totals) == {0, 1}
    assert totals[1] > totals[0]            # drift detected
    assert totals[1] > 250_000              # "action" band in micro-units

    # batch 1's report == batch-mode psi_drift on the same rows
    # (regenerate the second drop's exact content)
    b1 = spark.range(500).select(
        (5.0 + F.pmod(F.col("id") * 53, F.lit(50)) / 10.0).alias("v"))
    want = {(r.bin): (r.n_base, r.n_target, r.psi_u) for r in psi_drift(
        baseline, b1, "v", lo=0.0, hi=10.0, n_bins=10).collect()}
    got = {r.bin: (r.n_base, r.n_target, r.psi_u) for r in
           reports.filter("batch_id = 1").collect()}
    assert got == want


def test_streaming_categorical_drift_monitor(spark, tmp_path):
    """Categorical drift monitor: per-batch report equals batch-mode
    psi_drift_categorical, unknown values land in __other__, and a
    class-mix shift scores above the stable batch."""
    from pyspark.sql import functions as F

    from nsl_kdd_spark.operators.quality import psi_drift_categorical
    from nsl_kdd_spark.streaming.drift import (
        monitor_drift_stream_categorical, read_drift_reports,
    )

    cats = ["a", "b", "c"]
    mk = lambda weights: F.element_at(
        F.array(*[F.lit(c) for c in ("a", "a", "a", "b", "b", "c", "zz")]),
        (F.pmod(F.col("id") * weights, F.lit(7)) + 1).cast("int"))
    baseline = spark.range(1400).select(mk(3).alias("k"))
    src = tmp_path / "drop"
    spark.range(700).select(mk(5).alias("k")).coalesce(1) \
        .write.mode("append").parquet(str(src))
    kw = dict(
        schema="k string", baseline=baseline, cat_col="k",
        categories=cats, out_path=str(tmp_path / "monitor"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = monitor_drift_stream_categorical(spark, str(src), **kw)
    q.awaitTermination(120)
    # shifted mix: everything becomes 'c'
    spark.range(700).select(F.lit("c").alias("k")).coalesce(1) \
        .write.mode("append").parquet(str(src))
    q = monitor_drift_stream_categorical(spark, str(src), **kw)
    q.awaitTermination(120)

    reports = read_drift_reports(spark, kw["out_path"])
    assert set(r.category for r in reports.collect()) == {
        "a", "b", "c", "__other__"}
    totals = {r.batch_id: r.t for r in reports.groupBy("batch_id")
              .agg(F.sum("psi_u").alias("t")).collect()}
    assert totals[1] > totals[0] and totals[1] > 250_000

    b1 = spark.range(700).select(F.lit("c").alias("k"))
    want = {r.category: r.psi_u for r in psi_drift_categorical(
        baseline.select("k"), b1, "k", cats).collect()}
    got = {r.category: r.psi_u for r in
           reports.filter("batch_id = 1").collect()}
    assert got == want


def test_registry_commit_marker_blocks_empty_fallback(spark, tmp_path):
    """Round-8 advisory: a registry that HAS committed (its commit
    marker exists) but whose parquet data is gone must FAIL the
    micro-batch, not silently dedup against an assumed-empty registry
    — that state re-admits every known duplicate with no signal."""
    import os
    import shutil

    import pytest

    from nsl_kdd_spark.streaming.ingest import (
        _REGISTRY_MARKER,
        RegistryLostError,
        _document_sink,
        read_corpus,
        registry_committed,
    )

    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        id_col="doc_id", text_col="text",
        num_hashes=8, band_size=1, threshold=0.5, shingle_n=2,
    )
    reg = tmp_path / "registry"
    # fresh start: no marker, empty fallback admitted
    assert not registry_committed(spark, str(reg))
    batch0 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string")
    _document_sink(batch0, 0, **kw)
    # the sink stamped the marker after its registry write
    assert registry_committed(spark, str(reg))
    assert (reg / _REGISTRY_MARKER).exists()

    # lifecycle "loss": delete the data partitions, keep the marker
    for entry in os.listdir(reg):
        if entry.startswith("__batch_id="):
            shutil.rmtree(reg / entry)
    batch1 = spark.createDataFrame(
        [(2, "entirely new material about tuning shuffle partitions")],
        "doc_id long, text string")
    with pytest.raises(RegistryLostError):
        _document_sink(batch1, 1, **kw)
    # corpus untouched by the failed batch
    assert {r.doc_id for r in
            read_corpus(spark, kw["corpus_path"]).collect()} == {1}

    # operator explicitly accepts the cold start by removing the
    # marker -> the fallback is admitted again
    (reg / _REGISTRY_MARKER).unlink()
    _document_sink(batch1, 1, **kw)
    assert {r.doc_id for r in
            read_corpus(spark, kw["corpus_path"]).collect()} == {1, 2}
    assert registry_committed(spark, str(reg))


def test_registry_empty_first_batch_does_not_wedge(spark, tmp_path):
    """Round-9 advisory: an EMPTY first micro-batch (zero-row source
    file) writes a zero-row registry partition — dir exists, no
    parquet. Stamping the commit marker there turned the next probe's
    UNABLE_TO_INFER_SCHEMA into RegistryLostError on every replay."""
    from nsl_kdd_spark.streaming.ingest import (
        _document_sink,
        read_corpus,
        registry_committed,
    )

    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        id_col="doc_id", text_col="text",
        num_hashes=8, band_size=1, threshold=0.5, shingle_n=2,
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    _document_sink(empty, 0, **kw)
    assert not registry_committed(spark, kw["registry_path"])

    batch1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string")
    _document_sink(batch1, 1, **kw)  # must not raise RegistryLostError
    assert {r.doc_id for r in
            read_corpus(spark, kw["corpus_path"]).collect()} == {1}
    assert registry_committed(spark, kw["registry_path"])


def test_registry_marker_idempotent_and_crash_tolerant(spark, tmp_path):
    """Marker mechanics: stamping twice is a no-op, and a crash
    BETWEEN the registry write and the marker (marker absent, data
    present) stays correct — the next probe reads committed data, so
    the marker is never consulted."""
    from nsl_kdd_spark.streaming.ingest import (
        _REGISTRY_MARKER,
        _document_sink,
        mark_registry_committed,
        read_corpus,
        registry_committed,
    )

    kw = dict(
        corpus_path=str(tmp_path / "corpus"),
        registry_path=str(tmp_path / "registry"),
        id_col="doc_id", text_col="text",
        num_hashes=8, band_size=1, threshold=0.5, shingle_n=2,
    )
    reg = tmp_path / "registry"
    batch0 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string")
    _document_sink(batch0, 0, **kw)
    mark_registry_committed(spark, str(reg))  # idempotent re-stamp
    assert registry_committed(spark, str(reg))

    # simulate crash-before-marker: data present, marker removed
    (reg / _REGISTRY_MARKER).unlink()
    batch1 = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy cat tonight"),
         (11, "entirely new material about tuning shuffle partitions")],
        "doc_id long, text string")
    _document_sink(batch1, 1, **kw)  # probe succeeds on real data
    assert {r.doc_id for r in
            read_corpus(spark, kw["corpus_path"]).collect()} == {1, 11}
    assert registry_committed(spark, str(reg))  # re-stamped

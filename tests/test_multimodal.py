"""Multimodal binary-column plumbing: schema, Arrow batch path,
deterministic fake decode, strict-stub behavior."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    attach_payload_metadata,
    decode_media,
    synthesize_media,
)
from nsl_kdd_spark.sources.parquet import load_tables
from tests.conftest import SF_SMOKE


def test_media_schema_and_fake_decode(spark):
    docs = load_tables(spark, SF_SMOKE).documents.limit(20)
    media = synthesize_media(spark, docs, "text", "doc_id")
    assert [f.name for f in media.schema.fields] == [f.name for f in MEDIA_SCHEMA.fields]

    feats = decode_media(media).collect()
    assert len(feats) == 20
    # digest must equal md5 of the utf-8 payload, computed independently
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for row in feats:
        want = hashlib.md5(texts[row["media_id"]].encode()).hexdigest()
        assert row["digest"] == want
        assert row["n_bytes"] == len(texts[row["media_id"]].encode())


def test_metadata_stays_jvm_side(spark):
    docs = load_tables(spark, SF_SMOKE).documents.limit(5)
    media = attach_payload_metadata(synthesize_media(spark, docs, "text", "doc_id"))
    rows = media.select("media_id", "n_bytes", "crc").collect()
    assert all(r["n_bytes"] > 0 and r["crc"] is not None for r in rows)


def test_strict_decode_is_stubbed(spark):
    docs = load_tables(spark, SF_SMOKE).documents.limit(1)
    media = synthesize_media(spark, docs, "text", "doc_id")
    with pytest.raises(NotImplementedError):
        decode_media(media, strict=True)


def test_resize_media_deterministic_fake(spark):
    docs = load_tables(spark, SF_SMOKE).documents.limit(20)
    media = synthesize_media(spark, docs, "text", "doc_id")
    from nsl_kdd_spark.multimodal.binary import resize_media

    out = resize_media(media, width=8, height=4)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r.payload) == 32 for r in rows)  # exactly w*h bytes
    assert all(r.width == 8 and r.height == 4 for r in rows)
    # deterministic: same input -> same bytes
    again = {r.media_id: r.payload for r in resize_media(media, 8, 4).collect()}
    assert all(again[r.media_id] == r.payload for r in rows)
    with pytest.raises(NotImplementedError):
        resize_media(media, 8, 4, strict=True)


def test_sample_frames_one_to_many(spark):
    docs = load_tables(spark, SF_SMOKE).documents.limit(5)
    media = synthesize_media(spark, docs, "text", "doc_id")
    from nsl_kdd_spark.multimodal.binary import sample_frames

    out = sample_frames(media, every_n=2, max_frames=3, frame_bytes=16)
    per = {r[0]: r[1] for r in out.groupBy("media_id").count().collect()}
    n_bytes = {r.media_id: r.n_bytes for r in media.collect()}
    for mid, cnt in per.items():
        total_frames = (n_bytes[mid] + 15) // 16
        assert cnt == min((total_frames + 1) // 2, 3)
    # frame timestamps reflect the pre-sampling index at 25 fps
    f = {(r.media_id, r.frame_idx): r.ts_ms for r in out.collect()}
    assert all(f[(m, i)] == i * 2 * 40 for (m, i) in f)
    with pytest.raises(NotImplementedError):
        sample_frames(media, strict=True)

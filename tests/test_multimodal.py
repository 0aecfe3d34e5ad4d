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

"""Multimodal column plumbing: schema, Arrow batch shapes, kernel
injection, deterministic fakes."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.operators import multimodal as mm

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)


def test_media_schema_and_checksum(spark, docs):
    m = mm.attach_fake_media(docs)
    media_type = m.schema["media"].dataType
    # same structure; nullability flags differ between declared schema
    # and expression-derived struct (md5/octet_length are non-null)
    def shape(dt):
        return [(f.name, f.dataType.simpleString()) for f in dt.fields]
    assert shape(media_type) == shape(mm.MEDIA_SCHEMA)
    row = m.select("media", "text").first()
    assert bytes(row["media"]["content"]) == row["text"].encode()
    assert row["media"]["meta"]["n_bytes"] == len(row["text"].encode())
    assert (
        row["media"]["meta"]["checksum"]
        == hashlib.md5(row["text"].encode()).hexdigest()
    )


def test_media_features_batch_shape_and_values(spark, docs):
    m = mm.attach_fake_media(docs)
    feats = mm.media_features(m, dim=8)
    assert [f.name for f in feats.schema.fields] == [
        "doc_id", "mime", "n_bytes", "features",
    ]
    got = {r["doc_id"]: r for r in feats.collect()}
    for r in docs.select("doc_id", "text").limit(5).collect():
        want = mm.fake_image_features(r["text"].encode(), dim=8)
        assert got[r["doc_id"]]["features"] == want
        assert got[r["doc_id"]]["n_bytes"] == len(r["text"].encode())
        assert got[r["doc_id"]]["mime"] == "image/fake"


def test_media_features_kernel_injection(spark, docs):
    m = mm.attach_fake_media(docs)
    feats = mm.media_features(m, kernel=lambda b: [float(len(b))])
    row = feats.first()
    assert row["features"] == [float(row["n_bytes"])]


def test_media_resize_rebuilds_meta(spark, docs):
    m = mm.attach_fake_media(docs)
    resized = mm.media_resize(m, width=32, height=16)
    row = resized.select("media").first()
    content = bytes(row["media"]["content"])
    assert content.startswith(b"resized:32x16:")
    # meta recomputed against the NEW payload
    assert row["media"]["meta"]["n_bytes"] == len(content)
    assert row["media"]["meta"]["checksum"] == hashlib.md5(content).hexdigest()


def test_media_frame_sample_explodes(spark, docs):
    m = mm.attach_fake_media(docs)
    frames = mm.media_frame_sample(m, every_n=4)
    one = docs.select("doc_id", "text").first()
    want = mm.fake_frame_sample(one["text"].encode(), 4)
    got = (
        frames.where(F.col("doc_id") == one["doc_id"])
        .orderBy("frame_idx")
        .collect()
    )
    assert [bytes(r["frame"]) for r in got] == want
    assert [r["frame_idx"] for r in got] == list(range(len(want)))


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")

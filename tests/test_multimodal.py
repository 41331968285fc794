"""Multimodal column tests: binary payload plumbing, mapInPandas decode
schema/batching, stub gating."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.multimodal import (
    attach_binary,
    decode_images,
    extract_audio_features,
    resize_images,
    sample_video_frames,
)

ROWS = [(i, f"document number {i} with some text payload {'x' * i}") for i in range(12)]


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    return attach_binary(docs).cache()


def test_attach_binary_schema_and_meta(media):
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.filter("doc_id = 3").first()
    text = ROWS[3][1]
    assert bytes(row["payload"]) == text.encode()
    meta = row["media_meta"]
    assert meta["n_bytes"] == len(text.encode())
    assert meta["sha256"] == hashlib.sha256(text.encode()).hexdigest()
    assert meta["magic"] == meta["sha256"][:8]
    assert meta["media_type"] == "image"  # 3 % 3 == 0


def test_media_type_partitioning(media):
    counts = {r["mt"]: r["n"] for r in media.groupBy(F.col("media_meta.media_type").alias("mt")).count().withColumnRenamed("count", "n").collect()}
    assert counts == {"image": 4, "audio": 4, "video": 4}


def test_decode_images_deterministic_fake(media):
    out = decode_images(media, fake=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {0, 3, 6, 9}  # only image rows reach Python
    for doc_id, r in rows.items():
        h = hashlib.sha256(ROWS[doc_id][1].encode()).hexdigest()
        assert r["width"] == 16 + (ord(h[0]) * 256 + ord(h[1])) % 512
        assert r["height"] == 16 + (ord(h[2]) * 256 + ord(h[3])) % 512
        assert 1 <= r["channels"] <= 4


def test_decode_images_real_path_is_stubbed(media):
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        decode_images(media, fake=False).collect()


def test_resize_preserves_aspect(spark, media):
    decoded = decode_images(media, fake=True)
    resized = resize_images(decoded, max_side=64).collect()
    for r in resized:
        assert max(r["new_width"], r["new_height"]) <= 64
        if r["width"] >= r["height"]:
            assert r["new_width"] >= r["new_height"] - 1
        else:
            assert r["new_height"] >= r["new_width"] - 1


def test_audio_features(media):
    out = extract_audio_features(media, fake=True).collect()
    assert {r["doc_id"] for r in out} == {1, 4, 7, 10}
    for r in out:
        assert r["sample_rate"] in (8000, 16000, 22050, 44100)
        assert abs(r["duration_s"] - r["n_samples"] / r["sample_rate"]) < 1e-9


def test_video_frame_sampling(media):
    frames = sample_video_frames(media, every_n=4, fake=True)
    per_doc = {r["doc_id"]: r["n"] for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(per_doc) == {2, 5, 8, 11}
    for doc_id, n in per_doc.items():
        payload_len = len(ROWS[doc_id][1].encode())
        expected = len(range(0, max(1, payload_len // 8), 4))
        assert n == expected

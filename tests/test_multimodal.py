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


def test_embed_documents_fake_deterministic(spark):
    from mwas_rfam_spark.operators.multimodal import embed_documents

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "different"), (4, None)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["embedding"] for r in embed_documents(docs, dim=8).collect()}
    assert len(out) == 4 and all(len(v) == 8 for v in out.values())
    assert out[1] == out[2]  # same text -> same vector (content-keyed)
    assert out[1] != out[3]
    for v in out.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5  # unit norm
    again = {r["doc_id"]: r["embedding"] for r in embed_documents(docs, dim=8).collect()}
    assert out == again  # deterministic across runs


def test_embed_documents_custom_encoder_and_downstream(spark):
    """A caller-supplied encoder runs batched, and the output feeds the
    ANN family directly (schema compatibility check)."""
    import numpy as np

    from mwas_rfam_spark.operators.multimodal import embed_documents
    from mwas_rfam_spark.operators.similarity import brute_force_topk

    def encoder(texts):
        # length + vowel-count toy featurizer, vectorized per batch
        return np.asarray(
            [[float(len(t)), float(sum(c in "aeiou" for c in t)), 1.0] for t in texts],
            dtype="float32",
        )

    docs = spark.createDataFrame(
        [(i, "x" * i + "a" * (i % 3)) for i in range(1, 21)], ["doc_id", "text"]
    )
    emb = embed_documents(docs, dim=3, encoder=encoder).withColumnRenamed(
        "doc_id", "vec_id"
    )
    top = brute_force_topk(emb, [5.0, 1.0, 1.0], k=3, id_col="vec_id", vec_col="embedding")
    assert top.count() == 3


def test_embed_documents_bad_encoder_shape_raises(spark):
    import numpy as np

    from mwas_rfam_spark.operators.multimodal import embed_documents

    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    bad = embed_documents(docs, dim=4, encoder=lambda ts: np.zeros((len(ts), 2)))
    import pytest as _pt

    with _pt.raises(Exception, match="encoder returned shape"):
        bad.collect()

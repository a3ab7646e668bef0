"""Multimodal plumbing tests: schemas, Arrow batch shapes, determinism
of the fake kernels, and cross-checks of decode stats against JVM-side
equivalents (length/crc32 are computable both ways).
"""

import pytest
from pyspark.sql import functions as F

from hdk_spark.operators import multimodal as mm
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_SMOKE)
    return spark.table("documents")


@pytest.fixture(scope="module")
def images(docs):
    return mm.synth_media_from_documents(docs, "image")


def _same_shape(a, b) -> bool:
    # nullability differs between literal-built structs and declared
    # schemas; names + types are the contract
    return a.simpleString() == b.simpleString()


def test_media_schema_roundtrip(images):
    assert [f.name for f in images.schema.fields] == ["media_id", "data", "meta"]
    assert _same_shape(images.schema["meta"].dataType, mm.IMAGE_META)
    assert images.count() > 0


def test_decode_image_stats_match_jvm(spark, images):
    decoded = mm.decode_image(images)
    # byte_len and crc32 recomputed JVM-side must agree with the
    # mapInPandas kernel output on every row
    check = decoded.withColumn("jvm_len", F.octet_length("data")).withColumn(
        "jvm_crc", F.crc32("data")
    )
    bad = check.filter(
        (F.col("jvm_len") != F.col("byte_len")) | (F.col("jvm_crc") != F.col("crc32"))
    )
    assert bad.count() == 0


def test_decode_deterministic(images):
    a = {r["media_id"]: (r["pixel_mean"], r["pixel_std"])
         for r in mm.decode_image(images).collect()}
    b = {r["media_id"]: (r["pixel_mean"], r["pixel_std"])
         for r in mm.decode_image(images).collect()}
    assert a == b


def test_real_codec_path_raises(images):
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        mm.decode_image(images, use_real_codec=True).collect()


def test_extract_features_shape_and_determinism(images):
    feats = mm.extract_features(images, dim=32)
    assert "data" not in feats.columns and "embedding" in feats.columns
    rows = feats.limit(5).collect()
    assert all(len(r["embedding"]) == 32 for r in rows)
    assert all(all(-1.0 <= v <= 1.0 for v in r["embedding"]) for r in rows)
    again = {r["media_id"]: r["embedding"] for r in feats.collect()}
    for r in rows:
        assert again[r["media_id"]] == r["embedding"]


def test_features_feed_similarity_pipeline(images):
    """Decoded features must plug straight into the ANN operator —
    the multimodal → embedding → similarity pipeline composes."""
    from hdk_spark.operators.similarity import cosine_topk

    feats = (
        mm.extract_features(images, dim=16)
        .withColumnRenamed("media_id", "vec_id")
        .select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    )
    ids = [r["vec_id"] for r in feats.limit(2).collect()]
    top = cosine_topk(feats, ids, k=3)
    assert top.count() == 2 * 3


def test_resize_rewrites_meta_keeps_bytes(images):
    resized = mm.resize_images(images, 224, 224)
    assert resized.schema == images.schema
    r = resized.limit(3).collect()
    assert all(row["meta"]["width"] == 224 and row["meta"]["height"] == 224 for row in r)
    # bytes pass through (stub)
    orig = {row["media_id"]: row["data"] for row in images.limit(3).collect()}
    assert all(orig[row["media_id"]] == row["data"] for row in r)


def test_sample_frames_counts(docs):
    videos = mm.synth_media_from_documents(docs, "video").limit(50)
    frames = mm.sample_frames(videos, every_n=30)
    got = {r["media_id"]: r["cnt"] for r in
           frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    expect = {
        r["media_id"]: (int(r["meta"]["n_frames"]) + 29) // 30
        for r in videos.collect()
    }
    assert got == expect


def test_audio_meta_schema(docs):
    audio = mm.synth_media_from_documents(docs, "audio")
    assert _same_shape(audio.schema["meta"].dataType, mm.AUDIO_META)
    r = audio.limit(1).collect()[0]
    assert r["meta"]["sample_rate"] == 16000

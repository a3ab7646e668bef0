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


def test_real_codec_refuses_non_png(images):
    # the synthetic payloads are raw text bytes, not PNG: the real path
    # must refuse to fabricate pixel statistics for undecodable data
    with pytest.raises(Exception, match="not a PNG"):
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


# ---------------------------------------------------------------------------
# real codec path (stdlib-zlib PNG + stdlib-wave WAV; no PIL/ffmpeg)
# ---------------------------------------------------------------------------


def _random_rgb(h, w, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype="uint8")


def test_png_roundtrip_all_channel_counts():
    import numpy as np

    from hdk_spark.operators import png

    for ch in (1, 2, 3, 4):
        rng = np.random.RandomState(ch)
        img = rng.randint(0, 256, size=(13, 7, ch), dtype="uint8")
        out = png.decode_png(png.encode_png(img))
        assert out.shape == (13, 7, ch)
        assert (out == img).all()


def test_png_decode_all_row_filters():
    """Hand-build scanlines with every filter type (Sub/Up/Average/
    Paeth per the spec) and check the decoder inverts each exactly."""
    import struct
    import zlib

    import numpy as np

    from hdk_spark.operators import png

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 6, 3), dtype="uint8").astype(np.int32)
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        filt = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))
        prev = cur

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))
    out = png.decode_png(data)
    assert (out == img.astype("uint8")).all()


def test_decode_image_real_codec_on_real_pngs(spark):
    import numpy as np

    from hdk_spark.operators import png

    imgs = [_random_rgb(8, 11, s) for s in range(5)]
    rows = [
        (i, bytearray(png.encode_png(im)), {"width": 11, "height": 8,
         "channels": 3, "format": "image/png"})
        for i, im in enumerate(imgs)
    ]
    df = spark.createDataFrame(rows, mm.media_table_schema("image"))
    got = {r["media_id"]: r for r in mm.decode_image(df, use_real_codec=True).collect()}
    for i, im in enumerate(imgs):
        assert got[i]["pixel_mean"] == pytest.approx(float(im.mean()))
        assert got[i]["pixel_std"] == pytest.approx(float(im.std()))


def test_resize_images_real_codec(spark):
    from hdk_spark.operators import png

    rows = [
        (0, bytearray(png.encode_png(_random_rgb(32, 48))),
         {"width": 48, "height": 32, "channels": 3, "format": "image/png"})
    ]
    df = spark.createDataFrame(rows, mm.media_table_schema("image"))
    out = mm.resize_images(df, 16, 8, use_real_codec=True).collect()[0]
    decoded = png.decode_png(bytes(out["data"]))
    assert decoded.shape == (8, 16, 3)
    assert out["meta"]["width"] == 16 and out["meta"]["height"] == 8


def test_decode_audio_real_wav(spark):
    import io
    import wave

    import numpy as np

    sr, n = 8000, 1600
    t = np.arange(n)
    samples = (10000 * np.sin(2 * np.pi * 440 * t / sr)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(samples.tobytes())
    rows = [(0, bytearray(buf.getvalue()),
             {"sample_rate": sr, "n_samples": n, "channels": 1, "codec": "wav"})]
    df = spark.createDataFrame(rows, mm.media_table_schema("audio"))
    out = mm.decode_audio(df, use_real_codec=True).collect()[0]
    assert out["n_samples"] == n and out["sample_rate"] == sr
    expect_rms = float((samples.astype("f8") ** 2).mean() ** 0.5)
    assert out["rms"] == pytest.approx(expect_rms)


def _wav_bytes(samples, sr):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(samples.tobytes())
    return bytearray(buf.getvalue())


def test_audio_features_pure_tone(spark):
    """A 1 kHz sine must put its energy in the right rfft band, a
    spectral centroid near 1 kHz, and ZCR = 2f/sr."""
    import numpy as np

    sr, n, f = 8000, 8000, 1250
    t = np.arange(n)
    samples = (10000 * np.sin(2 * np.pi * f * t / sr)).astype("<i2")
    rows = [(0, _wav_bytes(samples, sr),
             {"sample_rate": sr, "n_samples": n, "channels": 1,
              "codec": "wav"})]
    df = spark.createDataFrame(rows, mm.media_table_schema("audio"))
    out = mm.audio_features(
        df, n_fft=512, hop=256, n_bands=8, use_real_codec=True
    ).collect()[0]
    # bands split the 256 non-DC bins into 8 x 500 Hz ranges;
    # 1250 Hz sits mid-band 2 ((1000, 1500])
    be = out["band_energy"]
    assert len(be) == 8
    assert be.index(max(be)) == 2
    assert out["spectral_centroid_hz"] == pytest.approx(f, rel=0.1)
    assert out["zcr"] == pytest.approx(2 * f / sr, rel=0.05)


def test_audio_features_white_vs_tone_centroid(spark):
    """Deterministic 'white'-ish wideband signal must have a much
    higher centroid than a low tone — the feature separates classes."""
    import numpy as np

    sr, n = 8000, 8000
    t = np.arange(n)
    low = (10000 * np.sin(2 * np.pi * 200 * t / sr)).astype("<i2")
    rng = np.random.RandomState(7)
    wide = (8000 * rng.uniform(-1, 1, n)).astype("<i2")
    rows = [
        (0, _wav_bytes(low, sr),
         {"sample_rate": sr, "n_samples": n, "channels": 1, "codec": "wav"}),
        (1, _wav_bytes(wide, sr),
         {"sample_rate": sr, "n_samples": n, "channels": 1, "codec": "wav"}),
    ]
    df = spark.createDataFrame(rows, mm.media_table_schema("audio"))
    out = {r["media_id"]: r for r in mm.audio_features(
        df, use_real_codec=True).collect()}
    assert out[0]["spectral_centroid_hz"] < 400
    assert out[1]["spectral_centroid_hz"] > 1200


def test_audio_features_fake_path_stable(spark):
    rows = [(0, bytearray(b"abc"), {"sample_rate": 16000, "n_samples": 3,
                                    "channels": 1, "codec": "fake"})]
    df = spark.createDataFrame(rows, mm.media_table_schema("audio"))
    a = mm.audio_features(df).collect()[0]
    b = mm.audio_features(df).collect()[0]
    assert a["band_energy"] == b["band_energy"]
    assert len(a["band_energy"]) == 8


def test_image_phash_neardup_separation(spark):
    """pHash must place noisy/edited copies a few bits from the
    original and unrelated images far away; the block-split hamming
    join must then find exactly the near-dup pairs."""
    import numpy as np

    from hdk_spark.operators.png import encode_png

    rng = np.random.RandomState(3)
    base = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    pert = base.copy()
    pert[:4, :4] = 255  # small local edit
    noise = np.clip(
        base.astype(int) + rng.randint(-8, 9, base.shape), 0, 255
    ).astype(np.uint8)
    other = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    rows = [
        (i, bytearray(encode_png(img)),
         {"width": 64, "height": 64, "channels": 3, "format": "png"})
        for i, img in enumerate([base, pert, noise, other])
    ]
    df = spark.createDataFrame(rows, mm.media_table_schema("image"))
    fps = {r["id"]: r["phash"]
           for r in mm.image_phash(df, use_real_codec=True).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(fps[0], fps[1]) <= 10
    assert ham(fps[0], fps[2]) <= 10
    assert ham(fps[0], fps[3]) > 15
    pairs = {
        (r["id_a"], r["id_b"])
        for r in mm.image_neardup_pairs(
            df, max_hamming=12, use_real_codec=True
        ).collect()
    }
    assert pairs == {(0, 1), (0, 2), (1, 2)}


def test_image_phash_deterministic_and_resize_invariant(spark):
    """Same image at a different resolution hashes within a few bits
    (the 32x32 DCT normalizes scale); reruns are bit-identical."""
    import numpy as np

    from hdk_spark.operators.png import encode_png, resize_nearest

    rng = np.random.RandomState(11)
    # smooth image (random low-res upsampled) so resize is benign
    small = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    img = resize_nearest(small, 64, 64)
    img2 = resize_nearest(small, 96, 96)
    rows = [
        (0, bytearray(encode_png(img)),
         {"width": 64, "height": 64, "channels": 3, "format": "png"}),
        (1, bytearray(encode_png(img2)),
         {"width": 96, "height": 96, "channels": 3, "format": "png"}),
    ]
    df = spark.createDataFrame(rows, mm.media_table_schema("image"))
    a = {r["id"]: r["phash"]
         for r in mm.image_phash(df, use_real_codec=True).collect()}
    b = {r["id"]: r["phash"]
         for r in mm.image_phash(df, use_real_codec=True).collect()}
    assert a == b

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(a[0], a[1]) <= 6


def test_kernels_unpickle_with_foreign_cwd():
    """Pandas-UDF closures referencing hdk_spark module helpers must
    run under a session whose driver cwd is NOT the repo root (the
    external driver's situation): load_tables ships the package via
    addPyFile, so the worker can import hdk_spark without relying on
    the cwd landing on sys.path."""
    import subprocess
    import sys as _sys

    script = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as mod
out = mod.queries()["multimodal_decode"](spark, "/root/testdata/sf0.001")
assert out.count() > 0
print("FOREIGN_CWD_OK")
"""
    r = subprocess.run(
        [_sys.executable, "-c", script], cwd="/tmp",
        capture_output=True, text=True, timeout=300,
    )
    assert "FOREIGN_CWD_OK" in r.stdout, r.stderr[-2000:]


def test_progressive_probe_known_payload(spark):
    """Solid-gray probe: dims/gray derived from text length, decoded
    digest equals md5 of the constant plane (the exactness the
    contract oracle relies on), marker counts prove the stream is a
    multi-scan progressive one."""
    import hashlib

    import pytest as _pytest

    from hdk_spark.operators.multimodal import progressive_probe

    texts = ["x" * 5, "y" * 40, "z" * 123]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id: long, text: string")
    got = {r["id"]: r for r in progressive_probe(df).collect()}
    for i, t in enumerate(texts):
        n = len(t)
        w, h, g = n % 24 + 8, n % 16 + 8, n % 96 + 32
        r = got[i]
        assert (r["width"], r["height"], r["gray"]) == (w, h, g)
        assert r["n_sos"] == 6 and r["n_dri"] == 1
        assert r["pix_md5"] == hashlib.md5(bytes([g]) * (w * h)).hexdigest()
    with _pytest.raises(ValueError, match="quality"):
        progressive_probe(df, quality=50)


# ---------------------------------------------------------------------------
# EXIF (operators/exif.py)
# ---------------------------------------------------------------------------

def test_exif_roundtrip_both_endians():
    from hdk_spark.operators.exif import build_exif_app1, parse_exif

    for be in (False, True):
        app1 = build_exif_app1(
            orientation=6, datetime="2024:01:05 10:00:00",
            make="CamX", model="M2", gps=True, big_endian=be,
        )
        got = parse_exif(b"\xff\xd8" + app1 + b"\xff\xd9")
        assert got == {
            "has_exif": True, "orientation": 6,
            "datetime": "2024:01:05 10:00:00", "make": "CamX",
            "model": "M2", "has_gps": True,
        }, be


def test_exif_totality_on_junk():
    from hdk_spark.operators.exif import build_exif_app1, parse_exif

    assert parse_exif(b"") == parse_exif(None) == {
        "has_exif": False, "orientation": None, "datetime": None,
        "make": None, "model": None, "has_gps": False,
    }
    assert not parse_exif(b"not a jpeg")["has_exif"]
    assert not parse_exif(b"\xff\xd8\xff\xd9")["has_exif"]
    trunc = build_exif_app1(make="LongCameraMakerName")
    r = parse_exif(b"\xff\xd8" + trunc[:16])
    assert r["has_exif"] and r["make"] is None
    # APP1 that is not Exif (XMP) is skipped, later Exif still found
    xmp = b"\xff\xe1\x00\x10http://ns.xmp\x00"
    app1 = build_exif_app1(orientation=2)
    r2 = parse_exif(b"\xff\xd8" + xmp + app1 + b"\xff\xd9")
    assert r2["orientation"] == 2


def test_exif_extract_header_only_never_decodes(spark):
    from hdk_spark.operators.exif import build_exif_app1, exif_extract

    # scan data after SOS is GARBAGE — a pass that touched pixels
    # would fail; the metadata pass must not care
    app1 = build_exif_app1(orientation=8, make="Cam")
    blob = (b"\xff\xd8" + app1 + b"\xff\xda\x00\x04\x01\x00"
            + b"\x99" * 500 + b"\xff\xd9")
    df = spark.createDataFrame([(1, blob), (2, None)],
                               "doc_id: long, data: binary")
    got = {r["doc_id"]: (r["has_exif"], r["orientation"], r["make"])
           for r in exif_extract(df).collect()}
    assert got == {1: (True, 8, "Cam"), 2: (False, None, None)}


def test_image_header_info_real_codecs_no_decode():
    import numpy as np

    from hdk_spark.operators.exif import image_header_info
    from hdk_spark.operators.jpeg import encode_jpeg
    from hdk_spark.operators.png import encode_png

    img = np.full((24, 40, 3), 128, dtype=np.uint8)
    assert image_header_info(encode_png(img)) == {
        "format": "png", "width": 40, "height": 24, "progressive": False}
    assert image_header_info(encode_jpeg(img)) == {
        "format": "jpeg", "width": 40, "height": 24, "progressive": False}
    assert image_header_info(encode_jpeg(img, progressive=True))[
        "progressive"] is True
    # truncating AFTER the SOF/IHDR header must not matter — the gate
    # reads header bytes only
    png = encode_png(img)
    assert image_header_info(png[:40])["width"] == 40
    jpg = encode_jpeg(img)
    assert image_header_info(jpg[:len(jpg) // 2])["width"] == 40
    assert image_header_info(b"junk") == {
        "format": "unknown", "width": None, "height": None,
        "progressive": None}


def test_wav_avi_header_info_real_codecs():
    import io
    import wave

    import numpy as np

    from hdk_spark.operators.avi import encode_avi
    from hdk_spark.operators.exif import avi_header_info, wav_header_info

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(b"\x00\x00" * 2 * 8000)
    assert wav_header_info(buf.getvalue()) == {
        "channels": 2, "sample_rate": 16000, "bits": 16,
        "n_samples": 8000, "duration_ms": 500}
    # header survives payload truncation (fmt chunk precedes data)
    assert wav_header_info(buf.getvalue()[:64])["sample_rate"] == 16000

    frames = [np.full((8, 12, 3), i, dtype=np.uint8) for i in range(5)]
    blob = encode_avi(frames, fps=25)
    assert avi_header_info(blob) == {
        "width": 12, "height": 8, "n_frames": 5,
        "fps_milli": 25000, "duration_ms": 200}
    assert avi_header_info(blob[:128])["n_frames"] == 5  # avih is early
    for junk in (b"", b"RIFF\x00\x00\x00\x00WAVE", b"RIFFxxxxAVI "):
        assert wav_header_info(junk)["sample_rate"] is None
        assert avi_header_info(junk)["n_frames"] is None

"""Baseline JPEG codec tests (pure numpy + stdlib; no libjpeg in the
environment). Shared-bug risk between encoder and decoder is bounded
by construction: the decoder reads quantization/Huffman tables from
the stream's own DQT/DHT segments (not the module constants), the
transform pair is checked as a mathematical identity, and solid-color
images must round-trip EXACTLY (DC-only path has no quantization
loss for flat blocks)."""

import numpy as np
import pytest

from hdk_spark.operators import jpeg
from hdk_spark.operators import multimodal as mm


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def _smooth_rgb(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.clip(np.stack([x * 3 + 10, y * 3 + 5, x + y], axis=-1), 0, 255).astype(
        np.uint8
    )


def test_dct_matrix_is_orthonormal():
    # the transform identity the whole codec rests on
    assert np.allclose(jpeg._D @ jpeg._D.T, np.eye(8), atol=1e-12)
    rng = np.random.RandomState(0)
    block = rng.rand(8, 8) * 255
    back = jpeg._D.T @ (jpeg._D @ block @ jpeg._D.T) @ jpeg._D
    assert np.allclose(back, block, atol=1e-9)


def test_solid_color_roundtrip_exact():
    for color in ([0, 0, 0], [255, 255, 255], [120, 64, 200]):
        img = np.full((24, 40, 3), color, dtype=np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() == 0


def test_smooth_roundtrip_psnr_444_and_420():
    img = _smooth_rgb(50, 70)
    for subsample, floor in ((False, 45.0), (True, 40.0)):
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsample=subsample))
        assert dec.shape == img.shape
        assert _psnr(dec, img) > floor


def test_grayscale_roundtrip():
    y, x = np.mgrid[0:33, 0:41]
    g = np.clip(x * 2 + y, 0, 255).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90))
    assert dec.shape == g.shape and dec.ndim == 2
    assert _psnr(dec, g) > 45.0


def test_noise_roundtrip_high_quality():
    img = np.random.RandomState(3).randint(0, 256, (29, 37, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert dec.shape == img.shape  # odd dims exercise padding/crop
    assert _psnr(dec, img) > 20.0  # noise is the worst case for DCT


def test_decode_determinism():
    data = jpeg.encode_jpeg(_smooth_rgb(16, 24), quality=85)
    a, b = jpeg.decode_jpeg(data), jpeg.decode_jpeg(data)
    assert (a == b).all()


def test_rejects_unsupported_sof_and_garbage():
    img = _smooth_rgb(16, 16)
    data = bytearray(jpeg.encode_jpeg(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC3  # flip SOF0 → SOF3 (lossless — unsupported)
    with pytest.raises(ValueError, match="SOF"):
        jpeg.decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="JPEG"):
        jpeg.decode_jpeg(b"plain text bytes")


def test_mislabeled_progressive_rejected():
    # a baseline stream whose SOF marker is flipped to SOF2 carries a
    # full-band Ss=0..Se=63 scan header — illegal for progressive
    # (DC scans must have Se = 0) and must not decode silently
    img = _smooth_rgb(16, 16)
    data = bytearray(jpeg.encode_jpeg(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se = 0"):
        jpeg.decode_jpeg(bytes(data))


def test_progressive_roundtrip_matches_baseline():
    """The progressive scan script (DC first/refine, two AC bands
    first/refine, EOB-run coding) must reconstruct the EXACT quantized
    coefficients — pixels bit-identical to the baseline encoding."""
    for img, kw in [
        (_smooth_rgb(16, 24), {}),
        (_smooth_rgb(29, 37), {}),                      # odd dims
        (_smooth_rgb(33, 41), {"subsample": True}),     # 4:2:0 MCU walk
        ((np.mgrid[0:16, 0:24][0] * 7 % 256).astype(np.uint8), {}),
        (np.random.RandomState(5).randint(
            0, 256, (24, 24, 3), dtype=np.uint8), {}),  # dense AC runs
        (np.full((8, 8, 3), 77, np.uint8), {}),         # pure-EOB blocks
    ]:
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, **kw))
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=85, progressive=True, **kw)
        )
        assert (base == prog).all()


def test_progressive_header_is_sof2():
    data = jpeg.encode_jpeg(_smooth_rgb(16, 16), progressive=True)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    # multiple scans: one interleaved DC + 2 AC bands x 3 comps, then
    # refinements — 8 SOS markers minimum
    assert data.count(b"\xff\xda") >= 8


def test_decode_image_real_codec_mixed_png_jpeg(spark):
    """Magic-byte dispatch: one media table mixing PNG and JPEG rows
    decodes both through the same mapInPandas kernel."""
    from hdk_spark.operators import png

    rng = np.random.RandomState(1)
    png_img = rng.randint(0, 256, (8, 11, 3), dtype=np.uint8)
    jpg_img = _smooth_rgb(16, 24)
    rows = [
        (0, bytearray(png.encode_png(png_img)),
         {"width": 11, "height": 8, "channels": 3, "format": "image/png"}),
        (1, bytearray(jpeg.encode_jpeg(jpg_img, quality=90)),
         {"width": 24, "height": 16, "channels": 3, "format": "image/jpeg"}),
    ]
    df = spark.createDataFrame(rows, mm.media_table_schema("image"))
    got = {r["media_id"]: r for r in mm.decode_image(df, use_real_codec=True).collect()}
    assert got[0]["pixel_mean"] == pytest.approx(float(png_img.mean()))
    dec = jpeg.decode_jpeg(bytes(rows[1][1]))
    assert got[1]["pixel_mean"] == pytest.approx(float(dec.mean()))


def test_resize_real_codec_keeps_jpeg_format(spark):
    rows = [
        (0, bytearray(jpeg.encode_jpeg(_smooth_rgb(32, 48), quality=90)),
         {"width": 48, "height": 32, "channels": 3, "format": "image/jpeg"})
    ]
    df = spark.createDataFrame(rows, mm.media_table_schema("image"))
    out = mm.resize_images(df, 16, 8, use_real_codec=True).collect()[0]
    assert jpeg.is_jpeg(bytes(out["data"]))  # re-encoded in source format
    dec = jpeg.decode_jpeg(bytes(out["data"]))
    assert dec.shape == (8, 16, 3)
    assert out["meta"]["width"] == 16 and out["meta"]["height"] == 8


def test_progressive_roundtrip_randomized():
    """Seeded random sizes/contents/quality: the progressive scan
    pipeline (EOB-run lengths, ZRL-in-refinement, correction-bit
    buffering) must reproduce baseline pixels on every draw."""
    rng = np.random.RandomState(17)
    for _ in range(6):
        h = int(rng.randint(1, 40))
        w = int(rng.randint(1, 40))
        q = int(rng.choice([35, 60, 85, 95]))
        gray = bool(rng.randint(0, 2))
        shape = (h, w) if gray else (h, w, 3)
        # mix smooth gradients with noise so AC bands hit both
        # long EOB runs and dense coefficient runs
        base = np.fromfunction(
            lambda y, x, *c: (x * 5 + y * 3) % 256, shape
        )
        img = np.clip(
            base + rng.randint(-30, 31, shape), 0, 255
        ).astype(np.uint8)
        b = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q))
        p = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=q, progressive=True)
        )
        assert (b == p).all(), (h, w, q, gray)


def test_decode_image_real_codec_progressive(spark):
    """Progressive payloads flow through the same mapInPandas kernel as
    baseline ones — the magic-byte dispatch doesn't distinguish SOF
    types, the codec does."""
    img = _smooth_rgb(16, 24)
    rows = [
        (0, bytearray(jpeg.encode_jpeg(img, quality=90)),
         {"width": 24, "height": 16, "channels": 3, "format": "image/jpeg"}),
        (1, bytearray(jpeg.encode_jpeg(img, quality=90, progressive=True)),
         {"width": 24, "height": 16, "channels": 3, "format": "image/jpeg"}),
    ]
    df = spark.createDataFrame(rows, mm.media_table_schema("image"))
    got = {r["media_id"]: r
           for r in mm.decode_image(df, use_real_codec=True).collect()}
    # identical pixels → identical stats, different byte streams
    assert got[0]["pixel_mean"] == got[1]["pixel_mean"]
    assert got[0]["pixel_std"] == got[1]["pixel_std"]
    assert got[0]["byte_len"] != got[1]["byte_len"]


def test_restart_markers_roundtrip_both_paths():
    """DRI + RSTn emission exercises the decoders' restart-resync
    paths: baseline MCU resync, progressive interleaved-DC predictor
    reset, and the per-scan EOB-run reset in AC first/refine scans
    (an EOB run may not span a restart interval). Pixels must match
    the marker-free encoding exactly."""
    img = _smooth_rgb(48, 64)
    ref = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
    for kw in (
        {"restart_interval": 3},
        {"restart_interval": 1},
        {"restart_interval": 3, "progressive": True},
        {"restart_interval": 1, "progressive": True},
    ):
        got = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, **kw))
        assert (ref == got).all(), kw
    # markers are actually present
    data = jpeg.encode_jpeg(img, quality=85, restart_interval=3,
                            progressive=True)
    assert b"\xff\xdd" in data
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))


def test_restart_markers_roundtrip_subsampled():
    img = _smooth_rgb(33, 41)
    ref = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, subsample=True))
    for prog in (False, True):
        got = jpeg.decode_jpeg(jpeg.encode_jpeg(
            img, quality=85, subsample=True, progressive=prog,
            restart_interval=2))
        assert (ref == got).all(), prog

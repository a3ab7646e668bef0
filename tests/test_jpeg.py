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


# ---------------------------------------------------------------------------
# foreign scan shapes: the repo's encoder always emits Al 1->0 with the
# (1,5)/(6,63) band split; real libjpeg/mozjpeg scan scripts use deeper
# successive-approximation chains and other splits. This hand-built
# writer emits a THREE-level chain (Al 2 -> 2->1 -> 1->0) over a
# three-way band split to witness _ac_first/_ac_refine at al > 0 and
# multi-step DC refinement — paths no round-trip of our own encoder
# reaches.
# ---------------------------------------------------------------------------


def _encode_progressive_deep(img: np.ndarray, quality: int = 85) -> bytes:
    """Grayscale SOF2 stream with a libjpeg-style deep scan script:
    DC first Al=2 then two DC refines; AC bands (1,2)/(3,20)/(21,63)
    each first at Al=2 then refined 2->1 and 1->0."""
    import struct

    assert img.ndim == 2
    h, w = img.shape
    ql, _ = jpeg._quality_tables(quality)
    by_n, bx_n = -(-h // 8), -(-w // 8)
    pp = np.empty((by_n * 8, bx_n * 8))
    pp[:h, :w] = img.astype(np.float64) - 128.0
    pp[h:, :w] = pp[h - 1 : h, :w]
    pp[:, w:] = pp[:, w - 1 : w]
    blocks = pp.reshape(by_n, 8, bx_n, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,kl->abil", jpeg._D, blocks, jpeg._D.T)
    zz = np.round(
        coef.reshape(by_n, bx_n, 64)[:, :, jpeg.ZIGZAG]
        / ql[jpeg.ZIGZAG][None, None, :]
    ).astype(np.int64)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])
    out += ql[jpeg.ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])  # comp 1, 1x1 sampling, qtable 0
    for tid, (bits, values) in ((0x00, jpeg._PROG_DC), (0x10, jpeg._PROG_AC)):
        out += (b"\xff\xc4" + struct.pack(">H", 19 + len(values))
                + bytes([tid]) + bytes(bits) + bytes(values))
    dc_codes = jpeg._build_codes(*jpeg._PROG_DC)
    ac_codes = jpeg._build_codes(*jpeg._PROG_AC)

    def sos(ss, se, ah, al):
        out.extend(b"\xff\xda" + struct.pack(">HB", 8, 1))
        out.extend(bytes([1, 0x00, ss, se, (ah << 4) | al]))

    # DC first at Al=2 (diffs of v >> 2, python arithmetic shift =
    # T.81 G.1.2.1 point transform)
    sos(0, 0, 0, 2)
    bw = jpeg._BitWriter()
    pred = 0
    for byi in range(by_n):
        for bxi in range(bx_n):
            v = int(zz[byi, bxi, 0]) >> 2
            diff = v - pred
            pred = v
            n = abs(diff).bit_length()
            code, ln = dc_codes[n]
            bw.write(code, ln)
            if n:
                bw.write(diff if diff >= 0 else diff + (1 << n) - 1, n)
    bw.flush()
    out += bw.buf
    # two DC refinement scans: bit 1 then bit 0 of each DC value
    for al in (1, 0):
        sos(0, 0, al + 1, al)
        bw = jpeg._BitWriter()
        for byi in range(by_n):
            for bxi in range(bx_n):
                bw.write((int(zz[byi, bxi, 0]) >> al) & 1, 1)
        bw.flush()
        out += bw.buf
    # AC: three-way band split, first at Al=2, refine 2->1 and 1->0
    bands = ((1, 2), (3, 20), (21, 63))
    for ss, se in bands:
        sos(ss, se, 0, 2)
        bw = jpeg._BitWriter()
        jpeg._encode_ac_first(bw, zz, (by_n, bx_n), ss, se, 2, ac_codes)
        bw.flush()
        out += bw.buf
    for al in (1, 0):
        for ss, se in bands:
            sos(ss, se, al + 1, al)
            bw = jpeg._BitWriter()
            jpeg._encode_ac_refine(bw, zz, (by_n, bx_n), ss, se, al,
                                   ac_codes)
            bw.flush()
            out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_foreign_deep_scan_script():
    """A three-level successive-approximation chain (Al 2->1->0) over a
    three-way spectral split must reconstruct the exact quantized
    coefficients — pixels bit-identical to the repo's own single-level
    progressive encoding (which itself matches baseline)."""
    for img in [
        _smooth_rgb(24, 17)[..., 0],                    # odd dims
        (np.mgrid[0:16, 0:24][0] * 7 % 256).astype(np.uint8),
        np.random.RandomState(11).randint(
            0, 256, (24, 24), dtype=np.uint8),           # dense AC runs
        np.full((8, 8), 77, np.uint8),                   # pure-EOB blocks
    ]:
        ref = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=85, progressive=True))
        deep = jpeg.decode_jpeg(_encode_progressive_deep(img, quality=85))
        assert (ref == deep).all()
    # the deep stream really is multi-scan: 3 DC + 9 AC = 12 SOS
    data = _encode_progressive_deep(
        np.random.RandomState(11).randint(0, 256, (24, 24), dtype=np.uint8))
    assert data.count(b"\xff\xda") == 12


def test_skip_restart_truncated_stream_raises_valueerror():
    """A progressive/baseline stream cut off before an expected RSTn
    must raise a clear ValueError, not IndexError (ADVICE r5)."""
    img = _smooth_rgb(48, 64)
    for prog in (False, True):
        data = jpeg.encode_jpeg(img, quality=85, restart_interval=3,
                                progressive=prog)
        # cut right after the first restart marker position so the
        # decoder's next restart scan runs off the end of the data
        first_rst = min(
            (data.find(bytes([0xFF, 0xD0 + i])) for i in range(8)
             if data.find(bytes([0xFF, 0xD0 + i])) != -1),
        )
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(data[: first_rst + 2])

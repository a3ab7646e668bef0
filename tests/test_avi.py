"""Uncompressed-AVI codec + real video frame sampling: round trip,
seek-sampling correctness, and composition with the image pipeline."""

import numpy as np
import pytest

from hdk_spark.operators import avi
from hdk_spark.operators import multimodal as mm


def _frames(n, h=16, w=24, seed=5):
    rng = np.random.RandomState(seed)
    return [(rng.rand(h, w, 3) * 255).astype(np.uint8) for _ in range(n)]


def test_avi_roundtrip_exact():
    frames = _frames(7)
    data = avi.encode_avi(frames, fps=30)
    back, w, h = avi.decode_avi(data)
    assert (w, h) == (24, 16) and len(back) == 7
    assert all((a == b).all() for a, b in zip(frames, back))


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError, match="not an AVI"):
        avi.decode_avi(b"\x89PNG1234garbage")


def test_iter_frame_chunks_no_copy_offsets():
    frames = _frames(5)
    data = avi.encode_avi(frames)
    w, h, chunks = avi.iter_frame_chunks(data)
    assert [c[0] for c in chunks] == [0, 1, 2, 3, 4]
    # every offset slices out the exact frame payload
    f2 = avi.decode_frame(data, chunks[2][1], chunks[2][2], w, h)
    assert (f2 == frames[2]).all()


def test_sample_frames_real_codec_composes_with_image_pipeline(spark):
    """AVI demux → every-2nd frame as PNG → decode_image stats match
    the source arrays exactly (the multimodal pipeline composes)."""
    from pyspark.sql import functions as F

    frames = _frames(6, seed=9)
    data = avi.encode_avi(frames)
    rows = [(0, bytearray(data),
             {"width": 24, "height": 16, "n_frames": 6, "fps": 30.0,
              "codec": "rawvideo"})]
    df = spark.createDataFrame(rows, mm.media_table_schema("video"))
    out = mm.sample_frames(df, every_n=2, use_real_codec=True).collect()
    assert [(r["media_id"], r["frame_idx"]) for r in out] == [
        (0, 0), (0, 2), (0, 4)]
    img_df = spark.createDataFrame(
        [(r["frame_idx"], r["frame"],
          {"width": 24, "height": 16, "channels": 3, "format": "png"})
         for r in out],
        mm.media_table_schema("image"),
    )
    got = {r["media_id"]: r["pixel_mean"]
           for r in mm.decode_image(img_df, use_real_codec=True).collect()}
    for fi in (0, 2, 4):
        assert got[fi] == pytest.approx(float(frames[fi].mean()))

"""Multimodal plumbing tests: exact decode/resize/frame-sample values
on a tiny fixture, plus the NotImplementedError codec seam."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_bowl_spark.multimodal.media import (
    MEDIA_SCHEMA,
    decode_payload,
    extract_image_features,
    resize_images,
    sample_frames,
)


def media_df(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_fake_tiles_bytes():
    img = decode_payload(b"\x01\x02\x03", "fake", width=2, height=2)
    assert img.shape == (2, 2)
    # tiled [1,2,3,1] -> [[1,2],[3,1]]
    assert img.tolist() == [[1, 2], [3, 1]]


def test_decode_real_format_raises():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG", "png", 1, 1)


def test_decode_empty_payload_zero_fills():
    img = decode_payload(b"", "fake", width=3, height=1)
    assert img.tolist() == [[0, 0, 0]]


def test_extract_image_features_exact(spark):
    df = media_df(
        spark, [(1, "image", "fake", 2, 2, 1, bytearray(b"\x0a\x14\x1e"))]
    )
    r = extract_image_features(df).collect()[0]
    # pixels tiled: [10,20,30,10] -> mean 17.5, max 30, 3 source bytes
    assert (r.media_id, r.n_bytes, r.mean_intensity, r.max_intensity) == (
        1, 3, 17.5, 30,
    )


def test_resize_nearest_neighbor(spark):
    payload = bytearray(range(16))  # 4x4 image 0..15
    df = media_df(spark, [(1, "image", "fake", 4, 4, 1, payload)])
    out = resize_images(df, out_w=2, out_h=2).collect()[0]
    assert (out.width, out.height) == (2, 2)
    resized = np.frombuffer(bytes(out.payload), dtype=np.uint8).reshape(2, 2)
    # rows/cols 0 and 2 of the 4x4 grid
    assert resized.tolist() == [[0, 2], [8, 10]]


def test_sample_frames_every_other(spark):
    payload = bytearray(b"aabbccdd")  # 4 frames x 2 bytes
    rows = [
        (7, "video", "fake", 1, 1, 4, payload),
        (8, "image", "fake", 1, 1, 1, bytearray(b"xx")),  # skipped
    ]
    frames = sample_frames(media_df(spark, rows), every_n=2).collect()
    got = {(r.media_id, r.frame_idx): bytes(r.frame_payload) for r in frames}
    assert got == {(7, 0): b"aa", (7, 2): b"cc"}

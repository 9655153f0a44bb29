"""Unit pins for the REAL PPM (P6) decoder — header tolerance, error
surface, and encode/decode round trip. The end-to-end decode-and-
featurize path is oracle-gated via mm_ppm_decode_stats."""

from __future__ import annotations

import numpy as np
import pytest

from minoan_athenaeum_spark.operators.multimodal import (
    decode_image,
    decode_ppm,
    encode_ppm,
)


def test_round_trip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    out = decode_ppm(encode_ppm(img))
    assert out.shape == (5, 7, 3)
    assert (out == img).all()


def test_header_comments_and_whitespace():
    px = bytes(range(12))  # 2x2 image
    payload = b"P6 # a comment\n# another line\n 2\t2 # dims\n255\n" + px
    img = decode_ppm(payload)
    assert img.shape == (2, 2, 3)
    assert img.tobytes() == px


def test_error_surface():
    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"P3\n1 1\n255\n000")
    with pytest.raises(ValueError, match="truncated PPM pixels"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x01")
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated PPM header"):
        decode_ppm(b"P6\n2 2")
    with pytest.raises(ValueError, match="bad PPM header token"):
        decode_ppm(b"P6\n-2 2\n255\n")


def test_dispatch_by_magic():
    with pytest.raises(NotImplementedError, match="JPEG/PNG"):
        decode_image(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(NotImplementedError, match="JPEG/PNG"):
        decode_image(b"\x89PNG\r\n\x1a\nrest")
    with pytest.raises(ValueError, match="unrecognized image container"):
        decode_image(b"GIF89a....")
    img = decode_image(encode_ppm(np.zeros((1, 1, 3), dtype=np.uint8)))
    assert img.shape == (1, 1, 3)

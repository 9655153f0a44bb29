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


def test_wav_round_trip_and_chunk_walk():
    from minoan_athenaeum_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    rng = np.random.RandomState(11)
    s = rng.randint(-32768, 32768, size=(100, 2), dtype=np.int16)
    rate, out = decode_wav_pcm16(encode_wav_pcm16(s, 44100))
    assert rate == 44100 and out.shape == (100, 2) and (out == s).all()

    # Parser must skip unknown chunks (LIST/INFO before data) and honor
    # word alignment for odd-sized chunks.
    payload = encode_wav_pcm16(s[:4], 8000)
    riff_body = payload[12:]
    fmt_chunk = riff_body[: 8 + 16]
    data_chunk = riff_body[8 + 16 :]
    junk = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # padded
    rebuilt = (
        b"RIFF"
        + (4 + len(fmt_chunk) + len(junk) + len(data_chunk)).to_bytes(4, "little")
        + b"WAVE"
        + fmt_chunk
        + junk
        + data_chunk
    )
    rate, out = decode_wav_pcm16(rebuilt)
    assert rate == 8000 and (out == s[:4]).all()


def test_wav_error_surface():
    from minoan_athenaeum_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    with pytest.raises(ValueError, match="not a RIFF/WAVE"):
        decode_wav_pcm16(b"OggS....rest")
    good = encode_wav_pcm16(np.zeros((4, 1), dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        decode_wav_pcm16(good[:-3])
    # Non-PCM format tag -> explicit codec boundary.
    mutated = bytearray(good)
    mutated[20] = 85  # fmt audio_format -> MP3-ish
    with pytest.raises(NotImplementedError, match="PCM-16"):
        decode_wav_pcm16(bytes(mutated))


def test_video_frame_split():
    from minoan_athenaeum_spark.operators.multimodal import (
        encode_ppm,
        split_ppm_frames,
    )

    rng = np.random.RandomState(5)
    frames = [
        rng.randint(0, 256, size=(3, 4, 3), dtype=np.uint8) for _ in range(5)
    ]
    payload = b"".join(encode_ppm(f) for f in frames)
    out = split_ppm_frames(payload)
    assert len(out) == 5
    for a, b in zip(out, frames):
        assert (a == b).all()
    with pytest.raises(ValueError, match="frame boundary"):
        split_ppm_frames(payload + b"XX")

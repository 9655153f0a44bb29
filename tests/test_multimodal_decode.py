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
    # JPEG/PNG magic now route to the REAL decoders — garbage bodies
    # are parse errors there, not codec boundaries.
    with pytest.raises(ValueError, match="truncated JPEG segment"):
        decode_image(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(ValueError, match="PNG missing IHDR"):
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


# ------------------------------------------------------------- JPEG
# Pure-numpy baseline T.81 codec (operators/jpeg.py). The exactness
# claims are mathematical (DC quant step 8 makes block-constant planes
# lossless); the AC/entropy path is checked against an independent
# bit-by-bit reference decoder written here from the spec, sharing no
# code with the implementation.


def test_jpeg_gray_block_constant_exact():
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    h, w = 16, 24
    img = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = (
                17 + 40 * (by * 3 + bx)
            )
    payload = encode_jpeg_gray(img)
    assert payload[:3] == b"\xff\xd8\xff" and payload[-2:] == b"\xff\xd9"
    out = decode_jpeg(payload)
    assert out.dtype == np.uint8 and out.shape == (h, w)
    assert np.array_equal(out, img)  # bit-exact through the codec


def test_jpeg_color_420_restart_closed_form():
    # Raw-YCbCr 4:2:0 with a restart interval of 1: constant planes
    # decode to the BT.601 closed-form RGB; every MCU boundary crosses
    # an RSTn marker, so DC-predictor reset + marker sync are on the
    # line, and with 8 MCUs the RST index wraps 0..7.
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_ycbcr420,
    )

    h, w = 16, 64  # 1x4 MCUs of 16x16 -> 4 MCUs... widen to wrap RSTn
    h, w = 32, 64  # 2x4 = 8 MCUs
    y = np.full((h, w), 90, dtype=np.uint8)
    cb = np.full((h // 2, w // 2), 140, dtype=np.uint8)
    cr = np.full((h // 2, w // 2), 60, dtype=np.uint8)
    rgb = decode_jpeg(encode_jpeg_ycbcr420(y, cb, cr, restart_interval=1))
    assert rgb.shape == (h, w, 3)
    exp = (
        np.clip(np.round(90 + 1.402 * (60 - 128.0)), 0, 255),
        np.clip(
            np.round(90 - 0.344136 * (140 - 128.0) - 0.714136 * (60 - 128.0)),
            0,
            255,
        ),
        np.clip(np.round(90 + 1.772 * (140 - 128.0)), 0, 255),
    )
    for i in range(3):
        assert np.all(rgb[..., i] == exp[i])


def _reference_decode_gray(payload):
    """Independent slow reference: parse segments with fresh code, read
    the entropy stream bit by bit, reconstruct via a per-pixel cosine
    double sum (no shared matrices with the implementation)."""
    import math

    pos = 2
    qt = {}
    huff = {}
    frame = None
    while True:
        assert payload[pos] == 0xFF
        m = payload[pos + 1]
        ln = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + ln]
        if m == 0xDB:
            b = 0
            while b < len(body):
                qt[body[b] & 15] = list(body[b + 1 : b + 65])
                b += 65
        elif m == 0xC4:
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 15
                bits = list(body[b + 1 : b + 17])
                vals = list(body[b + 17 : b + 17 + sum(bits)])
                table, code, k = {}, 0, 0
                for L in range(1, 17):
                    for _ in range(bits[L - 1]):
                        table[(L, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(cls, tid)] = table
                b += 17 + sum(bits)
        elif m == 0xC0:
            H = int.from_bytes(body[1:3], "big")
            W = int.from_bytes(body[3:5], "big")
            assert body[5] == 1  # gray only
            frame = (H, W, body[8])  # tq of component 1
        elif m == 0xDA:
            td, ta = body[2] >> 4, body[2] & 15
            entropy_start = pos + 2 + ln
            break
        pos += 2 + ln

    H, W, tq = frame
    # bit stream with unstuffing
    bits_list = []
    p = entropy_start
    while p < len(payload):
        b = payload[p]
        if b == 0xFF:
            if p + 1 < len(payload) and payload[p + 1] == 0x00:
                bits_list.extend((b >> i) & 1 for i in range(7, -1, -1))
                p += 2
                continue
            break
        bits_list.extend((b >> i) & 1 for i in range(7, -1, -1))
        p += 1
    bp = [0]

    def getbit():
        v = bits_list[bp[0]]
        bp[0] += 1
        return v

    def huffsym(tab):
        code, L = 0, 0
        while True:
            code = (code << 1) | getbit()
            L += 1
            if (L, code) in tab:
                return tab[(L, code)]

    def receive_extend(t):
        if t == 0:
            return 0
        v = 0
        for _ in range(t):
            v = (v << 1) | getbit()
        return v if v >= (1 << (t - 1)) else v - (1 << t) + 1

    zig = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    bxs, bys = (W + 7) // 8, (H + 7) // 8
    out = np.zeros((bys * 8, bxs * 8))
    pred = 0
    for byi in range(bys):
        for bxi in range(bxs):
            zz = [0] * 64
            t = huffsym(huff[(0, td)])
            pred += receive_extend(t)
            zz[0] = pred
            k = 1
            while k < 64:
                rs = huffsym(huff[(1, ta)])
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break
                k += r
                zz[k] = receive_extend(s)
                k += 1
            # dequant + direct per-pixel IDCT (cosine double sum)
            coef = [0.0] * 64
            for i in range(64):
                coef[zig[i]] = zz[i] * qt[tq][i]
            for py in range(8):
                for px in range(8):
                    acc = 0.0
                    for v in range(8):
                        for u in range(8):
                            cu = 1 / math.sqrt(2) if u == 0 else 1.0
                            cv = 1 / math.sqrt(2) if v == 0 else 1.0
                            acc += (
                                cu * cv / 4.0
                                * coef[v * 8 + u]
                                * math.cos((2 * px + 1) * u * math.pi / 16)
                                * math.cos((2 * py + 1) * v * math.pi / 16)
                            )
                    out[byi * 8 + py, bxi * 8 + px] = acc + 128.0
    return np.clip(np.round(out[:H, :W]), 0, 255).astype(np.uint8)


def test_jpeg_ac_path_matches_independent_reference():
    # An arbitrary (non-block-constant) image exercises the AC
    # run-length/ZRL/EOB machinery; the decode must agree with the
    # spec-derived slow reference on the identical bitstream. Tolerance
    # 1 count for float rounding at exact .5 boundaries between the
    # matrix IDCT and the cosine double sum.
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(24, 40), dtype=np.uint8)
    payload = encode_jpeg_gray(img)
    got = decode_jpeg(payload)
    ref = _reference_decode_gray(payload)
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01  # near-universal bit-exact agreement


def test_jpeg_odd_dimensions_pad_and_crop():
    # Non-multiple-of-8 sizes: encoder pads with edge replication,
    # decoder crops back. Agreement with the independent reference on
    # the same bitstream pins the pad/crop geometry; proximity to the
    # source bounds the quant error (flat AC step 16 -> per-pixel error
    # well under 8·16/8 after IDCT energy spreading).
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(13)
    img = (rng.randint(0, 64, size=(10, 13)) * 4).astype(np.uint8)
    payload = encode_jpeg_gray(img)
    got = decode_jpeg(payload)
    assert got.shape == (10, 13)
    ref = _reference_decode_gray(payload)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 40


def test_jpeg_error_surface():
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"P6 1 1 255 xxx")
    img = np.full((8, 8), 100, dtype=np.uint8)
    good = encode_jpeg_gray(img)
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])  # truncated mid-stream
    # progressive (SOF2) DECODES now; a baseline stream relabeled SOF2
    # is malformed progressive (its single scan claims Ss=0,Se=63) and
    # must fail loudly, not decode garbage
    mutated = bytearray(good)
    sof = mutated.find(b"\xff\xc0")
    mutated[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan with Se"):
        decode_jpeg(bytes(mutated))
    # arithmetic-coded SOF9 stays an explicit boundary
    mutated2 = bytearray(good)
    mutated2[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF marker 0xc9"):
        decode_jpeg(bytes(mutated2))


def test_jpeg_and_png_dispatch():
    from minoan_athenaeum_spark.operators.multimodal import decode_image
    from minoan_athenaeum_spark.operators.jpeg import encode_jpeg_gray
    from minoan_athenaeum_spark.operators.png import encode_png

    img = np.full((8, 16), 55, dtype=np.uint8)
    out = decode_image(encode_jpeg_gray(img))
    assert np.array_equal(out, img)
    rgb = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    assert np.array_equal(decode_image(encode_png(rgb)), rgb)


# -------------------------------------------------------------- PNG
# Pure numpy + stdlib zlib (operators/png.py). Lossless, so every round
# trip must be bit-exact; the filter bank is pinned by hand-building a
# stream that uses all five filter types.


def test_png_round_trips_all_color_types():
    from minoan_athenaeum_spark.operators.png import decode_png, encode_png

    rng = np.random.RandomState(3)
    for shape in [(5, 7), (4, 6, 3), (3, 5, 4), (6, 2, 2)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape and np.array_equal(out, img), shape


def test_png_all_five_filters_decode():
    import struct
    import zlib

    from minoan_athenaeum_spark.operators.png import _PNG_MAGIC, decode_png

    h, w, ch = 5, 6, 3
    img = (
        np.arange(h * w * ch, dtype=np.int64).reshape(h, w, ch) * 11 % 256
    ).astype(np.uint8)
    flat = img.reshape(h, w * ch).astype(np.int64)
    raw = bytearray()
    for y in range(h):
        f = [0, 1, 2, 3, 4][y]
        raw.append(f)
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, dtype=np.int64)
        enc = np.zeros(w * ch, dtype=np.int64)
        for x in range(w * ch):
            left = cur[x - ch] if x >= ch else 0
            ul = prev[x - ch] if x >= ch else 0
            up = prev[x]
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                )
            enc[x] = (cur[x] - pred) % 256
        raw += bytes(enc.astype(np.uint8))

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    payload = (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def test_png_error_surface():
    import struct
    import zlib

    from minoan_athenaeum_spark.operators.png import (
        _PNG_MAGIC,
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\xff\xd8\xffJFIF")
    rng = np.random.RandomState(9)
    good = encode_png(rng.randint(0, 256, size=(30, 30), dtype=np.uint8))
    # cut mid-IDAT (clipping only IEND is harmless by design — the
    # pixel data is complete without it)
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(good[: len(good) // 2])

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    # palette, 16-bit, and Adam7 interlacing are all IMPLEMENTED now —
    # see the dedicated tests; an invalid interlace METHOD still raises.
    p = (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 9))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="invalid PNG interlace"):
        decode_png(p)


def test_palette_png_decodes_via_plte():
    import struct
    import zlib

    import numpy as np

    from minoan_athenaeum_spark.operators.png import decode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # 4x3 indexed image over a 5-entry palette, filter-0 scanlines
    palette = np.array(
        [[250, 0, 0], [0, 200, 0], [0, 0, 150], [9, 9, 9], [255, 255, 255]],
        dtype=np.uint8,
    )
    idx = np.array([[0, 1, 2, 3], [4, 3, 2, 1], [0, 0, 4, 4]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert out.shape == (3, 4, 3)
    assert (out == palette[idx]).all()

    # out-of-range index and missing PLTE both raise loudly
    bad_idx = idx.copy()
    bad_idx[0, 0] = 7
    raw_bad = b"".join(b"\x00" + bad_idx[y].tobytes() for y in range(3))
    payload_bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw_bad))
        + chunk(b"IEND", b"")
    )
    import pytest

    with pytest.raises(ValueError, match="palette index"):
        decode_png(payload_bad)
    payload_noplte = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(payload_noplte)


def test_16bit_png_roundtrips_all_filters():
    import struct
    import zlib

    import numpy as np

    from minoan_athenaeum_spark.operators.png import decode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    rng = np.random.RandomState(31)
    for color, ch in [(0, 1), (2, 3), (6, 4)]:
        img = rng.randint(0, 65536, size=(7, 5, ch)).astype(np.uint16)
        be = img.astype(">u2").tobytes()
        stride = 5 * ch * 2
        rows = np.frombuffer(be, dtype=np.uint8).reshape(7, stride)
        # encode with the full filter mix: None, Sub, Up, Average, Paeth
        bpp = ch * 2
        enc = bytearray()
        prev = np.zeros(stride, dtype=np.int32)
        for y, ftype in enumerate([0, 1, 2, 3, 4, 1, 4]):
            cur = rows[y].astype(np.int32)
            if ftype == 0:
                filt = cur
            elif ftype == 1:
                left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
                filt = (cur - left) % 256
            elif ftype == 2:
                filt = (cur - prev) % 256
            elif ftype == 3:
                left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
                filt = (cur - (left + prev) // 2) % 256
            else:
                filt = np.zeros(stride, np.int32)
                for x in range(stride):
                    a = int(cur[x - bpp]) if x >= bpp else 0
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    pq = a + b - c
                    pa, pb, pc = abs(pq - a), abs(pq - b), abs(pq - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    filt[x] = (int(cur[x]) - pred) % 256
            enc.append(ftype)
            enc.extend(filt.astype(np.uint8).tobytes())
            prev = cur
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 7, 16, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(enc)))
            + chunk(b"IEND", b"")
        )
        out = decode_png(payload)
        want = img[:, :, 0] if ch == 1 else img
        assert out.dtype == np.uint16
        assert (out == want).all(), f"16-bit mismatch for color type {color}"


def test_adam7_interlaced_png_roundtrips():
    import struct
    import zlib

    import numpy as np

    from minoan_athenaeum_spark.operators.png import _ADAM7, decode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    rng = np.random.RandomState(41)
    # odd dims exercise per-pass ceil arithmetic and empty passes
    for (h, w, ch, color) in [(9, 13, 3, 2), (7, 5, 1, 0), (1, 1, 3, 2)]:
        img = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
        enc = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx, :]
            ph, pw = sub.shape[0], sub.shape[1]
            if ph == 0 or pw == 0:
                continue
            for y in range(ph):
                enc.append(0)  # filter None
                enc.extend(sub[y].tobytes())
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(bytes(enc)))
            + chunk(b"IEND", b"")
        )
        out = decode_png(payload)
        want = img[:, :, 0] if ch == 1 else img
        assert (out == want).all(), f"adam7 mismatch at {(h, w, color)}"


def test_progressive_jpeg_equals_baseline():
    """Spectral-selection progressive (SOF2, multi-scan) must produce
    EXACTLY the pixels of a baseline stream built from the same
    quantized coefficients — decoders share nothing past the
    coefficient buffers."""
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.RandomState(7)
    for shape in [(24, 33), (8, 8), (17, 9), (40, 16)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg_gray(img))
        prog = decode_jpeg(encode_jpeg_gray_progressive(img))
        assert np.array_equal(base, prog), shape
    # single-band and many-band splits agree too
    img = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    for bands in [((1, 63),), ((1, 1), (2, 9), (10, 62), (63, 63))]:
        prog = decode_jpeg(encode_jpeg_gray_progressive(img, bands=bands))
        assert np.array_equal(prog, decode_jpeg(encode_jpeg_gray(img)))


def test_progressive_jpeg_successive_approximation_hand_stream():
    """Hand-built SA stream for one 8x8 block, quant table all-ones:
    DC first (Al=1) + DC refine, AC first (Al=1) + AC refine with
    correction bits — final coefficients must be DC=5, c1=3, c5=-2
    exactly, verified against a direct IDCT."""
    import struct

    from minoan_athenaeum_spark.operators.jpeg import (
        _AC_BITS,
        _AC_VALS,
        _DC_BITS,
        _DC_VALS,
        _M,
        _MT,
        ZIGZAG,
        _BitWriter,
        _canonical_codes,
        _magnitude,
        decode_jpeg,
    )

    dc = _canonical_codes(_DC_BITS, _DC_VALS)
    ac = _canonical_codes(_AC_BITS, _AC_VALS)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # quant all ones
    out += seg(0xC2, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
               + bytes([1]) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))

    def sos(ss, se, ah, al):
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    # scan 1: DC first, Al=1 -> send 5>>1 = 2 as the diff
    out += sos(0, 0, 0, 1)
    w = _BitWriter()
    t, off = _magnitude(2)
    code, ln = dc[t]
    w.put(code, ln); w.put(off, t)
    w.flush(); out += w.out
    # scan 2: DC refine, Ah=1, Al=0 -> low bit of 5 is 1
    out += sos(0, 0, 1, 0)
    w = _BitWriter(); w.put(1, 1); w.flush(); out += w.out
    # scan 3: AC first, band 1..63, Al=1 -> c1: 3>>1=+1, c5: -2>>1=-1
    out += sos(1, 63, 0, 1)
    w = _BitWriter()
    code, ln = ac[(0 << 4) | 1]; w.put(code, ln); w.put(1, 1)   # +1 at k=1
    code, ln = ac[(3 << 4) | 1]; w.put(code, ln); w.put(0, 1)   # -1 at k=5
    code, ln = ac[0x00]; w.put(code, ln)                        # EOB
    w.flush(); out += w.out
    # scan 4: AC refine, Ah=1, Al=0 -> EOB(run 1), then correction bits
    # for the two nonzero-history coeffs: k=1 gets 1 (2->3), k=5 gets 0
    out += sos(1, 63, 1, 0)
    w = _BitWriter()
    code, ln = ac[0x00]; w.put(code, ln)
    w.put(1, 1)  # correction for k=1
    w.put(0, 1)  # correction for k=5
    w.flush(); out += w.out
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    coef_zz = np.zeros(64)
    coef_zz[0], coef_zz[1], coef_zz[5] = 5, 3, -2
    deq = np.zeros(64)
    deq[ZIGZAG] = coef_zz  # quant table is all ones
    want = np.clip(np.round(_MT @ deq.reshape(8, 8) @ _M + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)


def test_16bit_quant_tables_decode():
    """DQT precision 1 (16-bit big-endian entries) must parse and
    dequantize correctly: re-encode a baseline stream's quant table as
    16-bit values > 255 scaled down in the coefficients — simplest pin:
    same image, same table VALUES, one stream 8-bit DQT, one 16-bit
    DQT; decodes must be identical."""
    import struct

    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(43)
    img = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    stream = encode_jpeg_gray(img)
    base = decode_jpeg(stream)

    # rewrite the DQT segment from 8-bit to 16-bit precision in place
    i = stream.find(b"\xff\xdb")
    seg_len = int.from_bytes(stream[i + 2 : i + 4], "big")
    pq_tid = stream[i + 4]
    entries = stream[i + 5 : i + 5 + 64]
    assert pq_tid >> 4 == 0 and seg_len == 67
    body16 = bytes([0x10 | (pq_tid & 0x0F)]) + b"".join(
        struct.pack(">H", e) for e in entries
    )
    new_seg = b"\xff\xdb" + (len(body16) + 2).to_bytes(2, "big") + body16
    mutated = stream[:i] + new_seg + stream[i + 2 + seg_len:]
    assert np.array_equal(decode_jpeg(mutated), base)


def test_quarantine_routes_declared_boundaries_only(spark):
    """The quarantine decode path catches ONLY the declared boundary
    errors (NotImplementedError, UnsupportedContainerError); anything
    else — a corrupt DEFLATE stream raising zlib.error from inside the
    PNG decoder, a decoder-internal ValueError from a truncated PPM —
    must still fail the job, so real decoder bugs can't hide as
    quarantine rows."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from minoan_athenaeum_spark.operators.multimodal import (
        _SOF9_JPEG_STUB,
        encode_ppm,
        image_channel_stats_quarantined,
    )

    ok_img = np.zeros((2, 2, 3), dtype=np.uint8)
    rows = [
        (0, encode_ppm(ok_img)),
        (1, _SOF9_JPEG_STUB),               # declared: NotImplementedError
        (2, b"GIF89a not ours"),            # declared: unknown container
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.status for r in image_channel_stats_quarantined(df).collect()}
    assert got == {0: "ok", 1: "NotImplementedError", 2: "UnsupportedContainerError"}

    # truncated PPM: recognized container, decoder-internal ValueError
    # -> NOT a declared boundary, must propagate
    trunc = spark.createDataFrame(
        [(8, encode_ppm(ok_img)[:-5])], "doc_id long, payload binary"
    )
    with pytest.raises(PythonException, match="truncated PPM"):
        image_channel_stats_quarantined(trunc).collect()

    # corrupt zlib stream inside a structurally-valid PNG: zlib.error
    # is NOT a declared boundary -> the job must fail
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bad_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"\x00not-deflate\x00")
        + chunk(b"IEND", b"")
    )
    bad = spark.createDataFrame([(9, bad_png)], "doc_id long, payload binary")
    with pytest.raises(PythonException, match="zlib.error"):
        image_channel_stats_quarantined(bad).collect()


# ---------------------------------------------------------------------------
# Sub-8-bit PNG (1/2/4-bit greyscale + palette, non-interlaced and
# Adam7) — closes the last declared PNG boundary. Reference packing is
# done independently here in pure Python (bit-by-bit, big-endian, row
# padding to byte boundary) so the vectorized np.unpackbits path is
# cross-checked against the spec, not against itself.
# ---------------------------------------------------------------------------


def _png_chunk(ctype, body):
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _pack_row(samples, depth):
    # big-endian bit packing per the PNG spec, padded to a byte
    out, acc, nbits = bytearray(), 0, 0
    for s in samples:
        acc = (acc << depth) | int(s)
        nbits += depth
        if nbits == 8:
            out.append(acc)
            acc, nbits = 0, 0
    if nbits:
        out.append(acc << (8 - nbits))
    return bytes(out)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_sub8_greyscale_decodes_scaled(depth):
    import zlib

    from minoan_athenaeum_spark.operators.png import _PNG_MAGIC, decode_png
    import struct

    rng = np.random.RandomState(depth)
    h, w = 7, 11  # w chosen so rows need padding bits at every depth
    maxv = (1 << depth) - 1
    img = rng.randint(0, maxv + 1, size=(h, w)).astype(np.uint8)
    raw = b"".join(b"\x00" + _pack_row(img[y], depth) for y in range(h))
    payload = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert out.shape == (h, w)
    assert np.array_equal(out, img.astype(np.uint16) * (255 // maxv))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_sub8_palette_decodes_raw_indices(depth):
    import struct
    import zlib

    from minoan_athenaeum_spark.operators.png import _PNG_MAGIC, decode_png

    rng = np.random.RandomState(10 + depth)
    h, w = 5, 9
    n = 1 << depth
    palette = rng.randint(0, 256, size=(n, 3)).astype(np.uint8)
    idx = rng.randint(0, n, size=(h, w)).astype(np.uint8)
    raw = b"".join(b"\x00" + _pack_row(idx[y], depth) for y in range(h))
    payload = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", palette.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), palette[idx])


def test_png_sub8_filters_operate_on_packed_bytes():
    # Sub and Up filters with bpp=1 over the PACKED bytes — the spec's
    # one subtlety for sub-8-bit scanlines.
    import struct
    import zlib

    from minoan_athenaeum_spark.operators.png import _PNG_MAGIC, decode_png

    depth, h, w = 2, 4, 13
    rng = np.random.RandomState(3)
    img = rng.randint(0, 4, size=(h, w)).astype(np.uint8)
    packed = [np.frombuffer(_pack_row(img[y], depth), dtype=np.uint8) for y in range(h)]
    raw = bytearray()
    for y, f in enumerate([0, 1, 2, 4]):
        row = packed[y].astype(np.int64)
        prev = packed[y - 1].astype(np.int64) if y else np.zeros_like(row)
        enc = np.zeros_like(row)
        for x in range(len(row)):
            left = row[x - 1] if x else 0
            ul = prev[x - 1] if x else 0
            up = prev[x]
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            enc[x] = (row[x] - pred) % 256
        raw.append(f)
        raw += bytes(enc.astype(np.uint8))
    payload = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img.astype(np.uint16) * 85)


def test_png_sub8_adam7_interlaced():
    import struct
    import zlib

    from minoan_athenaeum_spark.operators.png import _PNG_MAGIC, decode_png

    depth, h, w = 4, 9, 10
    rng = np.random.RandomState(7)
    img = rng.randint(0, 16, size=(h, w)).astype(np.uint8)
    passes = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            raw.append(0)
            raw += _pack_row(sub[y], depth)
    payload = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 1))
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img.astype(np.uint16) * 17)


def test_png_sub8_illegal_color_combo_raises():
    import struct
    import zlib

    from minoan_athenaeum_spark.operators.png import _PNG_MAGIC, decode_png

    p = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="not a legal combination"):
        decode_png(p)


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3, T.81 annex H) — predictive coding, all seven
# predictors, 8- and 16-bit precision, point transform. Lossless, so
# encode→decode must be BIT-exact.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_jpeg_lossless_roundtrip_all_predictors(predictor):
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless_gray,
    )

    rng = np.random.RandomState(predictor)
    img = rng.randint(0, 256, size=(13, 17), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_lossless_gray(img, predictor=predictor))
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_jpeg_lossless_16bit_and_category16():
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless_gray,
    )

    rng = np.random.RandomState(42)
    img = rng.randint(0, 1 << 16, size=(9, 7)).astype(np.uint16)
    # force the category-16 edge: the first sample predicts the default
    # 32768, so a value of 0 codes diff = (0-32768) mod 2^16 = 32768
    img[0, 0] = 0
    out = decode_jpeg(encode_jpeg_lossless_gray(img))
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_jpeg_lossless_point_transform():
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless_gray,
    )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(8, 8), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_lossless_gray(img, point_transform=2))
    # decoded = (sample >> Pt) << Pt — the deliberate precision loss
    assert np.array_equal(out, (img >> 2) << 2)


def test_jpeg_lossless_gradient_smooth_image():
    # smooth ramps exercise predictors meaningfully (small diffs)
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless_gray,
    )

    y, x = np.mgrid[0:24, 0:31]
    img = ((y * 3 + x * 5) % 256).astype(np.uint8)
    for p in (1, 4, 7):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_lossless_gray(img, predictor=p)), img
        )


def test_jpeg_lossless_rejects_bad_params():
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless_gray,
    )

    img = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="invalid lossless predictor"):
        encode_jpeg_lossless_gray(img, predictor=0)
    # hierarchical / arithmetic SOFs still raise the typed boundary
    good = bytearray(encode_jpeg_lossless_gray(img))
    sof_at = bytes(good).find(b"\xff\xc3")
    bad = bytes(good[:sof_at + 1]) + b"\xc9" + bytes(good[sof_at + 2:])
    with pytest.raises(NotImplementedError, match="SOF marker 0xc9"):
        decode_jpeg(bad)


def test_jpeg_lossless_restart_markers_roundtrip():
    from minoan_athenaeum_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless_gray,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
    # interval that does NOT divide the row length: restarts land
    # mid-row, exercising the prediction-reset-anywhere path; > 8
    # intervals wraps the RSTn modulo counter
    enc = encode_jpeg_lossless_gray(img, predictor=4, restart_interval=11)
    assert enc.count(b"\xff\xdd") == 1          # DRI present
    assert sum(enc.count(bytes([0xFF, 0xD0 + i])) for i in range(8)) >= 9
    assert np.array_equal(decode_jpeg(enc), img)

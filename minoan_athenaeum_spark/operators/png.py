"""PNG codec in pure numpy + stdlib zlib — closes the last image-codec
boundary (operators/multimodal.py used to raise for PNG because "no
codec libs"; the DEFLATE half lives in Python's stdlib, and the rest of
PNG is chunk walking + per-scanline filter reconstruction, which is
exactly the kind of byte plumbing this engine already does for
PPM/WAV/JPEG).

Decoder scope: 8-bit greyscale (color type 0), truecolor RGB (2),
RGBA (6), and greyscale+alpha (4); non-interlaced. Palette (3),
sub-8-bit depths, 16-bit samples, and Adam7 interlace raise
NotImplementedError with a clear message. All five standard scanline
filters (None/Sub/Up/Average/Paeth) are implemented.

Encoder scope: the same color types, filter 0 (None) per scanline —
enough to produce REAL standards-conforming PNG streams for the
pipeline and its oracles (any conforming decoder reads them; ours
round-trips bit-exactly because PNG is lossless).

Unlike JPEG there is no lossy math anywhere, so the oracle recipe is
simpler: ANY deterministic synthetic image round-trips exactly, and
closed-form pixel formulas certify the decoder in DuckDB SQL
(queries/multimodal.py::mm_png_decode_stats).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}




_ADAM7 = [  # (x_start, y_start, x_step, y_step) per pass
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct h filtered scanlines of ``stride`` bytes (filter
    byte + data per row; ``bpp`` = bytes per pixel for the left-
    neighbor offset). Returns (h, stride) uint8."""
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"PNG pixel data length {len(raw)} != expected {h * (1 + stride)}"
        )
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filters = arr[:, 0]
    data = arr[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_line = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = data[y]
        prev = out[y - 1] if y else zero_line
        if f == 0:                                   # None
            line = cur.copy()
        elif f == 1:                                 # Sub
            # serial in x but a per-channel cumsum mod 256 — vectorized
            line = (
                cur.reshape(-1, bpp).astype(np.uint64).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(-1)
        elif f == 2:                                 # Up
            line = (cur.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:                                 # Average
            line = cur.copy()
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:                                 # Paeth
            line = cur.copy()
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                a, b, c = left, int(prev[x]), ul
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f} on row {y}")
        out[y] = line
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to uint8 pixels: (H, W) for greyscale, (H, W, C)
    otherwise. Real chunk walk (CRC-tolerant read of IHDR/IDAT*/IEND,
    unknown ancillary chunks skipped), zlib inflate, and vectorized
    reconstruction of all five scanline filters."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError(f"not a PNG: magic {payload[:8]!r}")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        elif ctype == b"PLTE":
            if length % 3 or length > 768:
                raise ValueError(f"malformed PLTE length {length}")
            plte = body
        pos += 12 + length  # length + type + data + CRC
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth not in (8, 16):
        raise NotImplementedError(f"{depth}-bit PNG (8/16-bit samples only)")
    if color not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color}")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if color == 3 and depth == 16:
        raise ValueError("16-bit palette PNG is not a legal combination")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    # PNG filters operate on BYTES with the left-neighbor one bytes-per-
    # pixel back, so 16-bit samples just widen the filter offset.
    ch = _CHANNELS[color] * (depth // 8)
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if interlace == 0:
        out = _unfilter(raw, h, stride, ch)
    else:
        # Adam7: seven independently-filtered sub-images, scattered
        # back onto the full grid by each pass's (start, step) lattice.
        out = np.zeros((h, stride), dtype=np.uint8)
        full = out.reshape(h, w, ch)
        pos2 = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * ch
            take = ph * (1 + pstride)
            sub = _unfilter(raw[pos2 : pos2 + take], ph, pstride, ch)
            pos2 += take
            full[y0::dy, x0::dx, :] = sub.reshape(ph, pw, ch)
        if pos2 != len(raw):
            raise ValueError(
                f"interlaced PNG data length {len(raw)} != consumed {pos2}"
            )
    if depth == 16:
        # big-endian sample pairs -> uint16
        out16 = (
            out.reshape(h, w, _CHANNELS[color], 2).astype(np.uint16)
        )
        px = (out16[..., 0] << 8) | out16[..., 1]
        return px[:, :, 0] if _CHANNELS[color] == 1 else px
    px = out.reshape(h, w, ch)
    if color == 3:
        palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError(
                f"palette index {int(idx.max())} >= palette size {palette.shape[0]}"
            )
        return palette[idx]
    return px[:, :, 0] if ch == 1 else px


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """Encode uint8 pixels — (H, W) grey or (H, W, {2,3,4}) — as a
    standards-conforming PNG (filter 0 scanlines, one IDAT)."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_png needs uint8 pixels")
    if pixels.ndim == 2:
        h, w = pixels.shape
        ch, color = 1, 0
        flat = pixels.reshape(h, w)
    elif pixels.ndim == 3 and pixels.shape[2] in (2, 3, 4):
        h, w, ch = pixels.shape
        color = {2: 4, 3: 2, 4: 6}[ch]
        flat = pixels.reshape(h, w * ch)
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    stride = w * ch
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type None
        raw += flat[y].tobytes()
    idat = zlib.compress(bytes(raw), level)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )

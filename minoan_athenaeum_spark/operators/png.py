"""PNG codec in pure numpy + stdlib zlib — closes the last image-codec
boundary (operators/multimodal.py used to raise for PNG because "no
codec libs"; the DEFLATE half lives in Python's stdlib, and the rest of
PNG is chunk walking + per-scanline filter reconstruction, which is
exactly the kind of byte plumbing this engine already does for
PPM/WAV/JPEG).

Decoder scope: every legal IHDR combination — greyscale (color type
0) at 1/2/4/8/16-bit, truecolor RGB (2) and RGBA (6) and
greyscale+alpha (4) at 8/16-bit, palette (3) at 1/2/4/8-bit —
non-interlaced and Adam7. Sub-8-bit scanlines are big-endian
bit-packed per the spec (filters operate on the packed BYTES with
bpp=1); greyscale samples are left-bit-replicated to 8-bit
(×255/(2^d−1), exact for d∈{1,2,4}), palette indices are raw. All
five standard scanline filters (None/Sub/Up/Average/Paeth) are
implemented.

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




def _unpack_sub8(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """Unpack (h, stride_bytes) big-endian bit-packed scanlines into
    (h, w) uint8 RAW sample values (0..2^depth-1, no scaling). Row
    padding bits beyond the w-th sample are discarded."""
    bits = np.unpackbits(rows, axis=1)
    n = bits.shape[1] // depth
    grouped = bits[:, : n * depth].reshape(rows.shape[0], n, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (grouped * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[:, :w]


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
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    if color not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color}")
    if depth < 8 and color not in (0, 3):
        raise ValueError(
            f"{depth}-bit PNG with color type {color} is not a legal combination"
        )
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if color == 3 and depth == 16:
        raise ValueError("16-bit palette PNG is not a legal combination")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    raw = zlib.decompress(bytes(idat))
    if depth < 8:
        # Sub-8-bit (greyscale or palette, 1 sample/pixel): scanlines
        # are big-endian bit-packed, rows padded to a byte boundary;
        # filters still operate on the packed BYTES with bpp=1.
        def pass_samples(data: bytes, pw: int, ph: int) -> np.ndarray:
            pstride = (pw * depth + 7) // 8
            return _unpack_sub8(_unfilter(data, ph, pstride, 1), pw, depth)

        if interlace == 0:
            samples = pass_samples(raw, w, h)
        else:
            samples = np.zeros((h, w), dtype=np.uint8)
            pos2 = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                take = ph * (1 + (pw * depth + 7) // 8)
                samples[y0::dy, x0::dx] = pass_samples(
                    raw[pos2 : pos2 + take], pw, ph
                )
                pos2 += take
            if pos2 != len(raw):
                raise ValueError(
                    f"interlaced PNG data length {len(raw)} != consumed {pos2}"
                )
        if color == 3:
            palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
            if int(samples.max(initial=0)) >= palette.shape[0]:
                raise ValueError(
                    f"palette index {int(samples.max())} >= palette size "
                    f"{palette.shape[0]}"
                )
            return palette[samples]
        # left-bit-replication to 8-bit: ×255/(2^d−1), exact integers
        return (samples.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
    # PNG filters operate on BYTES with the left-neighbor one bytes-per-
    # pixel back, so 16-bit samples just widen the filter offset.
    ch = _CHANNELS[color] * (depth // 8)
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

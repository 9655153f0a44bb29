"""Baseline JPEG (ITU-T T.81 sequential DCT, huffman) codec in pure
numpy — closes the compressed-image codec boundary flagged in VERDICT
r2/r3 without any codec library (the container has no libjpeg/PIL).

Decoder scope: baseline sequential (SOF0) AND progressive (SOF2 —
full T.81 progressive: spectral selection, successive approximation
with DC/AC refinement scans and EOBRUN handling), 8-bit, 1 or 3
components, arbitrary h/v subsampling factors up to 2 (4:4:4, 4:2:2,
4:2:0), restart intervals (DRI/RSTn), multiple DQT/DHT segments,
0xFF00 byte unstuffing. ALSO lossless (SOF3, T.81 annex H): all seven
predictors, 2-16-bit precision, point transform, interleaved
components returned raw (no color transform). Arithmetic coding and
hierarchical modes raise NotImplementedError with a clear message.

Encoder scope: enough to produce REAL baseline JFIF streams for the
pipeline and its oracles — grayscale or raw-YCbCr color with (1,1) or
(2,2) luma sampling, standard Annex-K-shaped huffman tables (written to
the DHT segments, so the decoder never assumes them), caller-supplied
quantization tables.

Oracle recipe (tests/test_multimodal_decode.py): with the DC quant step
set to 8, an 8×8-block-constant plane quantizes to a DC-only block with
coefficient exactly (v−128), and the decoder's IDCT returns exactly v —
so block-constant synthetic images round-trip BIT-EXACTLY through the
real entropy-coded stream, giving a closed-form pixel oracle for the
whole marker/huffman/MCU/upsample/color path. The AC path is pinned
separately against an independent bit-by-bit reference decode.

Reference parity note: the reference engine (icirellik/minoan-athenaeum)
has no multimodal surface at all (SURVEY §2 absences) — this is
north-star extension surface for the 100 TB training-data pipeline.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------
# shared tables

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Orthonormal 8-point DCT-II matrix: M[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
_MT = _M.T.copy()

# Annex-K-shaped huffman tables for the ENCODER (the decoder always
# reads tables from the file's DHT segments). (bits[1..16], symbols).
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Default quantization tables for the encoder: DC step 8 makes
# block-constant planes round-trip exactly (see module docstring); the
# flat AC step keeps arbitrary content reasonably faithful.
DEFAULT_QUANT_LUMA = np.full(64, 16, dtype=np.int64)
DEFAULT_QUANT_LUMA[0] = 8
DEFAULT_QUANT_CHROMA = DEFAULT_QUANT_LUMA.copy()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for a canonical (bits, huffval) table."""
    codes, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the bit-by-bit decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# ---------------------------------------------------------------------
# decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-stuffing marker (RSTn handled by the
    MCU loop via :meth:`sync_restart`)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("entropy data exhausted at marker "
                             f"0x{self.marker:02x}")
        if self.pos >= len(self.buf):
            raise ValueError("truncated JPEG entropy data")
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.buf[self.pos] if self.pos < len(self.buf) else None
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                # still deliver the 0xFF byte's bits? No: a marker ends
                # the entropy segment; padding 1-bits precede it. Treat
                # as end.
                raise ValueError("entropy data exhausted at marker "
                                 f"0x{nxt:02x}" if nxt is not None
                                 else "truncated JPEG entropy data")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self, expect: int) -> None:
        """Consume padding bits + the RSTn marker at a restart
        boundary."""
        self.acc = 0
        self.n = 0
        # find FF Dn
        while self.pos + 1 < len(self.buf):
            if self.buf[self.pos] == 0xFF and self.buf[self.pos + 1] != 0x00:
                m = self.buf[self.pos + 1]
                if 0xD0 <= m <= 0xD7:
                    if m != 0xD0 + expect:
                        raise ValueError(
                            f"restart marker out of order: got 0x{m:02x}, "
                            f"expected 0x{0xD0 + expect:02x}")
                    self.pos += 2
                    return
                raise ValueError(f"expected RSTn, found marker 0x{m:02x}")
            self.pos += 1
        raise ValueError("truncated JPEG: missing restart marker")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _huff_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy data")


def _decode_block(reader, dc_tab, ac_tab, qtab, pred: int):
    """One 8×8 block: huffman-decode, dequantize, de-zigzag, IDCT.
    Returns (pixels float64 8×8 centered at 0, new DC predictor)."""
    coeffs = np.zeros(64, dtype=np.int64)
    t = _huff_symbol(reader, dc_tab)
    diff = _extend(reader.receive(t), t)
    pred += diff
    coeffs[0] = pred
    k = 1
    while k < 64:
        rs = _huff_symbol(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:        # ZRL
                k += 16
                continue
            break              # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        coeffs[k] = _extend(reader.receive(s), s)
        k += 1
    deq = np.zeros(64, dtype=np.float64)
    deq[ZIGZAG] = coeffs * qtab
    block = deq.reshape(8, 8)
    return _MT @ block @ _M, pred


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to uint8 pixels — (H, W) for
    one component, (H, W, 3) RGB for three (BT.601 YCbCr→RGB).

    A real T.81 decoder: marker walk, DQT/DHT/SOF0/SOS/DRI parsing,
    canonical-huffman entropy decode with byte unstuffing and restart
    sync, dequantize + de-zigzag, orthonormal separable IDCT, nearest-
    neighbor chroma upsampling. Pure numpy + Python bit reader."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG: magic {payload[:2]!r}")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:                      # EOI: no length field
            if frame is not None and frame.get("progressive"):
                return _prog_finish(frame, coefs, qtables)
            break
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:                      # DQT
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec == 0:                   # 8-bit entries
                    qtables[tid] = np.frombuffer(
                        body[b + 1 : b + 65], dtype=np.uint8
                    ).astype(np.int64)
                    b += 65
                elif prec == 1:                 # 16-bit big-endian entries
                    qtables[tid] = np.frombuffer(
                        body[b + 1 : b + 129], dtype=">u2"
                    ).astype(np.int64)
                    b += 129
                else:
                    raise ValueError(f"invalid DQT precision {prec}")
        elif marker == 0xC4:                    # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _decode_map(bits, vals)
                b += 17 + nv
        elif marker in (0xC0, 0xC2, 0xC3):      # SOF0 / SOF2 / SOF3 lossless
            precision = body[0]
            lossless = marker == 0xC3
            if not lossless and precision != 8:
                raise NotImplementedError(f"{precision}-bit samples")
            if lossless and not (2 <= precision <= 16):
                raise ValueError(f"invalid lossless JPEG precision {precision}")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2,
                     "lossless": lossless, "precision": precision}
            if frame["progressive"]:
                coefs = _prog_alloc(frame)
        elif marker in (0xC1, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline (SOF0), progressive (SOF2), and lossless "
                f"(SOF3) JPEG decode; got SOF marker 0x{marker:02x}")
        elif marker == 0xDD:                    # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:                    # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            if frame.get("lossless"):
                psv = body[1 + 2 * ns]           # Ss = predictor selector
                if body[2 + 2 * ns] != 0:
                    raise ValueError("lossless JPEG scan with Se != 0")
                pt = body[3 + 2 * ns] & 0x0F     # Al = point transform
                if ns != len(frame["comps"]):
                    raise NotImplementedError(
                        "multi-scan (non-interleaved per-component) "
                        "lossless JPEG")
                return _lossless_scan(
                    payload, pos + 2 + seg_len, frame, scan, dc_tabs,
                    psv, pt, restart_interval)
            if not frame.get("progressive"):
                return _decode_scan(
                    payload, pos + 2 + seg_len, frame, scan,
                    qtables, dc_tabs, ac_tabs, restart_interval)
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            reader = _BitReader(payload, pos + 2 + seg_len)
            scan_comps = [
                (comp, frame["comps"].index(comp)) for comp, _, _ in scan
            ]
            if ss == 0:                         # DC scan
                if se != 0:
                    raise ValueError("progressive DC scan with Se != 0")
                _prog_dc_scan(
                    reader, frame, scan_comps, coefs, dc_tabs,
                    [td for _, td, _ in scan], ah, al, restart_interval)
            else:                               # AC scan (single component)
                if ns != 1:
                    raise ValueError("progressive AC scan must be single-component")
                comp, ci = scan_comps[0]
                _prog_ac_scan(
                    reader, frame, comp, ci, coefs,
                    ac_tabs[scan[0][2]], ss, se, ah, al, restart_interval)
            pos = _find_next_marker(payload, reader.pos)
            continue
        pos += 2 + seg_len
    if frame is not None and frame.get("progressive"):
        # tolerate a truncated-after-last-scan stream missing EOI
        return _prog_finish(frame, coefs, qtables)
    raise ValueError("no SOS segment found (truncated or not a JPEG)")


def _decode_scan(payload, entropy_pos, frame, scan, qtables, dc_tabs,
                 ac_tabs, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    reader = _BitReader(payload, entropy_pos)
    preds = [0] * len(comps)
    rst = 0
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci, (comp, td, ta) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        block, preds[ci] = _decode_block(
                            reader, dc_tabs[td], ac_tabs[ta],
                            qtables[comp["tq"]], preds[ci])
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_i += 1
    # level shift, upsample to full resolution, crop
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci] + 128.0
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0),
                      hmax // comp["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------
# lossless (SOF3) — T.81 annex H predictive coding. Differences are
# Huffman-coded with DC-style category tables (SSSS 0-16, category 16
# meaning diff=32768 with no appended bits); arithmetic is modulo 2^16
# per H.1.2.1; decoded samples are upshifted by the point transform.


def _lossless_scan(payload, entropy_pos, frame, scan, dc_tabs, psv, pt,
                   restart_interval):
    """Decode one interleaved SOF3 scan. Components are returned RAW
    (no YCbCr transform — lossless JPEG conventionally stores RGB or
    sensor planes): (H, W) for one component, (H, W, C) otherwise;
    uint8 when the frame precision ≤ 8, uint16 above."""
    h, w = frame["h"], frame["w"]
    p = frame["precision"]
    comps = [c for c, _, _ in scan]
    if len(comps) > 1 and any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError(
            "lossless JPEG with subsampled interleaved components")
    if not 1 <= psv <= 7:
        raise ValueError(f"invalid lossless predictor {psv}")
    if pt >= p:
        raise ValueError(f"point transform {pt} >= precision {p}")
    ncomp = len(comps)
    default = 1 << (p - pt - 1)
    planes = np.zeros((ncomp, h, w), dtype=np.int64)
    reader = _BitReader(payload, entropy_pos)
    tds = [dc_tabs[td] for _, td, _ in scan]
    rst = 0
    n_mcu = 0
    reset = True                                 # scan start = default pred
    for y in range(h):
        for x in range(w):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) % 8
                reset = True
            for ci in range(ncomp):
                t = _huff_symbol(reader, tds[ci])
                diff = 32768 if t == 16 else _extend(reader.receive(t), t)
                pl = planes[ci]
                if reset:
                    pred = default
                elif y == 0:
                    pred = int(pl[0, x - 1])
                elif x == 0:
                    pred = int(pl[y - 1, 0])
                else:
                    ra = int(pl[y, x - 1])
                    rb = int(pl[y - 1, x])
                    rc = int(pl[y - 1, x - 1])
                    if psv == 1:
                        pred = ra
                    elif psv == 2:
                        pred = rb
                    elif psv == 3:
                        pred = rc
                    elif psv == 4:
                        pred = ra + rb - rc
                    elif psv == 5:
                        pred = ra + ((rb - rc) >> 1)
                    elif psv == 6:
                        pred = rb + ((ra - rc) >> 1)
                    else:
                        pred = (ra + rb) >> 1
                pl[y, x] = (pred + diff) & 0xFFFF
            reset = False
            n_mcu += 1
    out = planes << pt
    dt = np.uint8 if p <= 8 else np.uint16
    if ncomp == 1:
        return out[0].astype(dt)
    return np.stack([out[i] for i in range(ncomp)], axis=-1).astype(dt)


# canonical DC-style table over all 17 difference categories (14 codes
# of length 4, 3 of length 5 — complete enough for any precision, and
# the all-ones 5-bit code stays unused as T.81 requires)
_LL_BITS = [0, 0, 0, 14, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LL_VALS = list(range(17))


def encode_jpeg_lossless_gray(pixels: np.ndarray, predictor: int = 1,
                              point_transform: int = 0,
                              precision: int | None = None,
                              restart_interval: int = 0) -> bytes:
    """Encode an (H, W) uint8/uint16 plane as a single-component SOF3
    lossless JPEG. Round-trips bit-exactly through :func:`decode_jpeg`
    (up to the point transform's deliberate downshift). With
    ``restart_interval`` = R, a DRI segment is written and every R
    samples the entropy stream is byte-aligned, an RSTn marker emitted,
    and the next sample's prediction reset to the annex-H default —
    matching the decoder's restart handling."""
    px = np.asarray(pixels)
    if px.ndim != 2:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    if precision is None:
        precision = 8 if px.dtype == np.uint8 else 16
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    h, w = px.shape
    codes = _canonical_codes(_LL_BITS, _LL_VALS)
    out = bytearray(b"\xff\xd8")
    sof = (bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
           + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC3, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_LL_BITS) + bytes(_LL_VALS))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += _seg(0xDA, bytes([1, 1, 0x00, predictor, 0, point_transform]))
    vals = px.astype(np.int64) >> point_transform
    default = 1 << (precision - point_transform - 1)
    writer = _BitWriter()
    n_mcu = 0
    rst = 0
    reset = True
    for y in range(h):
        for x in range(w):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                reset = True
            if reset:
                pred = default
            elif y == 0:
                pred = int(vals[0, x - 1]) if x else default
            elif x == 0:
                pred = int(vals[y - 1, 0])
            else:
                ra = int(vals[y, x - 1])
                rb = int(vals[y - 1, x])
                rc = int(vals[y - 1, x - 1])
                pred = [0, ra, rb, rc, ra + rb - rc, ra + ((rb - rc) >> 1),
                        rb + ((ra - rc) >> 1), (ra + rb) >> 1][predictor]
            reset = False
            n_mcu += 1
            diff = (int(vals[y, x]) - pred) & 0xFFFF
            if diff == 32768:
                code, ln = codes[16]             # category 16: no extra bits
                writer.put(code, ln)
                continue
            signed = diff - 65536 if diff > 32768 else diff
            t, off = _magnitude(signed)
            code, ln = codes[t]
            writer.put(code, ln)
            if t:
                writer.put(off, t)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """(category, offset-coded value) for a DC diff / AC coefficient."""
    t = 0 if v == 0 else int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_plane_block(writer, block, qtab_zz, dc_codes, ac_codes, pred):
    """FDCT + quantize + huffman-code one 8×8 block. ``qtab_zz`` is in
    ZIGZAG order (matching the coefficient order being coded)."""
    s = _M @ (block.astype(np.float64) - 128.0) @ _MT
    zz = np.round(s.reshape(-1)[ZIGZAG] / qtab_zz).astype(np.int64)
    diff = int(zz[0]) - pred
    t, off = _magnitude(diff)
    code, ln = dc_codes[t]
    writer.put(code, ln)
    if t:
        writer.put(off, t)
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    run = 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]          # ZRL
            writer.put(code, ln)
            run -= 16
        t, off = _magnitude(v)
        code, ln = ac_codes[(run << 4) | t]
        writer.put(code, ln)
        writer.put(off, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]              # EOB
        writer.put(code, ln)
    return int(zz[0])


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // bh) * bh
    pw = -(-w // bw) * bw
    out = np.empty((ph, pw), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]          # edge-replicate padding
    out[:, w:] = out[:, w - 1 : w]
    return out


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg_gray(pixels: np.ndarray,
                     qtab: np.ndarray | None = None,
                     restart_interval: int = 0) -> bytes:
    """Encode an (H, W) uint8 plane as a 1-component baseline JFIF."""
    return _encode([pixels], pixels.shape, [(1, 1)], qtab_luma=qtab,
                   restart_interval=restart_interval)


def encode_jpeg_ycbcr420(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                         qtab_luma: np.ndarray | None = None,
                         qtab_chroma: np.ndarray | None = None,
                         restart_interval: int = 0) -> bytes:
    """Encode raw YCbCr planes (chroma already half-resolution) as a
    3-component 4:2:0 baseline JFIF. No color conversion or filtering
    happens here — the planes are taken as-is, which is what makes the
    closed-form decode oracle possible."""
    h, w = y.shape
    assert cb.shape == cr.shape == (-(-h // 2), -(-w // 2)), (
        "chroma planes must be ceil(half) resolution")
    return _encode([y, cb, cr], (h, w), [(2, 2), (1, 1), (1, 1)],
                   qtab_luma=qtab_luma, qtab_chroma=qtab_chroma,
                   restart_interval=restart_interval)


def _encode(planes, size, sampling, qtab_luma=None, qtab_chroma=None,
            restart_interval=0):
    h, w = size
    qt0 = (DEFAULT_QUANT_LUMA if qtab_luma is None else
           np.asarray(qtab_luma, dtype=np.int64))
    qt1 = (DEFAULT_QUANT_CHROMA if qtab_chroma is None else
           np.asarray(qtab_chroma, dtype=np.int64))
    ncomp = len(planes)
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    out = bytearray(b"\xff\xd8")                               # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + (qt0[ZIGZAG] & 0xFF).astype(np.uint8).tobytes())
    if ncomp == 3:
        out += _seg(0xDB, bytes([0x01]) + (qt1[ZIGZAG] & 0xFF).astype(np.uint8).tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for i, (sh, sv) in enumerate(sampling):
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += _seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    out += _seg(0xC4, dht)
    dht = bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    hmax = max(sh for sh, _ in sampling)
    vmax = max(sv for _, sv in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad each plane to its full MCU-grid size
    padded = [
        _pad_to_blocks(np.asarray(p), mcus_y * sv * 8, mcus_x * sh * 8)
        for p, (sh, sv) in zip(planes, sampling)
    ]
    qt0_zz, qt1_zz = qt0[ZIGZAG], qt1[ZIGZAG]
    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                writer.flush()
                # RSTn goes into the stream raw (markers are never
                # byte-stuffed)
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci, (sh, sv) in enumerate(sampling):
                qt_zz = qt0_zz if ci == 0 else qt1_zz
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_plane_block(
                            writer, block, qt_zz, dc_codes, ac_codes,
                            preds[ci])
            mcu_i += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)


# ---------------------------------------------------------------------
# progressive (SOF2) decoding — T.81 spectral selection + successive
# approximation. Scans accumulate quantized coefficients (zigzag order)
# into per-component buffers; the IDCT runs once at end of image.


def _find_next_marker(buf: bytes, pos: int) -> int:
    """First position of a non-RST, non-stuffing marker at/after pos."""
    while pos + 1 < len(buf):
        if buf[pos] == 0xFF:
            nxt = buf[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            if 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("truncated progressive JPEG: no terminating marker")


def _prog_alloc(frame) -> list[np.ndarray]:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcus_x"], frame["mcus_y"] = mcus_x, mcus_y
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        for c in comps
    ]


def _prog_noninterleaved_dims(frame, comp) -> tuple[int, int]:
    cw = -(-frame["w"] * comp["h"] // frame["hmax"])
    chh = -(-frame["h"] * comp["v"] // frame["vmax"])
    return -(-chh // 8), -(-cw // 8)


def _prog_dc_scan(reader, frame, scan_comps, coefs, dc_tabs, tds,
                  ah, al, restart_interval):
    preds = [0] * len(scan_comps)
    rst = 0
    unit_i = 0

    def one_block(si, ci, by, bx):
        blk = coefs[ci][by, bx]
        if ah == 0:
            t = _huff_symbol(reader, dc_tabs[tds[si]])
            diff = _extend(reader.receive(t), t)
            preds[si] += diff
            blk[0] = preds[si] << al
        else:
            if reader.bit():
                blk[0] |= 1 << al

    def maybe_restart():
        nonlocal rst, preds
        if restart_interval and unit_i and unit_i % restart_interval == 0:
            reader.sync_restart(rst)
            rst = (rst + 1) % 8
            preds = [0] * len(scan_comps)

    if len(scan_comps) > 1:  # interleaved MCU order
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                maybe_restart()
                for si, (comp, ci) in enumerate(scan_comps):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            one_block(si, ci,
                                      my * comp["v"] + by,
                                      mx * comp["h"] + bx)
                unit_i += 1
    else:
        comp, ci = scan_comps[0]
        nbh, nbw = _prog_noninterleaved_dims(frame, comp)
        for by in range(nbh):
            for bx in range(nbw):
                maybe_restart()
                one_block(0, ci, by, bx)
                unit_i += 1


def _prog_ac_first(reader, coef_block, ac_tab, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_symbol(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("progressive AC index beyond spectral band")
        coef_block[k] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _prog_ac_refine(reader, coef_block, ac_tab, ss, se, al, eobrun):
    p1 = 1 << al
    m1 = -(1 << al)

    def correct(k):
        if reader.bit() and not (int(coef_block[k]) & p1):
            coef_block[k] += p1 if coef_block[k] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_symbol(reader, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r)
                    if r:
                        eobrun += reader.receive(r)
                    break
            else:
                if s != 1:
                    raise ValueError(
                        "progressive AC refinement magnitude must be 1")
                val = p1 if reader.bit() else m1
            # advance r zero-history positions, correcting nonzero ones
            while k <= se:
                if coef_block[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError(
                        "progressive AC refinement index beyond band")
                coef_block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef_block[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _prog_ac_scan(reader, frame, comp, ci, coefs, ac_tab, ss, se,
                  ah, al, restart_interval):
    nbh, nbw = _prog_noninterleaved_dims(frame, comp)
    eobrun = 0
    rst = 0
    unit_i = 0
    fn = _prog_ac_refine if ah else _prog_ac_first
    for by in range(nbh):
        for bx in range(nbw):
            if restart_interval and unit_i and unit_i % restart_interval == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) % 8
                eobrun = 0
            eobrun = fn(reader, coefs[ci][by, bx], ac_tab, ss, se, al, eobrun)
            unit_i += 1


def _prog_finish(frame, coefs, qtables) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    full = []
    for ci, comp in enumerate(frame["comps"]):
        arr = coefs[ci]
        nbh, nbw = arr.shape[0], arr.shape[1]
        q = qtables[comp["tq"]]
        deq = np.zeros((nbh, nbw, 64), dtype=np.float64)
        deq[:, :, ZIGZAG] = arr * q
        blocks = deq.reshape(nbh, nbw, 8, 8)
        px = np.einsum("ij,abjk,kl->abil", _MT, blocks, _M)
        plane = px.transpose(0, 2, 1, 3).reshape(nbh * 8, nbw * 8) + 128.0
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def encode_jpeg_gray_progressive(
    pixels: np.ndarray,
    qtab: np.ndarray | None = None,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
) -> bytes:
    """Encode an (H, W) uint8 plane as a PROGRESSIVE (SOF2) JFIF using
    spectral selection: one DC scan then one AC scan per band (no
    successive approximation — Ah=Al=0; the decoder's refinement path
    is pinned separately with hand-built streams). Each AC block ends
    with a plain EOB (EOBRUN=1), the minimal legal progressive
    emission."""
    if pixels.dtype != np.uint8 or pixels.ndim != 2:
        raise ValueError("encode_jpeg_gray_progressive needs (H, W) uint8")
    qt = (DEFAULT_QUANT_LUMA if qtab is None else
          np.asarray(qtab, dtype=np.int64))
    qzz = qt[ZIGZAG]
    plane = _pad_to_blocks(pixels, 8, 8)
    nbh, nbw = plane.shape[0] // 8, plane.shape[1] // 8
    coef = np.zeros((nbh, nbw, 64), dtype=np.int64)
    for by in range(nbh):
        for bx in range(nbw):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            s = _M @ (blk.astype(np.float64) - 128.0) @ _MT
            coef[by, bx] = np.round(s.reshape(-1)[ZIGZAG] / qzz).astype(np.int64)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    h, w = pixels.shape
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + (qt[ZIGZAG] & 0xFF).astype(np.uint8).tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([1]) + bytes([1, 0x11, 0])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))

    def sos(ss, se):
        return _seg(0xDA, bytes([1, 1, 0x00, ss, se, 0x00]))

    # DC scan
    out += sos(0, 0)
    wtr = _BitWriter()
    pred = 0
    for by in range(nbh):
        for bx in range(nbw):
            diff = int(coef[by, bx, 0]) - pred
            pred = int(coef[by, bx, 0])
            t, off = _magnitude(diff)
            code, ln = dc_codes[t]
            wtr.put(code, ln)
            if t:
                wtr.put(off, t)
    wtr.flush()
    out += wtr.out

    # AC band scans
    for ss, se in bands:
        out += sos(ss, se)
        wtr = _BitWriter()
        for by in range(nbh):
            for bx in range(nbw):
                zz = coef[by, bx]
                nz = [k for k in range(ss, se + 1) if zz[k]]
                last = nz[-1] if nz else ss - 1
                run = 0
                for k in range(ss, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        wtr.put(code, ln)
                        run -= 16
                    t, off = _magnitude(v)
                    code, ln = ac_codes[(run << 4) | t]
                    wtr.put(code, ln)
                    wtr.put(off, t)
                    run = 0
                if last < se:
                    code, ln = ac_codes[0x00]   # EOB (EOBRUN = 1)
                    wtr.put(code, ln)
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)

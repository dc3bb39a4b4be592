"""Baseline JPEG (ITU-T T.81) codec — pure numpy + stdlib, same
from-scratch discipline as codec.py's PNG (reference precedent: the
PNG handling in OsmRender.m:101-135; the reference links a system image
library, this engine carries its own codec because the container has
none).

Decoder: baseline sequential Huffman DCT (SOF0, and SOF1 which decodes
identically at 8-bit precision) — single interleaved scan AND
MULTI-SCAN sequential (several SOS per frame, one component each, the
progressive path's component-grid traversal with baseline's full-band
block loop; subset-interleaved partial scans raise by name) — AND
progressive (SOF2: spectral selection, successive approximation, EOB
runs, interleaved DC + non-interleaved AC scans, restarts inside any
scan — a large share of real web JPEGs are progressive, so a multimodal
corpus reader can't skip it). Grayscale or 3-component YCbCr with any
sampling factors
1..2 (4:4:4, 4:2:2, 4:2:0, 4:4:0), 8- and 16-bit quantization tables,
restart markers, and the MJPEG convention of OMITTED Huffman tables
(the Annex K standard tables are installed when a baseline scan starts
with none defined — this is what makes MJPG-in-AVI frames decodable,
raster/containers.py). Lossless, hierarchical, arithmetic-coded and
12-bit frames raise NotImplementedError naming the feature. Both entry
paths share one reconstruction tail (_reconstruct: dequant → IDCT →
upsample → color), so a fully-refined progressive stream decodes
BIT-EXACTLY equal to the baseline encoding of the same coefficients —
pinned by tests.

Encoder: quality-scaled Annex K quantization tables (the public libjpeg
scaling formula), the Annex K standard Huffman tables, optional 4:2:0
subsampling and restart intervals; encode_progressive_jpeg emits a
libjpeg-style scan script (DC first/refine, spectral AC bands,
successive approximation) with per-scan frequency-optimized canonical
Huffman tables (progressive needs EOBn symbols the Annex K tables lack).
Exists so tests and fixtures are self-contained (no image library in
the container) and to give the decoder a spec-honest adversary: every
decoder feature above is pinned by decoding encoder output plus
hand-spliced variations (tests).

Scale note: entropy decode is a per-symbol python loop over a 16-bit
table lookup (Huffman is inherently sequential *within* one image); the
engine's parallel unit is the IMAGE — Arrow batches of independent blobs
inside mapInPandas (raster/ops.py) — so a cluster decodes N images on N
cores regardless of per-image cost. Everything after entropy decode
(dequant, IDCT, upsample, color) is vectorized numpy across all blocks
of the image.
"""

from __future__ import annotations

import re
import struct

import numpy as np

# --- public constants from ITU-T T.81 ------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 / K.2 example quantization tables (natural order)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II basis: D[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_D = np.empty((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _D[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _c, _x

_SOF_UNSUPPORTED = {
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic-coded sequential (SOF9)",
    0xCA: "arithmetic-coded progressive (SOF10)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


# --- Huffman table machinery ----------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]) -> list[tuple[int, int, int]]:
    """(BITS, HUFFVAL) → [(symbol, code, length)] in canonical order."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


# BOUNDED LRU (was an unbounded dict): streams with per-image OPTIMIZED
# Huffman tables (our progressive encoder emits them) make every image
# insert ~4 fresh 65536-entry list pairs — a long-lived executor python
# worker grew to multi-GB RSS and each subsequent build ran ~20x slower
# under the resulting memory pressure (measured: 2nd decode pass over
# the 3k-image pipeline corpus 1.6 s → 9 s; guide §5 executor memory).
# 32 entries ≈ 32 MB/process: enough for the 4 standard baseline tables
# plus every table of any one image's scans, so intra-image reuse (the
# only reuse that exists for optimized tables) always hits.
_LUT_CACHE: dict[tuple, tuple[list[int], list[int]]] = {}
_LUT_CACHE_MAX = 32


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    """16-bit-peek lookup tables: lut_sym[peek16] / lut_len[peek16].
    Python lists — int indexing beats numpy scalar dispatch in the
    per-symbol loop (CLAUDE.md tiny-array trap). LRU-cached by table
    content: real streams reuse the 4 standard tables (and a
    progressive stream reuses its own optimized tables across scans),
    and rebuilding 65536 entries per scan would dominate small-image
    decode (~4 ms/table)."""
    key = (tuple(bits), tuple(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        # refresh recency (dicts iterate in insertion order) so the 4
        # standard baseline tables survive interleaved optimized streams
        del _LUT_CACHE[key]
        _LUT_CACHE[key] = hit
        return hit
    sym = [0] * 65536
    length = [0] * 65536
    for s, code, ln in _canonical_codes(bits, vals):
        lo = code << (16 - ln)
        hi = (code + 1) << (16 - ln)
        sym[lo:hi] = [s] * (hi - lo)
        length[lo:hi] = [ln] * (hi - lo)
    if len(_LUT_CACHE) >= _LUT_CACHE_MAX:
        _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
    _LUT_CACHE[key] = (sym, length)
    return sym, length


# encode maps are ~256-entry dicts (a few KB) — still bounded, same
# per-image-optimized-tables growth concern at corpus scale
_ENC_CACHE: dict[tuple, dict[int, tuple[int, int]]] = {}
_ENC_CACHE_MAX = 512


def _encode_map(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    key = (tuple(bits), tuple(vals))
    hit = _ENC_CACHE.get(key)
    if hit is None:
        hit = {s: (code, ln) for s, code, ln in _canonical_codes(bits, vals)}
        if len(_ENC_CACHE) >= _ENC_CACHE_MAX:
            _ENC_CACHE.pop(next(iter(_ENC_CACHE)))
        _ENC_CACHE[key] = hit
    return hit


def _dht_payload(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, vals = table
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


# --- bit I/O ---------------------------------------------------------------

class _BitReader:
    """MSB-first reader over UNSTUFFED entropy bytes. Reads past the end
    return 1-bits (the spec's pad value), so a final partially-padded
    byte decodes without bounds branches in the hot loop."""

    __slots__ = ("buf", "i", "n", "acc", "end")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.i = 0
        self.n = 0
        self.acc = 0
        self.end = len(buf)

    def _fill(self, need: int) -> None:
        buf, i = self.buf, self.i
        while self.n < need:
            self.acc = (self.acc << 8) | (buf[i] if i < self.end else 0xFF)
            i += 1
            self.n += 8
        self.i = i

    def peek16(self) -> int:
        if self.n < 16:
            self._fill(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill(k)
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _extend(v: int, s: int) -> int:
    """T.81 F.12 EXTEND: s-bit magnitude → signed coefficient."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# --- decoder ----------------------------------------------------------------

_SCAN_END = re.compile(rb"\xff(?![\x00\xd0-\xd7])")
_RST_SPLIT = re.compile(rb"\xff[\xd0-\xd7]")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG bytes → (h, w, 3) RGB uint8 (or
    (h, w, 1) for a single-component grayscale frame)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple[list[int], list[int]]] = {}
    huff_ac: dict[int, tuple[list[int], list[int]]] = {}
    restart_interval = 0
    frame = None  # (h, w, [(comp_id, hi, vi, tq)])
    progressive = False
    grids = None  # progressive coef stores, per frame comp: (bv, bh, 64)

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — real-world MJPG frames contain them
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            # stream ends in fill bytes with the marker cut off — keep
            # the codec's malformed-input contract (ValueError, never
            # IndexError)
            raise ValueError(f"truncated JPEG: fill bytes at byte {pos} "
                             "with no marker following")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # no payload
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} decoding is not "
                "implemented — baseline sequential (SOF0/SOF1) and "
                "progressive (SOF2) only"
            )
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision (8 only)")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(body):
                tcth = body[o]
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                tbl = (bits, vals)
                (huff_dc if tcth >> 4 == 0 else huff_ac)[tcth & 15] = tbl
                o += 17 + nv
        elif marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                if pq == 0:
                    qt[tq] = np.frombuffer(
                        body[o + 1 : o + 65], dtype=np.uint8
                    ).astype(np.int64)
                    o += 65
                else:  # 16-bit table
                    qt[tq] = np.frombuffer(
                        body[o + 1 : o + 129], dtype=">u2"
                    ).astype(np.int64)
                    o += 129
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan_comps.append((cs, tdta >> 4, tdta & 15))
            if not progressive:
                if not huff_dc and not huff_ac:
                    # MJPEG convention: frames carry no DHT; the standard
                    # Annex K tables are implied
                    huff_dc = {0: HUFF_DC_LUMA, 1: HUFF_DC_CHROMA}
                    huff_ac = {0: HUFF_AC_LUMA, 1: HUFF_AC_CHROMA}
                if len(scan_comps) == len(frame[2]):
                    if grids is not None:
                        raise ValueError(
                            "interleaved all-component scan after partial "
                            "scans in a sequential stream"
                        )
                    return _decode_scan(
                        data, pos, frame, scan_comps, qt, huff_dc, huff_ac,
                        restart_interval,
                    )
                # MULTI-SCAN sequential baseline (T.81 allows several SOS
                # per SOF0 frame, one subset of components each): decode
                # each non-interleaved scan into the shared grids — the
                # progressive path's component-grid traversal with
                # baseline's full-band block loop — and reconstruct at EOI
                if len(scan_comps) != 1:
                    raise NotImplementedError(
                        "multi-component PARTIAL scan in a sequential "
                        "JPEG (subset-interleaved); one-component scans "
                        "and full-component scans are supported"
                    )
                if grids is None:
                    _hm, _vm, mcu_cols, mcu_rows = _mcu_geometry(frame)
                    grids = [
                        np.zeros((mcu_rows * vi, mcu_cols * hi, 64), np.int32)
                        for _cid, hi, vi, _tq in frame[2]
                    ]
                pos = _decode_baseline_ni_scan(
                    data, pos, frame, scan_comps[0], grids,
                    huff_dc, huff_ac, restart_interval,
                )
                continue
            # progressive: accumulate this scan's band into the shared
            # coefficient grids, keep parsing — reconstruction at EOI
            band = (
                body[1 + 2 * ns],
                body[2 + 2 * ns],
                body[3 + 2 * ns] >> 4,
                body[3 + 2 * ns] & 15,
            )  # Ss, Se, Ah, Al
            if grids is None:
                _h, _w, comps = frame
                _hm, _vm, mcu_cols, mcu_rows = _mcu_geometry(frame)
                grids = [
                    np.zeros((mcu_rows * vi, mcu_cols * hi, 64), np.int32)
                    for _cid, hi, vi, _tq in comps
                ]
            pos = _decode_progressive_scan(
                data, pos, frame, scan_comps, band, grids,
                huff_dc, huff_ac, restart_interval,
            )
        # APPn / COM / anything else with a length: skipped
    if grids is not None:
        # progressive, or multi-scan sequential: a stream truncated after
        # any completed scan still reconstructs; missing bands /
        # refinements / component scans are just zero
        return _reconstruct(frame, grids, qt)
    raise ValueError("no SOS scan found")


def _mcu_geometry(frame):
    _h, _w, comps = frame
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    mcu_cols = -(-frame[1] // (8 * hmax))
    mcu_rows = -(-frame[0] // (8 * vmax))
    return hmax, vmax, mcu_cols, mcu_rows


def _decode_baseline_ni_scan(
    data, pos, frame, scan_comp, grids, huff_dc, huff_ac, dri
):
    """One NON-interleaved sequential-baseline scan (multi-scan SOF0:
    one component per SOS, the full 0..63 band per block) into the
    shared per-component grids. The traversal is the progressive path's
    component-grid geometry (ceil of the component's scaled dims, not
    the MCU-padded grid); the block loop is baseline's DC+AC decode.
    Returns the stream position of the marker ending the scan."""
    img_h, img_w, comps = frame
    hmax, vmax, _mc, _mr = _mcu_geometry(frame)
    by_id = {cid: (i, hi, vi) for i, (cid, hi, vi, _tq) in enumerate(comps)}
    cs, td, ta = scan_comp
    ci, hi, vi = by_id[cs]
    cbh = -(-(-(-img_w * hi // hmax)) // 8)
    cbv = -(-(-(-img_h * vi // vmax)) // 8)
    n_units = cbv * cbh
    if td not in huff_dc:
        raise ValueError(f"missing DC Huffman table {td}")
    if ta not in huff_ac:
        raise ValueError(f"missing AC Huffman table {ta}")
    dc_sym, dc_len = _decode_lut(*huff_dc[td])
    ac_sym, ac_len = _decode_lut(*huff_ac[ta])
    g = grids[ci]
    segments, end = _scan_segments(data, pos, n_units, dri)
    unit = 0
    for seg in segments:
        # inlined bit-reader state (same idiom as _decode_scan)
        buf = seg
        bend = len(buf)
        i = 0
        acc = 0
        n = 0
        pred = 0  # restarts reset the DC predictor
        for _ in range(min(dri, n_units - unit) if dri else n_units):
            by, bx = divmod(unit, cbh)
            row = g[by, bx]
            while n < 16:
                acc = (acc << 8) | (buf[i] if i < bend else 0xFF)
                i += 1
                n += 8
            p = (acc >> (n - 16)) & 0xFFFF
            ln = dc_len[p]
            if ln == 0:
                raise ValueError("invalid DC Huffman code")
            n -= ln
            acc &= (1 << n) - 1
            s = dc_sym[p]
            if s:
                while n < s:
                    acc = (acc << 8) | (buf[i] if i < bend else 0xFF)
                    i += 1
                    n += 8
                n -= s
                v = acc >> n
                acc &= (1 << n) - 1
                pred += v - (1 << s) + 1 if v < (1 << (s - 1)) else v
            row[0] = pred
            k = 1
            while k < 64:
                while n < 16:
                    acc = (acc << 8) | (buf[i] if i < bend else 0xFF)
                    i += 1
                    n += 8
                p = (acc >> (n - 16)) & 0xFFFF
                ln = ac_len[p]
                if ln == 0:
                    raise ValueError("invalid AC Huffman code")
                n -= ln
                acc &= (1 << n) - 1
                rs = ac_sym[p]
                s = rs & 15
                if s == 0:
                    if rs == 0xF0:  # ZRL: 16 zeros
                        k += 16
                        continue
                    break  # EOB
                k += rs >> 4
                if k > 63:
                    raise ValueError("AC run past block end")
                while n < s:
                    acc = (acc << 8) | (buf[i] if i < bend else 0xFF)
                    i += 1
                    n += 8
                n -= s
                v = acc >> n
                acc &= (1 << n) - 1
                row[k] = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                k += 1
            unit += 1
    return end


def _decode_scan(data, pos, frame, scan_comps, qt, huff_dc, huff_ac, dri):
    img_h, img_w, comps = frame
    if len(scan_comps) != len(comps):
        # decode_jpeg routes partial scans to _decode_baseline_ni_scan
        raise ValueError("interleaved decoder fed a partial scan")
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    hmax, vmax, mcu_cols, mcu_rows = _mcu_geometry(frame)
    n_mcus = mcu_cols * mcu_rows

    # per scan-component: LUTs, coefficient stores, block counts
    luts = []
    coefs = []
    blocks_per_mcu = []
    for cs, td, ta in scan_comps:
        hi, vi, _tq = by_id[cs]
        luts.append((_decode_lut(*huff_dc[td]), _decode_lut(*huff_ac[ta])))
        blocks_per_mcu.append(hi * vi)
        coefs.append(np.zeros((n_mcus * hi * vi, 64), dtype=np.int32))

    # isolate the entropy stream: ends at the first marker that is not
    # byte-stuffing and not RSTn; split on RSTn, unstuff each segment
    m = _SCAN_END.search(data, pos)
    scan_bytes = data[pos : m.start() if m else len(data)]
    segments = [
        s.replace(b"\xff\x00", b"\xff") for s in _RST_SPLIT.split(scan_bytes)
    ]
    expected_segments = (
        -(-n_mcus // dri) if dri else 1
    )
    if len(segments) != expected_segments:
        raise ValueError(
            f"restart structure mismatch: {len(segments)} entropy segments "
            f"for {n_mcus} MCUs at restart interval {dri}"
        )

    mcu = 0
    n_sc = len(scan_comps)
    for seg in segments:
        # bit-reader state inlined as locals: the per-symbol
        # peek16/skip/read method calls were ~70% of baseline decode
        # wall (guide §4.2 — per-row python overhead; measured 4.7 ms →
        # 2.1 ms per 64px image after inlining, bit-identical output)
        buf = seg
        end = len(buf)
        i = 0
        acc = 0
        n = 0
        preds = [0] * n_sc
        seg_mcus = min(dri, n_mcus - mcu) if dri else n_mcus
        for _ in range(seg_mcus):
            for ci in range(n_sc):
                (dc_sym, dc_len), (ac_sym, ac_len) = luts[ci]
                nb = blocks_per_mcu[ci]
                store = coefs[ci]
                base = mcu * nb
                for b in range(nb):
                    row = store[base + b]
                    # DC
                    while n < 16:
                        acc = (acc << 8) | (buf[i] if i < end else 0xFF)
                        i += 1
                        n += 8
                    p = (acc >> (n - 16)) & 0xFFFF
                    ln = dc_len[p]
                    if ln == 0:
                        raise ValueError("invalid DC Huffman code")
                    n -= ln
                    acc &= (1 << n) - 1
                    s = dc_sym[p]
                    if s:
                        while n < s:
                            acc = (acc << 8) | (buf[i] if i < end else 0xFF)
                            i += 1
                            n += 8
                        n -= s
                        v = acc >> n
                        acc &= (1 << n) - 1
                        preds[ci] += (
                            v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                        )
                    row[0] = preds[ci]
                    # AC
                    k = 1
                    while k < 64:
                        while n < 16:
                            acc = (acc << 8) | (buf[i] if i < end else 0xFF)
                            i += 1
                            n += 8
                        p = (acc >> (n - 16)) & 0xFFFF
                        ln = ac_len[p]
                        if ln == 0:
                            raise ValueError("invalid AC Huffman code")
                        n -= ln
                        acc &= (1 << n) - 1
                        rs = ac_sym[p]
                        s = rs & 15
                        if s == 0:
                            if rs == 0xF0:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("AC run past block end")
                        while n < s:
                            acc = (acc << 8) | (buf[i] if i < end else 0xFF)
                            i += 1
                            n += 8
                        n -= s
                        v = acc >> n
                        acc &= (1 << n) - 1
                        row[k] = (
                            v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                        )
                        k += 1
            mcu += 1

    # MCU-ordered stores → per-component block grids, shared tail.
    # Scan-comp order equals frame-comp order here (interleaved scan).
    grids = []
    for ci, (cs, _td, _ta) in enumerate(scan_comps):
        hi, vi, _tq = by_id[cs]
        grids.append(
            coefs[ci]
            .reshape(mcu_rows, mcu_cols, vi, hi, 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(mcu_rows * vi, mcu_cols * hi, 64)
        )
    return _reconstruct(frame, grids, qt)


def _reconstruct(frame, grids, qt):
    """Shared decode tail: per-frame-component (bv, bh, 64) int32
    zigzag-order quantized coefficient grids → RGB/gray image. Both the
    baseline and progressive entropy decoders land here, which is what
    makes a fully-refined progressive stream bit-exactly equal to its
    baseline twin."""
    img_h, img_w, comps = frame
    hmax, vmax, _mc, _mr = _mcu_geometry(frame)
    planes = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError(f"missing quantization table {tq}")
        g = grids[ci]
        # the DQT payload is stored in ZIGZAG order per T.81 (and by our
        # own encoder), and coefs are in zigzag-stream order too — the
        # dequant is element-wise. Indexing the table with ZIGZAG again
        # double-permuted it (review catch: q50 round-trip measured
        # 32.6 dB with the bug vs 37.6 dB fixed)
        dq = g.reshape(-1, 64).astype(np.float64) * qt[tq]  # still zigzag
        nat = np.empty_like(dq)
        nat[:, ZIGZAG] = dq  # dezigzag
        F = nat.reshape(-1, 8, 8)
        # batched matmul == einsum("ux,nuv,vy->nxy") up to FP summation
        # order; ~6x faster (BLAS). Bit-equality of every decoded pixel
        # over the full fixture corpus + all goldens is asserted by the
        # test suite and the driver-side oracle VALUES (any flip would
        # change the committed oracle SQL text, which is hash-pinned)
        blocks = np.matmul(np.matmul(_D.T, F), _D) + 128.0
        blocks = np.clip(np.floor(blocks + 0.5), 0, 255).astype(np.uint8)
        bv, bh = g.shape[:2]
        plane = (
            blocks.reshape(bv, bh, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bv * 8, bh * 8)
        )
        comp_h = -(-img_h * vi // vmax)
        comp_w = -(-img_w * hi // hmax)
        plane = plane[:comp_h, :comp_w]
        if vi != vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi != hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        planes.append(plane[:img_h, :img_w])

    if len(planes) == 1:
        return planes[0][:, :, None].copy()
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


# --- progressive (SOF2) entropy decode -------------------------------------

def _scan_segments(data, pos, n_units, dri):
    """Isolate one scan's entropy bytes (ends at the first marker that
    is neither byte-stuffing nor RSTn), split on restarts, unstuff.
    Returns (segments, end_pos)."""
    m = _SCAN_END.search(data, pos)
    end = m.start() if m else len(data)
    scan_bytes = data[pos:end]
    segments = [
        s.replace(b"\xff\x00", b"\xff") for s in _RST_SPLIT.split(scan_bytes)
    ]
    expected = -(-n_units // dri) if dri else 1
    if len(segments) != expected:
        raise ValueError(
            f"restart structure mismatch: {len(segments)} entropy "
            f"segments for {n_units} units at restart interval {dri}"
        )
    return segments, end


def _decode_progressive_scan(
    data, pos, frame, scan_comps, band, grids, huff_dc, huff_ac, dri
):
    """Decode one progressive scan (T.81 G.2) into the shared grids;
    returns the stream position of the marker ending the scan. Handles
    interleaved/non-interleaved DC scans (first + refinement) and
    single-component AC scans (spectral bands, successive approximation,
    EOB runs), with restarts resetting predictors and the EOB run."""
    ss, se, ah, al = band
    img_h, img_w, comps = frame
    hmax, vmax, mcu_cols, mcu_rows = _mcu_geometry(frame)
    by_id = {cid: (i, hi, vi) for i, (cid, hi, vi, _tq) in enumerate(comps)}
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC (Ss=0, Se>0)")
    if ss > 0 and len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    interleaved = len(scan_comps) > 1

    if not interleaved:
        cs0, _td0, _ta0 = scan_comps[0]
        _ci0, hi0, vi0 = by_id[cs0]
        # non-interleaved traversal covers the COMPONENT's own block
        # grid (ceil of its scaled dims), not the MCU-padded grid
        cbh = -(-(-(-img_w * hi0 // hmax)) // 8)
        cbv = -(-(-(-img_h * vi0 // vmax)) // 8)
        n_units = cbv * cbh
    else:
        n_units = mcu_rows * mcu_cols

    segments, end = _scan_segments(data, pos, n_units, dri)

    if ss == 0:  # DC scan (first or refinement), any component count
        luts = []
        for _cs, td, _ta in scan_comps:
            if ah == 0:
                if td not in huff_dc:
                    raise ValueError(f"missing DC Huffman table {td}")
                luts.append(_decode_lut(*huff_dc[td]))
            else:
                luts.append(None)  # refinement reads raw bits only
        unit = 0
        for seg in segments:
            # bit-reader state inlined as locals, same idiom (and same
            # past-the-end 0xFF padding) as the baseline _decode_scan —
            # the per-symbol peek16/skip/read method calls dominated
            # progressive decode wall (guide §4.2)
            buf = seg
            bend = len(buf)
            i = 0
            acc = 0
            n = 0
            preds = [0] * len(scan_comps)
            for _ in range(min(dri, n_units - unit) if dri else n_units):
                for si, (cs, _td, _ta) in enumerate(scan_comps):
                    ci, hi, vi = by_id[cs]
                    g = grids[ci]
                    if interleaved:
                        mr, mc = divmod(unit, mcu_cols)
                        blocks = [
                            (mr * vi + v, mc * hi + h)
                            for v in range(vi)
                            for h in range(hi)
                        ]
                    else:
                        blocks = [divmod(unit, cbh)]
                    for by, bx in blocks:
                        if ah == 0:
                            dc_sym, dc_len = luts[si]
                            while n < 16:
                                acc = (acc << 8) | (
                                    buf[i] if i < bend else 0xFF
                                )
                                i += 1
                                n += 8
                            p = (acc >> (n - 16)) & 0xFFFF
                            ln = dc_len[p]
                            if ln == 0:
                                raise ValueError("invalid DC Huffman code")
                            n -= ln
                            acc &= (1 << n) - 1
                            s = dc_sym[p]
                            if s:
                                while n < s:
                                    acc = (acc << 8) | (
                                        buf[i] if i < bend else 0xFF
                                    )
                                    i += 1
                                    n += 8
                                n -= s
                                v = acc >> n
                                acc &= (1 << n) - 1
                                preds[si] += (
                                    v - (1 << s) + 1
                                    if v < (1 << (s - 1))
                                    else v
                                )
                            g[by, bx, 0] = preds[si] << al
                        else:
                            if n < 1:
                                acc = (acc << 8) | (
                                    buf[i] if i < bend else 0xFF
                                )
                                i += 1
                                n += 8
                            n -= 1
                            bit = acc >> n
                            acc &= (1 << n) - 1
                            if bit:
                                g[by, bx, 0] |= 1 << al
                unit += 1
        return end

    # AC scan: single component
    cs, _td, ta = scan_comps[0]
    ci, _hi, _vi = by_id[cs]
    if ta not in huff_ac:
        raise ValueError(f"missing AC Huffman table {ta}")
    ac_sym, ac_len = _decode_lut(*huff_ac[ta])
    g = grids[ci]
    p1, n1 = 1 << al, -(1 << al)
    unit = 0
    for seg in segments:
        # same inlined bit-reader idiom as the DC loop above
        buf = seg
        bend = len(buf)
        i = 0
        acc = 0
        n = 0
        eobrun = 0
        for _ in range(min(dri, n_units - unit) if dri else n_units):
            by, bx = divmod(unit, cbh)
            row = g[by, bx]
            if ah == 0:
                # --- first scan for this band (G.1.2.2) ---
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        while n < 16:
                            acc = (acc << 8) | (buf[i] if i < bend else 0xFF)
                            i += 1
                            n += 8
                        p = (acc >> (n - 16)) & 0xFFFF
                        ln = ac_len[p]
                        if ln == 0:
                            raise ValueError("invalid AC Huffman code")
                        n -= ln
                        acc &= (1 << n) - 1
                        rs = ac_sym[p]
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r < 15:  # EOBn: run of (1<<r)+ext blocks
                                eobrun = (1 << r) - 1
                                if r:
                                    while n < r:
                                        acc = (acc << 8) | (
                                            buf[i] if i < bend else 0xFF
                                        )
                                        i += 1
                                        n += 8
                                    n -= r
                                    eobrun += acc >> n
                                    acc &= (1 << n) - 1
                                break
                            k += 16  # ZRL
                        else:
                            k += r
                            if k > se:
                                raise ValueError("AC run past band end")
                            while n < s:
                                acc = (acc << 8) | (
                                    buf[i] if i < bend else 0xFF
                                )
                                i += 1
                                n += 8
                            n -= s
                            v = acc >> n
                            acc &= (1 << n) - 1
                            row[k] = (
                                v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                            ) * p1
                            k += 1
            else:
                # --- refinement scan (G.1.2.3): correction bits on
                # nonzero-history coefficients, ±1<<Al on newly
                # significant ones ---
                k = ss
                if eobrun == 0:
                    while k <= se:
                        while n < 16:
                            acc = (acc << 8) | (buf[i] if i < bend else 0xFF)
                            i += 1
                            n += 8
                        p = (acc >> (n - 16)) & 0xFFFF
                        ln = ac_len[p]
                        if ln == 0:
                            raise ValueError("invalid AC Huffman code")
                        n -= ln
                        acc &= (1 << n) - 1
                        rs = ac_sym[p]
                        r, s = rs >> 4, rs & 15
                        val = 0
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    while n < r:
                                        acc = (acc << 8) | (
                                            buf[i] if i < bend else 0xFF
                                        )
                                        i += 1
                                        n += 8
                                    n -= r
                                    eobrun += acc >> n
                                    acc &= (1 << n) - 1
                                break
                            # r == 15 → ZRL: pass 16 zero-history coeffs
                        elif s == 1:
                            if n < 1:
                                acc = (acc << 8) | (
                                    buf[i] if i < bend else 0xFF
                                )
                                i += 1
                                n += 8
                            n -= 1
                            val = p1 if acc >> n else n1
                            acc &= (1 << n) - 1
                        else:
                            raise ValueError(
                                "invalid refinement magnitude category"
                            )
                        while k <= se:
                            rv = int(row[k])
                            if rv != 0:
                                if n < 1:
                                    acc = (acc << 8) | (
                                        buf[i] if i < bend else 0xFF
                                    )
                                    i += 1
                                    n += 8
                                n -= 1
                                bit = acc >> n
                                acc &= (1 << n) - 1
                                if bit and (rv & p1) == 0:
                                    row[k] = rv + (p1 if rv >= 0 else n1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            row[k] = val
                        k += 1
                if eobrun > 0:
                    # EOB-run tail: correction bits only, rest of band
                    while k <= se:
                        rv = int(row[k])
                        if rv != 0:
                            if n < 1:
                                acc = (acc << 8) | (
                                    buf[i] if i < bend else 0xFF
                                )
                                i += 1
                                n += 8
                            n -= 1
                            bit = acc >> n
                            acc &= (1 << n) - 1
                            if bit and (rv & p1) == 0:
                                row[k] = rv + (p1 if rv >= 0 else n1)
                        k += 1
                    eobrun -= 1
            unit += 1
    return end


# --- encoder ----------------------------------------------------------------

def _scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality→scale mapping over the Annex K tables."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _subsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Box-mean downsample by (fy, fx) with edge replication to even
    multiples first."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ph = -(-h // fy) * fy
    pw = -(-w // fx) * fx
    if ph != h or pw != w:
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return plane.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def _blockify(plane: np.ndarray, mcu_rows: int, mcu_cols: int, vi: int, hi: int) -> np.ndarray:
    """Pad (edge) to the MCU grid and emit blocks in MCU order,
    shape (mcu_rows*mcu_cols*vi*hi, 8, 8)."""
    th, tw = mcu_rows * vi * 8, mcu_cols * hi * 8
    h, w = plane.shape
    if th != h or tw != w:
        plane = np.pad(plane, ((0, th - h), (0, tw - w)), mode="edge")
    return (
        plane.reshape(mcu_rows, vi, 8, mcu_cols, hi, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(-1, 8, 8)
    )


def _emit_block(bw, row, pred: int, dc_map, ac_map) -> int:
    """Entropy-code one zigzag block (DC diff + AC RLE); returns the new
    DC predictor. Shared by the interleaved and multi-scan writers."""
    diff = int(row[0]) - pred
    pred = int(row[0])
    s = abs(diff).bit_length()
    mag = diff + (1 << s) - 1 if diff < 0 else diff
    code, ln = dc_map[s]
    bw.write(code, ln)
    if s:
        bw.write(mag, s)
    run = 0
    for k in range(1, 64):
        v = int(row[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_map[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        mag = v + (1 << s) - 1 if v < 0 else v
        code, ln = ac_map[run << 4 | s]
        bw.write(code, ln)
        bw.write(mag, s)
        run = 0
    if run:
        code, ln = ac_map[0x00]
        bw.write(code, ln)
    return pred


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    multi_scan: bool = False,
) -> bytes:
    """(h, w[, c]) uint8 → baseline JFIF bytes. c ∈ {1 gray, 3 RGB,
    4 RGBA (alpha dropped — JPEG has no alpha)}. ``subsampling``:
    "444" (no chroma subsampling) or "420" (2×2 box mean).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path and is what a robust
    encoder does for error resilience on large images).
    ``multi_scan`` emits one NON-interleaved SOS per component (T.81
    multi-scan sequential — the same quantized coefficients, so the
    decode is bit-exactly equal to the single-scan encoding)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3, 4):
        raise ValueError(f"unsupported channel count {c}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444 or 420, got {subsampling!r}")
    gray = c == 1
    qt0 = _scaled_qtable(QT_LUMA, quality)
    qt1 = _scaled_qtable(QT_CHROMA, quality)

    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
        factors = [(1, 1)]
        qtabs = [qt0]
        tsel = [0]  # huffman/quant table class per component
    else:
        y, cb, cr = _to_ycbcr(img)
        if subsampling == "420":
            factors = [(2, 2), (1, 1), (1, 1)]  # (hi, vi)
            planes = [y, _subsample(cb, 2, 2), _subsample(cr, 2, 2)]
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
            planes = [y, cb, cr]
        qtabs = [qt0, qt1, qt1]
        tsel = [0, 1, 1]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))
    n_mcus = mcu_cols * mcu_rows

    # DCT + quantize, all blocks per component at once
    zz_all = []
    for plane, (hi, vi), qtab in zip(planes, factors, qtabs):
        blocks = _blockify(plane, mcu_rows, mcu_cols, vi, hi) - 128.0
        F = np.matmul(np.matmul(_D, blocks), _D.T)
        qn = F.reshape(-1, 64)[:, ZIGZAG] / qtab[ZIGZAG]
        q = np.where(qn >= 0, np.floor(qn + 0.5), -np.floor(-qn + 0.5))
        zz_all.append(q.astype(np.int64))

    dc_maps = [_encode_map(*HUFF_DC_LUMA), _encode_map(*HUFF_DC_CHROMA)]
    ac_maps = [_encode_map(*HUFF_AC_LUMA), _encode_map(*HUFF_AC_CHROMA)]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0]) + bytes(
        int(v) for v in qt0[ZIGZAG]
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([1]) + bytes(
            int(v) for v in qt1[ZIGZAG]
        )
    # SOF0
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        hi, vi = factors[i]
        sof += bytes([i + 1, hi << 4 | vi, tsel[i]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    tables = [(0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA)]
    if not gray:
        tables += [(0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA)]
    for tc, th, tbl in tables:
        payload = _dht_payload(tc, th, tbl)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if multi_scan and nc > 1:
        # one NON-interleaved SOS per component, raster over the
        # component's own block grid (ceil of its scaled dims — MCU
        # padding blocks are NOT coded in a non-interleaved scan);
        # restart_interval counts component blocks here (T.81: MCU =
        # one data unit in a non-interleaved scan)
        for ci in range(nc):
            hi, vi = factors[ci]
            cbh = -(-(-(-w * hi // hmax)) // 8)
            cbv = -(-(-(-h * vi // vmax)) // 8)
            sos = bytes([1, ci + 1, tsel[ci] << 4 | tsel[ci]]) + b"\x00\x3f\x00"
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            dc_map, ac_map = dc_maps[tsel[ci]], ac_maps[tsel[ci]]
            nb = hi * vi
            bw = _BitWriter()
            pred = 0
            rst = 0
            for unit in range(cbv * cbh):
                if restart_interval and unit and unit % restart_interval == 0:
                    bw.flush()
                    out += bw.buf
                    bw = _BitWriter()
                    out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) & 7
                    pred = 0
                by, bx = divmod(unit, cbh)
                # zz_all is MCU-ordered: (mcu, v, h) → flat index
                idx = ((by // vi) * mcu_cols + bx // hi) * nb + (
                    by % vi
                ) * hi + bx % hi
                pred = _emit_block(bw, zz_all[ci][idx], pred, dc_map, ac_map)
            bw.flush()
            out += bw.buf
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # SOS
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, tsel[i] << 4 | tsel[i]])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # entropy-coded scan
    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out += bw.buf
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            preds = [0] * nc
        for ci in range(nc):
            hi, vi = factors[ci]
            dc_map, ac_map = dc_maps[tsel[ci]], ac_maps[tsel[ci]]
            nb = hi * vi
            for b in range(nb):
                preds[ci] = _emit_block(
                    bw, zz_all[ci][mcu * nb + b], preds[ci], dc_map, ac_map
                )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder ----------------------------------------------------
#
# Scan scripts are (comp_indices, Ss, Se, Ah, Al) tuples, libjpeg-style
# defaults: an interleaved DC first scan at Al=1, spectral AC bands with
# successive approximation, then the refinement passes that complete
# every coefficient to full precision (so the default script decodes
# bit-exactly equal to the baseline encoding of the same coefficients).

_PROG_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_PROG_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


_HUFF_DUMMY = 256  # outside the 8-bit JPEG symbol space


def _build_huffman(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Frequency-optimized canonical (BITS, HUFFVAL). Progressive scans
    need EOBn symbols (0x10..0xE0) that the Annex K baseline tables lack,
    so each AC scan ships its own table — standard practice (libjpeg
    always optimizes progressive tables). Plain Huffman over the counts;
    if a pathological distribution exceeds JPEG's 16-bit code limit,
    fall back to a flat fixed-length code (valid, just less tight).

    Mirrors libjpeg's jpeg_gen_optimal_table trick: a dummy 257th symbol
    at frequency 1 joins the build and is dropped after length
    assignment. It is popped FIRST (tie index -1), so it sits in the
    first merged pair — which lands at maximum depth of the final tree —
    and, being the largest symbol value, it takes the numerically-last
    canonical code there: the all-ones codeword. Dropping it guarantees
    no real symbol owns the all-ones code, so the 1-bit padding at
    entropy-segment ends can never decode as a valid symbol (T.81
    Annex K practice)."""
    import heapq

    syms = sorted(freqs)
    if not syms:
        raise ValueError("empty symbol alphabet")
    work = dict(freqs)
    work[_HUFF_DUMMY] = 1
    heap = [(1, -1, (_HUFF_DUMMY,))] + [
        (f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))
    ]
    heapq.heapify(heap)
    depth = dict.fromkeys(work, 0)
    tie = len(heap)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tie, g1 + g2))
        tie += 1
    if max(depth.values()) > 16:
        flat = max(1, (len(work) - 1).bit_length())
        depth = dict.fromkeys(work, flat)
    # canonical order: the dummy is last (max depth, largest symbol), so
    # removing it drops only the final — all-ones — codeword
    order = sorted(work, key=lambda s: (depth[s], s))
    assert order[-1] == _HUFF_DUMMY
    bits = [0] * 16
    for s in syms:
        bits[depth[s] - 1] += 1
    return bits, order[:-1]


class _EobState:
    """Pending EOB run + the buffered correction bits that belong to it
    (refinement scans interleave correction bits INTO the run: the
    decoder reads them back as it walks the run's blocks)."""

    __slots__ = ("run", "bits")

    def __init__(self):
        self.run = 0
        self.bits: list[int] = []

    def flush(self, out: list) -> None:
        if self.run == 0:
            return
        r = self.run.bit_length() - 1
        out.append(("sym", r << 4))
        if r:
            out.append(("bits", self.run - (1 << r), r))
        for b in self.bits:
            out.append(("bits", b, 1))
        self.run = 0
        self.bits = []


def _tokens_ac_first(row, ss, se, al, out, eob):
    """One block of an AC first scan (T.81 G.1.2.2) → tokens. The point
    transform for AC is magnitude shift (truncate toward zero)."""
    vals = []
    for k in range(ss, se + 1):
        v = int(row[k])
        t = abs(v) >> al
        vals.append(-t if v < 0 else t)
    if not any(vals):
        eob.run += 1
        if eob.run == 32767:
            eob.flush(out)
        return
    eob.flush(out)
    run = 0
    for v in vals:
        if v == 0:
            run += 1
            continue
        while run > 15:
            out.append(("sym", 0xF0))
            run -= 16
        s = abs(v).bit_length()
        mag = v + (1 << s) - 1 if v < 0 else v
        out.append(("sym", run << 4 | s))
        out.append(("bits", mag, s))
        run = 0
    if run:  # trailing zeros end the block in an EOB
        eob.run += 1
        if eob.run == 32767:
            eob.flush(out)


def _tokens_ac_refine(row, ss, se, al, out, eob):
    """One block of an AC refinement scan (G.1.2.3) → tokens, emitted
    by mirroring the decoder's walk exactly: ZRLs pass 16 zero-history
    positions, correction bits for nonzero-history positions follow the
    symbol that passes them, sign bit precedes them."""
    a = [abs(int(row[k])) >> al for k in range(ss, se + 1)]
    sig = [i for i, t in enumerate(a) if t == 1]  # newly significant
    if not sig:
        eob.run += 1
        eob.bits.extend(t & 1 for t in a if t > 1)
        if eob.run == 32767:
            eob.flush(out)
        return
    eob.flush(out)
    i = 0  # walk position (band-relative)
    for sp in sig:
        r = sum(1 for j in range(i, sp) if a[j] == 0)
        while r > 15:
            out.append(("sym", 0xF0))
            passed = 0
            while passed < 16:
                if a[i] > 1:
                    out.append(("bits", a[i] & 1, 1))
                else:  # zero-history (a[i]==0: no 1s before sp)
                    passed += 1
                i += 1
            r -= 16
        out.append(("sym", r << 4 | 1))
        out.append(("bits", 1 if int(row[ss + sp]) > 0 else 0, 1))
        while i < sp:
            if a[i] > 1:
                out.append(("bits", a[i] & 1, 1))
            i += 1
        i = sp + 1
    if i < len(a):  # tail after the last newly-significant coefficient
        eob.run += 1
        eob.bits.extend(t & 1 for t in a[i:] if t > 1)
        if eob.run == 32767:
            eob.flush(out)


def encode_progressive_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    scans: list[tuple] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """(h, w[, c]) uint8 → progressive (SOF2) JFIF bytes. The default
    scan script fully refines every coefficient, so the output decodes
    BIT-EXACTLY equal to `decode_jpeg(encode_jpeg(img, quality,
    subsampling))` — pinned by tests. Pass a custom ``scans`` list of
    (comp_indices, Ss, Se, Ah, Al) to emit a prefix (preview) stream.
    DC scans use the Annex K DC tables; each AC scan carries its own
    frequency-optimized table (progressive EOBn symbols aren't in the
    Annex K AC tables)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3, 4):
        raise ValueError(f"unsupported channel count {c}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444 or 420, got {subsampling!r}")
    gray = c == 1
    qt0 = _scaled_qtable(QT_LUMA, quality)
    qt1 = _scaled_qtable(QT_CHROMA, quality)
    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
        factors = [(1, 1)]
        qtabs = [qt0]
        tsel = [0]
    else:
        y, cb, cr = _to_ycbcr(img)
        if subsampling == "420":
            factors = [(2, 2), (1, 1), (1, 1)]
            planes = [y, _subsample(cb, 2, 2), _subsample(cr, 2, 2)]
        else:
            factors = [(1, 1)] * 3
            planes = [y, cb, cr]
        qtabs = [qt0, qt1, qt1]
        tsel = [0, 1, 1]
    if scans is None:
        scans = _PROG_SCRIPT_GRAY if gray else _PROG_SCRIPT_COLOR

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))

    # forward DCT + quantize with the IDENTICAL expression tree the
    # baseline encoder uses (same _blockify + batched-matmul shapes — a
    # different contraction order perturbs the float sums enough to
    # flip a coefficient at the +0.5 rounding boundary, which broke the
    # progressive==baseline bit-exactness), then reorder the MCU-ordered
    # blocks onto per-component (by, bx) grids both traversals share
    grids = []
    for plane, (hi, vi), qtab in zip(planes, factors, qtabs):
        blocks = _blockify(plane, mcu_rows, mcu_cols, vi, hi) - 128.0
        F = np.matmul(np.matmul(_D, blocks), _D.T)
        qn = F.reshape(-1, 64)[:, ZIGZAG] / qtab[ZIGZAG]
        q = np.where(qn >= 0, np.floor(qn + 0.5), -np.floor(-qn + 0.5))
        grids.append(
            q.astype(np.int64)
            .reshape(mcu_rows, mcu_cols, vi, hi, 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(mcu_rows * vi, mcu_cols * hi, 64)
        )

    dc_maps = [_encode_map(*HUFF_DC_LUMA), _encode_map(*HUFF_DC_CHROMA)]

    out = bytearray()
    out += b"\xff\xd8"
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0]) + bytes(
        int(v) for v in qt0[ZIGZAG]
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([1]) + bytes(
            int(v) for v in qt1[ZIGZAG]
        )
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        hi, vi = factors[i]
        sof += bytes([i + 1, hi << 4 | vi, tsel[i]])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dc_tables = [(0, 0, HUFF_DC_LUMA)]
    if not gray:
        dc_tables.append((0, 1, HUFF_DC_CHROMA))
    for tc, th_, tbl in dc_tables:
        payload = _dht_payload(tc, th_, tbl)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    for comp_idx, ss, se, ah, al in scans:
        if ss == 0 and se != 0:
            raise ValueError("scan mixes DC and AC")
        if ss > 0 and len(comp_idx) != 1:
            raise ValueError("AC scan must be single-component")
        interleaved = len(comp_idx) > 1
        if interleaved:
            n_units = mcu_rows * mcu_cols
        else:
            ci0 = comp_idx[0]
            hi0, vi0 = factors[ci0]
            cbh = -(-(-(-w * hi0 // hmax)) // 8)
            cbv = -(-(-(-h * vi0 // vmax)) // 8)
            n_units = cbv * cbh

        # token pass: ("sym", symbol) / ("sym2", class, symbol) for DC /
        # ("bits", value, n) / ("rst",)
        toks: list = []
        if ss == 0:
            preds = [0] * len(comp_idx)
            for unit in range(n_units):
                if restart_interval and unit and unit % restart_interval == 0:
                    toks.append(("rst",))
                    preds = [0] * len(comp_idx)
                for si, ci in enumerate(comp_idx):
                    hi, vi = factors[ci]
                    g = grids[ci]
                    if interleaved:
                        mr, mc = divmod(unit, mcu_cols)
                        blocks = [
                            (mr * vi + v, mc * hi + hh)
                            for v in range(vi)
                            for hh in range(hi)
                        ]
                    else:
                        blocks = [divmod(unit, cbh)]
                    for by, bx in blocks:
                        v = int(g[by, bx, 0])
                        if ah == 0:
                            t = v >> al  # DC point transform: arithmetic
                            diff = t - preds[si]
                            preds[si] = t
                            s = abs(diff).bit_length()
                            mag = diff + (1 << s) - 1 if diff < 0 else diff
                            toks.append(("sym2", tsel[ci], s))
                            if s:
                                toks.append(("bits", mag, s))
                        else:
                            toks.append(("bits", (v >> al) & 1, 1))
        else:
            ci = comp_idx[0]
            g = grids[ci]
            eob = _EobState()
            block_fn = _tokens_ac_first if ah == 0 else _tokens_ac_refine
            for unit in range(n_units):
                if restart_interval and unit and unit % restart_interval == 0:
                    eob.flush(toks)
                    toks.append(("rst",))
                by, bx = divmod(unit, cbh)
                block_fn(g[by, bx], ss, se, al, toks, eob)
            eob.flush(toks)

        # table pass (AC scans carry a scan-local optimized table)
        if ss > 0:
            freqs: dict[int, int] = {}
            for t in toks:
                if t[0] == "sym":
                    freqs[t[1]] = freqs.get(t[1], 0) + 1
            tbl = _build_huffman(freqs) if freqs else ([1] + [0] * 15, [0])
            payload = _dht_payload(1, 0, tbl)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
            ac_map = _encode_map(*tbl)
        else:
            ac_map = None

        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            td = tsel[ci] if ss == 0 and ah == 0 else 0
            ta = 0 if ss > 0 else 0
            sos += bytes([ci + 1, td << 4 | ta])
        sos += bytes([ss, se, ah << 4 | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

        bw = _BitWriter()
        rst = 0
        for t in toks:
            if t[0] == "rst":
                bw.flush()
                out += bw.buf
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
            elif t[0] == "sym":
                code, ln = ac_map[t[1]]
                bw.write(code, ln)
            elif t[0] == "sym2":
                code, ln = dc_maps[t[1]][t[2]]
                bw.write(code, ln)
            else:
                bw.write(t[1], t[2])
        bw.flush()
        out += bw.buf

    out += b"\xff\xd9"
    return bytes(out)

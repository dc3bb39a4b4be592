"""FLAC codec — pure numpy + stdlib, from the published xiph.org
format spec (RFC 9639), the same from-scratch discipline as the PNG and
JPEG codecs (reference precedent: S8/R11 delegate to system media
libraries, OsmRender.m:101-135; this container has none).

Decoder: STREAMINFO + metadata walk, frames with fixed blocking,
all subframe types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC up to
order 32), partitioned Rice residuals (both 4- and 5-bit parameter
widths, raw-bits escape), wasted-bits, all four channel assignments
(independent, left/side, right/side, mid/side), UTF-8-coded frame
numbers, and CRC-8 / CRC-16 verification (corrupt frames raise).
Lossless by construction: decode(encode(pcm)) == pcm bit-exactly,
pinned by tests.

Encoder: fixed 4096-sample blocking, per-subframe predictor search
(CONSTANT / FIXED orders 0-2, cost-ranked), single-partition Rice with
exact parameter search, VERBATIM fallback when Rice loses, and all four
stereo decorrelation modes via ``mode=`` — it exists to give the
decoder a spec-honest adversary plus self-contained fixtures; a
hand-crafted stream test pins the decoder against the spec
independently of the encoder (the dequant-double-zigzag lesson from
the JPEG codec).

Scale note: like JPEG, entropy decode is sequential WITHIN a stream;
the engine's parallel unit is the audio blob — Arrow batches of
independent files inside mapInPandas (raster/ops.audio_features).
After residual decode, FIXED-predictor integration (the only predictor
our encoder emits) and stereo reconstruction are vectorized numpy
(order-many cumsums); general LPC reconstruction remains a per-sample
loop — it is an integer IIR with a shift, inherently sequential.
"""

from __future__ import annotations

import struct

import numpy as np

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}

# binomial coefficients of the FIXED predictors, orders 0..4:
# residual_o = sum_j (-1)^j C(o,j) x[i-j]
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


_CRC16_TABLE = None


def _crc16(data: bytes) -> int:
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        tbl = []
        for i in range(256):
            crc = i << 8
            for _ in range(8):
                crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            tbl.append(crc)
        _CRC16_TABLE = tbl
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


class _BitReader:
    """MSB-first bit reader; tracks byte position for CRC spans."""

    __slots__ = ("buf", "pos", "bit")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos
        self.bit = 0

    def read(self, k: int) -> int:
        v = 0
        while k:
            if self.pos >= len(self.buf):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(k, avail)
            byte = self.buf[self.pos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            k -= take
        return v

    def read_signed(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v >= 1 << (k - 1) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("invalid UTF-8-coded frame number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8 continuation in frame number")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    # bits capacity for n continuation bytes: (6 - n) + 6n = 5n + 6
    for n in range(1, 7):
        if v.bit_length() <= 5 * n + 6:
            lead = (0xFF << (7 - n)) & 0xFF
            out = [lead | (v >> (6 * n)) & ((1 << (6 - n)) - 1)]
            for i in range(n - 1, -1, -1):
                out.append(0x80 | ((v >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _rice_read(br: _BitReader, param: int) -> int:
    q = br.read_unary()
    u = (q << param) | br.read(param) if param else q
    return (u >> 1) ^ -(u & 1)  # un-zigzag


def _read_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pw = 4 + method  # rice parameter width (4 or 5 bits)
    esc = (1 << pw) - 1
    po = br.read(4)
    n_part = 1 << po
    if blocksize % n_part:
        raise ValueError("partition order does not divide block size")
    out: list[int] = []
    for p in range(n_part):
        n = (blocksize >> po) - (order if p == 0 else 0)
        param = br.read(pw)
        if param == esc:  # raw escape: fixed-width signed samples
            bits = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(bits) if bits else 0)
        else:
            for _ in range(n):
                out.append(_rice_read(br, param))
    return out


def _integrate_fixed(warm: list[int], res: list[int], order: int) -> np.ndarray:
    """FIXED-predictor reconstruction: the residual is the order-th
    difference of the signal, so decode is `order` successive cumsums.
    Level k integrates the k-th-difference sequence: seed it with the
    warmup's own (k-1)-th difference, cumsum, then DROP the seed — it
    belongs to the warmup region, and leaving it in corrupts every
    later level (review catch, verified by execution: orders ≥ 2
    decoded wrong values; order-by-order equality with the naive
    per-sample loop is now property-pinned in tests)."""
    arr = np.asarray(res, dtype=np.int64)
    if order == 0:
        return arr
    w = np.asarray(warm, dtype=np.int64)
    for k in range(order, 0, -1):
        seed = np.diff(w, k - 1)[-1:]  # (k-1)-th difference, last value
        arr = np.concatenate([seed, arr]).cumsum()[1:]
    return np.concatenate([w, arr])


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe header padding bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if sf_type == 0:  # CONSTANT
        v = br.read_signed(eff)
        x = np.full(blocksize, v, dtype=np.int64)
    elif sf_type == 1:  # VERBATIM
        x = np.array([br.read_signed(eff) for _ in range(blocksize)], np.int64)
    elif 8 <= sf_type <= 12:  # FIXED, order = type - 8
        order = sf_type - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        x = _integrate_fixed(warm, res, order)
    elif sf_type >= 32:  # LPC, order = (type & 31) + 1
        order = (sf_type & 31) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        xs = list(warm)
        for r in res:
            acc = sum(c * xs[-1 - j] for j, c in enumerate(coefs))
            xs.append((acc >> shift) + r)
        x = np.array(xs, np.int64)
    else:
        raise ValueError(f"reserved subframe type {sf_type}")
    return x << wasted


def decode_flac(data: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC bytes → (samples int32 (n, channels), sample_rate, bps).
    CRC-8 (frame header) and CRC-16 (whole frame) are verified."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    while True:
        hdr = data[pos : pos + 4]
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        body = data[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)  # min block
            br.read(16)  # max block
            br.read(24)
            br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, channels, bps, total)
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bps, total = info

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at byte {frame_start}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy (both decodable: number is opaque)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        elif bs_code in _BLOCK_SIZES:
            blocksize = _BLOCK_SIZES[bs_code]
        else:
            raise ValueError(f"reserved block size code {bs_code}")
        if sr_code == 0:
            pass
        elif sr_code in _SAMPLE_RATES:
            if _SAMPLE_RATES[sr_code] != rate:
                raise ValueError("frame sample rate contradicts STREAMINFO")
        elif sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        else:
            raise ValueError("invalid sample rate code")
        fbps = bps if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
        if fbps is None:
            raise ValueError(f"reserved sample size code {ss_code}")
        br.align()
        if _crc8(data[frame_start : br.pos]) != data[br.pos]:
            raise ValueError("frame header CRC-8 mismatch")
        br.pos += 1

        # (frame decode below appends to per-channel LISTS; a single
        # concatenate after the frame loop keeps decode O(n) — the
        # per-frame re-concatenate this replaces was O(frames²))
        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise ValueError("frame channel count contradicts STREAMINFO")
            subs = [_decode_subframe(br, blocksize, fbps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            # the SIDE channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, blocksize, fbps)
                side = _decode_subframe(br, blocksize, fbps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, blocksize, fbps + 1)
                right = _decode_subframe(br, blocksize, fbps)
                subs = [right + side, right]
            else:  # mid/side: mid = (l+r)>>1, side = l-r; the dropped
                # low bit of the sum is side's parity bit
                mid = _decode_subframe(br, blocksize, fbps)
                side = _decode_subframe(br, blocksize, fbps + 1)
                left = (((mid << 1) | (side & 1)) + side) >> 1
                subs = [left, left - side]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        br.align()
        crc = struct.unpack(">H", data[br.pos : br.pos + 2])[0]
        if _crc16(data[frame_start : br.pos]) != crc:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.pos + 2
        for c in range(channels):
            chans[c].append(subs[c])
        got += blocksize
    out = np.stack(
        [
            np.concatenate(ch) if ch else np.empty(0, np.int64)
            for ch in chans
        ],
        axis=1,
    )
    if total:
        out = out[:total]
    return out.astype(np.int32), rate, bps


# --- encoder ----------------------------------------------------------------

def _rice_cost(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + len(u) * (1 + k)


def _best_rice(res: np.ndarray) -> tuple[int, int]:
    r64 = res.astype(np.int64)
    u = np.where(r64 < 0, ((-r64) << 1) - 1, r64 << 1)  # zigzag
    best_k, best_c = 0, _rice_cost(u, 0)
    for k in range(1, 30):
        c = _rice_cost(u, k)
        if c < best_c:
            best_k, best_c = k, c
        elif c > best_c * 2:
            break
    return best_k, best_c


def _write_rice(bw: _BitWriter, res: np.ndarray, k: int) -> None:
    for v in res:
        v = int(v)
        u = (v << 1) if v >= 0 else ((-v << 1) - 1)
        bw.write_unary(u >> k)
        if k:
            bw.write(u, k)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if n and (x == x[0]).all():
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write(int(x[0]), bps)
        return
    # FIXED predictor search, orders 0..2 (order must be < n)
    cands = []
    for order in range(0, min(3, n)):
        res = x.copy()
        for _ in range(order):  # FIXED residual = order-th difference
            res = np.diff(res)
        k, cost = _best_rice(res)
        cands.append((cost + order * bps, order, k, res))
    cost, order, k, res = min(cands, key=lambda t: t[0])
    if cost >= n * bps:  # VERBATIM beats rice on this block
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write(int(v), bps)
        return
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for v in x[:order]:
        bw.write(int(v), bps)
    bw.write(0, 2)  # rice method (4-bit params)
    bw.write(0, 4)  # partition order 0
    if k >= 15:
        bw.write(15, 4)  # escape: raw residuals
        # int() first: numpy scalars have no .bit_length() on numpy 1.26
        bits = max(1, int(np.abs(res).max())).bit_length() + 1
        bw.write(bits, 5)
        for v in res:
            bw.write(int(v), bits)
    else:
        bw.write(k, 4)
        _write_rice(bw, res, k)


def encode_flac(
    pcm: np.ndarray,
    rate: int = 16000,
    bps: int = 16,
    block: int = 4096,
    mode: str = "indep",
) -> bytes:
    """PCM int array (n,) or (n, channels) → FLAC bytes (lossless —
    decode_flac returns the input bit-exactly). ``mode`` selects the
    stereo decorrelation for 2-channel input: "indep", "ls" (left/side),
    "rs" (right/side), "ms" (mid/side) — all four exercise the
    corresponding decoder paths."""
    x = np.asarray(pcm, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if mode != "indep" and channels != 2:
        raise ValueError(f"mode {mode!r} needs 2 channels, got {channels}")
    lim = 1 << (bps - 1)
    if x.max(initial=0) >= lim or x.min(initial=0) < -lim:
        raise ValueError(f"samples exceed {bps}-bit range")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(min(block, n) if n else block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    body = bytes(si.out) + b"\x00" * 16  # MD5 unknown (zeros — legal)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    ch_code = {"indep": channels - 1, "ls": 8, "rs": 9, "ms": 10}[mode]
    for fi, start in enumerate(range(0, n, block)):
        blk = x[start : start + block]
        bs = len(blk)
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocking
        hdr.write(7, 4)  # 16-bit block size follows
        hdr.write(0, 4)  # sample rate from STREAMINFO
        hdr.write(ch_code, 4)
        hdr.write(4, 3)  # 16-bit samples (bps 16 contract below)
        hdr.write(0, 1)
        hdr.align()
        if bps != 16:
            raise NotImplementedError("encoder emits 16-bit streams only")
        frame = bytearray(hdr.out)
        frame += _write_utf8_number(fi)
        frame += struct.pack(">H", bs - 1)
        frame.append(_crc8(bytes(frame)))
        bw = _BitWriter()
        if mode == "indep":
            for c in range(channels):
                _encode_subframe(bw, blk[:, c], bps)
        else:
            l, r = blk[:, 0], blk[:, 1]
            side = l - r
            if mode == "ls":
                _encode_subframe(bw, l, bps)
                _encode_subframe(bw, side, bps + 1)
            elif mode == "rs":
                _encode_subframe(bw, side, bps + 1)
                _encode_subframe(bw, r, bps)
            else:  # ms
                mid = (l + r) >> 1
                _encode_subframe(bw, mid, bps)
                _encode_subframe(bw, side, bps + 1)
        bw.align()
        frame += bytes(bw.out)
        frame += struct.pack(">H", _crc16(bytes(frame)))
        out += frame
    return bytes(out)

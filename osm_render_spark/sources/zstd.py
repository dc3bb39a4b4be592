"""Zstandard DECOMPRESSION from scratch — RFC 8878, pure python.

Closes the last PBF blob-codec gap (fileformat.proto field 7): the
container's python (3.11) has no zstd module and the engine links no
native codec libraries, so this module implements the published format
directly — FSE (tANS) table construction and two-state interleaved
decode, Huffman-coded literals (direct and FSE-compressed weight
descriptions, 1- and 4-stream), the sequences section (predefined /
RLE / FSE-compressed / repeat table modes), repcode offset history,
overlapping match copy, multi-frame and skippable-frame framing, and
XXH64 content-checksum verification.

Validation discipline (the JPEG/FLAC/LZ4 lesson — a self-consistent
encoder+decoder masks table bugs): this codec is DECODE-ONLY and the
tests validate it against an INDEPENDENT implementation — streams
produced by the system ``zstd`` CLI (libzstd 1.5) across compression
levels, sizes, and content classes, which exercises predefined FSE
tables, FSE-compressed tables, both Huffman weight descriptions, both
literal stream layouts, repcodes, and raw/RLE blocks.

Scale note: decompression is sequential WITHIN a blob (entropy-coded,
like JPEG/FLAC); the engine's parallel unit is the blob — PBF blobs
decode inside Arrow batches on executors (sources/pbf.py), so a
cluster decodes N blobs on N cores regardless of per-blob cost.
"""

from __future__ import annotations

import struct

_MAGIC = 0xFD2FB528
_SKIP_LO = 0x184D2A50
_SKIP_HI = 0x184D2A5F

# sequence-code baselines/extra-bits (RFC 8878 3.1.1.3.2.1.1)
_LL_BASE = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
_ML_BASE = [
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]

# predefined FSE distributions (RFC 8878 3.1.1.3.2.2.1)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)
_MAX_AL = {"ll": 9, "of": 8, "ml": 9, "weights": 6}


class _BackBits:
    """RFC 8878 backward bitstream: bytes written forward, read starting
    at the LAST byte; the highest set bit of the last byte is a padding
    sentinel (not data)."""

    __slots__ = ("acc", "pos")

    def __init__(self, buf: bytes):
        if not buf or buf[-1] == 0:
            raise ValueError("zstd bitstream missing padding sentinel")
        self.acc = int.from_bytes(buf, "little")
        self.pos = self.acc.bit_length() - 1  # data bits below the sentinel

    def read(self, n: int) -> int:
        """Read n bits (MSB-first); reading past the start zero-fills
        (the spec's streams end exactly, but Huffman/FSE final-state
        reads may legally consume the tail to exactly zero)."""
        if n == 0:
            return 0
        self.pos -= n
        if self.pos >= 0:
            return (self.acc >> self.pos) & ((1 << n) - 1)
        v = (self.acc << -self.pos) & ((1 << n) - 1)
        return v

    def peek(self, n: int) -> int:
        if self.pos >= n:
            return (self.acc >> (self.pos - n)) & ((1 << n) - 1)
        if self.pos <= 0:
            return 0
        return (self.acc << (n - self.pos)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos -= n

    @property
    def exhausted(self) -> bool:
        return self.pos <= 0


class _FwdBits:
    """Forward little-endian bit reader (FSE table descriptions only)."""

    __slots__ = ("buf", "bitpos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.bitpos = 0

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if (end + 7) // 8 > len(self.buf):
            raise ValueError("zstd FSE header truncated")
        chunk = int.from_bytes(
            self.buf[self.bitpos // 8 : (end + 7) // 8], "little"
        )
        v = (chunk >> (self.bitpos % 8)) & ((1 << n) - 1)
        self.bitpos = end
        return v

    def peek(self, n: int) -> int:
        save = self.bitpos
        try:
            v = self.read(n)
        except ValueError:
            # zero-fill past the end (the count reader may peek beyond)
            avail = len(self.buf) * 8 - save
            v = self.read(max(avail, 0)) if avail > 0 else 0
        self.bitpos = save
        return v

    def bytes_used(self) -> int:
        return (self.bitpos + 7) // 8


def _read_fse_distribution(fb: _FwdBits, max_al: int):
    """FSE table description (RFC 8878 4.1.1): accuracy log + the
    bit-packed normalized counts. Returns (norm, accuracy_log)."""
    al = fb.read(4) + 5
    if al > max_al:
        raise ValueError(f"zstd FSE accuracy log {al} over limit {max_al}")
    remaining = (1 << al) + 1
    threshold = 1 << al
    nb_bits = al + 1
    norm: list[int] = []
    previous0 = False
    while remaining > 1 and len(norm) <= 255:
        if previous0:
            # runs of zero-probability symbols: 2-bit repeat flags
            n0 = len(norm)
            while fb.peek(2) == 3:
                fb.read(2)
                n0 += 3
            n0 += fb.read(2)
            while len(norm) < n0:
                norm.append(0)
            previous0 = False
            continue
        maxv = (threshold << 1) - 1 - remaining
        if (fb.peek(nb_bits) & (threshold - 1)) < maxv:
            count = fb.read(nb_bits - 1) & (threshold - 1)
        else:
            count = fb.read(nb_bits) & ((threshold << 1) - 1)
            if count >= threshold:
                count -= maxv
        count -= 1  # 0 encodes the "-1" (less-than-one) probability
        remaining -= -count if count < 0 else count
        norm.append(count)
        previous0 = count == 0
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd FSE distribution does not sum to table size")
    return norm, al


def _fse_table(norm: list[int], al: int):
    """Decoding table per the canonical FSE construction: cells =
    (symbol, nb_bits, baseline). Low-probability (-1) symbols get one
    cell each at the table END; the rest spread with the fixed step."""
    size = 1 << al
    sym = [0] * size
    hi = size - 1
    for s, c in enumerate(norm):
        if c == -1:
            sym[hi] = s
            hi -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, c in enumerate(norm):
        for _ in range(max(c, 0)):
            sym[pos] = s
            pos = (pos + step) & mask
            while pos > hi:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd FSE table spread did not close")
    nxt = [1 if c == -1 else c for c in norm]
    cells = []
    for i in range(size):
        s = sym[i]
        state = nxt[s]
        nxt[s] += 1
        nb = al - (state.bit_length() - 1)
        cells.append((s, nb, (state << nb) - size))
    return cells, al


def _predef_or_read(fb_bytes: bytes, off: int, mode: int, default, kind: str):
    """One sequences-section table per its 2-bit mode; returns
    (table_or_rle_symbol, new_offset, is_rle)."""
    if mode == 0:  # predefined
        return _fse_table(*default), off, False
    if mode == 1:  # RLE: one byte = the symbol for every sequence
        return fb_bytes[off], off + 1, True
    if mode == 2:  # FSE-compressed distribution
        fb = _FwdBits(fb_bytes[off:])
        norm, al = _read_fse_distribution(fb, _MAX_AL[kind])
        return _fse_table(norm, al), off + fb.bytes_used(), False
    raise ValueError("zstd repeat-table mode with no previous table")


def _huf_weights_direct(hdr: int, buf: bytes):
    n = hdr - 127
    nbytes = (n + 1) // 2
    if len(buf) < nbytes:
        raise ValueError("zstd Huffman weights truncated")
    w = []
    for i in range(n):
        b = buf[i // 2]
        w.append((b >> 4) if i % 2 == 0 else (b & 15))
    return w, nbytes


def _huf_weights_fse(buf: bytes):
    """FSE-compressed weights: two interleaved states over a backward
    bitstream; when the stream empties, each state flushes one final
    symbol (RFC 8878 4.2.1.2)."""
    fb = _FwdBits(buf)
    norm, al = _read_fse_distribution(fb, _MAX_AL["weights"])
    cells, al = _fse_table(norm, al)
    bb = _BackBits(buf[fb.bytes_used() :])
    s1 = bb.read(al)
    s2 = bb.read(al)
    weights: list[int] = []
    while True:
        sym, nb, base = cells[s1]
        weights.append(sym)
        if bb.pos - nb < 0:  # s1 flushed the stream: s2 emits and stop
            weights.append(cells[s2][0])
            break
        s1 = base + bb.read(nb)
        sym, nb, base = cells[s2]
        weights.append(sym)
        if bb.pos - nb < 0:
            weights.append(cells[s1][0])
            break
        s2 = base + bb.read(nb)
        if len(weights) > 255:
            raise ValueError("zstd Huffman weight list overflow")
    return weights


def _huf_table(weights: list[int]):
    """Weights (last one implied) → peek-indexed decode LUT: symbols fill
    the table in increasing-weight order (longest codes at the low
    indexes), each spanning 2^(w-1) cells — the published decode-table
    layout, indexed directly by peeking max_bits."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd Huffman weights all zero")
    max_bits = total.bit_length()  # smallest 2^k > total
    rest = (1 << max_bits) - total
    if rest & (rest - 1):
        raise ValueError("zstd Huffman weights: invalid implied last weight")
    weights = weights + [rest.bit_length()]
    size = 1 << max_bits
    sym_t = bytearray(size)
    len_t = bytearray(size)
    pos = 0
    for w in range(1, max(weights) + 1):
        span = 1 << (w - 1)
        for s, ws in enumerate(weights):
            if ws == w:
                sym_t[pos : pos + span] = bytes([s]) * span
                len_t[pos : pos + span] = bytes([max_bits + 1 - w]) * span
                pos += span
    if pos != size:
        raise ValueError("zstd Huffman table does not fill the code space")
    return sym_t, len_t, max_bits


def _huf_decode_stream(buf: bytes, table, n_out: int) -> bytearray:
    sym_t, len_t, max_bits = table
    bb = _BackBits(buf)
    out = bytearray(n_out)
    for i in range(n_out):
        v = bb.peek(max_bits)
        out[i] = sym_t[v]
        bb.skip(len_t[v])
    if bb.pos < 0:
        raise ValueError("zstd Huffman stream underflow")
    return out


def _decode_literals(block: bytes, off: int, huf_state: list):
    """Literals section → (literals bytes, new offset). huf_state is a
    1-element list carrying the frame's last Huffman table (treeless
    literals blocks reuse it)."""
    b0 = block[off]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3
    if lit_type in (0, 1):  # raw / RLE
        if size_format in (0, 2):  # 00 and 10: 5-bit size
            rsize = b0 >> 3
            off += 1
        elif size_format == 1:
            rsize = (b0 >> 4) | (block[off + 1] << 4)
            off += 2
        else:
            rsize = (b0 >> 4) | (block[off + 1] << 4) | (block[off + 2] << 12)
            off += 3
        if lit_type == 0:
            lits = bytes(block[off : off + rsize])
            if len(lits) != rsize:
                raise ValueError("zstd raw literals truncated")
            return lits, off + rsize
        return bytes([block[off]]) * rsize, off + 1
    # compressed (2) or treeless (3)
    if size_format == 0:
        rsize = (b0 >> 4) | ((block[off + 1] & 0x3F) << 4)
        csize = (block[off + 1] >> 6) | (block[off + 2] << 2)
        off += 3
        four = False
    elif size_format == 1:
        rsize = (b0 >> 4) | ((block[off + 1] & 0x3F) << 4)
        csize = (block[off + 1] >> 6) | (block[off + 2] << 2)
        off += 3
        four = True
    elif size_format == 2:
        rsize = (
            (b0 >> 4) | (block[off + 1] << 4) | ((block[off + 2] & 3) << 12)
        )
        csize = (
            (block[off + 2] >> 2) | (block[off + 3] << 6)
        )
        off += 4
        four = True
    else:
        rsize = (
            (b0 >> 4)
            | (block[off + 1] << 4)
            | ((block[off + 2] & 0x3F) << 12)
        )
        csize = (
            (block[off + 2] >> 6)
            | (block[off + 3] << 2)
            | (block[off + 4] << 10)
        )
        off += 5
        four = True
    payload = block[off : off + csize]
    if len(payload) != csize:
        raise ValueError("zstd compressed literals truncated")
    off += csize
    p = 0
    if lit_type == 2:  # new Huffman table
        hdr = payload[0]
        p = 1
        if hdr < 128:
            weights = _huf_weights_fse(payload[p : p + hdr])
            p += hdr
        else:
            weights, used = _huf_weights_direct(hdr, payload[p:])
            p += used
        huf_state[0] = _huf_table(weights)
    if huf_state[0] is None:
        raise ValueError("zstd treeless literals with no previous table")
    table = huf_state[0]
    if not four:
        return bytes(_huf_decode_stream(payload[p:], table, rsize)), off
    if csize - p < 6:
        raise ValueError("zstd 4-stream literals too short for jump table")
    s1, s2, s3 = struct.unpack_from("<HHH", payload, p)
    p += 6
    sizes = [s1, s2, s3, csize - p - s1 - s2 - s3]
    if sizes[3] <= 0:
        raise ValueError("zstd 4-stream jump table inconsistent")
    per = (rsize + 3) // 4
    out_sizes = [per, per, per, rsize - 3 * per]
    if out_sizes[3] < 0:
        raise ValueError("zstd 4-stream regenerated size inconsistent")
    out = bytearray()
    for ssize, osize in zip(sizes, out_sizes):
        if osize:
            out += _huf_decode_stream(payload[p : p + ssize], table, osize)
        p += ssize
    return bytes(out), off


def _decode_sequences(block: bytes, off: int, lits: bytes, out: bytearray,
                      rep: list[int], seq_state: dict) -> None:
    """Sequences section: parse count + table modes, build/reuse the
    three FSE tables, run the backward interleaved decode, execute the
    (literals, match) copies into ``out``. Mutates rep history."""
    b0 = block[off]
    if b0 < 128:
        n_seq = b0
        off += 1
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) | block[off + 1]
        off += 2
    else:
        n_seq = block[off + 1] | (block[off + 2] << 8) | 0x7F00
        off += 3
    if n_seq == 0:
        out += lits
        return
    modes = block[off]
    off += 1
    if modes & 3:
        raise ValueError("zstd sequences: reserved mode bits set")
    tabs = {}
    for kind, shift, default in (
        ("ll", 6, _LL_DEFAULT),
        ("of", 4, _OF_DEFAULT),
        ("ml", 2, _ML_DEFAULT),
    ):
        mode = (modes >> shift) & 3
        if mode == 3:
            if seq_state.get(kind) is None:
                raise ValueError("zstd repeat-table mode with no previous table")
            tabs[kind] = seq_state[kind]
        else:
            tab, off, is_rle = _predef_or_read(block, off, mode, default, kind)
            tabs[kind] = (tab, is_rle)
            seq_state[kind] = tabs[kind]

    bb = _BackBits(block[off:])

    def init(kind):
        tab, is_rle = tabs[kind]
        if is_rle:
            return None
        return bb.read(tab[1])

    def cell(kind, state):
        tab, is_rle = tabs[kind]
        if is_rle:
            return tab, 0, 0  # symbol, no state bits
        return tab[0][state]

    st_ll = init("ll")
    st_of = init("of")
    st_ml = init("ml")
    lpos = 0
    for i in range(n_seq):
        of_code = cell("of", st_of)[0]
        ml_code = cell("ml", st_ml)[0]
        ll_code = cell("ll", st_ll)[0]
        if of_code > 31:
            raise ValueError("zstd offset code out of range")
        off_val = (1 << of_code) + bb.read(of_code)
        ml = _ML_BASE[ml_code] + bb.read(_ML_BITS[ml_code])
        ll = _LL_BASE[ll_code] + bb.read(_LL_BITS[ll_code])
        # repcodes (RFC 8878 3.1.1.5)
        if off_val > 3:
            offset = off_val - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = off_val - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # ll == 0 and off_val == 3
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd repcode underflow")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        out += lits[lpos : lpos + ll]
        lpos += ll
        if offset > len(out):
            raise ValueError("zstd match offset beyond window")
        start = len(out) - offset
        if offset >= ml:
            out += out[start : start + ml]
        else:
            for j in range(ml):  # overlapping copy is byte-sequential
                out.append(out[start + j])
        if i < n_seq - 1:
            # state updates read LL, ML, OF (in that order)
            for kind, st in (("ll", st_ll), ("ml", st_ml), ("of", st_of)):
                tab, is_rle = tabs[kind]
                if not is_rle:
                    _s, nb, base = tab[0][st]
                    ns = base + bb.read(nb)
                    if kind == "ll":
                        st_ll = ns
                    elif kind == "ml":
                        st_ml = ns
                    else:
                        st_of = ns
    out += lits[lpos:]


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 (the published algorithm) — zstd's content checksum."""
    p1, p2, p3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    p4, p5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    mask = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & mask

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + p1 + p2) & mask
        v2 = (seed + p2) & mask
        v3 = seed & mask
        v4 = (seed - p1) & mask
        while i + 32 <= n:
            for k, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * k : i + 8 * k + 8], "little")
                v = rotl((v + lane * p2) & mask, 31) * p1 & mask
                if k == 0:
                    v1 = v
                elif k == 1:
                    v2 = v
                elif k == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & mask
        for v in (v1, v2, v3, v4):
            h ^= rotl((v * p2) & mask, 31) * p1 & mask
            h = (h * p1 + p4) & mask
    else:
        h = (seed + p5) & mask
    h = (h + n) & mask
    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        h ^= rotl((lane * p2) & mask, 31) * p1 & mask
        h = (rotl(h, 27) * p1 + p4) & mask
        i += 8
    if i + 4 <= n:
        h ^= int.from_bytes(data[i : i + 4], "little") * p1 & mask
        h = (rotl(h, 23) * p2 + p3) & mask
        i += 4
    while i < n:
        h ^= data[i] * p5 & mask
        h = rotl(h, 11) * p1 & mask
        i += 1
    h ^= h >> 33
    h = (h * p2) & mask
    h ^= h >> 29
    h = (h * p3) & mask
    h ^= h >> 32
    return h


def zstd_decompress(data: bytes, expected_size: int | None = None) -> bytes:
    """Decompress a complete zstd stream (one or more frames, skippable
    frames skipped). Verifies the content checksum when present.
    ``expected_size``: optional Blob-level contract check. Malformed or
    truncated input raises ValueError (never Index/struct errors)."""
    try:
        return _decompress(data, expected_size)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"zstd stream truncated or malformed: {exc}") from exc


def _decompress(data: bytes, expected_size: int | None) -> bytes:
    out_all = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ValueError("zstd frame header truncated")
        (magic,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if _SKIP_LO <= magic <= _SKIP_HI:
            (skip,) = struct.unpack_from("<I", data, pos)
            pos += 4 + skip
            continue
        if magic != _MAGIC:
            raise ValueError(f"not a zstd frame (magic {magic:#x})")
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single_segment = (fhd >> 5) & 1
        checksum = (fhd >> 2) & 1
        did_flag = fhd & 3
        if (fhd >> 3) & 1:
            raise ValueError("zstd reserved frame-header bit set")
        if not single_segment:
            pos += 1  # window descriptor (whole output kept in memory)
        pos += (0, 1, 2, 4)[did_flag]
        if did_flag:
            raise ValueError("zstd dictionary frames are not supported")
        fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
        fcs = None
        if fcs_len:
            fcs = int.from_bytes(data[pos : pos + fcs_len], "little")
            if fcs_len == 2:
                fcs += 256
            pos += fcs_len

        frame_out = bytearray()
        huf_state: list = [None]
        seq_state: dict = {}
        rep = [1, 4, 8]
        while True:
            if n - pos < 3:
                raise ValueError("zstd block header truncated")
            bh = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # raw
                frame_out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                frame_out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                block = data[pos : pos + bsize]
                if len(block) != bsize:
                    raise ValueError("zstd compressed block truncated")
                pos += bsize
                lits, off = _decode_literals(block, 0, huf_state)
                _decode_sequences(block, off, lits, frame_out, rep, seq_state)
            else:
                raise ValueError("zstd reserved block type")
            if last:
                break
        if checksum:
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            got = xxh64(bytes(frame_out)) & 0xFFFFFFFF
            if got != want:
                raise ValueError("zstd content checksum mismatch")
        if fcs is not None and len(frame_out) != fcs:
            raise ValueError("zstd frame content size mismatch")
        out_all += frame_out
    if expected_size is not None and len(out_all) != expected_size:
        raise ValueError("zstd decompressed size mismatch")
    return bytes(out_all)

"""LZ4 block codec — pure python/stdlib, from the published LZ4 block
format specification (lz4.org; the format is public and frozen). The
container has no lz4 library, and OSM PBF blobs may carry
``lz4_data`` (fileformat.proto field 6, LZ4 *block* format with the
uncompressed size in the Blob's raw_size field) — this unstubs that
codec honestly instead of raising, the same discipline as the
PNG/JPEG/FLAC codecs.

Block format: a sequence of sequences, each
  token(1B: hi-nibble literal length, lo-nibble match length - 4;
  15 ⇒ extended by 255-bytes-then-terminator) → literals →
  little-endian 2-byte match offset (1..65535) → extended match length.
The final sequence is literals-only. End-of-block restrictions
honored by the compressor: the last 5 bytes are literals and no match
starts within 12 bytes of the end.

Compressor: greedy 4-byte-hash table (the reference implementation's
fast-mode shape) — valid, deterministic output; not bit-identical to
any particular lz4 build (the format does not require it; round-trip
and hand-crafted-stream tests pin correctness).

Scale note: decode is a sequential byte loop per BLOB; the engine's
parallel unit is the blob (sources/pbf.py decodes blobs inside Arrow
tasks), so a cluster decodes N blobs on N cores regardless of
per-blob cost.
"""

from __future__ import annotations


def lz4_decompress_block(data: bytes, expected_size: int | None = None) -> bytes:
    """LZ4 block → raw bytes. Raises ValueError on malformed input
    (bad offset, truncated stream, size mismatch)."""
    out = bytearray()
    i = 0
    n = len(data)
    if n == 0:
        if expected_size not in (None, 0):
            raise ValueError("empty LZ4 block for nonzero raw_size")
        return b""
    while True:
        if i >= n:
            raise ValueError("LZ4 block truncated (missing token)")
        token = data[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise ValueError("LZ4 block truncated (literal length)")
                b = data[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise ValueError("LZ4 block truncated (literals)")
        out += data[i : i + lit_len]
        i += lit_len
        if i == n:
            break  # final literals-only sequence
        if i + 2 > n:
            raise ValueError("LZ4 block truncated (offset)")
        offset = data[i] | (data[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise ValueError(f"LZ4 invalid match offset {offset}")
        match_len = (token & 15) + 4
        if (token & 15) == 15:
            while True:
                if i >= n:
                    raise ValueError("LZ4 block truncated (match length)")
                b = data[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if offset >= match_len:
            out += out[start : start + match_len]
        else:  # overlapping match: byte-wise (the RLE case)
            for j in range(match_len):
                out.append(out[start + j])
    if expected_size is not None and len(out) != expected_size:
        raise ValueError(
            f"LZ4 size mismatch: got {len(out)}, expected {expected_size}"
        )
    return bytes(out)


_MIN_MATCH = 4
_LAST_LITERALS = 5  # spec: last 5 bytes are always literals
_MFLIMIT = 12  # spec: no match may start within 12 bytes of the end


def _write_len(out: bytearray, ln: int) -> None:
    while ln >= 255:
        out.append(255)
        ln -= 255
    out.append(ln)


def lz4_compress_block(data: bytes) -> bytes:
    """Raw bytes → LZ4 block (greedy 4-byte-hash matcher)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        return b""
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    limit = n - _MFLIMIT
    while i < limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 65535 or data[cand : cand + 4] != key:
            i += 1
            continue
        # extend the match forward (stop before the last-5 literals)
        m = i + 4
        c = cand + 4
        end = n - _LAST_LITERALS
        while m < end and data[m] == data[c]:
            m += 1
            c += 1
        lit_len = i - anchor
        match_len = m - i
        token_lit = 15 if lit_len >= 15 else lit_len
        token_mat = 15 if match_len - 4 >= 15 else match_len - 4
        out.append(token_lit << 4 | token_mat)
        if lit_len >= 15:
            _write_len(out, lit_len - 15)
        out += data[anchor:i]
        off = i - cand
        out.append(off & 0xFF)
        out.append(off >> 8)
        if match_len - 4 >= 15:
            _write_len(out, match_len - 4 - 15)
        i = m
        anchor = m
    # final literals-only sequence
    lit_len = n - anchor
    token_lit = 15 if lit_len >= 15 else lit_len
    out.append(token_lit << 4)
    if lit_len >= 15:
        _write_len(out, lit_len - 15)
    out += data[anchor:]
    return bytes(out)

"""LZ4 block codec (sources/lz4.py): round-trips, hand-crafted block
decode pinned against the published format independently of our
compressor, overlap/RLE matches, and malformed-input rejection."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from osm_render_spark.sources.lz4 import (
    lz4_compress_block,
    lz4_decompress_block,
)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"a",
        b"abcd",
        b"hello world " * 500,            # highly repetitive
        bytes(range(256)) * 40,           # cyclic
        np.random.default_rng(7).integers(0, 256, 10_000, dtype=np.uint8).tobytes(),
        b"A" * 100_000,                   # extreme RLE
        ("the quick brown fox " * 311).encode(),
    ],
)
def test_roundtrip(payload):
    comp = lz4_compress_block(payload)
    assert lz4_decompress_block(comp, len(payload)) == payload


def test_compresses_repetitive_data():
    payload = b"spark tiler engine " * 2000
    comp = lz4_compress_block(payload)
    assert len(comp) < len(payload) * 0.05
    # sanity vs a known-good compressor's ballpark (not equality)
    assert len(comp) < len(zlib.compress(payload)) * 40


def test_hand_crafted_block_decodes():
    """Built byte-by-byte from the spec, not via our compressor:
    literals 'abcdef', then a match of length 5 at offset 4 (overlap →
    byte-wise copy: 'cdefc'), then final literals 'XY'."""
    block = bytes(
        [
            0x61,          # token: 6 literals, match len 1+4=5
            *b"abcdef",
            0x04, 0x00,    # offset 4 (little-endian)
            0x20,          # token: 2 literals, final (no match follows)
            *b"XY",
        ]
    )
    assert lz4_decompress_block(block) == b"abcdef" + b"cdefc" + b"XY"


def test_hand_crafted_extended_lengths():
    """15-in-nibble extension bytes for both literal and match length:
    20 literals (15 + ext 5) then a match of 23 (15+4 + ext 4) at
    offset 20 — length exceeds offset, so the copy wraps (overlap
    path) and cycles the 20-byte window."""
    lits = bytes(range(65, 85))  # 20 distinct bytes
    block = bytes([0xFF, 5]) + lits + bytes([20, 0]) + bytes([4]) + bytes([0x00])
    out = lz4_decompress_block(block)
    assert out == lits + (lits * 2)[:23]


def test_rle_single_byte_offset():
    """offset 1 repeats the previous byte — the classic RLE encoding."""
    block = bytes([0x1F, ord("Q"), 0x01, 0x00, 200, 0x00])
    out = lz4_decompress_block(block)
    assert out == b"Q" * (1 + 4 + 15 + 200)


@pytest.mark.parametrize(
    "bad",
    [
        bytes([0x10]),                 # truncated literals
        bytes([0x01, ord("a")]),       # missing offset
        bytes([0x01, ord("a"), 0x05, 0x00]),  # offset beyond output
        bytes([0x01, ord("a"), 0x00, 0x00]),  # offset 0 is invalid
    ],
)
def test_malformed_blocks_raise(bad):
    with pytest.raises(ValueError):
        lz4_decompress_block(bad)


def test_size_mismatch_raises():
    comp = lz4_compress_block(b"some payload bytes")
    with pytest.raises(ValueError, match="size mismatch"):
        lz4_decompress_block(comp, 5)

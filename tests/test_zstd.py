"""From-scratch zstd decoder (RFC 8878) vs the system libzstd.

Validation discipline (CLAUDE.md / the JPEG-FLAC-LZ4 lesson): the codec
is decode-only and every compressed fixture here is produced by an
INDEPENDENT implementation — the system ``zstd`` CLI (libzstd 1.5) —
across levels, content classes, window modes and frame layouts, so a
self-consistent table bug cannot hide. Framing edge cases (skippable
frames, multi-frame streams, checksum corruption) are hand-assembled.
"""

from __future__ import annotations

import random
import struct
import subprocess

import pytest

from osm_render_spark.sources.zstd import xxh64, zstd_decompress


def _z(payload: bytes, *args: str) -> bytes:
    return subprocess.run(
        ["zstd", "-c", *args], input=payload, capture_output=True, check=True
    ).stdout


def _payloads():
    rng = random.Random(42)
    words = [b"the", b"quick", b"brown", b"tile", b"spark", b"zstd", b"osm"]
    out = [
        ("empty", b""),
        ("one", b"x"),
        ("zeros", bytes(4096)),
        ("rand_small", bytes(rng.randrange(256) for _ in range(100))),
        ("rand_64k", bytes(rng.randrange(256) for _ in range(65536))),
        (
            "text",
            b" ".join(rng.choice(words) for _ in range(20000)),
        ),
        (
            "structured",
            (b"ABCD" * 64 + bytes(rng.randrange(256) for _ in range(16)))
            * 400,
        ),
        ("biased", bytes(rng.choice([0, 0, 0, 1, 2]) for _ in range(50000))),
    ]
    return out


@pytest.mark.parametrize(
    "name,payload", _payloads(), ids=[n for n, _ in _payloads()]
)
@pytest.mark.parametrize("level", [1, 3, 19])
def test_roundtrip_vs_libzstd(name, payload, level):
    """Levels 1/3/19 exercise raw+RLE blocks, predefined FSE tables,
    FSE-compressed tables, both Huffman weight encodings and both
    literal stream layouts. (ids= matters: without it pytest embeds the
    payload bytes in the test ID → PYTEST_CURRENT_TEST env var →
    E2BIG on every subprocess spawn.)"""
    assert zstd_decompress(_z(payload, f"-{level}")) == payload


def test_long_mode_and_nocheck():
    payload = b"frame data " * 30000
    assert zstd_decompress(_z(payload, "-19", "--long=27")) == payload
    assert zstd_decompress(_z(payload, "-3", "--no-check")) == payload


def test_multiframe_and_skippable():
    a, b = b"frame one " * 100, b"frame TWO " * 500
    skip = struct.pack("<II", 0x184D2A53, 7) + b"IGNORED"
    stream = _z(a, "-3") + skip + _z(b, "-19")
    assert zstd_decompress(stream) == a + b


def test_expected_size_contract():
    good = _z(b"payload " * 500, "-3")
    assert zstd_decompress(good, expected_size=4000) == b"payload " * 500
    with pytest.raises(ValueError, match="size"):
        zstd_decompress(good, expected_size=7)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda g: g[: len(g) // 2],  # truncated mid-stream
        lambda g: b"\x00\x00\x00\x00" + g[4:],  # bad magic
        lambda g: g[:-4] + b"\x00\x00\x00\x01",  # checksum corrupted
        # bitflip mid-frame (relative: the frame is only ~36 bytes)
        lambda g: g[: len(g) // 2]
        + bytes([g[len(g) // 2] ^ 0xFF])
        + g[len(g) // 2 + 1 :],
    ],
)
def test_malformed_raises_valueerror(mutate):
    good = _z(b"payload " * 500, "-3")
    with pytest.raises(ValueError):
        zstd_decompress(mutate(good))


def test_corruption_sweep_never_crashes_unstructured():
    """Single-byte corruption anywhere either raises ValueError or
    (rarely, if the flip lands in literal bytes AND the frame has no
    checksum) returns different data — never an uncaught exception."""
    payload = b"sweep target " * 200
    good = _z(payload, "-3", "--no-check")
    for pos in range(0, len(good), 7):
        bad = good[:pos] + bytes([good[pos] ^ 0x5A]) + good[pos + 1 :]
        try:
            zstd_decompress(bad)
        except ValueError:
            pass


def test_xxh64_known_vectors():
    """Published xxHash test vectors (seed 0 and a nonzero seed)."""
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"", seed=1) == 0xD5AFBA1336A3BE4B
    # cross-checked against the xxhsum CLI-equivalent of libzstd's copy
    sample = bytes(range(101))
    assert xxh64(sample) == xxh64(sample)  # determinism
    h = xxh64(b"zstd content checksum") & 0xFFFFFFFF
    # and the real use: libzstd's appended checksum must match ours
    frame = _z(b"zstd content checksum", "-3")
    assert struct.unpack("<I", frame[-4:])[0] == h


def test_dictionary_frames_rejected_clearly():
    payload = b"dictionary sample data " * 200
    # build a real dictionary + dict-compressed frame with the CLI
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        samples = []
        for i in range(8):
            p = os.path.join(d, f"s{i}")
            open(p, "wb").write(payload + str(i).encode())
            samples.append(p)
        dict_path = os.path.join(d, "dict")
        r = subprocess.run(
            ["zstd", "--train", *samples, "-o", dict_path, "--maxdict=1024"],
            capture_output=True,
        )
        if r.returncode != 0:
            pytest.skip("zstd --train unavailable on tiny samples")
        comp = subprocess.run(
            ["zstd", "-c", "-D", dict_path],
            input=payload,
            capture_output=True,
            check=True,
        ).stdout
    with pytest.raises(ValueError, match="dictionary"):
        zstd_decompress(comp)

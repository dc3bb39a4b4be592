"""FLAC codec (osm_render_spark/raster/flac.py): lossless round-trips
across block sizes / channel modes / content classes, CRC rejection,
a hand-crafted stream pinning the decoder against the spec
independently of the encoder (LPC + partitioned Rice + 5-bit params +
raw escape — paths the encoder never emits), and the Spark
audio_features path over real FLAC blobs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm_render_spark.raster.flac import decode_flac, encode_flac


def _tone(n=10_000, seed=3, amp=6000, noise=300):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (amp * np.sin(t / 23.0) + rng.normal(0, noise, n)).astype(np.int16)


@pytest.mark.parametrize("block", [4096, 1000, 192])
def test_mono_roundtrip_lossless_and_smaller(block):
    x = _tone()
    data = encode_flac(x, 16000, block=block)
    dec, rate, bps = decode_flac(data)
    assert (dec[:, 0] == x).all()
    assert (rate, bps) == (16000, 16)
    assert len(data) < x.nbytes  # tonal content must compress


@pytest.mark.parametrize("mode", ["indep", "ls", "rs", "ms"])
def test_stereo_modes_roundtrip_lossless(mode):
    rng = np.random.default_rng(5)
    t = np.arange(9000)
    l = (5000 * np.sin(t / 19.0) + rng.normal(0, 200, len(t))).astype(np.int16)
    r = (l * 0.9 + rng.normal(0, 150, len(t))).astype(np.int16)
    st = np.stack([l, r], axis=1)
    dec, rate, _ = decode_flac(encode_flac(st, 44100, mode=mode))
    assert (dec == st).all() and rate == 44100


def test_edge_content_classes():
    const = np.full(5000, -123, np.int16)
    assert (decode_flac(encode_flac(const, 8000))[0][:, 0] == const).all()
    tiny = np.array([1, -2, 3], np.int16)
    assert (decode_flac(encode_flac(tiny, 8000))[0][:, 0] == tiny).all()
    # mono full-range noise takes the VERBATIM fallback (cost >= n*bps);
    # the encoder's raw-bits ESCAPE branch is covered by the stereo
    # decorrelated-mode tests below (17-bit side channel forces k>=15)
    noise = np.random.default_rng(9).integers(-32768, 32768, 8000).astype(np.int16)
    assert (decode_flac(encode_flac(noise, 8000))[0][:, 0] == noise).all()
    # extremes of the 16-bit range
    ext = np.array([-32768, 32767, -32768, 32767, 0], np.int16)
    assert (decode_flac(encode_flac(ext, 8000))[0][:, 0] == ext).all()


@pytest.mark.parametrize("mode", ["ls", "rs", "ms"])
def test_stereo_noise_escape_roundtrip(mode):
    """Encoder-side raw-bits ESCAPE: full-range independent stereo noise
    makes the decorrelated side channel 17-bit, where the best Rice k is
    >= 15 while Rice still beats VERBATIM — so the escape branch RUNS in
    the encoder (it used to crash on a numpy scalar .bit_length)."""
    rng = np.random.default_rng(31)
    st = rng.integers(-32768, 32768, (6000, 2)).astype(np.int16)
    dec, rate, _ = decode_flac(encode_flac(st, 22050, mode=mode))
    assert (dec == st).all() and rate == 22050


def test_encode_subframe_emits_escape_parameter():
    """Pin that the escape parameter (rice param 15) is actually written
    for a residual distribution where k>=15 wins, and that the emitted
    bits round-trip through the decoder's subframe reader."""
    from osm_render_spark.raster.flac import (
        _BitReader,
        _BitWriter,
        _best_rice,
        _decode_subframe,
        _encode_subframe,
    )

    # 17-bit side-channel-like noise: zigzag mean ~2^16 -> best k >= 15,
    # yet Rice cost < n*bps so VERBATIM does not win
    rng = np.random.default_rng(7)
    x = (rng.integers(0, 65536, 512) - rng.integers(0, 65536, 512)).astype(np.int64)
    bps = 17
    k, cost = _best_rice(np.diff(x, n=0))
    assert k >= 15 and cost < len(x) * bps  # escape regime, rice wins

    bw = _BitWriter()
    _encode_subframe(bw, x, bps)
    bw.align()
    data = bytes(bw.out)

    br = _BitReader(data)
    assert br.read(1) == 0
    t = br.read(6)
    assert t >= 8  # FIXED subframe
    order = t - 8
    assert br.read(1) == 0  # no wasted bits
    for _ in range(order):
        br.read(bps)  # warmup
    assert br.read(2) == 0  # 4-bit rice params
    assert br.read(4) == 0  # partition order 0
    assert br.read(4) == 15  # ESCAPE parameter actually emitted

    got = _decode_subframe(_BitReader(data), len(x), bps)
    assert got.tolist() == x.tolist()


def test_corrupt_stream_raises():
    data = bytearray(encode_flac(_tone(2000), 16000))
    data[-1] ^= 0xFF  # frame CRC-16
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(data))
    data = bytearray(encode_flac(_tone(2000), 16000))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"WRNG" + bytes(data[4:]))


# --- hand-crafted stream (decoder vs spec, not vs our encoder) -------------

def _pack(fields):
    """Independent MSB-first bit packer: [(value, nbits), ...] → bytes."""
    acc, n = 0, 0
    out = bytearray()
    for v, k in fields:
        acc = (acc << k) | (v & ((1 << k) - 1))
        n += k
        while n >= 8:
            n -= 8
            out.append((acc >> n) & 0xFF)
        acc &= (1 << n) - 1
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def _crc8_ref(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16_ref(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def test_hand_crafted_stream_decodes_bit_exact():
    """8-sample mono frame built bit-by-bit per RFC 9639: an LPC
    subframe (order 1, coef 2, shift 1 — i.e. x[i] = x[i-1] + r), a
    5-bit-parameter Rice residual with partition order 1 whose second
    partition uses the raw-bits ESCAPE — none of which our encoder
    emits. Expected samples computed by hand."""
    streaminfo = _pack(
        [
            (8, 16), (8, 16),       # min/max block size
            (0, 24), (0, 24),       # min/max frame size (unknown)
            (8000, 20), (0, 3), (15, 5),  # rate, channels-1, bps-1
            (8, 36),                # total samples
        ]
    ) + b"\x00" * 16
    head = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo

    frame_hdr = _pack(
        [
            (0x3FFE, 14), (0, 1), (0, 1),
            (6, 4),   # 8-bit blocksize-1 follows
            (0, 4),   # rate from STREAMINFO
            (0, 4),   # 1 channel
            (4, 3), (0, 1),  # 16-bit samples
        ]
    ) + bytes([0x00]) + bytes([7])  # frame number 0, blocksize-1
    frame_hdr += bytes([_crc8_ref(frame_hdr)])

    # LPC subframe: pad 0, type 100000 (order 1), wasted 0
    sub = [
        (0, 1), (0b100000, 6), (0, 1),
        (100, 16),      # warmup x0
        (3, 4),         # precision-1 -> 4 bits
        (1, 5),         # shift 1
        (2, 4),         # coefficient +2  (pred = (2*x[i-1]) >> 1)
        (1, 2),         # residual method 01: 5-bit Rice params
        (1, 4),         # partition order 1 -> two partitions
        # partition 1 (3 samples, k=0): residuals 1, -1, 0 -> zigzag 2,1,0
        (0, 5),
        (0b001, 3),     # unary 2
        (0b01, 2),      # unary 1
        (0b1, 1),       # unary 0
        # partition 2 (4 samples): ESCAPE (31), 3 raw bits each
        (31, 5), (3, 5),
        (-1, 3), (2, 3), (3, 3), (-4, 3),
    ]
    frame = frame_hdr + _pack(sub)
    frame += struct.pack(">H", _crc16_ref(frame))

    dec, rate, bps = decode_flac(head + frame)
    # x[i] = x[i-1] + r over residuals [1,-1,0, -1,2,3,-4]
    want = [100, 101, 100, 100, 99, 101, 104, 100]
    assert dec[:, 0].tolist() == want
    assert (rate, bps) == (8000, 16)


def test_wasted_bits_and_verbatim_decode():
    """VERBATIM subframe with 1 wasted bit: samples are stored at
    bps-1 bits and shifted left on output."""
    streaminfo = _pack(
        [(4, 16), (4, 16), (0, 24), (0, 24), (8000, 20), (0, 3), (15, 5), (4, 36)]
    ) + b"\x00" * 16
    head = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    frame_hdr = _pack(
        [(0x3FFE, 14), (0, 1), (0, 1), (6, 4), (0, 4), (0, 4), (4, 3), (0, 1)]
    ) + bytes([0x00, 3])
    frame_hdr += bytes([_crc8_ref(frame_hdr)])
    sub = [
        (0, 1), (1, 6),          # VERBATIM
        (1, 1), (1, 1),          # wasted-bits flag, unary 0 -> wasted = 1
        (5, 15), (-3, 15), (0, 15), (7, 15),
    ]
    frame = frame_hdr + _pack(sub)
    frame += struct.pack(">H", _crc16_ref(frame))
    dec, _, _ = decode_flac(head + frame)
    assert dec[:, 0].tolist() == [10, -6, 0, 14]


def test_audio_features_on_flac_matches_wav(spark):
    """The Spark audio path: the same PCM through WAV and FLAC blobs
    must produce IDENTICAL features (both decode to the same float
    samples), and mp3 still raises by name."""
    from osm_render_spark.raster.containers import encode_wav
    from osm_render_spark.raster.ops import audio_features

    pcm = _tone(8000)
    rows = [
        (1, bytearray(encode_wav(pcm, 16000))),
        (2, bytearray(encode_flac(pcm, 16000))),
    ]
    df = spark.createDataFrame(rows, "audio_id long, bytes binary")
    got = {r["audio_id"]: r for r in audio_features(df).collect()}
    w, f = got[1], got[2]
    assert (w["rate"], w["n_frames"]) == (f["rate"], f["n_frames"])
    for col in ("rms", "peak", "zcr"):
        assert w[col] == f[col], col

    bad = spark.createDataFrame(
        [(3, bytearray(b"ID3\x04" + b"\x00" * 64))],
        "audio_id long, bytes binary",
    )
    with pytest.raises(Exception, match="codec library"):
        audio_features(bad).collect()


def test_integrate_fixed_equals_naive_loop_all_orders():
    """Property pin for the vectorized FIXED reconstruction (review
    catch: the cumsum seeding corrupted orders >= 2 while noisy
    fixtures kept order 2 from ever being chosen): order-by-order
    equality with the naive per-sample predictor loop."""
    from osm_render_spark.raster.flac import _FIXED_COEFS, _integrate_fixed

    rng = np.random.default_rng(1)
    for order in range(5):
        for _ in range(10):
            n = int(rng.integers(order + 1, 60))
            x = rng.integers(-30000, 30000, n).astype(np.int64)
            res = x.copy()
            for _ in range(order):
                res = np.diff(res)
            warm = list(x[:order])
            coefs = _FIXED_COEFS[order]
            xs = list(warm)
            for r in res:
                xs.append(sum(c * xs[-1 - j] for j, c in enumerate(coefs)) + r)
            got = _integrate_fixed(warm, list(res), order)
            assert got.tolist() == xs == x.tolist(), order


@pytest.mark.parametrize(
    "name,sig",
    [
        ("two_tone", lambda t: 1000 * np.sin(t / 50.0) + 300 * np.sin(t / 13.0)),
        ("ramp", lambda t: t % 3000 - 1500),
        ("parabola", lambda t: ((t % 200) - 100) ** 2 / 4.0),
    ],
)
def test_noiseless_smooth_signals_lossless(name, sig):
    """NOISELESS smooth content — the regime where the encoder's cost
    ranking picks FIXED order 2 (the additive-noise fixtures never
    exercised it, which let the order-2 decode bug slip through)."""
    t = np.arange(12_000)
    pcm = np.floor(sig(t) + 0.5).astype(np.int16)
    dec, _, _ = decode_flac(encode_flac(pcm, 16000))
    assert (dec[:, 0] == pcm).all()

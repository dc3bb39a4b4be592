"""Audio DSP for multimodal corpus curation: windowed-sinc resampling,
STFT spectral features, silence segmentation — all closed-form math
(sinc, Hann, DFT), pure numpy inside Arrow batches, no codec tables.

This is the honestly-implementable audio-processing layer that a
training pipeline needs after decode (decode itself: WAV PCM and FLAC
are real from-scratch codecs; perceptual formats stay stubbed — see
raster/ops.py audio_features for the rationale). Reference precedent:
the reference delegates media decode to system libraries
(OsmRender.m:101-135); its pipeline-side math is what the survey maps.

Determinism: every kernel is a fixed sequence of IEEE double ops on
deterministically synthesized input, so driver and executors produce
bit-identical results — the same contract the FLAC/JPEG roundtrip
oracles pin. Integer outputs use floor(x + 0.5) (CLAUDE.md F6), never
round().

Scale shape: all kernels are per-clip (mapInPandas over blob rows);
the parallel unit is the audio file. No shuffle is introduced beyond
the scan; a 100 TB corpus distributes by file exactly like the image
decode path.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame

#: modulus for all integer checksums (same prime the codec oracles use)
CHECKSUM_P = 1000000007


# ---------------------------------------------------------------------------
# decode dispatch (shared with ops.audio_features)
# ---------------------------------------------------------------------------


def decode_audio_blob(data: bytes) -> tuple[np.ndarray, int]:
    """Opaque audio blob → (mono float64 in [-1, 1], rate). Dispatches
    on magic: RIFF/WAVE (containers.decode_wav), fLaC (flac.decode_flac),
    FAUD (the deterministic fixture format). Perceptual codecs raise
    NotImplementedError with the format named."""
    import struct
    import zlib

    from .containers import decode_wav
    from .flac import decode_flac

    if data[:4] == b"RIFF":
        return decode_wav(bytes(data))
    if data[:4] == b"fLaC":
        pcm, rate, bps = decode_flac(bytes(data))
        scale = float((1 << (bps - 1)) - 1)
        return pcm.astype(np.float64).mean(axis=1) / scale, rate
    if data[:4] == b"FAUD":
        _aid, _n, rate = struct.unpack(">IIH", bytes(data[4:14]))
        pcm = np.frombuffer(zlib.decompress(bytes(data[14:])), dtype=np.int16)
        return pcm.astype(np.float64) / 32767.0, rate
    raise NotImplementedError(
        "perceptual audio codecs (mp3/aac) require a codec library not in "
        "this container; WAV PCM (RIFF), FLAC, and fake_audio_bytes blobs "
        "decode"
    )


# ---------------------------------------------------------------------------
# windowed-sinc polyphase resampling
# ---------------------------------------------------------------------------


def sinc_resample(
    x: np.ndarray, sr_in: int, sr_out: int, taps: int = 16
) -> np.ndarray:
    """Rational-ratio resampling by Hann-windowed sinc interpolation.

    Classic polyphase design: ratio L/M in lowest terms; output sample j
    sits at input time j*M/L, reconstructed from 2*taps neighbours with
    kernel  fc * sinc(fc * d) * hann(d / taps)  where d is the distance
    in input samples and fc = min(1, L/M) is the anti-alias cutoff
    (downsampling lowpasses at the OUTPUT Nyquist). Each of the L phase
    filters is normalized to unit DC gain so constant signals are exact.

    Identity ratios return the input unchanged. Output length is
    floor(n * L / M) — exact integer arithmetic, no float drift.
    """
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError("sample rates must be positive")
    if sr_in == sr_out or len(x) == 0:
        return np.asarray(x, dtype=np.float64).copy()
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    n_out = (n * L) // M
    fc = min(1.0, L / M)
    half = taps

    # pad so every window of 2*half neighbours is in-bounds (edges see
    # zeros — the standard choice; deterministic)
    xp = np.concatenate([np.zeros(half), x, np.zeros(half + 1)])

    j = np.arange(n_out, dtype=np.int64)
    t_num = j * M  # input time = t_num / L, exact integers
    base = t_num // L  # floor(input time)
    frac = (t_num - base * L).astype(np.float64) / L  # in [0, 1)

    # distances from the interpolation point to the 2*half neighbours
    # k = base - half + 1 .. base + half  →  d = (base + off) - t
    off = np.arange(-half + 1, half + 1, dtype=np.float64)  # (2*half,)
    d = off[None, :] - frac[:, None]  # (n_out, 2*half)
    w = fc * np.sinc(fc * d) * (0.5 + 0.5 * np.cos(np.pi * d / half))
    w /= w.sum(axis=1, keepdims=True)  # unit DC gain per output phase

    idx = base[:, None] + np.arange(-half + 1, half + 1)[None, :] + half
    return (xp[idx] * w).sum(axis=1)


# ---------------------------------------------------------------------------
# STFT + spectral features
# ---------------------------------------------------------------------------


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window: 0.5 - 0.5*cos(2*pi*i/n)."""
    i = np.arange(n, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * i / n)


def stft_mag(x: np.ndarray, n_fft: int = 256, hop: int = 128) -> np.ndarray:
    """Magnitude spectrogram: frames of n_fft samples every hop samples,
    periodic-Hann windowed, |rfft|. Returns (n_frames, n_fft//2 + 1);
    zero frames if the clip is shorter than one window."""
    x = np.asarray(x, dtype=np.float64)
    n_frames = 0 if len(x) < n_fft else 1 + (len(x) - n_fft) // hop
    if n_frames == 0:
        return np.zeros((0, n_fft // 2 + 1))
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * hann_window(n_fft)[None, :]
    return np.abs(np.fft.rfft(frames, axis=1))


def spectral_features(
    x: np.ndarray, rate: int, n_fft: int = 256, hop: int = 128
) -> dict:
    """Per-clip spectral summary as exact integers:
      dominant_bin   argmax of the mean magnitude spectrum
      centroid_mhz   spectral centroid in milli-Hz, floor(x+0.5)
      rolloff_bin    first bin where cumulative energy >= 85%
      energy_q       floor(total windowed energy * 1e6 + 0.5) mod P
    """
    s = stft_mag(x, n_fft, hop)
    if s.shape[0] == 0:
        return {"dominant_bin": 0, "centroid_mhz": 0, "rolloff_bin": 0,
                "energy_q": 0}
    mean_mag = s.mean(axis=0)
    power = mean_mag**2
    total = power.sum()
    freqs = np.arange(len(mean_mag), dtype=np.float64) * rate / n_fft
    centroid = 0.0 if total == 0.0 else float((freqs * power).sum() / total)
    cum = np.cumsum(power)
    rolloff = int(np.searchsorted(cum, 0.85 * total))
    energy = float((s**2).sum())
    return {
        "dominant_bin": int(np.argmax(mean_mag)),
        "centroid_mhz": int(math.floor(centroid * 1000.0 + 0.5)),
        "rolloff_bin": rolloff,
        "energy_q": int(math.floor(energy * 1e6 + 0.5)) % CHECKSUM_P,
    }


# ---------------------------------------------------------------------------
# silence segmentation
# ---------------------------------------------------------------------------


def silence_segments(
    x: np.ndarray, frame: int = 400, threshold: float = 1e-3
) -> list[tuple[int, int]]:
    """Runs of consecutive frames whose RMS < threshold (linear
    amplitude — no dB logs, so the comparison is a single IEEE op).
    Returns [(start_frame, end_frame_exclusive), ...]."""
    x = np.asarray(x, dtype=np.float64)
    n_frames = len(x) // frame
    if n_frames == 0:
        return []
    fx = x[: n_frames * frame].reshape(n_frames, frame)
    quiet = np.sqrt((fx**2).mean(axis=1)) < threshold
    edges = np.flatnonzero(np.diff(np.concatenate([[0], quiet, [0]])))
    return [(int(s), int(e)) for s, e in zip(edges[::2], edges[1::2])]


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------


def resample_audio(
    audios: DataFrame, sr_out: int, taps: int = 16
) -> DataFrame:
    """Resample each blob to sr_out and emit provenance + an int16
    quantization checksum (floor(x*32767+0.5) clipped, |sum| mod P) —
    the value the oracle hash-compares. Input: (audio_id, bytes)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                x, sr_in = decode_audio_blob(row.bytes)
                y = sinc_resample(x, sr_in, sr_out, taps)
                q = np.clip(
                    np.floor(y * 32767.0 + 0.5), -32768, 32767
                ).astype(np.int64)
                rows.append(
                    (
                        row.audio_id,
                        sr_in,
                        sr_out,
                        len(x),
                        len(y),
                        int(np.abs(q).sum() % CHECKSUM_P),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "sr_in", "sr_out", "n_in", "n_out", "checksum"
                ],
            )

    return audios.mapInPandas(
        kernel,
        schema=(
            "audio_id long, sr_in int, sr_out int, n_in long, n_out long, "
            "checksum long"
        ),
    )


def audio_dsp_features(
    audios: DataFrame,
    n_fft: int = 256,
    hop: int = 128,
    silence_frame: int = 400,
    silence_threshold: float = 1e-3,
) -> DataFrame:
    """Spectral + silence features per blob (exact-integer outputs; see
    spectral_features / silence_segments for definitions)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                x, rate = decode_audio_blob(row.bytes)
                f = spectral_features(x, rate, n_fft, hop)
                segs = silence_segments(x, silence_frame, silence_threshold)
                rows.append(
                    (
                        row.audio_id,
                        rate,
                        f["dominant_bin"],
                        f["centroid_mhz"],
                        f["rolloff_bin"],
                        f["energy_q"],
                        len(segs),
                        int(sum(e - s for s, e in segs)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "rate", "dominant_bin", "centroid_mhz",
                    "rolloff_bin", "energy_q", "n_silence_segments",
                    "silent_frames",
                ],
            )

    return audios.mapInPandas(
        kernel,
        schema=(
            "audio_id long, rate int, dominant_bin int, centroid_mhz long, "
            "rolloff_bin int, energy_q long, n_silence_segments int, "
            "silent_frames int"
        ),
    )

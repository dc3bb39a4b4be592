"""Audio DSP kernels: closed-form invariants (DC exactness, tone
preservation, anti-alias attenuation, Parseval) + operator plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from osm_render_spark.raster.dsp import (
    audio_dsp_features,
    decode_audio_blob,
    hann_window,
    resample_audio,
    silence_segments,
    sinc_resample,
    spectral_features,
    stft_mag,
)


def _tone(freq, rate, n, amp=0.5):
    t = np.arange(n, dtype=np.float64) / rate
    return amp * np.sin(2 * np.pi * freq * t)


# --- sinc_resample ------------------------------------------------------


def test_identity_rate_is_passthrough():
    x = _tone(440, 8000, 1000)
    y = sinc_resample(x, 8000, 8000)
    assert np.array_equal(x, y)


def test_dc_gain_is_exact():
    x = np.full(500, 0.25)
    y = sinc_resample(x, 8000, 12000)
    # unit-DC-gain normalization -> interior samples exactly 0.25
    core = y[40:-40]
    assert np.max(np.abs(core - 0.25)) < 1e-12


def test_output_length_exact_integer():
    for n, si, so in [(1000, 8000, 12000), (999, 44100, 16000), (5, 3, 7)]:
        y = sinc_resample(np.zeros(n), si, so)
        import math

        g = math.gcd(si, so)
        assert len(y) == (n * (so // g)) // (si // g)


def test_tone_survives_upsample():
    rate_in, rate_out, f = 8000, 12000, 440.0
    x = _tone(f, rate_in, 4000)
    y = sinc_resample(x, rate_in, rate_out)
    s = stft_mag(y, 512, 256).mean(axis=0)
    peak_hz = np.argmax(s) * rate_out / 512
    assert abs(peak_hz - f) <= rate_out / 512  # within one bin


def test_downsample_kills_above_nyquist():
    # 5 kHz tone at 16 kHz -> above the 4 kHz Nyquist of 8 kHz output;
    # the fc=L/M lowpass must attenuate it strongly vs an in-band tone
    hi = sinc_resample(_tone(5000, 16000, 8000), 16000, 8000, taps=32)
    lo = sinc_resample(_tone(1000, 16000, 8000), 16000, 8000, taps=32)
    assert np.sqrt((hi**2).mean()) < 0.02 * np.sqrt((lo**2).mean())


def test_resample_deterministic():
    x = _tone(313, 44100, 2205) + _tone(1777, 44100, 2205, 0.2)
    a = sinc_resample(x, 44100, 16000)
    b = sinc_resample(x.copy(), 44100, 16000)
    assert np.array_equal(a, b)


def test_empty_and_bad_rates():
    assert len(sinc_resample(np.array([]), 8000, 16000)) == 0
    with pytest.raises(ValueError):
        sinc_resample(np.zeros(10), 0, 8000)


# --- stft / features ----------------------------------------------------


def test_hann_window_endpoints():
    w = hann_window(8)
    assert w[0] == 0.0
    assert abs(w[4] - 1.0) < 1e-15  # periodic form peaks at n/2


def test_stft_parseval_single_frame():
    x = _tone(500, 8000, 256)
    s = stft_mag(x, 256, 256)
    xw = x * hann_window(256)
    # rfft Parseval: sum|X|^2 over full spectrum == N * sum x^2;
    # reconstruct the full spectrum energy from the half spectrum
    full = np.concatenate([s[0], s[0][1:-1][::-1]])
    assert abs((full**2).sum() - 256 * (xw**2).sum()) < 1e-6


def test_stft_short_clip_zero_frames():
    assert stft_mag(np.zeros(100), 256, 128).shape == (0, 129)
    f = spectral_features(np.zeros(10), 8000)
    assert f == {"dominant_bin": 0, "centroid_mhz": 0, "rolloff_bin": 0,
                 "energy_q": 0}


def test_dominant_bin_tracks_tone():
    rate, n_fft = 8000, 256
    k = 10  # bin-centered tone
    x = _tone(k * rate / n_fft, rate, 4096)
    f = spectral_features(x, rate, n_fft, 128)
    assert f["dominant_bin"] == k
    # centroid of a pure bin-centered tone sits at that bin's frequency
    assert abs(f["centroid_mhz"] / 1000.0 - k * rate / n_fft) < rate / n_fft


# --- silence segments ---------------------------------------------------


def test_silence_segments_planted():
    frame = 100
    x = np.concatenate(
        [
            _tone(440, 8000, 300),  # frames 0-2 loud
            np.zeros(200),  # frames 3-4 silent
            _tone(440, 8000, 100),  # frame 5 loud
            np.zeros(300),  # frames 6-8 silent
        ]
    )
    assert silence_segments(x, frame) == [(3, 5), (6, 9)]
    assert silence_segments(np.zeros(50), frame) == []  # sub-frame clip


# --- DataFrame operators ------------------------------------------------


@pytest.fixture(scope="module")
def audio_df(spark):
    from osm_render_spark.raster.containers import encode_wav
    from osm_render_spark.raster.flac import encode_flac
    from osm_render_spark.raster.ops import fake_audio_bytes

    tone = np.floor(_tone(440, 8000, 4000) * 32767 + 0.5).astype(np.int16)
    rows = [
        (0, bytearray(encode_wav(tone, 8000))),
        (1, bytearray(encode_flac(tone, 8000, block=1024))),
        (2, bytearray(fake_audio_bytes(2))),
    ]
    return spark.createDataFrame(rows, "audio_id long, bytes binary")


def test_resample_operator_matches_kernel(audio_df):
    from osm_render_spark.raster.dsp import CHECKSUM_P

    got = {r["audio_id"]: r.asDict() for r in resample_audio(audio_df, 12000).collect()}
    for aid, blob in [(r["audio_id"], bytes(r["bytes"])) for r in audio_df.collect()]:
        x, sr = decode_audio_blob(blob)
        y = sinc_resample(x, sr, 12000)
        q = np.clip(np.floor(y * 32767.0 + 0.5), -32768, 32767).astype(np.int64)
        assert got[aid]["checksum"] == int(np.abs(q).sum() % CHECKSUM_P)
        assert got[aid]["n_out"] == len(y)
        assert got[aid]["sr_in"] == sr


def test_dsp_features_operator(audio_df):
    rows = {r["audio_id"]: r.asDict() for r in audio_dsp_features(audio_df).collect()}
    # WAV and FLAC carry the same 440 Hz tone -> same dominant bin
    assert rows[0]["dominant_bin"] == rows[1]["dominant_bin"]
    assert rows[0]["rate"] == 8000
    for r in rows.values():
        assert r["energy_q"] > 0
        assert r["n_silence_segments"] == 0


def test_unknown_codec_raises(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"ID3\x03trailing-mp3-ish"))], "audio_id long, bytes binary"
    )
    with pytest.raises(Exception, match="codec library|NotImplemented"):
        audio_dsp_features(df).collect()

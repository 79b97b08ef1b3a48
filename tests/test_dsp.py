"""Phase-vocoder pitch shift / time stretch correctness."""

import numpy as np
import pytest

from music2midi_tpu.dsp import istft, pitch_shift, stft, time_stretch


def _dominant_freq(y, sr):
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.fft.rfftfreq(len(y), 1 / sr)[np.argmax(spec)]


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(0)
    y = rng.normal(size=16384)
    D = stft(y)
    back = istft(D, length=len(y))
    # interior reconstruction is near-perfect (COLA)
    np.testing.assert_allclose(back[2048:-2048], y[2048:-2048], atol=1e-6)


def test_time_stretch_length():
    y = np.sin(2 * np.pi * 440 * np.arange(32000) / 16000)
    half = time_stretch(y, 2.0)
    assert abs(len(half) - 16000) <= 1
    double = time_stretch(y, 0.5)
    assert abs(len(double) - 64000) <= 1


@pytest.mark.parametrize("steps", [-6, -3, 3, 5])
def test_pitch_shift_moves_frequency(steps):
    sr = 16000
    y = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    shifted = pitch_shift(y, sr, steps)
    assert len(shifted) == len(y)
    got = _dominant_freq(shifted[2000:-2000], sr)
    want = 440 * 2 ** (steps / 12)
    assert abs(got - want) / want < 0.03


def test_pitch_shift_zero_is_identity():
    y = np.sin(2 * np.pi * 440 * np.arange(8000) / 16000).astype(np.float32)
    np.testing.assert_array_equal(pitch_shift(y, 16000, 0), y)

"""Pallas fused mel kernel parity vs the jnp reference (CPU interpreter)."""

import numpy as np
import pytest

from music2midi_tpu.ops.mel import LogMelConfig, log_mel_spectrogram
from music2midi_tpu.ops.mel_pallas import (
    log_mel_spectrogram_pallas,
    log_mel_spectrogram_pallas_fft,
)


@pytest.mark.parametrize("n_samples", [48000, 41234])
def test_pallas_matches_jnp(n_samples):
    cfg = LogMelConfig()
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(2, n_samples)) * 0.3).astype(np.float32)
    a = np.asarray(log_mel_spectrogram_pallas(w, cfg, interpret=True))
    b = np.asarray(log_mel_spectrogram(w, cfg))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-2)


def test_pallas_tone_and_silence():
    cfg = LogMelConfig()
    t = np.arange(48000) / cfg.sample_rate
    wave = np.stack([
        np.sin(2 * np.pi * 440 * t).astype(np.float32),
        np.zeros(48000, dtype=np.float32),
    ])
    out = np.asarray(log_mel_spectrogram_pallas(wave, cfg, interpret=True))
    ref = np.asarray(log_mel_spectrogram(wave, cfg))
    assert np.argmax(out[0].mean(0)) == np.argmax(ref[0].mean(0))
    np.testing.assert_allclose(out[1], np.log(1e-6), atol=1e-4)


def test_pallas_rejects_bad_hop():
    cfg = LogMelConfig(n_fft=2048, hop_length=300)
    with pytest.raises(ValueError):
        log_mel_spectrogram_pallas(
            np.zeros((1, 3000), np.float32), cfg, interpret=True
        )


@pytest.mark.parametrize("n_samples", [48000, 41234])
def test_pallas_fft_matches_jnp(n_samples):
    """Two-stage Cooley-Tukey kernel: much tighter than the direct DFT
    (stage sums are 16- and 128-term, vs 2048-term cancellation)."""
    cfg = LogMelConfig()
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(2, n_samples)) * 0.3).astype(np.float32)
    a = np.asarray(log_mel_spectrogram_pallas_fft(w, cfg, interpret=True))
    b = np.asarray(log_mel_spectrogram(w, cfg))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_pallas_fft_tone_and_silence():
    cfg = LogMelConfig()
    t = np.arange(48000) / cfg.sample_rate
    wave = np.stack([
        np.sin(2 * np.pi * 440 * t).astype(np.float32),
        np.zeros(48000, dtype=np.float32),
    ])
    out = np.asarray(log_mel_spectrogram_pallas_fft(wave, cfg, interpret=True))
    ref = np.asarray(log_mel_spectrogram(wave, cfg))
    assert np.argmax(out[0].mean(0)) == np.argmax(ref[0].mean(0))
    np.testing.assert_allclose(out[1], np.log(1e-6), atol=1e-4)


def test_pallas_fft_rejects_bad_shape():
    cfg = LogMelConfig(n_fft=2048, hop_length=300)
    with pytest.raises(ValueError):
        log_mel_spectrogram_pallas_fft(
            np.zeros((1, 3000), np.float32), cfg, interpret=True
        )
    # odd multiples of 128 break the conjugate-mirror filterbank fold —
    # must be rejected, not silently wrong
    cfg = LogMelConfig(n_fft=384, hop_length=128)
    with pytest.raises(ValueError):
        log_mel_spectrogram_pallas_fft(
            np.zeros((1, 3000), np.float32), cfg, interpret=True
        )

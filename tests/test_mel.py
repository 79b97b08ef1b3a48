"""Mel frontend numerical tests.

Oracle: an independent per-frame numpy implementation of torchaudio's
MelSpectrogram conventions (center/reflect, periodic hann, power 2,
HTK mel, norm=None) — SURVEY.md §4 "mel-frontend numerical parity".
"""

import numpy as np
import pytest

from music2midi_tpu.ops.mel import (
    LogMelConfig,
    log_mel_spectrogram,
    mel_filterbank,
    num_frames,
)


def _oracle_logmel(wave: np.ndarray, cfg: LogMelConfig) -> np.ndarray:
    """Slow, obviously-correct per-frame implementation in float64."""
    pad = cfg.n_fft // 2
    x = np.pad(wave.astype(np.float64), pad, mode="reflect")
    n = np.arange(cfg.n_fft)
    window = 0.5 - 0.5 * np.cos(2 * np.pi * n / cfg.n_fft)  # periodic hann
    frames = []
    for i in range(1 + len(wave) // cfg.hop_length):
        seg = x[i * cfg.hop_length : i * cfg.hop_length + cfg.n_fft]
        frames.append(np.abs(np.fft.rfft(seg * window)) ** 2)
    power = np.stack(frames)  # (F, n_freqs)
    fb = mel_filterbank(
        cfg.n_fft // 2 + 1, cfg.f_min, cfg.sample_rate / 2, cfg.n_mels,
        cfg.sample_rate,
    ).astype(np.float64)
    mel = power @ fb
    return np.log(np.maximum(mel, cfg.log_floor))


@pytest.fixture(scope="module")
def cfg():
    return LogMelConfig()


def test_frame_count_3s_window(cfg):
    # 48000 samples at hop 256, center=True -> 188 frames (SURVEY.md §2)
    assert num_frames(48000, cfg) == 188


def test_output_shape(cfg):
    wave = np.random.default_rng(0).normal(size=(2, 48000)).astype(np.float32)
    out = log_mel_spectrogram(wave, cfg)
    assert out.shape == (2, 188, 384)
    assert out.dtype == np.float32


def test_matches_oracle(cfg):
    rng = np.random.default_rng(1)
    wave = (rng.normal(size=(1, 8192)) * 0.3).astype(np.float32)
    got = np.asarray(log_mel_spectrogram(wave, cfg))[0]
    want = _oracle_logmel(wave[0], cfg)
    # log-domain comparison; fp32 FFT vs fp64 FFT oracle
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-4)


def test_dft_matmul_matches_fft_path(cfg):
    """The MXU DFT path is approximate: fp32 cancellation in near-silent
    bins.  Linear-domain relative agreement must hold for energetic bins;
    log-domain agreement for the loudest 90%."""
    rng = np.random.default_rng(2)
    wave = (rng.normal(size=(2, 8192)) * 0.5).astype(np.float32)
    a = np.asarray(log_mel_spectrogram(wave, cfg, use_fft=False))
    b = np.asarray(log_mel_spectrogram(wave, cfg, use_fft=True))
    energetic = b > -5.0  # mel power above ~6.7e-3
    assert energetic.mean() > 0.5
    np.testing.assert_allclose(a[energetic], b[energetic], atol=2e-2)


def test_pure_tone_lands_in_right_mel_bin(cfg):
    # 440 Hz sine: energy concentrated near the mel band containing 440 Hz
    t = np.arange(16000) / cfg.sample_rate
    wave = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
    out = np.asarray(log_mel_spectrogram(wave, cfg))[0]
    mean_per_mel = out.mean(axis=0)
    peak_mel = int(np.argmax(mean_per_mel))
    # find which mel filter is centered nearest 440 Hz
    from music2midi_tpu.ops.mel import _hz_to_mel_htk, _mel_to_hz_htk

    m_pts = np.linspace(
        _hz_to_mel_htk(cfg.f_min), _hz_to_mel_htk(cfg.sample_rate / 2),
        cfg.n_mels + 2,
    )
    centers = _mel_to_hz_htk(m_pts[1:-1])
    expected = int(np.argmin(np.abs(centers - 440.0)))
    assert abs(peak_mel - expected) <= 2


def test_silence_hits_log_floor(cfg):
    wave = np.zeros((1, 4096), dtype=np.float32)
    out = np.asarray(log_mel_spectrogram(wave, cfg))
    np.testing.assert_allclose(out, np.log(1e-6), atol=1e-5)


def test_filterbank_shape_and_coverage(cfg):
    fb = mel_filterbank(1025, 20.0, 8000.0, 384, 16000)
    assert fb.shape == (1025, 384)
    assert fb.min() >= 0
    # every triangle spans at least one 7.8 Hz bin (narrowest is ~9.4 Hz at
    # the low end), so no filter is empty
    assert (fb.sum(axis=0) > 0).all()


def test_mel_matches_torch_stft_golden():
    """Golden vector with torch.stft provenance (tests/data/make_golden_mel.py):
    the framing / reflect-pad / Hann / FFT conventions come from torch
    itself, so a shared misreading of the STFT layer between ops/mel.py
    and its float64 numpy oracle can no longer pass silently (VERDICT r2
    weak #4).  fp32 jnp-FFT error vs the float64 golden measured at
    1.0e-4 max in the log domain."""
    import numpy as np

    from music2midi_tpu.ops.mel import LogMelConfig, log_mel_spectrogram

    d = np.load(
        __file__.rsplit("/", 1)[0] + "/data/golden_mel_torch.npz"
    )
    mine = np.asarray(
        log_mel_spectrogram(d["waveform"][None], LogMelConfig())
    )[0]
    gold = d["log_mel"]
    assert mine.shape == gold.shape == (63, 384)
    diff = np.abs(mine - gold.astype(np.float32))
    assert diff.max() < 5e-4, diff.max()
    assert diff.mean() < 1e-5, diff.mean()
    # the silent first 1/8 s must sit on the log floor in both
    assert np.allclose(gold[:3], np.log(1e-6), atol=1e-3)
    assert np.allclose(mine[:3], np.log(1e-6), atol=1e-3)

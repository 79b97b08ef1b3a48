"""Generate golden_mel_torch.npz — a log-mel golden vector with torch.stft
provenance.

The reference mel frontend is torchaudio.transforms.MelSpectrogram with
defaults (power=2, win_length=n_fft, center=True, pad_mode="reflect",
mel_scale="htk", norm=None) followed by clamp(1e-6).log()
(/root/reference/music2midi/input.py:25-41).  torchaudio is not installed
in this image, but torchaudio's Spectrogram IS torch.stft — so this
script computes the expectation with float64 torch.stft (framing, reflect
padding, Hann window, and FFT conventions are torch's own, NOT
re-implemented here) and only the mel filterbank is built by hand
following torchaudio.functional.melscale_fbanks' documented algorithm
(HTK scale, triangular overlap, no norm).

What this pins vs the previous float64 numpy oracle (VERDICT r2 weak #4):
a shared misreading of the STFT conventions (edge padding, frame count,
window placement, onesidedness) can no longer pass both sides.  The
filterbank remains the one hand-written piece on both sides — its risk
surface is the 6-line triangle formula, documented here.

Run: python tests/data/make_golden_mel.py  (writes golden_mel_torch.npz)
"""

from pathlib import Path

import numpy as np
import torch

SR, N_FFT, HOP, F_MIN, N_MELS = 16000, 2048, 256, 20.0, 384


def melscale_fbanks_htk(n_freqs: int) -> torch.Tensor:
    """torchaudio.functional.melscale_fbanks(htk, norm=None) in float64."""
    all_freqs = torch.linspace(0, SR / 2, n_freqs, dtype=torch.float64)
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    m_pts = torch.linspace(
        hz_to_mel(F_MIN), hz_to_mel(SR / 2), N_MELS + 2,
        dtype=torch.float64,
    )
    f_pts = torch.tensor(mel_to_hz(m_pts.numpy()), dtype=torch.float64)
    f_diff = f_pts[1:] - f_pts[:-1]                        # (n_mels+1,)
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)   # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return torch.clamp(torch.min(down, up), min=0.0)       # (n_freqs, n_mels)


def main() -> None:
    rng = np.random.default_rng(1234)
    t = np.arange(SR) / SR  # 1 s
    y = (
        0.45 * np.sin(2 * np.pi * 261.63 * t)
        + 0.25 * np.sin(2 * np.pi * 1046.5 * t)
        + 0.10 * np.sin(2 * np.pi * 6500.0 * t)
        + 0.02 * rng.normal(size=len(t))
    )
    y[: SR // 8] = 0.0                       # silence -> log-floor region
    y[SR // 2 : SR // 2 + 64] += 0.8         # transient across a frame edge
    y = y.astype(np.float32)

    yt = torch.tensor(y, dtype=torch.float64)
    spec = torch.stft(
        yt, n_fft=N_FFT, hop_length=HOP, win_length=N_FFT,
        window=torch.hann_window(N_FFT, periodic=True, dtype=torch.float64),
        center=True, pad_mode="reflect", normalized=False,
        onesided=True, return_complex=True,
    )
    power = spec.abs() ** 2                                 # (freq, frame)
    mel = melscale_fbanks_htk(N_FFT // 2 + 1).T @ power     # (n_mels, frame)
    logmel = torch.log(torch.clamp(mel, min=1e-6)).T        # (frame, n_mels)

    out = Path(__file__).parent / "golden_mel_torch.npz"
    np.savez_compressed(
        out, waveform=y, log_mel=logmel.numpy().astype(np.float64)
    )
    print(f"{out}: waveform {y.shape}, log_mel {tuple(logmel.shape)}")


if __name__ == "__main__":
    main()

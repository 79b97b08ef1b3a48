"""Log-mel spectrogram frontend — TPU-native.

Numerically equivalent to the reference's torchaudio pipeline
(reference music2midi/input.py:15-41: MelSpectrogram(sr=16000, n_fft=2048,
hop=256, f_min=20, n_mels=384) -> transpose -> clamp(1e-6) -> log), with
torchaudio's exact conventions:

  * center=True with reflect padding of n_fft//2 on both sides
  * periodic Hann window, win_length = n_fft
  * power-2 (magnitude squared) spectrum, no normalization
  * HTK mel scale, norm=None, f_max = sr/2, triangular filters over
    n_fft//2 + 1 linearly spaced frequency bins

TPU-first design: the DFT is expressed as two real matmuls against a
(n_fft, n_freqs) cosine/sine basis so the whole frontend is
frame-gather -> window -> MXU matmul -> |.|^2 -> MXU matmul (mel) -> log,
which XLA fuses aggressively.  For a 3-second 16 kHz window this is 188
frames x 2048 -> 384 mels (SURVEY.md §2 model-shape facts).  A fused Pallas
kernel with the same signature lives in `mel_pallas.py`; this module is the
reference implementation it is parity-tested against.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LogMelConfig(NamedTuple):
    sample_rate: int = 16000
    n_fft: int = 2048
    hop_length: int = 256
    f_min: float = 20.0
    n_mels: int = 384
    log_floor: float = 1e-6
    noise_floor_sigma: float = 0.0  # r5clamp serving floor
    # (PERFORMANCE.md): clamp each mel bin at the EXPECTED mel power of
    # an RMS-sigma white gaussian noise floor (the training corpora's
    # synthesize_corpus --noise default is 0.003) before the log.
    # 0.0 = off (the default: BOTH serving-side normalizations failed
    # their pre-declared neutrality bars — waveform dither -0.022 hard,
    # this clamp -0.026 hard, PERFORMANCE.md r5dither/r5clamp).  Unlike
    # the dither this touches ONLY bins BELOW the training floor
    # (digital silence, zero-pad tails — the r4 noise-floor OOD class)
    # and leaves above-floor audio bit-unchanged; it still failed
    # because E[mel] for a white floor is largest in the wide HF mel
    # bands, where real dense-mix content is sparse.


# --------------------------------------------------------------------- #
# filterbank / basis construction (host-side, cached)                    #
# --------------------------------------------------------------------- #


def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int
) -> np.ndarray:
    """(n_freqs, n_mels) triangular HTK-mel filterbank, norm=None.

    Matches torchaudio.functional.melscale_fbanks(mel_scale="htk",
    norm=None): filters are triangles between successive points of
    n_mels + 2 mel-uniform frequencies spanning [f_min, f_max], evaluated at
    n_freqs linearly spaced bin centers in [0, sample_rate / 2].
    """
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(
        _hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2
    )
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _dft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-FFT as matmul: (n_fft, n_freqs) cos and -sin bases such that
    frames @ cos = Re(rfft), frames @ sin = Im(rfft)."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    return (
        np.cos(angle).astype(np.float32),
        (-np.sin(angle)).astype(np.float32),
    )


@functools.lru_cache(maxsize=4)
def _hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(n_fft, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def noise_mel_floor(cfg: LogMelConfig) -> np.ndarray:
    """(n_mels,) float32: expected mel power of an RMS-sigma white
    gaussian input through this config's frontend, the r5clamp per-bin
    serving floor.

    Derivation: for x ~ N(0, sigma^2) i.i.d. and any DFT bin k,
    E[re_k^2 + im_k^2] = sigma^2 * sum_n hann[n]^2 (the cos^2 + sin^2
    terms collapse; flat white-noise periodogram scaled by the window
    energy, independent of k).  Each mel bin then averages
    E[mel_m] = sigma^2 * sum(hann^2) * colsum(fb)_m.  Never below
    cfg.log_floor so the log stays defined when a filter column is
    empty."""
    w = _hann_window(cfg.n_fft).astype(np.float64)
    fb = mel_filterbank(
        cfg.n_fft // 2 + 1, cfg.f_min, cfg.sample_rate / 2.0, cfg.n_mels,
        cfg.sample_rate,
    )
    floor = cfg.noise_floor_sigma ** 2 * float(np.sum(w * w)) * fb.sum(0)
    return np.maximum(floor, cfg.log_floor).astype(np.float32)


def num_frames(n_samples: int, cfg: LogMelConfig) -> int:
    """Frame count with center=True padding: 1 + n_samples // hop."""
    return 1 + n_samples // cfg.hop_length


# --------------------------------------------------------------------- #
# the transform                                                          #
# --------------------------------------------------------------------- #


def frame_signal(wave: jax.Array, cfg: LogMelConfig) -> jax.Array:
    """(B, S) -> (B, F, n_fft) windowed frames with reflect center-padding."""
    pad = cfg.n_fft // 2
    x = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    n_f = num_frames(wave.shape[-1], cfg)
    idx = (
        np.arange(n_f)[:, None] * cfg.hop_length + np.arange(cfg.n_fft)[None, :]
    )
    frames = x[:, idx]  # (B, F, n_fft)
    return frames * jnp.asarray(_hann_window(cfg.n_fft))


@functools.partial(jax.jit, static_argnames=("cfg", "use_fft"))
def log_mel_spectrogram(
    wave: jax.Array, cfg: LogMelConfig = LogMelConfig(), use_fft: bool = True
) -> jax.Array:
    """waveform (B, S) float32 -> log-mel (B, F, n_mels) float32.

    F = 1 + S // hop (188 for a 3-s, 16 kHz window).

    Default path uses the XLA FFT op (error ~6e-3 in log domain vs a float64
    oracle, same profile as the torch fp32 FFT the reference uses).
    `use_fft=False` instead computes the DFT as two MXU matmuls — faster to
    fuse but subject to fp32 cancellation in near-silent bins (observed up
    to ~0.5 log-units where mel power < 1e-3); use it only where bit-level
    token parity is not required.
    """
    wave = wave.astype(jnp.float32)
    frames = frame_signal(wave, cfg)
    n_freqs = cfg.n_fft // 2 + 1
    if use_fft:
        spec = jnp.fft.rfft(frames, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    else:
        cos_b, sin_b = _dft_basis(cfg.n_fft)
        re = jnp.einsum(
            "bfn,nk->bfk", frames, jnp.asarray(cos_b),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        im = jnp.einsum(
            "bfn,nk->bfk", frames, jnp.asarray(sin_b),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        power = re * re + im * im
    fb = jnp.asarray(
        mel_filterbank(
            n_freqs, cfg.f_min, cfg.sample_rate / 2.0, cfg.n_mels,
            cfg.sample_rate,
        )
    )
    mel = jnp.einsum(
        "bfk,km->bfm", power, fb, preferred_element_type=jnp.float32
    )
    if cfg.noise_floor_sigma > 0.0:
        mel = jnp.maximum(mel, jnp.asarray(noise_mel_floor(cfg)))
    return jnp.log(jnp.clip(mel, min=cfg.log_floor))


def log_mel_spectrogram_fast(
    wave: jax.Array, cfg: LogMelConfig = LogMelConfig()
) -> jax.Array:
    """Serving-mode mel frontend: the fused Pallas Cooley-Tukey kernel on
    TPU (measured 3.5 ms vs 9.25 ms for the XLA-FFT path at B=128 x 3 s,
    in-loop slope; see mel_pallas.py), the jnp FFT path elsewhere.

    NOT the bit-parity path: the kernel differs from the jnp FFT by
    <= 3e-5 in the log domain, so fp32 token-exact flows keep
    log_mel_spectrogram (CLAUDE.md numerics contract)."""
    if (
        jax.default_backend() == "tpu"
        and cfg.n_fft % 256 == 0  # kernel needs an even 128-multiple
        and cfg.hop_length % 128 == 0
    ):
        from .mel_pallas import log_mel_spectrogram_pallas_fft

        out = log_mel_spectrogram_pallas_fft(wave, cfg)
        if cfg.noise_floor_sigma > 0.0:
            # the kernel clamps at log_floor in-kernel; the per-bin
            # r5clamp floor applies as a log-domain max — exactly
            # equivalent to the power-domain max (log is monotonic)
            out = jnp.maximum(
                out, jnp.log(jnp.asarray(noise_mel_floor(cfg)))
            )
        return out
    return log_mel_spectrogram(wave, cfg)


def log_mel_config_from(config) -> LogMelConfig:
    """Build from the shared YAML tree (reference transformer.py:18-22)."""
    return LogMelConfig(
        sample_rate=int(config.model.sample_rate),
        n_fft=int(config.spectrogram.n_fft),
        hop_length=int(config.spectrogram.hop_length),
        f_min=float(config.spectrogram.f_min),
        n_mels=int(config.model.t5.d_model),
    )

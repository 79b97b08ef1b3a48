"""Fused Pallas TPU kernel for the log-mel frontend.

One kernel performs framing -> Hann window -> real DFT -> power -> mel
filterbank -> clamp/log without materializing frames or the (B, F, 1025)
power spectrum in HBM — the fusion the north star asks for (torchaudio's
MelSpectrogram chain, reference music2midi/input.py:25-31, runs as separate
STFT/matmul ops).

Key trick — framing AS matmul (no gathers): with hop | n_fft
(256 | 2048), view the padded wave as rows of `hop` samples,
W[r, :] = wave[r*hop : (r+1)*hop].  Then for frame i and spectrum bin k

    X[i, k] = sum_n wave[i*hop + n] * hann[n] * basis[n, k]
            = sum_{j=0}^{n_fft/hop - 1}  W[i + j, :] @ WB_j[:, k]

where WB_j = (hann * basis)[j*hop : (j+1)*hop, :].  Each j term is a plain
MXU matmul of a sublane-shifted slice of W — no per-frame copies, which
made a gather-based variant 30x slower on the VPU.

Grid = (B, frame_blocks, freq_blocks), freq innermost: the output block is
revisited and accumulated in VMEM while Pallas double-buffers the basis
tiles (guide: Grid and Block Specifications / output revisiting).

Numerics: fp32 with HIGHEST-precision MXU passes; observed <= 7e-3
log-domain deviation from the jnp FFT path on white noise.

Status / measurements (v5e-1, axon stack, 128 x 3-s batch): this kernel
runs ~530 ms vs 15.5 ms for the jnp/XLA-FFT path — a matmul DFT performs
27x the FFT's FLOPs and the axon Pallas pipeline adds further overhead
(time is flat across FRAME_BLOCK/precision choices, pointing at pipeline
latency, not MXU).  The jnp FFT path therefore remains the production
default in ops/mel.py; this kernel is kept correct and parity-tested as
the foundation for an in-kernel split-radix FFT (2048 = 32x64 two-stage
Cooley-Tukey as matmuls, 21x fewer FLOPs) in a later round.  Mel is ~4% of
whole-song latency, so this is not currently on the critical path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mel import (
    LogMelConfig,
    _dft_basis,
    _hann_window,
    mel_filterbank,
    num_frames,
)

FRAME_BLOCK = 128  # frames per grid step
FREQ_BLOCK = 256  # spectrum bins per grid step


def _mel_kernel(
    wave_ref,  # (1, n_shifts, FRAME_BLOCK, hop): j-row-shifted wave tiles
    cosw_ref,  # (n_shifts * hop, FREQ_BLOCK) windowed cos basis tile
    sinw_ref,  # (n_shifts * hop, FREQ_BLOCK) windowed -sin basis tile
    fb_ref,  # (FREQ_BLOCK, n_mels) mel filterbank tile
    out_ref,  # (1, FRAME_BLOCK, n_mels) — revisited across kb
    *,
    hop: int,
    n_shifts: int,
    n_freq_blocks: int,
    log_floor: float,
):
    kb = pl.program_id(2)

    def dft_half(basis_ref):
        acc = jnp.zeros((FRAME_BLOCK, FREQ_BLOCK), jnp.float32)
        for j in range(n_shifts):
            acc += jnp.dot(
                wave_ref[0, j],
                basis_ref[pl.ds(j * hop, hop), :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return acc

    re = dft_half(cosw_ref)
    im = dft_half(sinw_ref)
    power = re * re + im * im
    partial = jnp.dot(
        power, fb_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(kb == 0)
    def _init():
        out_ref[0, :, :] = partial

    @pl.when(kb > 0)
    def _acc():
        out_ref[0, :, :] = out_ref[0, :, :] + partial

    @pl.when(kb == n_freq_blocks - 1)
    def _finish():
        out_ref[0, :, :] = jnp.log(
            jnp.maximum(out_ref[0, :, :], log_floor)
        )


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def log_mel_spectrogram_pallas(
    wave: jax.Array, cfg: LogMelConfig = LogMelConfig(),
    interpret: bool = False,
) -> jax.Array:
    """(B, S) float32 -> (B, F, n_mels) float32; F = 1 + S // hop.

    Drop-in for ops.mel.log_mel_spectrogram (fast path).  Requires
    hop | n_fft (true for the 2048/256 reference configuration)."""
    wave = wave.astype(jnp.float32)
    B, S = wave.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    if n_fft % hop != 0:
        raise ValueError("pallas mel kernel requires hop | n_fft")
    n_shifts = n_fft // hop
    F = num_frames(S, cfg)
    n_fb = pl.cdiv(F, FRAME_BLOCK)
    n_freqs = n_fft // 2 + 1
    n_kb = pl.cdiv(n_freqs, FREQ_BLOCK)
    padded_freqs = n_kb * FREQ_BLOCK

    # center reflect pad + zero tail so every shifted row slice stays in
    # bounds, and row count R covers base + n_shifts + FRAME_BLOCK
    pad = n_fft // 2
    x = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    rows_needed = n_fb * FRAME_BLOCK + n_shifts
    needed = rows_needed * hop
    if needed > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, needed - x.shape[1])))
    R = x.shape[1] // hop
    x = x[:, : R * hop].reshape(B, R, hop)
    # pre-shift: copy j (j < n_shifts) holds rows [j, j + F_padded) so every
    # in-kernel slice starts sublane-aligned (Mosaic cannot load from
    # row base+j) — an XLA gather outside the kernel, 8x wave bytes, trivial
    # vs the DFT FLOPs
    f_padded = n_fb * FRAME_BLOCK
    x = jnp.stack(
        [x[:, j:j + f_padded, :] for j in range(n_shifts)], axis=1
    )  # (B, n_shifts, f_padded, hop)

    cos_b, sin_b = _dft_basis(n_fft)
    hann = _hann_window(n_fft)[:, None]
    cosw = np.zeros((n_fft, padded_freqs), np.float32)
    sinw = np.zeros((n_fft, padded_freqs), np.float32)
    cosw[:, :n_freqs] = cos_b * hann
    sinw[:, :n_freqs] = sin_b * hann
    fb = np.zeros((padded_freqs, cfg.n_mels), np.float32)
    fb[:n_freqs] = mel_filterbank(
        n_freqs, cfg.f_min, cfg.sample_rate / 2.0, cfg.n_mels,
        cfg.sample_rate,
    )

    kernel = functools.partial(
        _mel_kernel,
        hop=hop,
        n_shifts=n_shifts,
        n_freq_blocks=n_kb,
        log_floor=cfg.log_floor,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_fb, n_kb),
        in_specs=[
            pl.BlockSpec(
                (1, n_shifts, FRAME_BLOCK, hop),
                lambda b, f, k: (b, 0, f, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_fft, FREQ_BLOCK), lambda b, f, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, FREQ_BLOCK), lambda b, f, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FREQ_BLOCK, cfg.n_mels), lambda b, f, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAME_BLOCK, cfg.n_mels), lambda b, f, k: (b, f, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_fb * FRAME_BLOCK, cfg.n_mels), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_fb * FRAME_BLOCK * n_fft * padded_freqs * 2
            + 2 * B * n_fb * FRAME_BLOCK * padded_freqs * cfg.n_mels,
            bytes_accessed=4 * B * n_fb * FRAME_BLOCK * (
                n_shifts * hop + cfg.n_mels)
            + 4 * n_fft * padded_freqs * 2 * B * n_fb,
            transcendentals=B * n_fb * FRAME_BLOCK * cfg.n_mels,
        ),
        interpret=interpret,
    )(x, jnp.asarray(cosw), jnp.asarray(sinw), jnp.asarray(fb))
    return out[:, :F, :]

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

Two kernels live here:

  * log_mel_spectrogram_pallas — direct DFT-as-matmul (r1).  Kept as the
    simplest parity reference for the framing trick.
  * log_mel_spectrogram_pallas_fft — two-stage Cooley-Tukey FFT
    (n_fft = N1 x 128) fused with framing, window, power, mel, and log.
    THE PRODUCTION SERVING PATH (ops/mel.py log_mel_spectrogram_fast).

Measurements (v5e-1, axon stack, 128 x 3-s batch, per-call slope of K
dependent in-program iterations — the honest protocol, see below):

    jnp/XLA-FFT path   9.25 ms
    pallas_fft         3.50 ms   (2.6x faster; <= 3e-5 log-domain diff)
    pallas_dft        12.14 ms

r1 anomaly resolved: the "flat ~530 ms" previously reported for the DFT
kernel was RELAY-DISPATCH time, not kernel time — a single dispatch on
this tunneled stack costs 30-500 ms regardless of the program (which is
also why it was flat across block size and precision).  Timing K
data-dependent calls inside one jit program and taking the slope isolates
the kernel: the DFT kernel is really ~12 ms and the FFT kernel ~3.5 ms.
fp32 remains the bit-parity mode and uses the jnp FFT (CLAUDE.md).
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


# --------------------------------------------------------------------- #
# in-kernel Cooley-Tukey FFT variant (n_fft = N1 x 128)                   #
# --------------------------------------------------------------------- #

_N2 = 128  # stage-2 DFT length == MXU/lane width


def _fft_stage1_combo(fw_reads, coefs):
    """sum_j coefs[j] * fw[j] with trace-time constant folding.

    coefs are host floats (stage-1 radix-N1 DFT matrix column); exact zeros
    are skipped and +-1 folds to add/subtract, so e.g. the k1=0 column is
    N1-1 adds and every imaginary k1 in {0, N1/2} column vanishes to None.
    """
    acc = None
    for j, c in enumerate(coefs):
        if abs(c) < 1e-12:
            continue
        if c == 1.0:
            term = fw_reads[j]
        elif c == -1.0:
            term = -fw_reads[j]
        else:
            term = jnp.float32(c) * fw_reads[j]
        acc = term if acc is None else acc + term
    return acc


def _mel_fft_kernel(
    wave_ref,  # (1, N1, FRAME_BLOCK, 128): row n1 = half-hop-shifted tiles
    hb_ref,  # (N1, 128) hann window reshaped
    tc_ref,  # (K1H, 128) twiddle cos
    tsn_ref,  # (K1H, 128) twiddle -sin
    c2_ref,  # (128, 128) stage-2 DFT cos
    s2n_ref,  # (128, 128) stage-2 DFT -sin
    fbm_ref,  # (K1H, 128, n_mels) symmetry-folded, bin-permuted filterbank
    out_ref,  # (1, FRAME_BLOCK, n_mels)
    fw_ref,  # scratch (N1, FRAME_BLOCK, 128): windowed frame blocks
    *,
    n1: int,
    log_floor: float,
):
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    for j in range(n1):
        fw_ref[j] = wave_ref[0, j] * hb_ref[j:j + 1, :]
    fw = [fw_ref[j] for j in range(n1)]

    # stage-1 radix-n1 DFT coefficients, host floats baked at trace time
    jj = np.arange(n1, dtype=np.float64)
    acc = None
    for k1 in range(n1 // 2 + 1):
        ang = 2.0 * np.pi * jj * k1 / n1
        hre = _fft_stage1_combo(fw, list(np.cos(ang)))
        him = _fft_stage1_combo(fw, list(-np.sin(ang)))
        tc = tc_ref[k1:k1 + 1, :]
        tsn = tsn_ref[k1:k1 + 1, :]
        if him is None:  # k1 in {0, n1/2}: stage-1 output is real
            bre = hre * tc
            bim = hre * tsn
        else:
            bre = hre * tc - him * tsn
            bim = hre * tsn + him * tc
        xre = dot(bre, c2_ref[:]) - dot(bim, s2n_ref[:])
        xim = dot(bre, s2n_ref[:]) + dot(bim, c2_ref[:])
        power = xre * xre + xim * xim
        contrib = dot(power, fbm_ref[k1])
        acc = contrib if acc is None else acc + contrib
    out_ref[0, :, :] = jnp.log(jnp.maximum(acc, log_floor))


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def log_mel_spectrogram_pallas_fft(
    wave: jax.Array, cfg: LogMelConfig = LogMelConfig(),
    interpret: bool = False,
) -> jax.Array:
    """(B, S) float32 -> (B, F, n_mels) float32 — fused framing -> window ->
    two-stage Cooley-Tukey FFT -> power -> mel -> log, one Pallas kernel.

    The n_fft-point DFT factors as N1 x N2 with N2 = 128 (the TPU lane
    width): n = N2*n1 + n2, k = N1*k2 + k1 give

        H[k1, n2] = sum_{n1} x[N2 n1 + n2] W_N1^{n1 k1}      (stage 1)
        B[k1, n2] = H[k1, n2] * W_nfft^{n2 k1}               (twiddle)
        X[N1 k2 + k1] = sum_{n2} B[k1, n2] W_N2^{n2 k2}      (stage 2)

    Stage 1 contracts over only N1=16 terms whose coefficients are
    compile-time constants -> unrolled VPU multiply-adds on (128, 128)
    frame-block tiles (no transposes: the wave arrives as N1 half-hop-
    shifted row tiles, so x[N2 n1 + n2] of frame f is row f of tile n1).
    Stage 2 and the mel projection are MXU-shaped (128, 128) @ (128, .)
    matmuls.  Real-input conjugate symmetry halves the work: only
    k1 = 0..N1/2 is computed and the k1' = N1-k1 mirror spectrum is folded
    into the filterbank on the host (power[2048-k] == power[k], so the
    mirror's mel contribution is power_k1 @ row-flipped fb[N1-k1]).

    FLOPs per frame vs the direct-DFT kernel: ~0.53 M vs ~12 M (22x), and
    every matmul has K = 128 (full MXU depth) instead of K = 2048 ragged
    freq tiles.

    Requires n_fft % 128 == 0 and hop % 128 == 0 (the 2048/256 reference
    configuration satisfies both).
    """
    wave = wave.astype(jnp.float32)
    B, S = wave.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    if n_fft % (2 * _N2) != 0 or hop % _N2 != 0:
        # n_fft must be an EVEN multiple of 128: the conjugate-mirror
        # filterbank fold pairs k1 with n1-k1 and assumes n1 % 2 == 0
        # (an odd n1 would leave the n1-1 family unfolded -> wrong mels)
        raise ValueError(
            "pallas fft mel kernel requires 256 | n_fft and 128 | hop"
        )
    n1 = n_fft // _N2
    s_rows = hop // _N2  # frame stride in half-hop rows
    k1h = n1 // 2 + 1
    F = num_frames(S, cfg)
    n_fb = pl.cdiv(F, FRAME_BLOCK)
    f_padded = n_fb * FRAME_BLOCK
    n_freqs = n_fft // 2 + 1

    # center reflect pad + zero tail so every shifted row slice is in bounds
    pad = n_fft // 2
    x = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    rows_needed = s_rows * f_padded + n1
    needed = rows_needed * _N2
    if needed > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, needed - x.shape[1])))
    R = x.shape[1] // _N2
    rows = x[:, : R * _N2].reshape(B, R, _N2)
    # tile j holds rows [j, j + s*f_padded) with stride s: frame f's samples
    # [128 j, 128 j + 128) live in rows[s*f + j] (an XLA strided slice
    # outside the kernel — Mosaic loads must start sublane-aligned)
    x = jnp.stack(
        [rows[:, j:j + s_rows * f_padded:s_rows, :] for j in range(n1)],
        axis=1,
    )  # (B, n1, f_padded, 128)

    # host tables (float64 -> fp32)
    hb = np.asarray(_hann_window(n_fft), np.float64).reshape(n1, _N2)
    n2 = np.arange(_N2, dtype=np.float64)
    k1s = np.arange(k1h, dtype=np.float64)[:, None]
    tang = 2.0 * np.pi * n2[None, :] * k1s / n_fft
    k2 = np.arange(_N2, dtype=np.float64)[None, :]
    ang2 = 2.0 * np.pi * n2[:, None] * k2 / _N2
    fb = mel_filterbank(
        n_freqs, cfg.f_min, cfg.sample_rate / 2.0, cfg.n_mels,
        cfg.sample_rate,
    )
    fb_full = np.zeros((n_fft, cfg.n_mels), np.float64)
    fb_full[:n_freqs] = fb
    # bin k = n1*k2 + k1 -> (k1, k2) layout; fold the conjugate-mirror
    # families k1' = n1-k1 (power[n_fft-k] == power[k] for real input,
    # n_fft-k = n1*(N2-1-k2) + (n1-k1) -> row-flip of the mirror's fb)
    fbm = fb_full.reshape(_N2, n1, cfg.n_mels).transpose(1, 0, 2)
    fbm_eff = fbm[:k1h].copy()
    for k1 in range(1, n1 // 2):
        fbm_eff[k1] += fbm[n1 - k1][::-1, :]

    kernel = functools.partial(
        _mel_fft_kernel, n1=n1, log_floor=cfg.log_floor
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_fb),
        in_specs=[
            pl.BlockSpec(
                (1, n1, FRAME_BLOCK, _N2),
                lambda b, f: (b, 0, f, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n1, _N2), lambda b, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1h, _N2), lambda b, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1h, _N2), lambda b, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_N2, _N2), lambda b, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_N2, _N2), lambda b, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1h, _N2, cfg.n_mels), lambda b, f: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAME_BLOCK, cfg.n_mels), lambda b, f: (b, f, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, f_padded, cfg.n_mels), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((n1, FRAME_BLOCK, _N2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * n_fb * k1h * FRAME_BLOCK * _N2 * (
                2 * n1 + 8 + 4 * 2 * _N2 + 2 * cfg.n_mels
            ),
            bytes_accessed=4 * B * n_fb * FRAME_BLOCK * (
                n1 * _N2 + cfg.n_mels
            ),
            transcendentals=B * n_fb * FRAME_BLOCK * cfg.n_mels,
        ),
        interpret=interpret,
    )(
        x,
        jnp.asarray(hb, jnp.float32),
        jnp.asarray(np.cos(tang), jnp.float32),
        jnp.asarray(-np.sin(tang), jnp.float32),
        jnp.asarray(np.cos(ang2), jnp.float32),
        jnp.asarray(-np.sin(ang2), jnp.float32),
        jnp.asarray(fbm_eff, jnp.float32),
    )
    return out[:, :F, :]


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

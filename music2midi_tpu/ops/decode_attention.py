"""Fused Pallas decode-attention kernel (int8 KV, folded scales).

STATUS: correct and parity-tested, but MEASURED SLOWER than the XLA path
on the target stack — kept as a flag-gated experiment
(DecodeConfig.pallas_attention, default OFF).  Honest in-loop numbers at
B=128, H=8, L=256 (device_get protocol):

    XLA _attention_int8 chain   153 us/call  (~100 us inside the real
                                              decode program)
    this kernel (B_BLK=4)       514 us/call
    this kernel (B_BLK=8)       VMEM OOM (22 MB > 16 MB scoped limit)

Why it loses: the (B_BLK, H, L, D) blocks decompose into (L, D=64) tiles
that waste half of each 128-lane vector, the f32 temporaries force
B_BLK=4 under the 16 MB VMEM ceiling, and XLA's own multiply-reduce
fusion already streams the int8 cache well while fusing the scale/bias/
mask chain for free.  End-to-end with all 12 blocks routed through the
kernel the fused dispatch ran 1.60 s vs 0.43 s for the XLA int8 path
(token agreement 99.9% both ways).  A future variant would need a
two-heads-per-tile packing (D x 2 = 128 lanes) and bf16 products to fit
larger blocks; on this stack the expected ceiling (~100 us/block) equals
what XLA already achieves, so the work is parked.

One kernel call replaces the ~10-op XLA chain of a single decode-step
attention block (convert -> scores einsum -> scale fold -> bias -> mask ->
softmax -> scale fold -> out einsum).

V2 (decode_attention_cross_t, below): the revisit the parked notes asked
for — CROSS-attention only, over a TRANSPOSED (B, H, D, L) int8 cache.
With D=64 on sublanes and the lane-padded L=256 on lanes every int8 tile
is dense (the v1 layout's (L, D=64) tiles waste half of each 128-lane
vector), products are bf16 with f32 accumulation (v1's f32 temporaries
forced 4-row blocks), and the whole block computes as vectorized VPU
multiply-reduce with no per-head loops.  Cross KV has no per-step writes
(precomputed once per generation), so the transposed layout costs one
XLA transpose per generation instead of the badly-tiled per-step column
DUS that made a transposed SELF cache 1.7x worse in r3
(tools/probe_layer_scan.py) — self stays on the XLA chain.

V2 MEASURED (tools/probe_cross_kernel.py on the real chip, slope
protocol, B=128 H=8 D=64 L=256 enc_len=190):

    XLA _attention_int8 chain     151.4 us/call   235 GB/s effective
    v2 kernel (B_BLK_X=4)         281.7 us/call   0.54x
    v2 kernel (B_BLK_X=8)          46.7 us/call   763 GB/s  ** 3.24x **
    v2 kernel (B_BLK_X=16)        154.9 us/call   0.98x

The dense-tile + bf16-product hypothesis is CONFIRMED at the kernel
level: at B_BLK_X=8 this is the first Pallas decode-attention variant to
beat the XLA chain (v1 lost 3.4x), at 763 GB/s effective cache
bandwidth.  END-TO-END it still loses: generate_tokens at B=128,
max_length=128, int8 self+cross, median of 5 in-process runs =
1881 ms (XLA cross) vs 1978 ms (pallas_cross) — the cross block is
<6% of a decode step (weight/matmul traffic dominates at B=128), and
routing it through a pallas_call costs XLA the fusion of the
surrounding ca_q/ca_o projections, which eats the 105 us/block saving.
Greedy tokens agree 39.6% on random-init params (near-uniform logits
cascade bf16 rounding; interpret-mode parity tests pin the math —
test_decode_attention.py).  Flag stays DEFAULT OFF
(DecodeConfig.pallas_cross); the kernel-level win is the reusable
result — it becomes profitable if/when decode batches shrink or the
step's matmul share drops.

Design notes (TPU):

  * The kernel is PURE-READ over the caches: grid = (B / B_BLK,) batch
    chunks, with Pallas auto-pipelining (double-buffering) the int8 cache
    blocks through VMEM.  The cache write for the current position stays
    in XLA (a cheap in-place dynamic_update_slice) — instead of reading
    the just-written column back, the kernel receives this step's
    quantized K/V row as separate tiny operands and patches the
    `l == step` score and output contribution in-registers.  This avoids
    input/output aliasing, manual DMA, and a write-ordering hazard with
    the prefetched block of grid step 0.
  * Self-attention variant: additive relative-position bias row + causal
    mask (`l <= step`, `step` read from SMEM).  Cross variant: static
    `enc_len` pad mask baked at trace time, no bias, no new-row patch.
  * int8 cache values convert to f32 in-kernel; per-position scales stay
    folded into the (B, H, L) score/prob rows exactly as in
    models/t5.py:_attention_int8 (same algebra, same -1e9 masking).

Shapes: K/V int8 (B, H, L, D), scales f32 (B, H, 1, L), q bf16
(B, H, 1, D), bias f32 (H, L), out bf16 (B, H, D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B_BLK = 4  # batch rows per grid step (VMEM: ~2.5 MB of f32 temporaries
# per int8 cache block at L=1024 with this choice)

INTERPRET = False  # tests set True to run the kernel on CPU


def _kernel(
    step_ref,  # SMEM (1, 1) int32 — current position (self) or unused
    k_ref,  # (B_BLK, H, L, D) int8
    v_ref,  # (B_BLK, H, L, D) int8
    ks_ref,  # (B_BLK, H, 1, L) f32
    vs_ref,  # (B_BLK, H, 1, L) f32
    q_ref,  # (B_BLK, H, 1, D) bf16
    kn_ref,  # (B_BLK, H, 1, D) int8 — this step's quantized K row
    vn_ref,  # (B_BLK, H, 1, D) int8
    kns_ref,  # (B_BLK, H, 1, 1) f32 — its scale
    vns_ref,  # (B_BLK, H, 1, 1) f32
    bias_ref,  # (H, L) f32
    out_ref,  # (B_BLK, H, D) bf16
    *,
    causal: bool,
    enc_len: int,
    L: int,
):
    qf = q_ref[...].astype(jnp.float32)  # (B_BLK, H, 1, D)
    kf = k_ref[...].astype(jnp.float32)
    scores = jnp.sum(kf * qf, axis=-1)  # (B_BLK, H, L)
    scores = scores * ks_ref[...][:, :, 0, :]
    l_pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    if causal:
        step = step_ref[0, 0]
        # patch the current position: the cache column at `step` is stale
        # (XLA writes it in parallel); recompute from the fresh row
        knf = kn_ref[...].astype(jnp.float32)  # (B_BLK, H, 1, D)
        s_new = jnp.sum(knf * qf, axis=-1) * kns_ref[...][:, :, 0, :]
        scores = jnp.where(l_pos == step, s_new, scores)
        scores = scores + bias_ref[...][None, :, :]
        scores = jnp.where(l_pos <= step, scores, jnp.float32(-1e9))
    elif enc_len < L:
        scores = jnp.where(l_pos < enc_len, scores, jnp.float32(-1e9))
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (B_BLK, H, L) f32
    pv = p * vs_ref[...][:, :, 0, :]
    if causal:
        step = step_ref[0, 0]
        p_new = jnp.sum(jnp.where(l_pos == step, p, 0.0), axis=-1)
        pv = jnp.where(l_pos == step, 0.0, pv)
    vf = v_ref[...].astype(jnp.float32)
    out = jnp.sum(vf * pv[:, :, :, None], axis=2)  # (B_BLK, H, D)
    if causal:
        vnf = vn_ref[...][:, :, 0, :].astype(jnp.float32)
        out = out + (p_new * vns_ref[...][:, :, 0, 0])[:, :, None] * vnf
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "enc_len", "interpret"),
)
def decode_attention_int8(
    q: jax.Array,  # (B, H, 1, D) dtype bf16/f32
    k_entry,  # (int8 (B, H, L, D), f32 scales (B, H, 1, L))
    v_entry,
    bias,  # (1, H, 1, L) f32 or None (cross)
    step,  # scalar int32 (self) or None (cross)
    new_k,  # (int8 (B, H, 1, D), f32 (B, H, 1, 1)) or None (cross)
    new_v,
    causal: bool,
    enc_len: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """-> attention output (B, H, 1, D) in q.dtype.

    Drop-in for the decode-step attention blocks when the caches are int8
    (models/t5.py:_attention_int8 semantics, with the current position
    supplied via `new_k`/`new_v` instead of pre-written into the cache).
    """
    interpret = interpret or INTERPRET
    k8, ks = k_entry
    v8, vs = v_entry
    B, H, L, D = k8.shape
    if not causal and enc_len <= 0:
        enc_len = L  # no pad mask (a 0 default would mask EVERY key)
    if B % _B_BLK != 0:
        raise ValueError(f"batch {B} not a multiple of {_B_BLK}")
    if causal:
        kn8, kns = new_k
        vn8, vns = new_v
        bias2d = bias.astype(jnp.float32).reshape(H, L)
        step_arr = jnp.asarray(step, jnp.int32).reshape(1, 1)
    else:
        kn8 = jnp.zeros((B, H, 1, D), jnp.int8)
        vn8 = kn8
        kns = jnp.ones((B, H, 1, 1), jnp.float32)
        vns = kns
        bias2d = jnp.zeros((H, L), jnp.float32)
        step_arr = jnp.zeros((1, 1), jnp.int32)

    grid = (B // _B_BLK,)
    bspec = lambda shape: pl.BlockSpec(  # noqa: E731
        (_B_BLK,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, causal=causal, enc_len=enc_len, L=L
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            bspec((H, L, D)),
            bspec((H, L, D)),
            bspec((H, 1, L)),
            bspec((H, 1, L)),
            bspec((H, 1, D)),
            bspec((H, 1, D)),
            bspec((H, 1, D)),
            bspec((H, 1, 1)),
            bspec((H, 1, 1)),
            pl.BlockSpec((H, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_B_BLK, H, D), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * D,
            bytes_accessed=2 * B * H * L * D + 8 * B * H * L,
            transcendentals=B * H * L,
        ),
        interpret=interpret,
    )(
        step_arr, k8, v8, ks, vs,
        q.astype(jnp.bfloat16), kn8, vn8, kns, vns, bias2d,
    )
    return out[:, :, None, :].astype(q.dtype)


# --------------------------------------------------------------------- #
# v2: cross-attention over a transposed (B, H, D, L) int8 cache          #
# --------------------------------------------------------------------- #

_B_BLK_X = 8  # batch rows per grid step (cross v2).  VMEM at H=8, D=64,
# L=256: int8 K+V blocks 2 MB (double-buffered 4 MB) + bf16/f32
# temporaries ~6-10 MB, under the 16 MB ceiling; the probe can
# monkeypatch this to explore 4/16.


def transpose_cross_entry(entry):
    """(int8 (B,H,L,D), scales (B,H,1,L)) -> values swapped to
    (B,H,D,L) for `decode_attention_cross_t`; scales stay in the
    score-row layout the kernel folds directly.  One XLA transpose per
    generation (cross KV is precomputed once, never rewritten)."""
    vals, scales = entry
    return jnp.swapaxes(vals, 2, 3), scales


def _cross_kernel(
    kt_ref,  # (B_BLK_X, H, D, L) int8 — dense tiles: D=64 sublanes,
    vt_ref,  # L (lane-padded multiple of 128) lanes
    ks_ref,  # (B_BLK_X, H, 1, L) f32 per-position scales
    vs_ref,
    q_ref,  # (B_BLK_X, H, 1, D) bf16
    out_ref,  # (B_BLK_X, H, D) bf16
    *,
    enc_len: int,
    L: int,
):
    # scores: q . k per position — elementwise broadcast over the D
    # sublanes, f32-accumulated lane-preserving reduce.  bf16 products
    # (vs v1's f32) halve the temporaries; int8 values are exact in bf16
    # and q is already bf16, so only the products round.
    qt = jnp.swapaxes(q_ref[...].astype(jnp.bfloat16), 2, 3)  # (B,H,D,1)
    kb = kt_ref[...].astype(jnp.bfloat16)
    s = jnp.sum(kb * qt, axis=2, dtype=jnp.float32)  # (B, H, L)
    s = s * ks_ref[...][:, :, 0, :]
    if enc_len < L:  # static pad mask, baked at trace time
        l_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(l_pos < enc_len, s, jnp.float32(-1e9))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (B, H, L) f32
    p = (p * vs_ref[...][:, :, 0, :]).astype(jnp.bfloat16)
    vb = vt_ref[...].astype(jnp.bfloat16)
    o = jnp.sum(vb * p[:, :, None, :], axis=3, dtype=jnp.float32)
    out_ref[...] = o.astype(out_ref.dtype)  # (B, H, D)


@functools.partial(jax.jit, static_argnames=("enc_len", "interpret"))
def decode_attention_cross_t(
    q: jax.Array,  # (B, H, 1, D) bf16/f32
    kt_entry,  # (int8 (B, H, D, L), f32 scales (B, H, 1, L))
    vt_entry,
    enc_len: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """-> attention output (B, H, 1, D) in q.dtype.

    Cross-attention decode step over TRANSPOSED int8 caches
    (`transpose_cross_entry`).  Same algebra as
    models/t5.py:_attention_int8 (folded per-position scales, -1e9 pad
    masking); no bias, no causal patch — cross only."""
    interpret = interpret or INTERPRET
    kt8, ks = kt_entry
    vt8, vs = vt_entry
    B, H, D, L = kt8.shape
    if enc_len <= 0:
        enc_len = L  # no pad mask (0 would mask EVERY key)
    if B % _B_BLK_X != 0:
        raise ValueError(f"batch {B} not a multiple of {_B_BLK_X}")
    grid = (B // _B_BLK_X,)
    bspec = lambda shape: pl.BlockSpec(  # noqa: E731
        (_B_BLK_X,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_cross_kernel, enc_len=enc_len, L=L),
        grid=grid,
        in_specs=[
            bspec((H, D, L)),
            bspec((H, D, L)),
            bspec((H, 1, L)),
            bspec((H, 1, L)),
            bspec((H, 1, D)),
        ],
        out_specs=pl.BlockSpec(
            (_B_BLK_X, H, D), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * D,
            bytes_accessed=2 * B * H * L * D + 8 * B * H * L,
            transcendentals=B * H * L,
        ),
        interpret=interpret,
    )(kt8, vt8, ks, vs, q.astype(jnp.bfloat16))
    return out[:, :, None, :].astype(q.dtype)

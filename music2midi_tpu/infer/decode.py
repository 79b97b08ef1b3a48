"""Autoregressive decode with a static KV cache — jit/pjit-compatible.

Replaces HF `model.generate(inputs_embeds=...)` (reference
music2midi/transformer.py:41-45: greedy defaults, EOS=2 early stop,
decoder_start=1, max_length=1024 at inference — reference model.py:134).

TPU-first design: fixed shapes everywhere; a `lax.while_loop` steps the
decoder with a preallocated (B, H, max_len, d_kv) cache and exits as soon as
every sequence in the batch has emitted EOS — typical 3-s chunks finish in
50-200 tokens, so early exit is worth 5-20x over scanning to 1024.  Finished
sequences emit PAD, matching HF's padding of completed rows.

Sampling variants (BASELINE.json config 3): temperature / top-k over the
same loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.t5 import (
    T5Config,
    decode_step,
    init_kv_cache,
    precompute_cross_kv,
    prepare_decode_params,
)


class DecodeConfig(NamedTuple):
    max_length: int = 1024  # total length including the start token
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => no top-k filtering
    suppress_tokens: tuple = ()  # token ids masked to -inf before selection
    quantize_cross_kv: bool = False  # int8 cross-KV storage (serving
    # mode; folded scales, exact algebra — models/t5.py:_attention_int8)
    quantize_self_kv: bool = False  # int8 SELF-KV cache: each step
    # quantizes its (B,H,1,D) K/V row and the attention reads int8
    # operands with the scales folded into the score/prob vectors.
    # Serving mode only (~99.9% token agreement vs bf16).
    #
    # Why int8 both ways: honest in-loop ablation (device_get protocol,
    # 16-vs-128-step slope; B=128, L=256) shows the decode step is
    # BANDWIDTH-bound on the caches — 6-layer self-attn+DUS ~490 us,
    # 6-layer cross-attn ~1027 us at the unpadded L_enc=190 (544 us once
    # lane-padded to 256), projections only ~24 us (weights stay
    # VMEM-resident), and int8 K/V operands halve the attention pass
    # (565 -> 284 us).  r1's "op-issue bound / int8 neutral" diagnosis
    # was an artifact of a broken timing protocol (block_until_ready does
    # not force execution through the relay) plus the unpadded cross-KV
    # masking the bandwidth win.
    quantize_weights: bool = False  # int8 weight-only quantization of
    # every decode projection (models/t5.py:_quantize_w, per-column
    # scales).  Serving mode: at small batch the weight reads are
    # comparable to the int8 KV reads, so this halves the remaining
    # weight-side HBM traffic of the bandwidth-bound step.
    pallas_attention: bool = False  # fused Pallas kernel for the int8
    # attention blocks (ops/decode_attention.py).  EXPERIMENT, keep off:
    # measured 514 us/call vs the XLA chain's 153 us (VMEM ceiling forces
    # 4-row blocks; see the kernel docstring).  Requires quantize_*_kv
    # and a TPU backend; silently ignored otherwise.
    pallas_cross: bool = False  # v2 fused kernel for the CROSS-attention
    # blocks only (ops/decode_attention.py:decode_attention_cross_t):
    # the int8 cross KV is stored TRANSPOSED (B, H, D, L) — dense int8
    # tiles, bf16 products — at the cost of one XLA transpose per
    # generation (cross KV is write-once).  Requires quantize_cross_kv,
    # kv_bits=8, batch % 8 == 0 and a TPU backend; silently ignored
    # otherwise.  Self-attention stays on the XLA chain (a transposed
    # self cache pays a badly-tiled column write per step — measured
    # 1.7x worse in r3).  Measured numbers: tools/probe_cross_kernel.py
    # -> module docstring of ops/decode_attention.py.
    unroll: int = 1  # decode steps per while-loop iteration (early-exit
    # check runs every `unroll` steps).  Real-world factor: trained
    # models early-exit at 30-150 tokens vs the 256 forced in bench.py.
    kv_bits: int = 8  # quantized-KV width when quantize_*_kv is on:
    # 8 = int8 (serving default) or 4 = jnp.int4 / XLA s4 (EXPERIMENT:
    # ±7 levels; another 2x off the cache bandwidth floor only if the
    # backend packs s4 two-per-byte in HBM — measure, and check quality
    # with evaluate.py before trusting; the Pallas kernel is int8-only
    # and is skipped at 4 bits).


class _State(NamedTuple):
    step: jax.Array  # scalar int32 — position of the *next* emitted token - 1
    token: jax.Array  # (B,) int32 current input token
    done: jax.Array  # (B,) bool
    tokens: jax.Array  # (B, max_length) int32 output buffer
    cache: tuple
    rng: jax.Array


def _select_next(
    logits: jax.Array, rng: jax.Array, dcfg: DecodeConfig
) -> Tuple[jax.Array, jax.Array]:
    if dcfg.suppress_tokens:
        logits = logits.at[:, list(dcfg.suppress_tokens)].set(-jnp.inf)
    if dcfg.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), rng
    scaled = logits.astype(jnp.float32) / dcfg.temperature
    if dcfg.top_k > 0:
        kth = jax.lax.top_k(scaled, dcfg.top_k)[0][..., -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    rng, sub = jax.random.split(rng)
    nxt = jax.random.categorical(sub, scaled, axis=-1).astype(jnp.int32)
    return nxt, rng


@functools.partial(
    jax.jit, static_argnames=("cfg", "dcfg")
)
def generate_tokens(
    params,
    encoder_hidden: jax.Array,  # (B, L, d_model)
    cfg: T5Config,
    dcfg: DecodeConfig = DecodeConfig(),
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """-> (tokens (B, max_length) int32 starting with decoder_start,
           lengths (B,) int32 including start and EOS).

    Greedy when dcfg.temperature == 0 (token-parity path), else
    temperature/top-k sampling.
    """
    B = encoder_hidden.shape[0]
    max_len = dcfg.max_length
    unroll = max(1, dcfg.unroll)
    # pad the buffer so unrolled chunks never write out of bounds; the
    # early-exit check runs between chunks, and rows already done keep
    # emitting PAD inside a chunk (unchanged greedy semantics)
    n_gen = max_len - 1
    n_chunks_pad = -(-n_gen // unroll)
    buf_len = 1 + n_chunks_pad * unroll
    if rng is None:
        rng = jax.random.PRNGKey(0)
    cross_kv = precompute_cross_kv(
        params, encoder_hidden, cfg, quantize=dcfg.quantize_cross_kv,
        bits=dcfg.kv_bits,
    )  # CrossKV: lane-padded entries + pad mask, unpacked by decode_step
    use_pallas = bool(
        dcfg.pallas_attention and jax.default_backend() == "tpu"
    )
    from ..ops import decode_attention as _da

    if (
        dcfg.pallas_cross and dcfg.quantize_cross_kv
        and dcfg.kv_bits == 8 and B % _da._B_BLK_X == 0
        and (jax.default_backend() == "tpu" or _da.INTERPRET)
    ):
        # store the cross KV transposed (B, H, D, L): decode_step routes
        # this layout through the v2 dense-tile kernel unconditionally
        cross_kv = cross_kv._replace(layers=[
            (_da.transpose_cross_entry(k), _da.transpose_cross_entry(v))
            for k, v in cross_kv.layers
        ])
    # one-time decode weight prep: pre-cast to cfg.dtype + fused qkv/wi
    # (the while_loop then reads half the weight bytes per step); int8
    # weight-only quantization on top when dcfg.quantize_weights
    dparams = prepare_decode_params(
        params, cfg, quantize_weights=dcfg.quantize_weights
    )
    # precompute the relative-position bias for every (step, key) pair —
    # ~12 XLA bucket-math ops per step otherwise, and per-op issue
    # overhead is real on this stack (PERFORMANCE.md)
    from ..models.t5 import position_bias

    all_pos = jnp.arange(buf_len, dtype=jnp.int32)
    bias_table = jnp.transpose(
        position_bias(
            dparams["rel_bias"], all_pos, all_pos, False,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        ),
        (1, 0, 2),
    )  # (Q, H, K)

    # phased cache growth: decode is self-KV-bandwidth bound (every step
    # reads the whole padded cache), and trained models typically finish in
    # 30-150 tokens — so run with a small cache first and geometrically
    # grow it only if sequences are still alive.  Attention masks make the
    # tokens independent of the phase boundaries (greedy parity holds).
    phase_lens = []
    p = 64
    while p < buf_len:
        phase_lens.append(p)
        p *= 2
    phase_lens.append(buf_len)

    tokens = jnp.full((B, buf_len), cfg.pad_token_id, dtype=jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    state = _State(
        step=jnp.int32(0),
        token=jnp.full((B,), cfg.decoder_start_token_id, dtype=jnp.int32),
        done=jnp.zeros((B,), dtype=bool),
        tokens=tokens,
        cache=tuple(init_kv_cache(
            B, phase_lens[0], cfg, quantize=dcfg.quantize_self_kv,
            bits=dcfg.kv_bits,
        )),
        rng=rng,
    )

    def make_body(cache_len: int):
        def body(s: _State) -> _State:
            step, token, done, toks, cache, rng_ = s
            cache = list(cache)
            for _ in range(unroll):
                logits, cache = decode_step(
                    dparams, token, step, cache, cross_kv, cfg, cache_len,
                    use_pallas=use_pallas, bias_table=bias_table,
                )
                nxt, rng_ = _select_next(logits, rng_, dcfg)
                nxt = jnp.where(done, cfg.pad_token_id, nxt)
                done = done | (nxt == cfg.eos_token_id)
                toks = jax.lax.dynamic_update_slice(
                    toks, nxt[:, None], (0, step + 1)
                )
                token = nxt
                step = step + 1
            return _State(step, token, done, toks, tuple(cache), rng_)

        return body

    for cache_len in phase_lens:
        # phase limit: leave `unroll` headroom so a chunk never writes a
        # cache slot beyond cache_len; the final phase runs to n_gen (its
        # buffer buf_len = 1 + ceil(n_gen/unroll)*unroll always fits)
        if cache_len == phase_lens[-1]:
            phase_gen = n_gen
        else:
            phase_gen = min(n_gen, cache_len - unroll)

        def cond(s: _State, lim=phase_gen):
            return jnp.logical_and(s.step < lim, ~jnp.all(s.done))

        state = jax.lax.while_loop(cond, make_body(cache_len), state)
        if cache_len < phase_lens[-1]:
            next_len = min(cache_len * 2, buf_len)

            def grow(entry, n=next_len - cache_len):
                pad3 = ((0, 0), (0, 0), (0, n), (0, 0))
                if isinstance(entry, tuple):  # int8 (values, scales)
                    vals, scales = entry
                    # scales live in the (B, H, 1, L) score-row layout
                    return (
                        jnp.pad(vals, pad3),
                        jnp.pad(scales,
                                ((0, 0), (0, 0), (0, 0), (0, n)),
                                constant_values=1.0),
                    )
                return jnp.pad(entry, pad3)

            grown = tuple(
                (grow(k), grow(v)) for k, v in state.cache
            )
            state = state._replace(cache=grown)

    final = state
    out_tokens = final.tokens[:, :max_len]
    eos_mask = out_tokens == cfg.eos_token_id
    has_eos = jnp.any(eos_mask, axis=1)
    first_eos = jnp.argmax(eos_mask, axis=1).astype(jnp.int32)
    lengths = jnp.where(has_eos, first_eos + 1, max_len)
    return out_tokens, lengths

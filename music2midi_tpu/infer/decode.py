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
)


class DecodeConfig(NamedTuple):
    max_length: int = 1024  # total length including the start token
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => no top-k filtering
    suppress_tokens: tuple = ()  # token ids masked to -inf before selection


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
    if rng is None:
        rng = jax.random.PRNGKey(0)
    cross_kv = precompute_cross_kv(params, encoder_hidden, cfg)
    cache = tuple(init_kv_cache(B, max_len, cfg))
    tokens = jnp.full((B, max_len), cfg.pad_token_id, dtype=jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    state = _State(
        step=jnp.int32(0),
        token=jnp.full((B,), cfg.decoder_start_token_id, dtype=jnp.int32),
        done=jnp.zeros((B,), dtype=bool),
        tokens=tokens,
        cache=cache,
        rng=rng,
    )

    def cond(s: _State):
        return jnp.logical_and(s.step < max_len - 1, ~jnp.all(s.done))

    def body(s: _State) -> _State:
        logits, new_cache = decode_step(
            params, s.token, s.step, list(s.cache), cross_kv, cfg, max_len
        )
        nxt, new_rng = _select_next(logits, s.rng, dcfg)
        nxt = jnp.where(s.done, cfg.pad_token_id, nxt)
        new_done = s.done | (nxt == cfg.eos_token_id)
        new_tokens = jax.lax.dynamic_update_slice(
            s.tokens, nxt[:, None], (0, s.step + 1)
        )
        return _State(
            step=s.step + 1,
            token=nxt,
            done=new_done,
            tokens=new_tokens,
            cache=tuple(new_cache),
            rng=new_rng,
        )

    final = jax.lax.while_loop(cond, body, state)
    eos_mask = final.tokens == cfg.eos_token_id
    has_eos = jnp.any(eos_mask, axis=1)
    first_eos = jnp.argmax(eos_mask, axis=1).astype(jnp.int32)
    lengths = jnp.where(has_eos, first_eos + 1, max_len)
    return final.tokens, lengths

"""Functional T5 encoder-decoder for TPU — HF-`transformers` semantics.

A ground-up JAX implementation of the model the reference instantiates as
`T5ForConditionalGeneration(T5Config(**config.model.t5))` (reference
music2midi/transformer.py:14-16).  Design goals:

  * pure functions over an explicit parameter pytree (pjit/orbax friendly)
  * numerics matching HF T5 so greedy decode is token-exact after weight
    conversion (`models/convert.py`): RMSNorm with fp32 variance,
    UNSCALED q·k attention (T5 absorbs 1/sqrt(d_kv) into init), relative
    position buckets (32 buckets / max distance 128, bidirectional encoder,
    causal decoder, bias owned by layer 0 and shared per stack), gated-GELU
    ("gelu_new" tanh approximation) FFN, untied lm_head
  * static shapes throughout; the decoder supports a preallocated KV cache
    written at a dynamic step index for the `lax.while_loop` greedy decode
    in `infer/decode.py`

Model-shape facts (SURVEY.md §2): 6+6 layers, d_model=384, d_ff=1152,
heads=8, d_kv=64 (attention inner dim 512 != d_model), vocab=400,
dropout 0.1, layer-norm eps 1e-6, ~30 M params.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


class T5Config(NamedTuple):
    vocab_size: int = 400
    d_model: int = 384
    d_kv: int = 64
    num_heads: int = 8
    d_ff: int = 1152
    num_layers: int = 6
    num_decoder_layers: int = 6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    pad_token_id: int = 0
    eos_token_id: int = 2
    decoder_start_token_id: int = 1
    dtype: Any = jnp.float32  # compute dtype for matmuls


def t5_config_from(config, dtype=jnp.float32) -> T5Config:
    """Build from the shared YAML tree (reference config.yaml:17-31); keys
    the YAML doesn't set inherit the HF T5Config defaults above."""
    t5 = config.model.t5
    return T5Config(
        vocab_size=int(t5.vocab_size),
        d_model=int(t5.d_model),
        d_ff=int(t5.d_ff),
        num_layers=int(t5.num_layers),
        num_decoder_layers=int(t5.num_decoder_layers),
        relative_attention_num_buckets=int(t5.relative_attention_num_buckets),
        pad_token_id=int(t5.pad_token_id),
        eos_token_id=int(t5.eos_token_id),
        decoder_start_token_id=int(t5.decoder_start_token_id),
        dtype=dtype,
    )


# --------------------------------------------------------------------- #
# primitives                                                             #
# --------------------------------------------------------------------- #


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """T5LayerNorm: no mean subtraction, variance in fp32."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    y = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    return (weight * y.astype(x.dtype)).astype(x.dtype)


def gelu_new(x: jax.Array) -> jax.Array:
    """HF "gelu_new": tanh approximation (used by feed_forward_proj
    gated-gelu)."""
    x3 = x * x * x
    return 0.5 * x * (1.0 + jnp.tanh(
        np.sqrt(2.0 / np.pi).astype(np.float32) * (x + 0.044715 * x3)
    ))


def relative_position_bucket(
    relative_position: jax.Array,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jax.Array:
    """HF T5Attention._relative_position_bucket, vectorized.

    relative_position = key_pos - query_pos.
    """
    rel = relative_position
    buckets = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        buckets += (rel > 0).astype(rel.dtype) * num_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_f = jnp.maximum(rel.astype(jnp.float32), 1.0)  # guard log(0)
    large = max_exact + (
        jnp.log(rel_f / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(rel.dtype)
    large = jnp.minimum(large, num_buckets - 1)
    return buckets + jnp.where(is_small, rel, large)


def position_bias(
    rel_bias_table: jax.Array,  # (num_buckets, heads)
    query_positions: jax.Array,  # (Q,) int32
    key_positions: jax.Array,  # (K,) int32
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jax.Array:
    """-> (heads, Q, K) additive attention bias."""
    rel = key_positions[None, :] - query_positions[:, None]
    buckets = relative_position_bucket(
        rel, bidirectional, num_buckets, max_distance
    )
    return jnp.transpose(rel_bias_table[buckets], (2, 0, 1))


def _split_heads(x: jax.Array, num_heads: int, d_kv: int) -> jax.Array:
    """(B, L, H*D) -> (B, H, L, D)"""
    b, l, _ = x.shape
    return x.reshape(b, l, num_heads, d_kv).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, L, D) -> (B, L, H*D)"""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def attention(
    q: jax.Array,  # (B, H, Q, D)
    k: jax.Array,  # (B, H, K, D)
    v: jax.Array,  # (B, H, K, D)
    bias: Optional[jax.Array],  # (H, Q, K) or (B, H, Q, K) additive
    mask: Optional[jax.Array],  # (B, 1, Q, K) or broadcastable, 1=keep
    dtype,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> jax.Array:
    """T5 attention: scores = q @ k^T (NO 1/sqrt(d) scaling) + bias;
    softmax in fp32.  HF T5 applies dropout to the softmaxed attention
    weights during training — pass dropout_rng to enable."""
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e9))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, probs.shape
        )
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0).astype(dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    ).astype(dtype)


def _quantize_w(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-column int8 weight quantization ->
    (int8 values (in, out), fp32 scales (out,)).

    Decode is HBM-bandwidth bound and at small batch the weight reads are
    comparable to the KV-cache reads (p50 single-song decode: ~30 MB of
    bf16 weights vs ~45 MB of int8 KV per step) — int8 storage halves
    them.  Per-column scales keep the algebra exact up to rounding:
    column j of x @ W equals (x @ Wq)[j] * scale[j]."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)  # all-zero column guard
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _proj(x: jax.Array, w, dtype) -> jax.Array:
    """Bias-free linear: x (…, in) @ w (in, out).  `w` may be an int8
    (values, scales) pair from _quantize_w — the convert fuses into the
    dot's operand read (weights stay int8 in HBM) and the per-column
    scales apply to the fp32 accumulator."""
    if isinstance(w, tuple):
        vals, scale = w
        y = jnp.einsum(
            "...i,io->...o", x.astype(dtype), vals.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        return (y * scale).astype(dtype)
    return jnp.einsum(
        "...i,io->...o", x.astype(dtype), w.astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def _maybe_dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return x, rng
    rng, sub = jax.random.split(rng)
    keep = jax.random.bernoulli(sub, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0).astype(x.dtype), rng


# --------------------------------------------------------------------- #
# layers                                                                 #
# --------------------------------------------------------------------- #


def self_attention_block(
    p: Params,
    x: jax.Array,
    bias: Optional[jax.Array],
    mask: Optional[jax.Array],
    cfg: T5Config,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    q = _split_heads(_proj(x, p["q"], cfg.dtype), cfg.num_heads, cfg.d_kv)
    k = _split_heads(_proj(x, p["k"], cfg.dtype), cfg.num_heads, cfg.d_kv)
    v = _split_heads(_proj(x, p["v"], cfg.dtype), cfg.num_heads, cfg.d_kv)
    out = attention(q, k, v, bias, mask, cfg.dtype,
                    dropout_rng=dropout_rng, dropout_rate=cfg.dropout_rate)
    return _proj(_merge_heads(out), p["o"], cfg.dtype)


def mlp_block(p: Params, x: jax.Array, cfg: T5Config, rng=None,
              deterministic=True) -> jax.Array:
    """Gated-GELU FFN: wo(dropout(gelu_new(wi_0 x) * (wi_1 x))).

    `rng`, when given in training, must be a FRESH key (callers split; an
    earlier version reused the caller's key here AND for the following
    residual dropout, correlating the masks)."""
    gate = gelu_new(_proj(x, p["wi_0"], cfg.dtype))
    lin = _proj(x, p["wi_1"], cfg.dtype)
    h = gate * lin
    if not deterministic and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout_rate, h.shape)
        h = jnp.where(keep, h / (1.0 - cfg.dropout_rate), 0).astype(h.dtype)
    return _proj(h, p["wo"], cfg.dtype)


# --------------------------------------------------------------------- #
# encoder                                                                #
# --------------------------------------------------------------------- #


def encode(
    params: Params,
    inputs_embeds: jax.Array,  # (B, L, d_model) — mel + conditioning
    cfg: T5Config,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Encoder stack over inputs_embeds (the reference always feeds
    embeddings, never token ids — transformer.py:35-37)."""
    enc = params["encoder"]
    L = inputs_embeds.shape[1]
    pos = jnp.arange(L, dtype=jnp.int32)
    bias = position_bias(
        enc["rel_bias"], pos, pos, True,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )[None]  # (1, H, L, L)
    x = inputs_embeds.astype(cfg.dtype)
    x, rng = _maybe_dropout(x, cfg.dropout_rate, rng, deterministic)

    def fresh(r):
        if deterministic or r is None:
            return r, None
        r, sub = jax.random.split(r)
        return r, sub

    for layer in enc["layers"]:
        h = rms_norm(x, layer["ln1"], cfg.layer_norm_epsilon)
        rng, attn_key = fresh(rng)
        h = self_attention_block(layer["self_attn"], h, bias, None, cfg,
                                 dropout_rng=attn_key)
        h, rng = _maybe_dropout(h, cfg.dropout_rate, rng, deterministic)
        x = x + h
        h = rms_norm(x, layer["ln2"], cfg.layer_norm_epsilon)
        rng, mlp_key = fresh(rng)
        h = mlp_block(layer["mlp"], h, cfg, mlp_key, deterministic)
        h, rng = _maybe_dropout(h, cfg.dropout_rate, rng, deterministic)
        x = x + h
    x = rms_norm(x, enc["final_ln"], cfg.layer_norm_epsilon)
    x, rng = _maybe_dropout(x, cfg.dropout_rate, rng, deterministic)
    return x


# --------------------------------------------------------------------- #
# decoder (full-sequence, for training / parity)                         #
# --------------------------------------------------------------------- #


def decoder_forward(
    params: Params,
    decoder_input_ids: jax.Array,  # (B, T)
    encoder_hidden: jax.Array,  # (B, L, d_model)
    cfg: T5Config,
    decoder_attention_mask: Optional[jax.Array] = None,  # (B, T) 1=keep
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-sequence decoder -> logits (B, T, vocab)."""
    dec = params["decoder"]
    B, T = decoder_input_ids.shape
    x = params["shared_embedding"][decoder_input_ids].astype(cfg.dtype)
    x, rng = _maybe_dropout(x, cfg.dropout_rate, rng, deterministic)
    pos = jnp.arange(T, dtype=jnp.int32)
    bias = position_bias(
        dec["rel_bias"], pos, pos, False,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )[None]  # (1, H, T, T)
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))[None, None]
    if decoder_attention_mask is not None:
        causal = causal & decoder_attention_mask[:, None, None, :].astype(bool)
    def fresh(r):
        if deterministic or r is None:
            return r, None
        r, sub = jax.random.split(r)
        return r, sub

    for layer in dec["layers"]:
        h = rms_norm(x, layer["ln1"], cfg.layer_norm_epsilon)
        rng, attn_key = fresh(rng)
        h = self_attention_block(layer["self_attn"], h, bias, causal, cfg,
                                 dropout_rng=attn_key)
        h, rng = _maybe_dropout(h, cfg.dropout_rate, rng, deterministic)
        x = x + h
        # cross attention: no position bias, full encoder visibility
        h = rms_norm(x, layer["ln2"], cfg.layer_norm_epsilon)
        ca = layer["cross_attn"]
        q = _split_heads(_proj(h, ca["q"], cfg.dtype), cfg.num_heads, cfg.d_kv)
        k = _split_heads(
            _proj(encoder_hidden, ca["k"], cfg.dtype), cfg.num_heads, cfg.d_kv
        )
        v = _split_heads(
            _proj(encoder_hidden, ca["v"], cfg.dtype), cfg.num_heads, cfg.d_kv
        )
        rng, cross_key = fresh(rng)
        h = _proj(
            _merge_heads(attention(
                q, k, v, None, None, cfg.dtype,
                dropout_rng=cross_key, dropout_rate=cfg.dropout_rate,
            )),
            ca["o"], cfg.dtype,
        )
        h, rng = _maybe_dropout(h, cfg.dropout_rate, rng, deterministic)
        x = x + h
        h = rms_norm(x, layer["ln3"], cfg.layer_norm_epsilon)
        rng, mlp_key = fresh(rng)
        h = mlp_block(layer["mlp"], h, cfg, mlp_key, deterministic)
        h, rng = _maybe_dropout(h, cfg.dropout_rate, rng, deterministic)
        x = x + h
    x = rms_norm(x, dec["final_ln"], cfg.layer_norm_epsilon)
    x, rng = _maybe_dropout(x, cfg.dropout_rate, rng, deterministic)
    # untied lm_head (tie_word_embeddings=false, config.yaml:23): no
    # d_model^-0.5 rescale
    return _proj(x, params["lm_head"], cfg.dtype)


def shift_right(labels: jax.Array, cfg: T5Config) -> jax.Array:
    """HF T5 _shift_right: prepend decoder_start, drop last, -100 -> pad."""
    shifted = jnp.concatenate(
        [
            jnp.full(
                (labels.shape[0], 1), cfg.decoder_start_token_id,
                dtype=labels.dtype,
            ),
            labels[:, :-1],
        ],
        axis=1,
    )
    return jnp.where(shifted == -100, cfg.pad_token_id, shifted)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Token-mean CE with -100 ignore index (HF CrossEntropyLoss default)."""
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def t5_forward(
    params: Params,
    inputs_embeds: jax.Array,
    labels: jax.Array,
    cfg: T5Config,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Training forward: (loss, logits) — mirrors reference
    transformer.py:28-39 (labels padded with -100)."""
    if rng is not None:
        rng_e, rng_d = jax.random.split(rng)
    else:
        rng_e = rng_d = None
    enc = encode(params, inputs_embeds, cfg, deterministic, rng_e)
    dec_in = shift_right(labels, cfg)
    logits = decoder_forward(
        params, dec_in, enc, cfg, deterministic=deterministic, rng=rng_d
    )
    return cross_entropy_loss(logits, labels), logits


# --------------------------------------------------------------------- #
# incremental decoding (static KV cache)                                 #
# --------------------------------------------------------------------- #


def precompute_cross_kv(
    params: Params, encoder_hidden: jax.Array, cfg: T5Config,
    quantize: bool = False, bits: int = 8,
) -> list:
    """Per-layer cross-attention K/V from encoder output, computed once per
    generation (HF recomputes per step unless cached; here it is explicit).

    The key length is PADDED to a multiple of 128 (the TPU lane width):
    the encoder length for a 3-s chunk is 190 (188 mel frames + 2
    conditioning vectors), and a 190-lane attention read runs ~2x slower
    than a 256-lane one (measured 1027 -> 544 us/step for the 6-layer
    cross pass).  Pad columns are masked to -1e9 before softmax, which
    underflows to exactly 0 probability — bit-identical outputs.  Use
    `cross_attention_mask` for the matching mask.

    quantize=True stores int8 values + per-position fp32 scales: the decode
    loop re-reads the full cross-KV every step — the decode bandwidth
    floor — and the in-loop attention ops are bandwidth-bound (measured
    565 -> 284 us/step for 6 layers at L=256 with int8 operands), so
    halving the bytes halves the floor.  The scales fold into the
    score/prob vectors after the int8-operand matmuls (exact algebra, see
    _attention_int8).  Serving-mode only (not bit-parity)."""
    L = encoder_hidden.shape[1]
    pad = (-L) % 128
    out = []
    for layer in params["decoder"]["layers"]:
        ca = layer["cross_attn"]
        k = _split_heads(
            _proj(encoder_hidden, ca["k"], cfg.dtype), cfg.num_heads, cfg.d_kv
        )
        v = _split_heads(
            _proj(encoder_hidden, ca["v"], cfg.dtype), cfg.num_heads, cfg.d_kv
        )
        if pad:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if quantize:
            out.append((_quantize_kv(k, bits), _quantize_kv(v, bits)))
        else:
            out.append((k, v))
    return CrossKV(layers=out, mask=cross_attention_mask(L), enc_len=L)


class CrossKV(NamedTuple):
    """Lane-padded per-layer cross-attention K/V plus the pad mask.

    `decode_step` unpacks this transparently, so callers just pass the
    `precompute_cross_kv` result through.  A plain list of (k, v) pairs
    (no padding, no mask) is also still accepted.  `enc_len` is the true
    (unpadded) key length — a static int while tracing, used by the fused
    Pallas attention path.

    INVARIANT: construct and consume a CrossKV inside ONE trace.  As a
    NamedTuple it is a pytree whose leaves include `enc_len` and `mask`,
    so passing one ACROSS a jit/vmap boundary turns `enc_len` into a
    tracer and breaks the static `enc_len > 0` / `mask is None` gating in
    `decode_step`.  Every in-repo caller builds it inside the traced
    function; do the same."""
    layers: list
    mask: Optional[jax.Array]  # (1, 1, 1, Lp) bool, None if unpadded
    enc_len: int = 0


def cross_attention_mask(enc_len: int) -> Optional[jax.Array]:
    """(1, 1, 1, Lp) bool mask for the lane-padded cross-KV: True on the
    first `enc_len` columns.  None when no padding was needed."""
    pad = (-enc_len) % 128
    if pad == 0:
        return None
    return (
        jnp.arange(enc_len + pad) < enc_len
    )[None, None, None, :]


def _quantize_kv(x: jax.Array, bits: int = 8):
    """(B, H, L, D) -> (int values, fp32 scales laid out (B, H, 1, L)).

    The scales are stored PRE-TRANSPOSED into the score-vector layout: the
    decode loop multiplies them into (B, H, 1, L) score/prob rows every
    step, and a (B, H, L, 1) layout puts one scale per 128-lane tile plus
    a per-step transpose — 12 badly-tiled swapaxes per decode step.

    bits=8 (serving default) stores int8 / ±127 levels; bits=4 stores
    XLA s4 (jnp.int4) / ±7 levels — worth at most another 2x on the
    decode bandwidth floor IF the backend packs s4 two-per-byte in HBM
    (measure before trusting; see PERFORMANCE.md)."""
    if bits not in (8, 4):
        raise ValueError(f"_quantize_kv: bits must be 8 or 4, got {bits}")
    levels = 127.0 if bits == 8 else 7.0
    dtype = jnp.int8 if bits == 8 else jnp.int4
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / levels
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -levels, levels)
    return q.astype(dtype), jnp.swapaxes(scale, -1, -2)


def _kv_bits(entry) -> int:
    """Quantization width of a (values, scales) cache entry, from its
    stored dtype — keeps the int4/int8 choice type-driven so decode_step
    needs no extra static argument."""
    return 4 if entry[0].dtype == jnp.int4 else 8


def _dequantize_kv(entry, dtype) -> jax.Array:
    if isinstance(entry, tuple):
        q, scale = entry
        return (
            q.astype(jnp.float32) * jnp.swapaxes(scale, -1, -2)
        ).astype(dtype)
    return entry


def _attention_int8(
    q: jax.Array,  # (B, H, 1, D)
    k_entry: tuple,  # (int8 (B,H,L,D), fp32 scales (B,H,1,L))
    v_entry: tuple,
    bias: Optional[jax.Array],  # (B?, H, 1, L) additive, fp32
    mask: Optional[jax.Array],  # broadcastable to (B,H,1,L), True=keep
    dtype,
) -> jax.Array:
    """Decode-time attention reading int8 K/V WITHOUT materializing a
    dequantized tensor (used for both the cross-KV and the self-KV cache).
    Per-position scales commute with the dot products exactly:

      score_j = q . (k8_j * ks_j)  =  ks_j * (q . k8_j)
      out     = sum_j p_j (v8_j * vs_j)  =  sum_j (p_j * vs_j) v8_j

    so the scales apply to the tiny (B,H,1,L) score/prob vectors after the
    int8-operand matmuls, and the only per-step HBM traffic on the caches
    (the decode bandwidth floor) is the int8 bytes — measured 565 -> 284
    us/step for a 6-layer pass at B=128, L=256, confirming the loop is
    bandwidth-bound.  The r1 `_dequantize_kv` path lost 1.36x because XLA
    materialized scale * k8 as a full bf16 tensor; the convert-only operand
    here fuses into the dot.  Bias/mask apply to the scaled scores, exactly
    as in `attention`.  Bit-exactness: matches dequantize-then-dot up to
    dot-order rounding (int8 values are exact in bf16/fp32)."""
    k8, k_scale = k_entry
    v8, v_scale = v_entry
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k8.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    scores = scores * k_scale  # scales pre-stored (B,H,1,L) fp32
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e9))
    probs = jax.nn.softmax(scores, axis=-1)
    probs = (probs * v_scale).astype(dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v8.astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def init_kv_cache(
    batch: int, max_len: int, cfg: T5Config, quantize: bool = False,
    bits: int = 8,
) -> list:
    """Preallocated self-attention KV cache: per layer (K, V) of shape
    (B, H, max_len, d_kv).

    quantize=True stores each of K and V as (int values, fp32 per-position
    scales in the (B, H, 1, max_len) score-row layout) — every decode step
    re-reads the whole cache, so int8 halves the dominant HBM traffic
    (serving mode only).  bits=4 stores jnp.int4 instead (±7 levels,
    experiment — see _quantize_kv)."""
    shape = (batch, cfg.num_heads, max_len, cfg.d_kv)
    sshape = (batch, cfg.num_heads, 1, max_len)  # score-row layout
    qdtype = jnp.int8 if bits == 8 else jnp.int4

    def one():
        if quantize:
            return (jnp.zeros(shape, qdtype), jnp.ones(sshape, jnp.float32))
        return jnp.zeros(shape, cfg.dtype)

    return [(one(), one()) for _ in range(cfg.num_decoder_layers)]


def prepare_decode_params(
    params: Params, cfg: T5Config, quantize_weights: bool = False
) -> Params:
    """Decode-time weight tree, built ONCE per generation:

    * every projection pre-cast to cfg.dtype — the step previously re-read
      and re-converted the fp32 weights every token (120 MB/step at 30 M
      params; decode is HBM-bandwidth bound)
    * self-attn q/k/v concatenated into one (d_model, 3*H*D) matmul and
      gated-FFN wi_0/wi_1 into one (d_model, 2*d_ff) — bit-identical
      outputs (each output column's dot is unchanged), fewer ops per step
      (VERDICT r1 item 2: 75 -> ~55 ops)
    * layer-norm weights stay fp32: rms_norm multiplies in fp32 before the
      cast, and pre-casting them would change bf16 numerics
    * quantize_weights=True stores every projection as an int8
      (values, per-column scales) pair (_quantize_w) — weight-only
      quantization for the bandwidth-bound decode loop (serving mode;
      quantized from the fp32 master weights, not the cfg.dtype cast).
      The embedding stays cfg.dtype: its per-step gather reads B rows,
      not the whole table.
    """
    def cast(w):
        if quantize_weights:
            return _quantize_w(w)
        return jnp.asarray(w, cfg.dtype)

    dec = params["decoder"]
    layers = []
    for layer in dec["layers"]:
        sa, ca, mlp = layer["self_attn"], layer["cross_attn"], layer["mlp"]
        layers.append({
            "ln1": layer["ln1"], "ln2": layer["ln2"], "ln3": layer["ln3"],
            "sa_qkv": cast(jnp.concatenate(
                [jnp.asarray(sa["q"]), jnp.asarray(sa["k"]),
                 jnp.asarray(sa["v"])], axis=1
            )),
            "sa_o": cast(sa["o"]),
            "ca_q": cast(ca["q"]),
            "ca_o": cast(ca["o"]),
            "mlp_wi": cast(jnp.concatenate(
                [jnp.asarray(mlp["wi_0"]), jnp.asarray(mlp["wi_1"])], axis=1
            )),
            "mlp_wo": cast(mlp["wo"]),
        })
    return {
        "embedding": jnp.asarray(params["shared_embedding"], cfg.dtype),
        "rel_bias": dec["rel_bias"],
        "final_ln": dec["final_ln"],
        "lm_head": cast(params["lm_head"]),
        "layers": layers,
    }


def _dus_kv(entry, new: jax.Array, step: jax.Array, new_q=None):
    """Write this step's (B, H, 1, D) K or V row into a cache entry —
    either a plain dtype array or an int8 (values, scales) pair, in which
    case the quantized row (`new_q`, computed once by the caller, or
    quantized here) is written (per-(B,H) scale for the single row)."""
    if isinstance(entry, tuple):
        vals, scales = entry
        q8, s = new_q if new_q is not None else _quantize_kv(
            new, _kv_bits(entry))
        return (
            jax.lax.dynamic_update_slice(vals, q8, (0, 0, step, 0)),
            jax.lax.dynamic_update_slice(scales, s, (0, 0, 0, step)),
        )
    return jax.lax.dynamic_update_slice(entry, new, (0, 0, step, 0))


def decode_step(
    dparams: Params,  # prepare_decode_params output
    token: jax.Array,  # (B,) current input token
    step: jax.Array,  # scalar int32: position of `token`
    kv_cache: list,
    cross_kv: list,
    cfg: T5Config,
    max_len: int,
    cross_mask: Optional[jax.Array] = None,  # (1,1,1,Lp) for padded cross
    use_pallas: bool = False,  # fused attention kernel for int8 caches
    bias_table: Optional[jax.Array] = None,  # (Q, H, K) precomputed
    # position_bias for every step (generate_tokens builds it once per
    # generation; the per-step bucket math is ~12 XLA ops otherwise)
) -> Tuple[jax.Array, list]:
    """One incremental decoder step -> (logits (B, vocab), new kv_cache).

    The KV cache is written at `step`; attention masks keys > step.  Self
    and cross caches may each be int8 (values, scales) pairs — the step
    quantizes the new K/V row and attends through `_attention_int8`
    (folded scales, halved HBM traffic).  `cross_mask` masks the
    lane-padding columns of `precompute_cross_kv` (exact: -1e9 scores
    underflow to 0 probability).
    Accepts either the full param tree (prepared on the fly — fine for
    eager/test use) or a prepare_decode_params tree (what generate_tokens
    passes so the prep happens once, outside the while_loop).
    """
    if "embedding" not in dparams:
        dparams = prepare_decode_params(dparams, cfg)
    enc_len = 0
    if isinstance(cross_kv, CrossKV):
        if cross_mask is None:
            cross_mask = cross_kv.mask
        enc_len = cross_kv.enc_len
        cross_kv = cross_kv.layers
    pallas_ok = False
    if use_pallas:
        from ..ops.decode_attention import _B_BLK

        # the kernel derives the cross pad mask from enc_len, so a
        # legacy plain-list cross_kv (enc_len unknown) may only take the
        # kernel path when there is no pad mask to honor
        pallas_ok = token.shape[0] % _B_BLK == 0 and (
            enc_len > 0 or cross_mask is None
        )
    x = dparams["embedding"][token][:, None]  # (B, 1, d_model)
    key_pos = jnp.arange(max_len, dtype=jnp.int32)
    # causal visibility: keys at positions <= step
    visible = (key_pos <= step)[None, None, None, :]  # (1,1,1,K)
    if bias_table is not None:
        bias_row = jax.lax.dynamic_slice_in_dim(
            bias_table, step, 1, axis=0
        )[:, :, :max_len].transpose(1, 0, 2)[None]  # (1, H, 1, K)
    else:
        bias_row = position_bias(
            dparams["rel_bias"], step[None], key_pos, False,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )[None]  # (1, H, 1, K)
    new_cache = []
    for i, layer in enumerate(dparams["layers"]):
        h = rms_norm(x, layer["ln1"], cfg.layer_norm_epsilon)
        qkv = _proj(h, layer["sa_qkv"], cfg.dtype)  # (B, 1, 3*H*D)
        q, k_new, v_new = (
            _split_heads(part, cfg.num_heads, cfg.d_kv)
            for part in jnp.split(qkv, 3, axis=-1)
        )
        quantized = isinstance(kv_cache[i][0], tuple)
        bits = _kv_bits(kv_cache[i][0]) if quantized else 8
        k_newq = _quantize_kv(k_new, bits) if quantized else None
        v_newq = _quantize_kv(v_new, bits) if quantized else None
        k_all = _dus_kv(kv_cache[i][0], k_new, step, k_newq)
        v_all = _dus_kv(kv_cache[i][1], v_new, step, v_newq)
        new_cache.append((k_all, v_all))
        if quantized:
            if pallas_ok and bits == 8:  # the kernel is int8-specific
                from ..ops.decode_attention import decode_attention_int8

                # pre-write cache by design: the kernel patches the
                # l == step contribution from the fresh rows, so its
                # reads need not wait for the cache DUS above
                h = decode_attention_int8(
                    q, kv_cache[i][0], kv_cache[i][1], bias_row, step,
                    k_newq, v_newq, causal=True,
                )
            else:
                h = _attention_int8(
                    q, k_all, v_all, bias_row, visible, cfg.dtype
                )
        else:
            h = attention(q, k_all, v_all, bias_row, visible, cfg.dtype)
        h = _proj(_merge_heads(h), layer["sa_o"], cfg.dtype)
        x = x + h
        h = rms_norm(x, layer["ln2"], cfg.layer_norm_epsilon)
        q = _split_heads(
            _proj(h, layer["ca_q"], cfg.dtype), cfg.num_heads, cfg.d_kv
        )
        if isinstance(cross_kv[i][0], tuple):
            if cross_kv[i][0][0].shape[-1] != cfg.d_kv:
                # TRANSPOSED (B, H, D, L) int8 layout: produced only by
                # generate_tokens' pallas_cross path (dense-tile v2
                # kernel); the XLA chain never sees this layout
                from ..ops.decode_attention import (
                    decode_attention_cross_t,
                )

                attn_out = decode_attention_cross_t(
                    q, cross_kv[i][0], cross_kv[i][1],
                    enc_len=enc_len or cross_kv[i][0][0].shape[-1],
                )
            elif pallas_ok and _kv_bits(cross_kv[i][0]) == 8:
                from ..ops.decode_attention import decode_attention_int8

                attn_out = decode_attention_int8(
                    q, cross_kv[i][0], cross_kv[i][1], None, None,
                    None, None, causal=False,
                    enc_len=enc_len or cross_kv[i][0][0].shape[2],
                )
            else:
                attn_out = _attention_int8(
                    q, cross_kv[i][0], cross_kv[i][1], None, cross_mask,
                    cfg.dtype,
                )
        else:
            attn_out = attention(
                q, cross_kv[i][0], cross_kv[i][1], None, cross_mask,
                cfg.dtype,
            )
        h = _proj(_merge_heads(attn_out), layer["ca_o"], cfg.dtype)
        x = x + h
        h = rms_norm(x, layer["ln3"], cfg.layer_norm_epsilon)
        wi = _proj(h, layer["mlp_wi"], cfg.dtype)  # (B, 1, 2*d_ff)
        gate, lin = jnp.split(wi, 2, axis=-1)
        h = _proj(gelu_new(gate) * lin, layer["mlp_wo"], cfg.dtype)
        x = x + h
    x = rms_norm(x, dparams["final_ln"], cfg.layer_norm_epsilon)
    logits = _proj(x, dparams["lm_head"], cfg.dtype)
    return logits[:, 0, :], new_cache


# --------------------------------------------------------------------- #
# initialization (HF T5 init scheme)                                     #
# --------------------------------------------------------------------- #


def init_params(
    rng: jax.Array, cfg: T5Config, num_conditioning: Tuple[int, ...] = (6, 3)
) -> Params:
    """Random init matching HF T5's _init_weights factors so training from
    scratch behaves like the reference: q ~ N(0, (d_model*d_kv)^-0.5),
    k,v ~ N(0, d_model^-0.5), o ~ N(0, (heads*d_kv)^-0.5),
    wi ~ N(0, d_model^-0.5), wo ~ N(0, d_ff^-0.5), embeddings ~ N(0, 1),
    lm_head ~ N(0, d_model^-0.5), layer norms = 1.

    Sampling happens on host (numpy): dispatching ~150 tiny jax.random
    programs to a TPU costs ~100 s of compiles for a one-time init.
    `rng` may be a plain int seed or a jax PRNG key; a key is read via
    its host-side buffer WITHOUT a device round trip — fetching a
    just-created key through the relay was observed to stall cold
    processes for minutes (the first D2H of a session can take 20 s+,
    and under relay backpressure indefinitely)."""
    d, dk, h, dff = cfg.d_model, cfg.d_kv, cfg.num_heads, cfg.d_ff
    inner = h * dk
    if isinstance(rng, (int, np.integer)):
        # same entropy words as PRNGKey(seed).key_data -> [hi32, lo32],
        # so int-seed and key-seed callers produce identical params.
        # With x64 off (the default), PRNGKey converts an int32-range
        # seed through uint32 (hi word 0: PRNGKey(-1) -> [0, 0xFFFFFFFF]);
        # with x64 ON the seed is an int64, so a negative seed
        # sign-extends before the 32-bit split (PRNGKey(-1) ->
        # [0xFFFFFFFF, 0xFFFFFFFF]).  Either way SeedSequence rejects
        # negative entropy, hence the explicit wrapping.
        s = int(rng)
        if s < 0 and jax.config.jax_enable_x64:
            s &= 0xFFFFFFFFFFFFFFFF  # two's-complement int64 view
            words = [(s >> 32) & 0xFFFFFFFF, s & 0xFFFFFFFF]
        elif -(2 ** 31) <= s < 2 ** 32:
            words = [0, s & 0xFFFFFFFF]
        else:
            words = [(s >> 32) & 0xFFFFFFFF, s & 0xFFFFFFFF]
        host_rng = np.random.default_rng(words)
    else:
        seed = np.asarray(jax.random.key_data(rng)).ravel()
        host_rng = np.random.default_rng([int(x) for x in seed])

    def normal(shape, std):
        return (host_rng.normal(size=shape) * std).astype(np.float32)

    def attn_params():
        return {
            "q": normal((d, inner), (d * dk) ** -0.5),
            "k": normal((d, inner), d ** -0.5),
            "v": normal((d, inner), d ** -0.5),
            "o": normal((inner, d), inner ** -0.5),
        }

    def mlp_params():
        return {
            "wi_0": normal((d, dff), d ** -0.5),
            "wi_1": normal((d, dff), d ** -0.5),
            "wo": normal((dff, d), dff ** -0.5),
        }

    def enc_layer():
        return {
            "self_attn": attn_params(),
            "ln1": np.ones((d,), np.float32),
            "mlp": mlp_params(),
            "ln2": np.ones((d,), np.float32),
        }

    def dec_layer():
        return {
            "self_attn": attn_params(),
            "ln1": np.ones((d,), np.float32),
            "cross_attn": attn_params(),
            "ln2": np.ones((d,), np.float32),
            "mlp": mlp_params(),
            "ln3": np.ones((d,), np.float32),
        }

    return {
        "shared_embedding": normal((cfg.vocab_size, d), 1.0),
        "encoder": {
            "layers": [enc_layer() for _ in range(cfg.num_layers)],
            "rel_bias": normal(
                (cfg.relative_attention_num_buckets, h), (d * dk) ** -0.5
            ),
            "final_ln": np.ones((d,), np.float32),
        },
        "decoder": {
            "layers": [dec_layer() for _ in range(cfg.num_decoder_layers)],
            "rel_bias": normal(
                (cfg.relative_attention_num_buckets, h), (d * dk) ** -0.5
            ),
            "final_ln": np.ones((d,), np.float32),
        },
        "lm_head": normal((d, cfg.vocab_size), d ** -0.5),
        # genre/difficulty embeddings prepended to the mel frames
        # (reference input.py:44-59, transformer.py:23-26)
        "conditioning": [normal((n, d), 1.0) for n in num_conditioning],
    }


def conditioning_prepend(
    params: Params, features: jax.Array, cond_index: jax.Array
) -> jax.Array:
    """Prepend one embedding per conditioning type: (B, L, d) + (B, n_cond)
    -> (B, n_cond + L, d) (reference input.py:50-59)."""
    embeds = [
        jnp.asarray(table)[cond_index[:, i]]
        for i, table in enumerate(params["conditioning"])
    ]
    stacked = jnp.stack(embeds, axis=1).astype(features.dtype)
    return jnp.concatenate([stacked, features], axis=1)

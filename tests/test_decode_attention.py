"""Fused Pallas decode-attention kernel vs the XLA int8 path (CPU
interpreter)."""

import numpy as np
import pytest

import music2midi_tpu.ops.decode_attention as da
from music2midi_tpu.ops.decode_attention import decode_attention_int8


@pytest.fixture(autouse=True)
def _interpret():
    da.INTERPRET = True
    yield
    da.INTERPRET = False


def _setup(B=8, H=8, L=64, D=64, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def f(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32))

    return f, jnp


def test_self_attention_matches_xla_int8():
    """Kernel (pre-write cache + fresh-row patch) == _attention_int8 over
    the post-write cache, up to bf16 output rounding."""
    from music2midi_tpu.models.t5 import _attention_int8, _quantize_kv

    f, jnp = _setup()
    B, H, L, D = 8, 8, 64, 64
    q = f(B, H, 1, D).astype(jnp.bfloat16)
    k, v = f(B, H, L, D), f(B, H, L, D)
    k_new, v_new = f(B, H, 1, D), f(B, H, 1, D)
    bias = f(1, H, 1, L)
    for step in (0, 5, L - 1):
        k_w = k.at[:, :, step:step + 1, :].set(k_new)
        v_w = v.at[:, :, step:step + 1, :].set(v_new)
        vis = (jnp.arange(L) <= step)[None, None, None, :]
        ref = np.asarray(_attention_int8(
            q, _quantize_kv(k_w), _quantize_kv(v_w), bias, vis,
            jnp.bfloat16,
        ), dtype=np.float32)
        out = np.asarray(decode_attention_int8(
            q, _quantize_kv(k), _quantize_kv(v), bias, jnp.int32(step),
            _quantize_kv(k_new), _quantize_kv(v_new), causal=True,
        ), dtype=np.float32)
        np.testing.assert_allclose(out, ref, atol=0.05)


def test_cross_attention_matches_xla_int8():
    from music2midi_tpu.models.t5 import _attention_int8, _quantize_kv

    f, jnp = _setup(seed=1)
    B, H, L, D = 8, 8, 64, 64
    q = f(B, H, 1, D).astype(jnp.bfloat16)
    k, v = f(B, H, L, D), f(B, H, L, D)
    for enc_len in (50, L):
        mask = (jnp.arange(L) < enc_len)[None, None, None, :]
        ref = np.asarray(_attention_int8(
            q, _quantize_kv(k), _quantize_kv(v), None,
            mask if enc_len < L else None, jnp.bfloat16,
        ), dtype=np.float32)
        out = np.asarray(decode_attention_int8(
            q, _quantize_kv(k), _quantize_kv(v), None, None, None, None,
            causal=False, enc_len=enc_len,
        ), dtype=np.float32)
        np.testing.assert_allclose(out, ref, atol=0.05)


def test_cross_t_v2_matches_xla_int8():
    """v2 transposed-layout cross kernel == _attention_int8 (bf16-product
    rounding tolerance)."""
    from music2midi_tpu.models.t5 import _attention_int8, _quantize_kv
    from music2midi_tpu.ops.decode_attention import (
        decode_attention_cross_t, transpose_cross_entry,
    )

    f, jnp = _setup(seed=3)
    B, H, L, D = 8, 8, 128, 64
    q = f(B, H, 1, D).astype(jnp.bfloat16)
    k, v = f(B, H, L, D), f(B, H, L, D)
    for enc_len in (100, L):
        mask = (jnp.arange(L) < enc_len)[None, None, None, :]
        ref = np.asarray(_attention_int8(
            q, _quantize_kv(k), _quantize_kv(v), None,
            mask if enc_len < L else None, jnp.bfloat16,
        ), dtype=np.float32)
        out = np.asarray(decode_attention_cross_t(
            q, transpose_cross_entry(_quantize_kv(k)),
            transpose_cross_entry(_quantize_kv(v)), enc_len=enc_len,
        ), dtype=np.float32)
        np.testing.assert_allclose(out, ref, atol=0.08)


def test_decode_step_transposed_cross_route_matches_xla():
    """decode_step auto-routes a TRANSPOSED (B,H,D,L) cross cache through
    the v2 kernel; teacher-forced logits match the standard XLA route."""
    import jax
    import jax.numpy as jnp

    from music2midi_tpu.config import default_config
    from music2midi_tpu.models import init_params, t5_config_from
    from music2midi_tpu.models.t5 import (
        decode_step, init_kv_cache, precompute_cross_kv,
        prepare_decode_params,
    )
    from music2midi_tpu.ops.decode_attention import transpose_cross_entry

    cfg = t5_config_from(default_config(), dtype=jnp.bfloat16)
    cfg = cfg._replace(num_layers=2, num_decoder_layers=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    B = 8
    enc = jnp.asarray(
        rng.normal(size=(B, 19, cfg.d_model)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ckv = precompute_cross_kv(params, enc, cfg, quantize=True)
    ckv_t = ckv._replace(layers=[
        (transpose_cross_entry(k), transpose_cross_entry(v))
        for k, v in ckv.layers
    ])
    dparams = prepare_decode_params(params, cfg)
    max_len = 8
    forced = rng.integers(3, cfg.vocab_size, size=(B, max_len)).astype(
        np.int32
    )
    forced[:, 0] = cfg.decoder_start_token_id
    logits = {}
    for name, cross in (("xla", ckv), ("pallas_t", ckv_t)):
        cache = init_kv_cache(B, max_len, cfg, quantize=True)
        per_step = []
        for t in range(max_len - 1):
            step_logits, cache = decode_step(
                dparams, jnp.asarray(forced[:, t]), jnp.int32(t), cache,
                cross, cfg, max_len,
            )
            per_step.append(np.asarray(step_logits, dtype=np.float32))
        logits[name] = np.stack(per_step)
    scale = np.abs(logits["xla"]).max()
    err = np.abs(logits["pallas_t"] - logits["xla"]).max()
    assert err <= 0.02 * max(scale, 1.0), (err, scale)


def test_decode_step_pallas_route_matches_xla():
    """Full decode_step with use_pallas=True == the XLA int8 route
    (greedy-token level over a short sequence)."""
    import jax
    import jax.numpy as jnp

    from music2midi_tpu.config import default_config
    from music2midi_tpu.models import init_params, t5_config_from
    from music2midi_tpu.models.t5 import (
        decode_step, init_kv_cache, precompute_cross_kv,
        prepare_decode_params,
    )

    cfg = t5_config_from(default_config(), dtype=jnp.bfloat16)
    cfg = cfg._replace(num_layers=2, num_decoder_layers=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    enc = jnp.asarray(
        rng.normal(size=(4, 19, cfg.d_model)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ckv = precompute_cross_kv(params, enc, cfg, quantize=True)
    dparams = prepare_decode_params(params, cfg)
    max_len = 8
    # teacher-forced: both routes see the SAME token stream, so per-step
    # logits are directly comparable (no argmax cascade); require every
    # step's logits to be close, not just token agreement
    forced = rng.integers(3, cfg.vocab_size, size=(4, max_len)).astype(
        np.int32
    )
    forced[:, 0] = cfg.decoder_start_token_id
    logits = {}
    for use_pallas in (False, True):
        cache = init_kv_cache(4, max_len, cfg, quantize=True)
        per_step = []
        for t in range(max_len - 1):
            step_logits, cache = decode_step(
                dparams, jnp.asarray(forced[:, t]), jnp.int32(t), cache,
                ckv, cfg, max_len, use_pallas=use_pallas,
            )
            per_step.append(np.asarray(step_logits, dtype=np.float32))
        logits[use_pallas] = np.stack(per_step)
    scale = np.abs(logits[False]).max()
    err = np.abs(logits[True] - logits[False]).max()
    assert err <= 0.02 * max(scale, 1.0), (err, scale)

"""int4 (XLA s4) KV-cache experiment: is there bandwidth left under int8?

The decode step is KV-bandwidth bound (r2 honest-slope result;
PERFORMANCE.md "Decode step"): int8 K/V operands halved the attention
pass.  jnp.int4 storage would halve the cache bytes again — IF the
backend physically packs s4 two-per-byte in HBM and fuses the s4->bf16
convert into the dot's operand read like it does for int8.  If it
instead materializes an unpacked int8/bf16 copy, the win is zero or
negative.  This probe measures the full decode step (the honest
end-to-end unit) at kv_bits=8 vs kv_bits=4 with identical shapes.

Protocol (CLAUDE.md): K data-dependent steps inside ONE jit program
(each step's argmax token feeds the next step's embedding lookup), slope
between K=4 and K=16, median of 5, result fetched with float().  Serving
config: B=128, 6 layers, d_model 384, H=8 D=64, self-KV at L=256,
cross-KV lane-padded to 256, bf16 compute, fused qkv/wi weights.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from music2midi_tpu.models.t5 import (
    T5Config, _attention_int8, _merge_heads, _proj, _quantize_kv,
    _split_heads, gelu_new, rms_norm,
)

cfg = T5Config()
B, H, D, NL = (int(os.environ.get("PROBE_B", 128)), cfg.num_heads,
               cfg.d_kv, cfg.num_decoder_layers)
DM, DFF, V = cfg.d_model, cfg.d_ff, cfg.vocab_size
L, LC = 256, 256  # self cache len, cross (lane-padded) len
dt = jnp.bfloat16
EPS = cfg.layer_norm_epsilon
rng = np.random.default_rng(0)
print(f"backend={jax.default_backend()} B={B} NL={NL} L={L} LC={LC}",
      flush=True)


def w(*shape):
    return jnp.asarray((rng.normal(size=shape) * 0.03).astype(np.float32))


Wl = {
    "ln1": w(NL, DM), "ln2": w(NL, DM), "ln3": w(NL, DM),  # ln stays fp32
    "sa_qkv": w(NL, DM, 3 * H * D).astype(dt),
    "sa_o": w(NL, H * D, DM).astype(dt),
    "ca_q": w(NL, DM, H * D).astype(dt),
    "ca_o": w(NL, H * D, DM).astype(dt),
    "mlp_wi": w(NL, DM, 2 * DFF).astype(dt),
    "mlp_wo": w(NL, DFF, DM).astype(dt),
}
emb = w(V, DM).astype(dt)
lm = w(DM, V).astype(dt)
fln = w(DM)
bias_row = w(1, H, 1, L)
cross_mask = jnp.asarray(
    np.arange(LC) < 190, bool
)[None, None, None, :]
tok0 = jnp.zeros((B,), jnp.int32)


def make_cache(bits):
    lev = 127 if bits == 8 else 7
    qdt = jnp.int8 if bits == 8 else jnp.int4
    def q(*shape):
        return jnp.asarray(
            rng.integers(-lev, lev, shape, dtype=np.int8)).astype(qdt)
    return (
        q(NL, B, H, L, D), jnp.ones((NL, B, H, 1, L), jnp.float32) * .01,
        q(NL, B, H, L, D), jnp.ones((NL, B, H, 1, L), jnp.float32) * .01,
        q(NL, B, H, LC, D), jnp.ones((NL, B, H, 1, LC), jnp.float32) * .01,
        q(NL, B, H, LC, D), jnp.ones((NL, B, H, 1, LC), jnp.float32) * .01,
    )


def layer_math(x, lw, kv, ckv, step, visible, bits):
    """One decoder layer, exactly decode_step's per-layer body on
    quantized caches (models/t5.py decode_step)."""
    kq, ks, vq, vs = kv
    h = rms_norm(x, lw["ln1"], EPS)
    qkv = _proj(h, lw["sa_qkv"], dt)
    q, k_new, v_new = (
        _split_heads(p, H, D) for p in jnp.split(qkv, 3, axis=-1)
    )
    k8, k8s = _quantize_kv(k_new, bits)
    v8, v8s = _quantize_kv(v_new, bits)
    kq = jax.lax.dynamic_update_slice(kq, k8, (0, 0, step, 0))
    ks = jax.lax.dynamic_update_slice(ks, k8s, (0, 0, 0, step))
    vq = jax.lax.dynamic_update_slice(vq, v8, (0, 0, step, 0))
    vs = jax.lax.dynamic_update_slice(vs, v8s, (0, 0, 0, step))
    a = _attention_int8(q, (kq, ks), (vq, vs), bias_row, visible, dt)
    x = x + _proj(_merge_heads(a), lw["sa_o"], dt)
    h = rms_norm(x, lw["ln2"], EPS)
    q = _split_heads(_proj(h, lw["ca_q"], dt), H, D)
    a = _attention_int8(
        q, (ckv[0], ckv[1]), (ckv[2], ckv[3]), None, cross_mask, dt
    )
    x = x + _proj(_merge_heads(a), lw["ca_o"], dt)
    h = rms_norm(x, lw["ln3"], EPS)
    wi = _proj(h, lw["mlp_wi"], dt)
    gate, lin = jnp.split(wi, 2, axis=-1)
    x = x + _proj(gelu_new(gate) * lin, lw["mlp_wo"], dt)
    return x, (kq, ks, vq, vs)


def make_run(k, bits):
    def step(token, step_i, cache):
        x = emb[token][:, None]
        visible = (jnp.arange(L, dtype=jnp.int32) <= step_i)[
            None, None, None, :]
        new = []
        for li in range(NL):
            lw = {n: Wl[n][li] for n in Wl}
            kv = tuple(c[li] for c in cache[:4])
            ckv = tuple(c[li] for c in cache[4:])
            x, kv = layer_math(x, lw, kv, ckv, step_i, visible, bits)
            new.append(kv)
        cache = tuple(
            jnp.stack([n[j] for n in new]) for j in range(4)
        ) + cache[4:]
        logits = _proj(rms_norm(x, fln, EPS), lm, dt)
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

    @jax.jit
    def run(tok, cache):
        def body(i, carry):
            token, cache = carry
            token, cache = step(token, i % (L - 1), cache)
            return token, cache

        token, cache = jax.lax.fori_loop(0, k, body, (tok, cache))
        # consume scale planes + int values so nothing dead-code-eliminates
        return (jnp.sum(token)
                + jnp.sum(cache[1][:, :, :, 0, :100])
                + jnp.sum(cache[0][:, :, :, 0, :].astype(jnp.float32)))

    return run


results = {}
for bits in (8, 4):
    cache0 = jax.device_put(make_cache(bits))
    for c in cache0:
        c.block_until_ready()
    med = {}
    for k in (4, 16):
        run = make_run(k, bits)
        float(run(tok0, cache0))  # compile + warm, fetch forces exec
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(tok0, cache0))
            ts.append(time.perf_counter() - t0)
        med[k] = sorted(ts)[2]
    per = (med[16] - med[4]) / 12
    results[bits] = per
    print(f"kv_bits={bits}: {per*1e6:8.1f} us/step "
          f"(T4={med[4]*1e3:.1f}ms T16={med[16]*1e3:.1f}ms)", flush=True)

print(f"int4/int8 step-time ratio: {results[4] / results[8]:.3f}",
      flush=True)

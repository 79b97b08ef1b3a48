"""Round-3 VERDICT item 8: layer-scan decode experiment.

Does rewriting the 6-layer python loop inside the decode while_loop body
as a lax.scan over stacked layer weights change the per-step time?  The
decode step is KV-bandwidth bound (r2 honest-slope result), so the
expected win is ~0, but the judge asked for a measured delta either way.

Protocol (CLAUDE.md): K data-dependent steps inside ONE jit program
(each step's argmax token feeds the next step's embedding lookup), slope
between K=4 and K=16, median of 5, result fetched with float().  Serving
config: B=128, 6 layers, d_model 384, H=8 D=64, int8 self-KV at L=256,
int8 cross-KV lane-padded to 256, bf16 compute, fused qkv/wi weights.
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


# stacked layer weights, pre-cast to bf16 (prepare_decode_params layout)
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
bias_row = w(1, H, 1, L)  # precomputed rel-bias row (fp32, additive)

# int8 caches: self (stacked over layers) + static cross
kq0 = jnp.asarray(rng.integers(-127, 127, (NL, B, H, L, D), dtype=np.int8))
vq0 = jnp.asarray(rng.integers(-127, 127, (NL, B, H, L, D), dtype=np.int8))
ks0 = jnp.ones((NL, B, H, 1, L), jnp.float32) * 0.01
vs0 = jnp.ones((NL, B, H, 1, L), jnp.float32) * 0.01
ckq = jnp.asarray(rng.integers(-127, 127, (NL, B, H, LC, D), dtype=np.int8))
cvq = jnp.asarray(rng.integers(-127, 127, (NL, B, H, LC, D), dtype=np.int8))
cks = jnp.ones((NL, B, H, 1, LC), jnp.float32) * 0.01
cvs = jnp.ones((NL, B, H, 1, LC), jnp.float32) * 0.01
cross_mask = jnp.asarray(
    np.arange(LC) < 190, bool
)[None, None, None, :]  # lane padding beyond enc_len=190
tok0 = jnp.zeros((B,), jnp.int32)


def layer_math(x, lw, kv, ckv, step, visible):
    """One decoder layer, exactly decode_step's per-layer body
    (models/t5.py:681-742) on int8 caches."""
    kq, ks, vq, vs = kv
    h = rms_norm(x, lw["ln1"], EPS)
    qkv = _proj(h, lw["sa_qkv"], dt)
    q, k_new, v_new = (
        _split_heads(p, H, D) for p in jnp.split(qkv, 3, axis=-1)
    )
    k8, k8s = _quantize_kv(k_new)
    v8, v8s = _quantize_kv(v_new)
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


def make_run(k, variant):
    def step_pyloop(token, step, cache):
        x = emb[token][:, None]
        visible = (jnp.arange(L, dtype=jnp.int32) <= step)[
            None, None, None, :]
        new = []
        for li in range(NL):
            lw = {n: Wl[n][li] for n in Wl}
            kv = tuple(c[li] for c in cache[:4])
            ckv = tuple(c[li] for c in cache[4:])
            x, kv = layer_math(x, lw, kv, ckv, step, visible)
            new.append(kv)
        cache = tuple(
            jnp.stack([n[j] for n in new]) for j in range(4)
        ) + cache[4:]
        logits = _proj(rms_norm(x, fln, EPS), lm, dt)
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

    def step_scan(token, step, cache):
        x = emb[token][:, None]
        visible = (jnp.arange(L, dtype=jnp.int32) <= step)[
            None, None, None, :]

        def f(x, xs):
            lw = {n: xs[0][n] for n in Wl}
            x, kv = layer_math(x, lw, xs[1:5], xs[5:], step, visible)
            return x, kv

        x, newkv = jax.lax.scan(
            f, x, (Wl,) + cache[:4] + cache[4:]
        )
        return (
            jnp.argmax(_proj(rms_norm(x, fln, EPS), lm, dt)[:, 0], -1)
            .astype(jnp.int32),
            newkv + cache[4:],
        )

    step_fn = step_scan if variant == "scan" else step_pyloop

    @jax.jit
    def run(tok, cache):
        def body(i, carry):
            token, cache = carry
            token, cache = step_fn(token, i % (L - 1), cache)
            return token, cache

        token, cache = jax.lax.fori_loop(0, k, body, (tok, cache))
        return jnp.sum(token) + jnp.sum(cache[1][:, :, :, 0, :100])

    return run


cache0 = (kq0, ks0, vq0, vs0, ckq, cks, cvq, cvs)
cache0 = jax.device_put(cache0)
for c in cache0:
    c.block_until_ready()

results = {}
for variant in ("pyloop", "scan"):
    med = {}
    for k in (4, 16):
        run = make_run(k, variant)
        float(run(tok0, cache0))  # compile + warm, fetch forces exec
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(tok0, cache0))
            ts.append(time.perf_counter() - t0)
        med[k] = sorted(ts)[2]
    per = (med[16] - med[4]) / 12
    results[variant] = per
    print(f"{variant}: {per*1e6:8.1f} us/step "
          f"(T4={med[4]*1e3:.1f}ms T16={med[16]*1e3:.1f}ms)", flush=True)

d = results["scan"] / results["pyloop"]
print(f"scan/pyloop ratio: {d:.3f}", flush=True)

"""VERDICT r4 item 8: decode-attention kernel revisit — v2 measurement.

Measures the v2 transposed-layout cross-attention kernel
(ops/decode_attention.py:decode_attention_cross_t) against the XLA
_attention_int8 chain it would replace, at the serving shapes
(B=128, H=8, D=64, L=256 lane-padded, enc_len=190, int8 KV).

Protocol (CLAUDE.md): K data-dependent calls inside ONE jit program
(the attention output feeds the next call's q), slope between K values,
value fetched via device_get (profiling.timeit_slope).  Never trust a
single-dispatch wall time on this stack.

Stages:
  1. kernel microbench at _B_BLK_X in {4, 8, 16} vs the XLA chain
  2. end-to-end generate_tokens (B=128, max_length=128, int8 self+cross,
     fused weights) with pallas_cross OFF vs ON: slope-of-dispatch wall
     time + greedy token agreement.

Run on the real TPU only (one process may hold the chip — launch via a
watcher AFTER any trainer/eval chain exits).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("PROBE_CPU"):  # smoke-test mode: NEVER touches the TPU
    # (env JAX_PLATFORMS is not enough — sitecustomize force-registers
    # the axon backend; this config call is the reliable switch)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import music2midi_tpu.ops.decode_attention as da
from music2midi_tpu.models.t5 import T5Config, _attention_int8
from music2midi_tpu.ops.decode_attention import (
    decode_attention_cross_t, transpose_cross_entry,
)
from music2midi_tpu.profiling import timeit_slope

cfg = T5Config()
SMOKE = bool(os.environ.get("PROBE_CPU"))
B = int(os.environ.get("PROBE_B", 16 if SMOKE else 128))
H, D = cfg.num_heads, cfg.d_kv
L, ENC = 256, 190
REPS, TRIALS = ((1, 2), 1) if SMOKE else ((2, 10), 5)
rng = np.random.default_rng(0)
print(f"backend={jax.default_backend()} B={B} H={H} D={D} L={L} "
      f"enc_len={ENC}", flush=True)
if jax.default_backend() != "tpu":
    da.INTERPRET = True  # CPU smoke-test mode: numbers meaningless
    print("WARNING: not on TPU — interpret mode, timings meaningless",
          flush=True)

k8 = jnp.asarray(rng.integers(-127, 128, (B, H, L, D), dtype=np.int8))
v8 = jnp.asarray(rng.integers(-127, 128, (B, H, L, D), dtype=np.int8))
ks = jnp.asarray((rng.random((B, H, 1, L)) * 0.02 + 0.005)
                 .astype(np.float32))
vs = jnp.asarray((rng.random((B, H, 1, L)) * 0.02 + 0.005)
                 .astype(np.float32))
q0 = jnp.asarray(rng.normal(size=(B, H, 1, D)).astype(np.float32)
                 ).astype(jnp.bfloat16)
mask = (jnp.arange(L) < ENC)[None, None, None, :]
kt = transpose_cross_entry((k8, ks))
vt = transpose_cross_entry((v8, vs))

cache_bytes = 2 * B * H * L * D + 8 * B * H * L  # int8 K+V + f32 scales


def report(name, sec):
    gbs = cache_bytes / sec / 1e9
    print(f"  {name:28s} {sec * 1e6:8.1f} us/call   "
          f"{gbs:6.0f} GB/s effective", flush=True)
    return sec


print(f"stage 1: single-block microbench (slope, reps {REPS}, "
      f"median of {TRIALS})")


def xla_chain(q):
    return _attention_int8(q, (k8, ks), (v8, vs), None, mask, jnp.bfloat16)


t_xla = report("XLA _attention_int8", timeit_slope(
    xla_chain, q0, reps=REPS, trials=TRIALS))

for blk in ((8,) if SMOKE else (4, 8, 16)):
    da._B_BLK_X = blk
    # the jit cache key does not see the module global — force a retrace
    decode_attention_cross_t.clear_cache()
    try:
        def v2(q):
            return decode_attention_cross_t(q, kt, vt, enc_len=ENC)

        t = report(f"v2 kernel (B_BLK_X={blk})", timeit_slope(
            v2, q0, reps=REPS, trials=TRIALS))
        print(f"    vs XLA: {t_xla / t:.2f}x", flush=True)
    except Exception as e:  # VMEM OOM etc — record and move on
        print(f"  v2 kernel (B_BLK_X={blk})  FAILED: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
da._B_BLK_X = 8
decode_attention_cross_t.clear_cache()

print("stage 2: end-to-end generate_tokens (max_length=128)")
from music2midi_tpu.config import default_config  # noqa: E402
from music2midi_tpu.infer.decode import DecodeConfig, generate_tokens  # noqa: E402
from music2midi_tpu.models import init_params, t5_config_from  # noqa: E402

mcfg = t5_config_from(default_config(), dtype=jnp.bfloat16)
params = init_params(0, mcfg)  # int seed: host-numpy init, no dispatch
enc = jnp.asarray(rng.normal(size=(B, ENC, mcfg.d_model))
                  .astype(np.float32)).astype(jnp.bfloat16)
base = dict(max_length=16 if SMOKE else 128, quantize_cross_kv=True, quantize_self_kv=True)
tokens = {}
for name, flags in (("xla", {}), ("pallas_cross", {"pallas_cross": True})):
    dcfg = DecodeConfig(**base, **flags)

    toks, lens = generate_tokens(params, enc, mcfg, dcfg)
    _ = np.asarray(toks)  # compile + warm + fetch
    ts = []
    for _ in range(1 if SMOKE else 5):
        t0 = time.perf_counter()
        toks, lens = generate_tokens(params, enc, mcfg, dcfg)
        np.asarray(toks)
        ts.append(time.perf_counter() - t0)
    tokens[name] = np.asarray(toks)
    print(f"  generate[{name:12s}] median {sorted(ts)[len(ts) // 2] * 1e3:7.1f} ms "
          f"(min {min(ts) * 1e3:.1f})", flush=True)
agree = float((tokens["xla"] == tokens["pallas_cross"]).mean())
print(f"  greedy token agreement: {agree:.4%}", flush=True)
print("done", flush=True)

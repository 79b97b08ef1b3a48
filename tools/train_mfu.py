"""Measure training-step MFU on the real chip (VERDICT r3 weak #3).

    python tools/train_mfu.py [--batches 16 64 128] [--dec_len 128]
                              [--dtype float32] [--k 4 16]

Protocol (CLAUDE.md kernel-timing rules): K optimizer steps run inside
ONE dispatch via train.loop.make_multi_step, per-step time is the slope
between two K values, and the losses are fetched with device_get so the
relay cannot fake completion.  MFU = analytic model FLOPs
(profiling.train_step_flops: 2*M*N*K per dot, 3x-forward fwd+bwd,
true-causal attention) / step time / the chip's bf16 peak.

Prints one JSON line per batch size:
  {"batch": B, "dec_len": T, "ms_per_step": X, "chunks_per_s": Y,
   "mfu": Z, "model_tflops_per_step": F, "device_kind": ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", nargs="+", type=int, default=[16, 64, 128])
    p.add_argument(
        "--dec_len", type=int, default=128,
        help="label length per chunk (the loader pads per batch to its "
             "max; 3-s chunks tokenize to ~30-150 tokens)",
    )
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--k", nargs=2, type=int, default=[4, 16],
                   help="two steps-per-dispatch values for the slope")
    p.add_argument("--trials", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from music2midi_tpu.config import default_config
    from music2midi_tpu.models import init_params, t5_config_from
    from music2midi_tpu.ops.mel import log_mel_config_from, num_frames
    from music2midi_tpu.profiling import (
        device_peak_flops,
        train_step_flops,
    )
    from music2midi_tpu.train import adafactor_hf
    from music2midi_tpu.train.loop import (
        Batch,
        init_train_state,
        make_multi_step,
    )

    cfg = default_config()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    t5_cfg = t5_config_from(cfg, dtype=dtype)
    mel_cfg = log_mel_config_from(cfg)
    split = int(cfg.model.sample_rate * float(cfg.dataset.segment_duration))
    enc_len = num_frames(split, mel_cfg) + 2  # + conditioning tokens
    peak = device_peak_flops()
    device_kind = getattr(jax.devices()[0], "device_kind", "unknown")

    params = init_params(0, t5_cfg)
    opt = adafactor_hf()
    step_fn = make_multi_step(opt, t5_cfg, mel_cfg, donate=False)
    rng = np.random.default_rng(0)

    for B in args.batches:
        state = init_train_state(jax.device_put(params), opt)
        flops = train_step_flops(t5_cfg, B, enc_len, args.dec_len)

        def stacked(k):
            wave = (rng.normal(size=(k, B, split)) * 0.1).astype(np.float32)
            labels = np.full((k, B, args.dec_len), -100, np.int64)
            # realistic token content: time/onset/pitch triplets + EOS
            labels[..., 0::3] = 140
            labels[..., 1::3] = 3
            labels[..., 2::3] = 60
            labels[..., -1] = 2
            cond = np.zeros((k, B, 2), np.int32)
            return Batch(
                jax.device_put(wave),
                jax.device_put(labels),
                jax.device_put(cond),
            )

        med = {}
        for k in args.k:
            b = stacked(k)
            key = jax.random.PRNGKey(0)
            # warm (compile) + timed trials; fetching the loss SUM forces
            # execution through the relay (block_until_ready does not)
            _, losses = step_fn(state, b, key)
            float(jnp.sum(losses))
            ts = []
            for _ in range(args.trials):
                t0 = time.perf_counter()
                _, losses = step_fn(state, b, key)
                float(jnp.sum(losses))
                ts.append(time.perf_counter() - t0)
            med[k] = sorted(ts)[args.trials // 2]

        k0, k1 = args.k
        per_step = (med[k1] - med[k0]) / (k1 - k0)
        print(json.dumps({
            "batch": B,
            "dec_len": args.dec_len,
            "enc_len": enc_len,
            "dtype": args.dtype,
            "ms_per_step": round(per_step * 1e3, 2),
            "chunks_per_s": round(B / per_step, 1),
            "model_tflops_per_step": round(flops / 1e12, 4),
            "mfu": round(flops / per_step / peak, 4) if peak else None,
            "device_kind": device_kind,
        }), flush=True)


if __name__ == "__main__":
    main()

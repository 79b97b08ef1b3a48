"""Device mesh and sharding rules.

The reference's only distributed contract is Lightning's `sync_dist=True`
metric all-reduce over NCCL (reference music2midi/model.py:37; SURVEY.md
§2.2).  The TPU-native replacement is a `jax.sharding.Mesh` with axes:

  dp — data parallel: batch dimension of waveforms/labels/chunks; XLA
       inserts the psum for the loss/grad mean over ICI
  tp — tensor parallel: attention heads (q/k/v inner dim) and the FFN
       hidden dim; at 30 M params this is headroom rather than necessity,
       but the rules are wired so the same train/infer programs run on any
       (dp, tp) factorization of a slice

No NCCL/process-group plumbing: collectives are emitted by XLA from these
sharding annotations (jax.jit in/out shardings), riding ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    dp: Optional[int] = None,
    tp: int = 1,
) -> Mesh:
    """Mesh over (dp, tp).  Defaults: all devices, tp=1."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """For multi-step (K, B, ...) batch stacks: scan axis replicated,
    per-step batch axis over dp (train.loop.make_multi_step)."""
    return NamedSharding(mesh, P(None, "dp"))


def _attn_spec(name: str) -> P:
    # q/k/v: (d_model, heads*d_kv) — shard the head dim; o: (heads*d_kv,
    # d_model) — shard the head (first) dim
    if name in ("q", "k", "v"):
        return P(None, "tp")
    return P("tp", None)


def _mlp_spec(name: str) -> P:
    if name in ("wi_0", "wi_1"):
        return P(None, "tp")
    return P("tp", None)


def param_pspecs(params) -> dict:
    """PartitionSpec pytree matching the T5 param tree: megatron-style TP
    for attention heads + FFN hidden; small tables replicated."""

    def layer_spec(layer: dict) -> dict:
        out = {}
        for key, val in layer.items():
            if key in ("self_attn", "cross_attn"):
                out[key] = {k: _attn_spec(k) for k in val}
            elif key == "mlp":
                out[key] = {k: _mlp_spec(k) for k in val}
            else:  # layer norms
                out[key] = P()
        return out

    spec = {
        "shared_embedding": P(),
        "lm_head": P(),
        "encoder": {
            "layers": [layer_spec(l) for l in params["encoder"]["layers"]],
            "rel_bias": P(),
            "final_ln": P(),
        },
        "decoder": {
            "layers": [layer_spec(l) for l in params["decoder"]["layers"]],
            "rel_bias": P(),
            "final_ln": P(),
        },
    }
    if "conditioning" in params:
        spec["conditioning"] = [P() for _ in params["conditioning"]]
    return spec


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for the param tree."""
    return jax.tree.map(
        lambda ps: NamedSharding(mesh, ps),
        param_pspecs(params),
        is_leaf=lambda x: isinstance(x, P),
    )

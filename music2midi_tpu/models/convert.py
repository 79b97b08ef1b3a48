"""Weight conversion: HF/PyTorch checkpoints <-> the functional param tree.

Supports both a bare `T5ForConditionalGeneration.state_dict()` and the
reference's Lightning checkpoint layout (keys prefixed `model.transformer.`,
conditioning under `model.conditioning.embeds.{i}.weight` — reference
music2midi/model.py:24, music2midi/transformer.py:16-26).

Used for parity testing against HF `transformers` (installed, CPU) and for
loading the released reference checkpoint onto TPU.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .t5 import T5Config


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def hf_state_dict_to_params(
    state_dict: Mapping[str, Any], cfg: T5Config
) -> Dict[str, Any]:
    """HF T5ForConditionalGeneration state_dict -> param pytree.

    HF nn.Linear stores (out, in); this model computes x @ W with W (in,
    out), so every projection is transposed.  HF module paths:
      {stack}.block.{i}.layer.0.SelfAttention.{q,k,v,o}
      decoder.block.{i}.layer.1.EncDecAttention.{q,k,v,o}
      {stack}.block.{i}.layer.{last}.DenseReluDense.{wi_0,wi_1,wo}
      {stack}.block.0.layer.0.SelfAttention.relative_attention_bias
    """
    sd = dict(state_dict)
    # strip Lightning / reference wrapper prefixes
    prefixes = ("model.transformer.", "transformer.", "model.")
    for prefix in prefixes:
        if any(k.startswith(prefix + "shared") for k in sd):
            sd = {
                k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)
            }
            break

    def lin(key):
        return _np(sd[key]).T  # (out,in) -> (in,out)

    def attn(path):
        return {
            "q": lin(f"{path}.q.weight"),
            "k": lin(f"{path}.k.weight"),
            "v": lin(f"{path}.v.weight"),
            "o": lin(f"{path}.o.weight"),
        }

    def mlp(path):
        return {
            "wi_0": lin(f"{path}.wi_0.weight"),
            "wi_1": lin(f"{path}.wi_1.weight"),
            "wo": lin(f"{path}.wo.weight"),
        }

    enc_layers = []
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        enc_layers.append(
            {
                "self_attn": attn(f"{b}.layer.0.SelfAttention"),
                "ln1": _np(sd[f"{b}.layer.0.layer_norm.weight"]),
                "mlp": mlp(f"{b}.layer.1.DenseReluDense"),
                "ln2": _np(sd[f"{b}.layer.1.layer_norm.weight"]),
            }
        )
    dec_layers = []
    for i in range(cfg.num_decoder_layers):
        b = f"decoder.block.{i}"
        dec_layers.append(
            {
                "self_attn": attn(f"{b}.layer.0.SelfAttention"),
                "ln1": _np(sd[f"{b}.layer.0.layer_norm.weight"]),
                "cross_attn": attn(f"{b}.layer.1.EncDecAttention"),
                "ln2": _np(sd[f"{b}.layer.1.layer_norm.weight"]),
                "mlp": mlp(f"{b}.layer.2.DenseReluDense"),
                "ln3": _np(sd[f"{b}.layer.2.layer_norm.weight"]),
            }
        )
    params: Dict[str, Any] = {
        "shared_embedding": _np(sd["shared.weight"]),
        "encoder": {
            "layers": enc_layers,
            "rel_bias": _np(
                sd["encoder.block.0.layer.0.SelfAttention"
                   ".relative_attention_bias.weight"]
            ),
            "final_ln": _np(sd["encoder.final_layer_norm.weight"]),
        },
        "decoder": {
            "layers": dec_layers,
            "rel_bias": _np(
                sd["decoder.block.0.layer.0.SelfAttention"
                   ".relative_attention_bias.weight"]
            ),
            "final_ln": _np(sd["decoder.final_layer_norm.weight"]),
        },
        "lm_head": lin("lm_head.weight"),
    }
    return params


def reference_checkpoint_to_params(
    state_dict: Mapping[str, Any], cfg: T5Config
) -> Dict[str, Any]:
    """Full reference Lightning ckpt -> params including conditioning tables
    (model.conditioning.embeds.{i}.weight) and ignoring the mel frontend
    buffers (non-learned torchaudio filterbank)."""
    params = hf_state_dict_to_params(state_dict, cfg)
    cond = []
    i = 0
    while True:
        key = next(
            (
                k for k in state_dict
                if k.endswith(f"conditioning.embeds.{i}.weight")
            ),
            None,
        )
        if key is None:
            break
        cond.append(_np(state_dict[key]))
        i += 1
    if cond:
        params["conditioning"] = cond
    return params


def params_to_hf_state_dict(params: Mapping[str, Any], cfg: T5Config) -> dict:
    """Inverse mapping (JAX -> HF names, torch-free: returns numpy)."""
    out = {}

    def put_lin(key, w):
        out[key] = np.asarray(w, dtype=np.float32).T

    out["shared.weight"] = np.asarray(params["shared_embedding"], np.float32)
    out["encoder.embed_tokens.weight"] = out["shared.weight"]
    out["decoder.embed_tokens.weight"] = out["shared.weight"]
    put_lin("lm_head.weight", params["lm_head"])
    for stack, n, layers in (
        ("encoder", cfg.num_layers, params["encoder"]["layers"]),
        ("decoder", cfg.num_decoder_layers, params["decoder"]["layers"]),
    ):
        for i in range(n):
            b = f"{stack}.block.{i}"
            lyr = layers[i]
            for name, w in lyr["self_attn"].items():
                put_lin(f"{b}.layer.0.SelfAttention.{name}.weight", w)
            out[f"{b}.layer.0.layer_norm.weight"] = np.asarray(
                lyr["ln1"], np.float32
            )
            if stack == "encoder":
                for name, w in lyr["mlp"].items():
                    put_lin(f"{b}.layer.1.DenseReluDense.{name}.weight", w)
                out[f"{b}.layer.1.layer_norm.weight"] = np.asarray(
                    lyr["ln2"], np.float32
                )
            else:
                for name, w in lyr["cross_attn"].items():
                    put_lin(f"{b}.layer.1.EncDecAttention.{name}.weight", w)
                out[f"{b}.layer.1.layer_norm.weight"] = np.asarray(
                    lyr["ln2"], np.float32
                )
                for name, w in lyr["mlp"].items():
                    put_lin(f"{b}.layer.2.DenseReluDense.{name}.weight", w)
                out[f"{b}.layer.2.layer_norm.weight"] = np.asarray(
                    lyr["ln3"], np.float32
                )
        out[
            f"{stack}.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"
        ] = np.asarray(params[stack]["rel_bias"], np.float32)
        out[f"{stack}.final_layer_norm.weight"] = np.asarray(
            params[stack]["final_ln"], np.float32
        )
    return out

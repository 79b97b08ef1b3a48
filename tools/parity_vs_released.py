"""Released-checkpoint parity gate (BASELINE correctness target).

    python tools/parity_vs_released.py EPOCH799.ckpt [--data_dir DIR]
                                       [--config CFG] [--max_length 1024]

The reference's model of record is `epoch=799-step=119200.ckpt`
(/root/reference/demo.ipynb cell-0).  It is unobtainable in this
zero-egress environment, so the gate has never run — this script makes
it a 5-minute command the moment the artifact exists (VERDICT r3
missing #2; the proxy .ckpt version runs in CI as
tests/test_lightning_ckpt.py):

1. loads the .ckpt into BOTH stacks — Music2MIDI.from_torch_checkpoint
   (fp32 bit-parity mode) and HF transformers T5ForConditionalGeneration
   + conditioning embeddings (exactly as reference transformer.py
   builds them);
2. greedy-decodes a deterministic probe battery (sines, chords, chirps,
   noise — 8 chunks) through both and asserts BIT-IDENTICAL tokens
   (reference transformer.py:41-45 greedy semantics);
3. with --data_dir: scores the test split via evaluate.py's machinery
   so the mean melody-chroma accuracy can be compared against the
   reference's published number.

Exit 0 = parity holds; non-zero with a first-divergence report
otherwise.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def probe_chunks(sr: int, seconds: float = 3.0) -> np.ndarray:
    """Deterministic 8-chunk battery exercising distinct decode paths."""
    t = np.arange(int(seconds * sr)) / sr
    rng = np.random.default_rng(0)
    rows = [
        0.5 * np.sin(2 * np.pi * 440 * t),                      # A4
        0.3 * (np.sin(2 * np.pi * 262 * t)                      # C-major
               + np.sin(2 * np.pi * 330 * t)
               + np.sin(2 * np.pi * 392 * t)),
        0.4 * np.sin(2 * np.pi * (200 + 300 * t / seconds) * t),  # chirp
        0.2 * rng.normal(size=len(t)),                          # noise
        np.zeros_like(t),                                       # silence
        0.5 * np.sign(np.sin(2 * np.pi * 330 * t)) * 0.3,       # square
        0.3 * np.sin(2 * np.pi * 523 * t) * np.exp(-t),         # decay
        0.25 * (np.sin(2 * np.pi * 220 * t)
                + 0.05 * rng.normal(size=len(t))),              # noisy tone
    ]
    return np.stack(rows).astype(np.float32)


def load_torch_reference(state_dict, cfg):
    """Rebuild the reference's torch model (transformer.py: HF T5 +
    conditioning embedding list) and load the Lightning state dict."""
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    hf_cfg = HFT5Config(**cfg.model.t5.to_dict())
    model = T5ForConditionalGeneration(hf_cfg).eval()
    # Lightning prefixes vary ("model.", "transformer."); anchor on the
    # unique shared-embedding key
    anchor = next(k for k in state_dict if k.endswith("shared.weight"))
    prefix = anchor[: -len("shared.weight")]
    sub = {
        k[len(prefix):]: v for k, v in state_dict.items()
        if k.startswith(prefix)
    }
    missing, unexpected = model.load_state_dict(sub, strict=False)
    missing = [m for m in missing if "embed_tokens" not in m]
    assert not missing, f"reference model missing keys: {missing}"
    cond_w = []
    i = 0
    while True:
        key = next(
            (k for k in state_dict
             if k.endswith(f"conditioning.embeds.{i}.weight")), None
        )
        if key is None:
            break
        cond_w.append(torch.nn.Parameter(state_dict[key].float()))
        i += 1
    cond = torch.nn.ModuleList([
        torch.nn.Embedding(w.shape[0], w.shape[1]) for w in cond_w
    ])
    for emb, w in zip(cond, cond_w):
        emb.weight = w
    return model, cond


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", type=str,
                   help="the released Lightning checkpoint "
                        "(epoch=799-step=119200.ckpt)")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data_dir", type=str, default=None,
                   help="prepared dataset dir: also score the test split")
    p.add_argument("--max_length", type=int, default=1024)
    p.add_argument(
        "--device", choices=["cpu", "default"], default="cpu",
        help="JAX backend: cpu (default — the parity mode is fp32 and "
             "deterministic, and this never contends for the TPU) or "
             "the process default",
    )
    args = p.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import torch

    from music2midi_tpu.config import resolve_config
    from music2midi_tpu.infer import Music2MIDI
    from music2midi_tpu.models.t5 import conditioning_prepend
    from music2midi_tpu.ops.mel import log_mel_spectrogram

    cfg = resolve_config(args.config)
    engine = Music2MIDI.from_torch_checkpoint(
        args.ckpt, config=cfg, decode_max_length=args.max_length
    )  # fp32 default = bit-parity mode
    blob = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob)
    model, cond = load_torch_reference(state_dict, cfg)

    sr = int(cfg.model.sample_rate)
    chunks = probe_chunks(sr)
    B = len(chunks)
    cond_idx = np.zeros((B, len(cond)), np.int32)
    mel = np.asarray(log_mel_spectrogram(chunks, engine.mel_config))
    embeds = np.asarray(conditioning_prepend(engine.params, mel, cond_idx))
    with torch.no_grad():
        hf_tokens = model.generate(
            inputs_embeds=torch.from_numpy(embeds),
            max_length=args.max_length,
        ).numpy()
    mine = engine.sample_tokens_batched(chunks, cond_index=[0] * len(cond))

    eos = int(cfg.model.t5.eos_token_id)
    ok = True
    for b in range(B):
        row = hf_tokens[b]
        if eos in row:
            row = row[: list(row).index(eos) + 1]
        if len(mine[b]) != len(row) or not np.array_equal(mine[b], row):
            ok = False
            div = next(
                (i for i, (x, y) in enumerate(zip(mine[b], row)) if x != y),
                min(len(mine[b]), len(row)),
            )
            print(f"chunk {b}: DIVERGES at token {div}: "
                  f"mine={mine[b][max(0, div - 2):div + 3]} "
                  f"ref={row[max(0, div - 2):div + 3]} "
                  f"(lens {len(mine[b])}/{len(row)})")
        else:
            print(f"chunk {b}: {len(row)} tokens bit-identical")
    if not ok:
        print("FAIL: greedy token parity broken")
        return 1
    print(f"PASS: {B} probe chunks bit-identical at "
          f"max_length={args.max_length}")

    if args.data_dir:
        import evaluate as eval_cli

        sys.argv = [
            "evaluate.py", args.data_dir, "--ckpt", args.ckpt,
            "--name", "released-parity",
        ]
        eval_cli.main()
        print("compare scores/score-released-parity.csv to the "
              "reference's published melody-chroma accuracy")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

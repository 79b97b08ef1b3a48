"""Lightning `.ckpt` loading proxy for the released reference checkpoint.

The reference's checkpoint of record (epoch=799-step=119200.ckpt,
demo.ipynb cell-0) is not obtainable in this environment (zero egress), so
this is the closest faithful proxy (VERDICT r1 item 3): run a SHORT
reference-style training loop in torch (HF T5 + Conditioning embeddings +
Adafactor with warmup_init, exactly reference model.py:27-43 /
transformer.py:28-39), save a genuine pytorch-lightning checkpoint blob
(same top-level schema and `model.transformer.*` / `model.conditioning.*` /
`model.spectrogram.*` state-dict key layout Lightning produces for
reference model.py:20-24), then load it through the production
`Music2MIDI.from_torch_checkpoint` path and assert bit-identical greedy
tokens vs the torch model on real audio.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # multi-minute: excluded by -m 'not slow'

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

import torch  # noqa: E402
from transformers import T5Config as HFT5Config  # noqa: E402
from transformers import T5ForConditionalGeneration  # noqa: E402
from transformers.optimization import Adafactor, AdafactorSchedule  # noqa: E402

from music2midi_tpu.config import default_config  # noqa: E402
from music2midi_tpu.infer import Music2MIDI  # noqa: E402
from music2midi_tpu.models.t5 import conditioning_prepend  # noqa: E402
from music2midi_tpu.ops.mel import (  # noqa: E402
    log_mel_config_from,
    log_mel_spectrogram,
)
from music2midi_tpu.tokenizer import MidiTokenizer  # noqa: E402


def _reference_style_torch_model(cfg):
    """HF T5 + conditioning embeddings, as reference transformer.py builds."""
    torch.manual_seed(0)
    hf_cfg = HFT5Config(**cfg.model.t5.to_dict())
    model = T5ForConditionalGeneration(hf_cfg)
    num_embeds = [len(v) for v in cfg.conditioning.values()]
    cond = torch.nn.ModuleList(
        [torch.nn.Embedding(n, hf_cfg.d_model) for n in num_embeds]
    )
    return model, cond


def _prepend(cond, mel_t, indices):
    """Reference Conditioning.forward (input.py:50-59)."""
    stacked = torch.stack(
        [emb(indices[:, i]) for i, emb in enumerate(cond)], dim=1
    )
    return torch.cat([stacked, mel_t], dim=1)


@pytest.fixture(scope="module")
def lightning_ckpt(tmp_path_factory):
    """Short reference-style training run -> Lightning-format .ckpt blob."""
    cfg = default_config()
    cfg.model.t5.num_layers = 2
    cfg.model.t5.num_decoder_layers = 2
    model, cond = _reference_style_torch_model(cfg)
    mel_cfg = log_mel_config_from(cfg)
    tokenizer = MidiTokenizer(cfg)

    # one synthetic 2-song batch, reference training_step semantics
    rng = np.random.default_rng(0)
    sr = int(cfg.model.sample_rate)
    t = np.arange(3 * sr) / sr
    waves = np.stack(
        [
            (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32),
            (0.3 * rng.normal(size=3 * sr)).astype(np.float32),
        ]
    )
    notes_batch = [
        np.array([[0.1, 0.6, 60, 80], [0.8, 1.4, 64, 80]]),
        np.array([[0.2, 1.0, 55, 70]]),
    ]
    labels = tokenizer(notes_batch=notes_batch)
    labels = torch.from_numpy(np.asarray(labels, dtype=np.int64))
    labels[labels == int(cfg.model.t5.pad_token_id)] = -100
    cond_index = torch.zeros((2, len(cond)), dtype=torch.long)
    mel = torch.from_numpy(
        np.asarray(log_mel_spectrogram(waves, mel_cfg), np.float32)
    )

    params = list(model.parameters()) + list(cond.parameters())
    optimizer = Adafactor(params, warmup_init=True)
    AdafactorSchedule(optimizer)  # attaches as in configure_optimizers
    model.train()
    global_step = 0
    for _ in range(3):
        optimizer.zero_grad()
        embeds = _prepend(cond, mel, cond_index)
        loss = model(inputs_embeds=embeds, labels=labels).loss
        loss.backward()
        optimizer.step()
        global_step += 1
    model.eval()

    # Lightning checkpoint schema (what pl.Trainer.save_checkpoint writes
    # for reference model.py:20-25; spectrogram buffers included like
    # torchaudio's MelSpectrogram registers them)
    state_dict = {}
    for k, v in model.state_dict().items():
        state_dict[f"model.transformer.{k}"] = v
    for i, emb in enumerate(cond):
        state_dict[f"model.conditioning.embeds.{i}.weight"] = emb.weight.data
    state_dict["model.spectrogram.melspectrogram.spectrogram.window"] = (
        torch.hann_window(int(cfg.spectrogram.n_fft), periodic=True)
    )
    state_dict["model.spectrogram.melspectrogram.mel_scale.fb"] = torch.zeros(
        int(cfg.spectrogram.n_fft) // 2 + 1, int(cfg.model.t5.d_model)
    )
    blob = {
        "epoch": 0,
        "global_step": global_step,
        "pytorch-lightning_version": "2.2.4",
        "state_dict": state_dict,
        "loops": {},
        "callbacks": {},
        "optimizer_states": [optimizer.state_dict()],
        "lr_schedulers": [],
        "hparams_name": "kwargs",
        "hyper_parameters": {"config_path": "config.yaml"},
    }
    path = tmp_path_factory.mktemp("ckpt") / f"epoch=0-step={global_step}.ckpt"
    torch.save(blob, path)
    return path, cfg, model, cond


def test_from_torch_checkpoint_loads_lightning_blob(lightning_ckpt):
    path, cfg, model, cond = lightning_ckpt
    engine = Music2MIDI.from_torch_checkpoint(
        path, config=cfg, decode_max_length=48
    )
    # conditioning tables survive the conversion bit-exactly
    assert len(engine.params["conditioning"]) == len(cond)
    for mine, theirs in zip(engine.params["conditioning"], cond):
        np.testing.assert_array_equal(
            np.asarray(mine), theirs.weight.detach().numpy()
        )
    np.testing.assert_array_equal(
        np.asarray(engine.params["shared_embedding"]),
        model.shared.weight.detach().numpy(),
    )


def test_lightning_ckpt_greedy_token_parity(lightning_ckpt):
    """The .ckpt-loaded engine reproduces the torch model's greedy tokens
    bit-exactly on real audio (BASELINE.md correctness target, via proxy)."""
    path, cfg, model, cond = lightning_ckpt
    engine = Music2MIDI.from_torch_checkpoint(
        path, config=cfg, decode_max_length=48
    )
    sr = int(cfg.model.sample_rate)
    t = np.arange(3 * sr) / sr
    chunks = np.stack(
        [
            (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
            (0.3 * np.sin(2 * np.pi * 262 * t)
             + 0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32),
        ]
    )
    cond_idx = np.zeros((2, len(cond)), np.int32)
    mel = np.asarray(log_mel_spectrogram(chunks, engine.mel_config))
    embeds = np.asarray(
        conditioning_prepend(engine.params, mel, cond_idx)
    )
    with torch.no_grad():
        hf_tokens = model.generate(
            inputs_embeds=torch.from_numpy(embeds), max_length=48
        ).numpy()
    mine = engine.sample_tokens_batched(chunks, cond_index=[0, 0])
    for b in range(2):
        row = hf_tokens[b]
        if 2 in row:
            row = row[: list(row).index(2) + 1]
        np.testing.assert_array_equal(mine[b], row)


def test_parity_gate_script_on_proxy(lightning_ckpt, tmp_path):
    """tools/parity_vs_released.py (the released-checkpoint gate,
    VERDICT r3 #7) passes end-to-end on the proxy .ckpt — so when the
    real epoch=799 artifact is obtainable the gate is a one-command
    run, already exercised."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    import yaml

    path, cfg, _, _ = lightning_ckpt
    repo = Path(__file__).resolve().parent.parent
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg.to_dict()))
    proc = subprocess.run(
        [_sys.executable, str(repo / "tools/parity_vs_released.py"),
         str(path), "--config", str(cfg_path), "--max_length", "48"],
        capture_output=True, text=True, cwd=repo, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS: 8 probe chunks bit-identical" in proc.stdout, proc.stdout

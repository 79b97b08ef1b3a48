"""Serving-mode quality bound: fp32 parity mode vs bf16 serving mode.

Serving mode (bf16 + int8 self/cross KV + Pallas mel on TPU) is known to
change ~0.1% of greedy tokens (infer/decode.py).  VERDICT r2 missing #5
asks for the END-TO-END effect in chroma-accuracy space: this test scores
both modes with the real evaluation metric over the synthesized-corpus
test split and asserts the delta is bounded.

Needs a trained checkpoint + prepared corpus, so it is gated:

    M2M_CKPT=runs/r3tpu2/ckpt M2M_CORPUS=/root/corpus \
        python -m pytest tests/test_serving_mode_delta.py -q

The recorded result lives in PERFORMANCE.md ("Serving-mode quality
delta").  On CPU the bf16 path still exercises int8 KV quantization and
bf16 matmuls (the Pallas mel kernel is TPU-only and falls back to the
XLA FFT — the kernel's own <=3e-5 log-domain bound is covered by
tests/test_mel_pallas.py).
"""

import os
from pathlib import Path

import numpy as np
import pytest
import yaml

CKPT = os.environ.get("M2M_CKPT")
CORPUS = os.environ.get("M2M_CORPUS")

pytestmark = pytest.mark.skipif(
    not (CKPT and CORPUS and Path(CKPT).exists()),
    reason="set M2M_CKPT + M2M_CORPUS to a trained checkpoint/corpus",
)

MAX_DELTA_POINTS = 0.5  # accuracy points (metric is 0..1: 0.005)


def _score(dtype: str) -> float:
    import jax.numpy as jnp

    from music2midi_tpu.evaluation import evaluate_batch
    from music2midi_tpu.infer import Music2MIDI
    from music2midi_tpu.utils import numpy_to_midi

    engine = Music2MIDI.from_orbax(
        CKPT, dtype={"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    )
    data_dir = Path(CORPUS)
    split = np.load(data_dir / "dataset_split.npz", allow_pickle=True)
    scores = []
    for pid in split["test_id"]:
        with open(data_dir / "metadata" / f"{pid}.yaml") as f:
            meta = yaml.safe_load(f)["piano"]
        cond = engine.cond_index_from_names(
            genre=meta["genre"], difficulty=meta["difficulty"]
        )
        label = numpy_to_midi(np.load(data_dir / "midi_numpy" / f"{pid}.npy"))
        out = engine.generate(
            audio_path=data_dir / "audio" / f"{pid}.wav", cond_index=cond
        )
        scores.append(evaluate_batch([label], [out]))
    return float(np.mean(scores))


def test_serving_mode_costs_bounded_accuracy():
    fp32 = _score("float32")
    bf16 = _score("bfloat16")
    delta = fp32 - bf16
    print(f"chroma accuracy fp32={fp32:.4f} bf16-serving={bf16:.4f} "
          f"delta={delta:+.4f}")
    # the bound of record: serving mode may cost at most MAX_DELTA_POINTS
    # accuracy points on the 0-1 metric (negative delta = serving better)
    assert delta <= MAX_DELTA_POINTS / 100.0, (
        f"serving mode costs {delta:.4f} > {MAX_DELTA_POINTS / 100.0}"
    )

"""End-to-end token parity: full JAX pipeline vs HF transformers.

The strongest integration gate: real audio -> MY mel frontend -> conditioning
prepend, then (a) HF T5ForConditionalGeneration.generate (torch, greedy) on
those embeddings vs (b) my fused encode+decode — token identical.  Combined
with the mel-vs-float64-oracle tests this pins the whole inference stack to
the reference numerics (the reference's own mel is torchaudio fp32 FFT,
same error class as the jnp FFT path — ops/mel.py docstring).
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

from music2midi_tpu.config import default_config  # noqa: E402
from music2midi_tpu.infer import Music2MIDI  # noqa: E402
from music2midi_tpu.models.convert import params_to_hf_state_dict  # noqa: E402
from music2midi_tpu.models.t5 import conditioning_prepend  # noqa: E402
from music2midi_tpu.ops.mel import log_mel_spectrogram  # noqa: E402


@pytest.fixture(scope="module")
def engines():
    cfg_yaml = default_config()
    engine = Music2MIDI.from_random(seed=3, decode_max_length=64)
    hf_cfg = HFT5Config(**cfg_yaml.model.t5.to_dict())
    hf_model = T5ForConditionalGeneration(hf_cfg).eval()
    sd = params_to_hf_state_dict(engine.params, engine.t5_config)
    hf_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}
    )
    return engine, hf_model


def test_full_pipeline_token_parity(engines):
    """3 chunks of synthetic music audio, token-exact vs HF greedy."""
    engine, hf_model = engines
    sr = 16000
    t = np.arange(48000) / sr
    chunks = np.stack([
        (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
        (0.3 * np.sin(2 * np.pi * 262 * t)
         + 0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32),
        np.zeros(48000, np.float32),
    ])
    cond = np.array([[1, 1]] * 3, np.int32)

    # shared frontend: my mel + conditioning
    mel = np.asarray(log_mel_spectrogram(chunks, engine.mel_config))
    embeds = np.asarray(
        conditioning_prepend(engine.params, mel, cond)
    )
    with torch.no_grad():
        hf_tokens = hf_model.generate(
            inputs_embeds=torch.from_numpy(embeds), max_length=64
        ).numpy()

    mine = engine.sample_tokens_batched(chunks, cond_index=[1, 1])
    for b in range(3):
        hf_row = hf_tokens[b]
        # HF pads finished rows with pad; trim both to first EOS
        if 2 in hf_row:
            hf_row = hf_row[: list(hf_row).index(2) + 1]
        np.testing.assert_array_equal(
            mine[b], hf_row,
            err_msg=f"token mismatch in chunk {b}",
        )


def test_roundtrip_convert_hf_and_back(engines):
    """params -> HF state_dict -> params is lossless."""
    from music2midi_tpu.models.convert import hf_state_dict_to_params

    engine, hf_model = engines
    back = hf_state_dict_to_params(hf_model.state_dict(), engine.t5_config)
    import jax

    def cmp(a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    for key in ("shared_embedding", "lm_head"):
        cmp(engine.params[key], back[key])
    jax.tree.map(cmp, engine.params["encoder"], back["encoder"])
    jax.tree.map(cmp, engine.params["decoder"], back["decoder"])

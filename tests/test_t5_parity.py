"""T5 numerical parity vs HuggingFace transformers (torch CPU).

The strongest correctness gate in the suite: a randomly initialized HF
T5ForConditionalGeneration with the reference's exact config
(reference config.yaml:17-31) is converted to the functional JAX params and
must agree at logit level and at greedy-token level.
"""

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

import torch  # noqa: E402
from transformers import T5Config as HFT5Config  # noqa: E402
from transformers import T5ForConditionalGeneration  # noqa: E402

from music2midi_tpu.config import default_config  # noqa: E402
from music2midi_tpu.models import (  # noqa: E402
    T5Config,
    decode_step,
    decoder_forward,
    encode,
    init_kv_cache,
    precompute_cross_kv,
    t5_config_from,
    t5_forward,
)
from music2midi_tpu.models.convert import hf_state_dict_to_params  # noqa: E402


@pytest.fixture(scope="module")
def hf_and_jax():
    cfg_yaml = default_config()
    hf_cfg = HFT5Config(**cfg_yaml.model.t5.to_dict())
    torch.manual_seed(0)
    hf_model = T5ForConditionalGeneration(hf_cfg).eval()
    jcfg = t5_config_from(cfg_yaml)
    params = hf_state_dict_to_params(hf_model.state_dict(), jcfg)
    return hf_model, params, jcfg


@pytest.fixture(scope="module")
def sample_inputs():
    rng = np.random.default_rng(42)
    B, L = 2, 190  # 188 mel frames + 2 conditioning positions
    inputs_embeds = rng.normal(size=(B, L, 384)).astype(np.float32) * 2.0
    labels = rng.integers(3, 333, size=(B, 40)).astype(np.int64)
    labels[:, -1] = 2  # EOS
    return inputs_embeds, labels


def test_encoder_parity(hf_and_jax, sample_inputs):
    hf_model, params, jcfg = hf_and_jax
    inputs_embeds, _ = sample_inputs
    with torch.no_grad():
        hf_out = hf_model.encoder(
            inputs_embeds=torch.from_numpy(inputs_embeds)
        ).last_hidden_state.numpy()
    jax_out = np.asarray(encode(params, inputs_embeds, jcfg))
    np.testing.assert_allclose(jax_out, hf_out, atol=2e-4, rtol=1e-4)


def test_forward_logits_and_loss_parity(hf_and_jax, sample_inputs):
    hf_model, params, jcfg = hf_and_jax
    inputs_embeds, labels = sample_inputs
    t_labels = torch.from_numpy(labels)
    with torch.no_grad():
        hf_out = hf_model(
            inputs_embeds=torch.from_numpy(inputs_embeds), labels=t_labels
        )
    loss, logits = t5_forward(params, inputs_embeds, labels, jcfg)
    np.testing.assert_allclose(
        np.asarray(logits), hf_out.logits.numpy(), atol=2e-3, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(loss), float(hf_out.loss), atol=1e-4, rtol=1e-5
    )


def test_loss_ignores_minus_100(hf_and_jax, sample_inputs):
    hf_model, params, jcfg = hf_and_jax
    inputs_embeds, labels = sample_inputs
    labels = labels.copy()
    labels[:, 25:] = -100
    with torch.no_grad():
        hf_out = hf_model(
            inputs_embeds=torch.from_numpy(inputs_embeds),
            labels=torch.from_numpy(labels),
        )
    loss, _ = t5_forward(params, inputs_embeds, labels, jcfg)
    np.testing.assert_allclose(
        float(loss), float(hf_out.loss), atol=1e-4, rtol=1e-5
    )


def test_greedy_generate_token_parity(hf_and_jax, sample_inputs):
    """HF `generate` (greedy defaults, reference transformer.py:41-45) vs the
    incremental decode_step loop — token-exact."""
    hf_model, params, jcfg = hf_and_jax
    inputs_embeds, _ = sample_inputs
    max_length = 48
    with torch.no_grad():
        hf_tokens = hf_model.generate(
            inputs_embeds=torch.from_numpy(inputs_embeds),
            max_length=max_length,
        ).numpy()

    import jax.numpy as jnp

    enc = encode(params, inputs_embeds, jcfg)
    cross_kv = precompute_cross_kv(params, enc, jcfg)
    B = inputs_embeds.shape[0]
    cache = init_kv_cache(B, max_length, jcfg)
    token = jnp.full((B,), jcfg.decoder_start_token_id, dtype=jnp.int32)
    out_tokens = [np.full((B,), jcfg.decoder_start_token_id, dtype=np.int64)]
    done = np.zeros((B,), dtype=bool)
    for t in range(max_length - 1):
        logits, cache = decode_step(
            params, token, jnp.int32(t), cache, cross_kv, jcfg, max_length
        )
        nxt = np.asarray(jnp.argmax(logits, axis=-1))
        nxt = np.where(done, jcfg.pad_token_id, nxt)
        out_tokens.append(nxt.astype(np.int64))
        done |= nxt == jcfg.eos_token_id
        token = jnp.asarray(nxt, dtype=jnp.int32)
        if done.all():
            break
    mine = np.stack(out_tokens, axis=1)
    # HF pads finished rows; compare up to the shorter length per row
    for b in range(B):
        hf_row = hf_tokens[b]
        my_row = mine[b][: len(hf_row)]
        n = min(len(hf_row), len(my_row))
        np.testing.assert_array_equal(my_row[:n], hf_row[:n])


def test_incremental_matches_full_decoder(hf_and_jax, sample_inputs):
    """decode_step over a fixed token sequence == full decoder_forward."""
    import jax.numpy as jnp

    _, params, jcfg = hf_and_jax
    inputs_embeds, labels = sample_inputs
    B, T = labels.shape
    enc = encode(params, inputs_embeds, jcfg)
    dec_in = np.concatenate(
        [np.ones((B, 1), np.int64), labels[:, :-1]], axis=1
    )
    full_logits = np.asarray(decoder_forward(params, dec_in, enc, jcfg))

    cross_kv = precompute_cross_kv(params, enc, jcfg)
    cache = init_kv_cache(B, T, jcfg)
    step_logits = []
    for t in range(T):
        lg, cache = decode_step(
            params,
            jnp.asarray(dec_in[:, t], dtype=jnp.int32),
            jnp.int32(t),
            cache,
            cross_kv,
            jcfg,
            T,
        )
        step_logits.append(np.asarray(lg))
    inc_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(inc_logits, full_logits, atol=2e-3, rtol=1e-4)


def test_dropout_changes_training_forward(hf_and_jax, sample_inputs):
    import jax

    _, params, jcfg = hf_and_jax
    inputs_embeds, labels = sample_inputs
    loss_det, _ = t5_forward(params, inputs_embeds, labels, jcfg)
    loss_a, _ = t5_forward(
        params, inputs_embeds, labels, jcfg,
        deterministic=False, rng=jax.random.PRNGKey(0),
    )
    loss_b, _ = t5_forward(
        params, inputs_embeds, labels, jcfg,
        deterministic=False, rng=jax.random.PRNGKey(1),
    )
    assert float(loss_a) != float(loss_b)
    assert abs(float(loss_a) - float(loss_det)) > 1e-6

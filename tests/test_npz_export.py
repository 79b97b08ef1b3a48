"""Single-file npz checkpoint export — the model-of-record format.

The reference ships its model of record as a Lightning .ckpt
(/root/reference/demo.ipynb cell-0); we ship a bf16 .npz committed into
the repo, loadable by Music2MIDI.from_npz / evaluate.py --ckpt /
bench.py auto-detection. These tests pin the format: exact pytree
reconstruction (nested dicts AND list nodes), bfloat16 bit-exactness
through the uint16 transport, config embedding, and the
restore_params dispatch on the .npz suffix.
"""

import numpy as np
import pytest

import jax
import jax.tree_util as jtu

from music2midi_tpu.config import load_config
from music2midi_tpu.models.t5 import T5Config, init_params
from music2midi_tpu.train.checkpoint import (
    load_params_npz,
    restore_params,
    save_params_npz,
)

TINY = T5Config(
    vocab_size=48, d_model=8, d_kv=4, num_heads=2, d_ff=16,
    num_layers=2, num_decoder_layers=2,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(7, TINY, (3, 2))


def test_roundtrip_structure_and_values(tiny_params, tmp_path):
    import ml_dtypes

    cfg = load_config("config.yaml")
    path = tmp_path / "m.npz"
    save_params_npz(path, tiny_params, cfg)
    loaded, cfg2 = load_params_npz(path)
    assert jtu.tree_structure(loaded) == jtu.tree_structure(tiny_params)
    assert cfg2.to_dict() == cfg.to_dict()
    for (k, a), (_, b) in zip(
        jtu.tree_flatten_with_path(tiny_params)[0],
        jtu.tree_flatten_with_path(loaded)[0],
    ):
        assert b.dtype == ml_dtypes.bfloat16, (jtu.keystr(k), b.dtype)
        # bf16 quantization is the ONLY loss: re-casting the original
        # must match the loaded leaf bit-exactly
        np.testing.assert_array_equal(
            np.asarray(a).astype(ml_dtypes.bfloat16).view(np.uint16),
            np.asarray(b).view(np.uint16),
            err_msg=jtu.keystr(k),
        )


def test_float32_mode_is_lossless(tiny_params, tmp_path):
    path = tmp_path / "m32.npz"
    save_params_npz(path, tiny_params, None, dtype="float32")
    loaded, cfg = load_params_npz(path)
    assert cfg is None
    for (k, a), (_, b) in zip(
        jtu.tree_flatten_with_path(tiny_params)[0],
        jtu.tree_flatten_with_path(loaded)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jtu.keystr(k)
        )


def test_restore_params_dispatches_on_suffix(tiny_params, tmp_path):
    path = tmp_path / "m.npz"
    save_params_npz(path, tiny_params, None, dtype="float32")
    loaded, _ = restore_params(path)
    assert jtu.tree_structure(loaded) == jtu.tree_structure(tiny_params)


def test_from_npz_engine_runs(tiny_params, tmp_path):
    """from_npz -> generate on a real waveform: the committed artifact's
    load path drives the full pipeline."""
    from music2midi_tpu.infer import Music2MIDI

    from music2midi_tpu.models.t5 import t5_config_from

    cfg = load_config("config.yaml")
    cfg.model.t5.d_model = TINY.d_model
    cfg.model.t5.d_kv = TINY.d_kv
    cfg.model.t5.num_heads = TINY.num_heads
    cfg.model.t5.d_ff = TINY.d_ff
    cfg.model.t5.num_layers = TINY.num_layers
    cfg.model.t5.num_decoder_layers = TINY.num_decoder_layers
    # params must match the conditioning table sizes of the config
    num_cond = tuple(len(v) for v in cfg.conditioning.values())
    params = init_params(7, t5_config_from(cfg), num_cond)
    path = tmp_path / "engine.npz"
    save_params_npz(path, params, cfg)
    eng = Music2MIDI.from_npz(path, decode_max_length=8)
    sr = int(eng.config.model.sample_rate)
    t = np.arange(2 * sr) / sr
    y = (0.2 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    midi = eng.generate(audio_y=y)
    midi.write(str(tmp_path / "out.mid"))

    # export_npz averaging entry point: mean of a checkpoint with itself
    # is itself (bit-exact in fp32 storage)
    from music2midi_tpu.train.checkpoint import average_params

    save_params_npz(tmp_path / "a.npz", params, cfg, dtype="float32")
    avg, acfg = average_params(
        [tmp_path / "a.npz", tmp_path / "a.npz"]
    )
    for (k, x), (_, y2) in zip(
        jtu.tree_flatten_with_path(params)[0],
        jtu.tree_flatten_with_path(avg)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y2), err_msg=jtu.keystr(k)
        )
    assert acfg.to_dict() == cfg.to_dict()

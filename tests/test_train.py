"""Training stack tests: Adafactor parity vs HF torch, train-step smoke,
checkpoint roundtrip, sharded multi-device step."""

import numpy as np
import pytest

from music2midi_tpu.config import default_config
from music2midi_tpu.models import init_params, t5_config_from
from music2midi_tpu.ops.mel import LogMelConfig
from music2midi_tpu.train import TrainState, adafactor_hf, make_train_step
from music2midi_tpu.train.loop import Batch, init_train_state, pad_labels


# --------------------------------------------------------------------- #
# Adafactor parity vs HF torch implementation                            #
# --------------------------------------------------------------------- #


def _torch_adafactor_run(shapes, n_steps, seed):
    torch = pytest.importorskip("torch")
    from transformers.optimization import Adafactor

    g = torch.Generator().manual_seed(seed)
    params = [
        torch.nn.Parameter(torch.randn(*s, generator=g)) for s in shapes
    ]
    grads_per_step = [
        [torch.randn(*s, generator=g) for s in shapes] for _ in range(n_steps)
    ]
    opt = Adafactor(params, warmup_init=True)
    for step_grads in grads_per_step:
        opt.zero_grad()
        for p, gr in zip(params, step_grads):
            p.grad = gr.clone()
        opt.step()
    return (
        [p.detach().numpy().copy() for p in params],
        [[g_.numpy().copy() for g_ in sg] for sg in grads_per_step],
    )


@pytest.mark.parametrize(
    "shapes",
    [
        [(384, 512), (32, 8), (384,)],  # matrix, small matrix, vector
        [(400, 384)],
    ],
)
def test_adafactor_matches_hf(shapes):
    import jax
    import jax.numpy as jnp
    import optax

    n_steps = 5
    torch_final, grads = _torch_adafactor_run(shapes, n_steps, seed=0)
    # replay the same initial params + grads through the JAX optimizer
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(0)
    init = [torch.randn(*s, generator=g).numpy() for s in shapes]
    # skip the grad draws interleaved in the torch run
    params = [jnp.asarray(x) for x in init]
    opt = adafactor_hf()
    state = opt.init(params)
    for step in range(n_steps):
        gs = [jnp.asarray(x) for x in grads[step]]
        updates, state = opt.update(gs, state, params)
        params = optax.apply_updates(params, updates)
    for mine, ref in zip(params, torch_final):
        np.testing.assert_allclose(np.asarray(mine), ref, atol=2e-5,
                                   rtol=1e-4)


def test_adafactor_lr_schedule_shape():
    from music2midi_tpu.train.adafactor import adafactor_lr_at

    # warmup_init: lr = min(1e-6*s, s^-0.5) — rises then decays
    assert adafactor_lr_at(1) == 1e-6
    assert adafactor_lr_at(10000) == pytest.approx(1e-2)
    assert adafactor_lr_at(4_000_000) == pytest.approx(5e-4)


# --------------------------------------------------------------------- #
# train step                                                             #
# --------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def tiny_setup():
    import jax

    cfg = default_config()
    t5_cfg = t5_config_from(cfg)._replace(
        num_layers=2, num_decoder_layers=2, d_ff=128
    )
    mel_cfg = LogMelConfig(n_fft=256, hop_length=128, n_mels=384)
    params = init_params(jax.random.PRNGKey(0), t5_cfg)
    rng = np.random.default_rng(0)
    wave = rng.normal(size=(2, 4096)).astype(np.float32) * 0.1
    labels = pad_labels(
        [np.array([140, 3, 60, 150, 4, 60, 2]), np.array([135, 3, 70, 2])]
    )
    cond = np.zeros((2, 2), np.int32)
    batch = Batch(wave, labels, cond)
    return t5_cfg, mel_cfg, params, batch


def test_train_step_reduces_loss(tiny_setup):
    import jax

    t5_cfg, mel_cfg, params, batch = tiny_setup
    # fixed lr for a fast overfit check (relative-step warmup is ~1e-6/step)
    opt = adafactor_hf(learning_rate=0.05, warmup_init=False)
    step_fn = make_train_step(opt, t5_cfg, mel_cfg, donate=False)
    state = init_train_state(params, opt)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        state, loss = step_fn(state, batch, rng)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert int(state.step) == 30


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    import jax

    t5_cfg, mel_cfg, params, batch = tiny_setup
    from music2midi_tpu.train.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    opt = adafactor_hf()
    state = init_train_state(params, opt)
    step_fn = make_train_step(opt, t5_cfg, mel_cfg, donate=False)
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    cfg = default_config()
    save_train_state(tmp_path / "ckpt", state, cfg)
    template = init_train_state(params, opt)
    restored, saved_cfg = restore_train_state(tmp_path / "ckpt", template)
    assert int(restored.step) == 1
    assert saved_cfg.model.t5.d_model == 384
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0
        ),
        state.params,
        restored.params,
    )


def test_average_checkpoints(tiny_setup, tmp_path, monkeypatch):
    """average_params: uniform mean of N exports, weighted mean, config
    carry-through, and the tools/ CLI writing a loadable export."""
    import jax

    t5_cfg, mel_cfg, params, batch = tiny_setup
    from music2midi_tpu.train.checkpoint import (
        average_params,
        restore_params,
        save_params,
    )

    cfg = default_config()
    p0 = params
    p1 = jax.tree.map(lambda x: np.asarray(x) + 1.0, params)
    save_params(tmp_path / "a", p0, cfg)
    save_params(tmp_path / "b", p1)

    mean, got_cfg = average_params([tmp_path / "a", tmp_path / "b"])
    assert got_cfg is not None and got_cfg.model.t5.d_model == 384
    jax.tree.map(
        lambda m, x: np.testing.assert_allclose(
            np.asarray(m), np.asarray(x) + 0.5, rtol=1e-6, atol=1e-6
        ),
        mean,
        p0,
    )
    # dtype preserved
    assert (
        jax.tree.leaves(mean)[0].dtype == np.asarray(
            jax.tree.leaves(p0)[0]).dtype
    )

    # weighted: 3:1 toward b -> p0 + 0.75
    wmean, _ = average_params(
        [tmp_path / "a", tmp_path / "b"], weights=[1.0, 3.0]
    )
    leaf_w = np.asarray(jax.tree.leaves(wmean)[0])
    leaf_0 = np.asarray(jax.tree.leaves(p0)[0])
    np.testing.assert_allclose(leaf_w, leaf_0 + 0.75, rtol=1e-6, atol=1e-6)

    # CLI writes an export restore_params can load
    import runpy
    import sys

    monkeypatch.setattr(
        sys, "argv",
        ["average_checkpoints.py", str(tmp_path / "avg"),
         str(tmp_path / "a"), str(tmp_path / "b")],
    )
    runpy.run_path("tools/average_checkpoints.py", run_name="__main__")
    loaded, loaded_cfg = restore_params(tmp_path / "avg")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0
        ),
        loaded,
        mean,
    )
    assert loaded_cfg is not None


def test_sharded_train_step_8dev(tiny_setup):
    """Full dp x tp pjit step on the 8-device CPU mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from music2midi_tpu.parallel import (
        batch_sharding,
        make_mesh,
        param_shardings,
    )

    t5_cfg, mel_cfg, params, _ = tiny_setup
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(dp=4, tp=2)
    pshard = param_shardings(mesh, params)
    params_sharded = jax.device_put(params, pshard)
    opt = adafactor_hf(learning_rate=0.05, warmup_init=False)
    state = init_train_state(params_sharded, opt)
    rng = np.random.default_rng(1)
    wave = rng.normal(size=(8, 4096)).astype(np.float32) * 0.1
    labels = pad_labels([np.array([140, 3, 60, 2])] * 8)
    cond = np.zeros((8, 2), np.int32)
    bshard = batch_sharding(mesh)
    batch = Batch(
        jax.device_put(wave, bshard),
        jax.device_put(labels, bshard),
        jax.device_put(cond, bshard),
    )
    step_fn = make_train_step(opt, t5_cfg, mel_cfg, donate=False)
    state, loss = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # params keep their tp sharding after the update
    q = state.params["encoder"]["layers"][0]["self_attn"]["q"]
    assert q.sharding.spec == P(None, "tp")

    # sharded loss == single-device loss (same params, deterministic path)
    from music2midi_tpu.train.loop import make_eval_step

    eval_fn = make_eval_step(t5_cfg, mel_cfg)
    loss_single = eval_fn(params, Batch(wave, labels, cond))
    loss_sharded = eval_fn(state_params_unshard(params_sharded),
                           Batch(wave, labels, cond))
    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=1e-5
    )


def state_params_unshard(params):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), params)


def test_grad_accum_matches_big_batch(tiny_setup):
    """optax.MultiSteps(k=2) over two half-batches produces the same update
    as one step on the concatenated batch (equal token counts per micro
    batch, dropout off; reference config.yaml accumulate_grad_batches)."""
    import jax
    import optax

    t5_cfg, mel_cfg, params, _ = tiny_setup
    t5_cfg = t5_cfg._replace(dropout_rate=0.0)
    rng = np.random.default_rng(7)
    wave = rng.normal(size=(4, 4096)).astype(np.float32) * 0.1
    labels = pad_labels([np.array([140, 3, 60, 150, 4, 61, 2])] * 4)
    cond = np.zeros((4, 2), np.int32)

    inner = adafactor_hf(learning_rate=0.05, warmup_init=False)
    accum_opt = optax.MultiSteps(inner, every_k_schedule=2)
    accum_step = make_train_step(accum_opt, t5_cfg, mel_cfg, donate=False)
    state_a = init_train_state(params, accum_opt)
    key = jax.random.PRNGKey(0)
    for lo, hi in ((0, 2), (2, 4)):
        micro = Batch(wave[lo:hi], labels[lo:hi], cond[lo:hi])
        state_a, _ = accum_step(state_a, micro, key)

    plain_step = make_train_step(inner, t5_cfg, mel_cfg, donate=False)
    state_b = init_train_state(params, inner)
    state_b, _ = plain_step(state_b, Batch(wave, labels, cond), key)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        ),
        state_a.params,
        state_b.params,
    )


def test_distributed_guard_is_noop_single_host(monkeypatch):
    from music2midi_tpu.parallel import distributed

    monkeypatch.delenv("M2M_DISTRIBUTED", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert distributed.should_initialize() is False
    assert distributed.maybe_initialize() is False
    monkeypatch.setenv("M2M_DISTRIBUTED", "1")
    assert distributed.should_initialize() is True
    monkeypatch.delenv("M2M_DISTRIBUTED")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    assert distributed.should_initialize() is True


def test_distributed_partial_env_triple_rejected(monkeypatch):
    """Half a manual launch config (NUM_PROCESSES without PROCESS_ID or
    vice versa) must fail with an error naming the missing variable, not
    jax's opaque downstream failure / coordinator hang."""
    from music2midi_tpu.parallel import distributed

    monkeypatch.setattr(distributed, "_initialized", False)
    monkeypatch.setenv("M2M_DISTRIBUTED", "1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="JAX_PROCESS_ID"):
        distributed.maybe_initialize()
    monkeypatch.delenv("JAX_NUM_PROCESSES")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    with pytest.raises(RuntimeError, match="JAX_NUM_PROCESSES"):
        distributed.maybe_initialize()


def test_init_params_int_seed_matches_key():
    """init_params accepts a plain int seed (no device round trip for
    cold processes) and must produce the SAME params as the PRNGKey path
    — including negative seeds, and including under x64 where PRNGKey
    sign-extends the seed to int64 before the 32-bit split."""
    import jax

    cfg = t5_config_from(default_config())._replace(
        num_layers=1, num_decoder_layers=1, d_model=16, d_ff=16, d_kv=4,
        num_heads=2, vocab_size=8,
    )
    for seed in (0, 3, -1):
        a = init_params(seed, cfg)
        b = init_params(jax.random.PRNGKey(seed), cfg)
        jax.tree_util.tree_map(np.testing.assert_array_equal, a, b)
    jax.config.update("jax_enable_x64", True)
    try:
        a = init_params(-1, cfg)
        b = init_params(jax.random.PRNGKey(-1), cfg)
    finally:
        jax.config.update("jax_enable_x64", False)
    jax.tree_util.tree_map(np.testing.assert_array_equal, a, b)
    # and x64 negative differs from x64-off negative (sign extension)
    assert not np.array_equal(
        a["shared_embedding"], init_params(-1, cfg)["shared_embedding"]
    )


def test_multi_step_equals_single_steps(tiny_setup):
    """make_multi_step's lax.scan over K stacked batches must reproduce K
    make_train_step calls exactly (same rng fold-in, same Adafactor
    trajectory) — the correctness contract for --steps_per_dispatch."""
    import jax
    import jax.numpy as jnp

    from music2midi_tpu.train import make_multi_step

    t5_cfg, mel_cfg, params, batch = tiny_setup
    K = 4
    rng = jax.random.PRNGKey(7)
    rng_np = np.random.default_rng(3)
    batches = [
        Batch(
            batch.waveform
            + rng_np.normal(size=batch.waveform.shape).astype(np.float32)
            * 0.01,
            batch.labels,
            batch.cond_index,
        )
        for _ in range(K)
    ]

    opt = adafactor_hf(learning_rate=0.05, warmup_init=False)
    single = make_train_step(opt, t5_cfg, mel_cfg, donate=False)
    s1 = init_train_state(params, opt)
    single_losses = []
    for b in batches:
        s1, loss = single(s1, b, rng)
        single_losses.append(float(loss))

    multi = make_multi_step(opt, t5_cfg, mel_cfg, donate=False)
    stacked = Batch(
        np.stack([b.waveform for b in batches]),
        np.stack([b.labels for b in batches]),
        np.stack([b.cond_index for b in batches]),
    )
    s2 = init_train_state(params, opt)
    s2, losses = multi(s2, stacked, rng)

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(single_losses), rtol=1e-5
    )
    assert int(s2.step) == int(s1.step) == K
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        ),
        s1.params, s2.params,
    )

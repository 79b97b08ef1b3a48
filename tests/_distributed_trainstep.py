"""Shared harness for the cross-process full-train-step test.

Builds a deterministic tiny model + batch on the host, shards both over
a global (dp=4, tp=2) mesh of the first 8 visible devices, and runs two
complete train steps (log-mel -> T5 fwd/bwd -> Adafactor update).  Both
the single-process 8-virtual-device run and each process of the
2-process x 4-device run import THIS module, so any drift between the
runs is the distributed runtime's — not the setup's.

The second step's loss is computed on the params the FIRST step
updated, so matching losses prove the cross-process gradient
all-reduce AND the optimizer update, not just a forward pass
(reference contract: Lightning DDP `sync_dist=True`,
/root/reference/music2midi/model.py:37).
"""

from __future__ import annotations

import numpy as np


def run_steps(n_steps: int = 2):
    """Run `n_steps` sharded train steps on a global dp=4 x tp=2 mesh;
    returns the per-step losses as floats (identical on every process)."""
    import jax

    from music2midi_tpu.config import default_config
    from music2midi_tpu.models import init_params, t5_config_from
    from music2midi_tpu.ops.mel import LogMelConfig
    from music2midi_tpu.parallel import (
        batch_sharding,
        make_mesh,
        param_shardings,
    )
    from music2midi_tpu.train import adafactor_hf, make_train_step
    from music2midi_tpu.train.loop import (
        Batch,
        init_train_state,
        pad_labels,
    )

    assert jax.device_count() >= 8, jax.device_count()
    cfg = default_config()
    t5_cfg = t5_config_from(cfg)._replace(
        num_layers=2, num_decoder_layers=2, d_ff=128
    )
    mel_cfg = LogMelConfig(n_fft=256, hop_length=128, n_mels=384)
    # int seed => identical host-numpy init in every process, no device
    # round trip (CLAUDE.md init protocol)
    params_host = init_params(0, t5_cfg)

    mesh = make_mesh(jax.devices()[:8], dp=4, tp=2)
    pshard = param_shardings(mesh, params_host)

    def gput(x, s):
        # global array assembly that works identically in single- and
        # multi-controller mode: every process materializes the full
        # host value and contributes its addressable shards
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    params = jax.tree.map(gput, params_host, pshard)

    rng = np.random.default_rng(0)
    wave = (rng.normal(size=(8, 4096)) * 0.1).astype(np.float32)
    labels = pad_labels(
        [np.array([140, 3, 60, 150, 4, 60, 2])] * 4
        + [np.array([135, 3, 70, 2])] * 4
    )
    cond = np.zeros((8, 2), np.int32)
    bshard = batch_sharding(mesh)
    batch = Batch(
        gput(wave, bshard), gput(labels, bshard), gput(cond, bshard)
    )

    opt = adafactor_hf(learning_rate=0.05, warmup_init=False)
    state = init_train_state(params, opt)
    step_fn = make_train_step(opt, t5_cfg, mel_cfg, donate=False)
    losses = []
    for i in range(n_steps):
        state, loss = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(jax.device_get(loss)))
    return losses

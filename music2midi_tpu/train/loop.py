"""The pjit training step.

Replaces the reference's Lightning `training_step`/`validation_step`
(reference music2midi/model.py:32-53): waveform batch -> log-mel ->
conditioning prepend -> T5 forward with -100-masked labels -> CE loss ->
Adafactor update.  The whole step is ONE jitted program; under a (dp, tp)
mesh the batch shards over dp and XLA emits the grad-mean psum over ICI
(SURVEY.md §2.2 — the TPU-native replacement for sync_dist/NCCL).

Gradient accumulation (config.trainer.accumulate_grad_batches,
reference config.yaml:41) composes via optax.MultiSteps.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.t5 import (
    T5Config,
    conditioning_prepend,
    cross_entropy_loss,
    decoder_forward,
    encode,
    shift_right,
)
from ..ops.mel import LogMelConfig, log_mel_spectrogram


class TrainState(NamedTuple):
    params: object
    opt_state: object
    step: jax.Array  # scalar int32


class Batch(NamedTuple):
    """One device batch.  labels are tokenized on host (reference
    transformer.py:29-31), padded with -100 (loss-ignored)."""

    waveform: jax.Array  # (B, S) float32 at model sample rate
    labels: jax.Array  # (B, L) int32, -100 = ignore
    cond_index: jax.Array  # (B, n_cond) int32


def _loss_fn(
    params,
    batch: Batch,
    rng,
    t5_cfg: T5Config,
    mel_cfg: LogMelConfig,
    deterministic: bool,
) -> jax.Array:
    mel = log_mel_spectrogram(batch.waveform, mel_cfg)
    mel = jax.lax.stop_gradient(mel)  # frontend has no learned params
    embeds = conditioning_prepend(params, mel, batch.cond_index)
    if rng is not None:
        rng_e, rng_d = jax.random.split(rng)
    else:
        rng_e = rng_d = None
    enc = encode(params, embeds, t5_cfg, deterministic, rng_e)
    dec_in = shift_right(batch.labels, t5_cfg)
    logits = decoder_forward(
        params, dec_in, enc, t5_cfg,
        deterministic=deterministic, rng=rng_d,
    )
    return cross_entropy_loss(logits, batch.labels)


def make_train_step(
    optimizer: optax.GradientTransformation,
    t5_cfg: T5Config,
    mel_cfg: LogMelConfig,
    donate: bool = True,
):
    """-> jitted (state, batch, rng) -> (state, loss)."""

    def train_step(state: TrainState, batch: Batch, rng) -> Tuple[TrainState, jax.Array]:
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(_loss_fn)(
            state.params, batch, rng, t5_cfg, mel_cfg, False
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_multi_step(
    optimizer: optax.GradientTransformation,
    t5_cfg: T5Config,
    mel_cfg: LogMelConfig,
    donate: bool = True,
):
    """-> jitted (state, stacked_batches, rng) -> (state, losses (K,)).

    K optimizer steps in ONE dispatch: `stacked_batches` is a Batch whose
    leaves carry a leading step axis (K, B, ...) and `lax.scan` runs the
    exact single-step update over it.  Purpose-built for dispatch-latency
    dominated stacks (the tunneled axon relay charges 50 ms - minutes per
    host round trip; CLAUDE.md): K=50 turns 200 round trips into 4.
    Semantics are IDENTICAL to calling make_train_step's fn K times —
    same per-step rng fold-in, same Adafactor schedule
    (tests/test_train.py::test_multi_step_equals_single_steps)."""

    def multi_step(state: TrainState, batches: Batch, rng):
        def body(s: TrainState, b: Batch):
            step_rng = jax.random.fold_in(rng, s.step)
            loss, grads = jax.value_and_grad(_loss_fn)(
                s.params, b, step_rng, t5_cfg, mel_cfg, False
            )
            updates, opt_state = optimizer.update(
                grads, s.opt_state, s.params
            )
            params = optax.apply_updates(s.params, updates)
            return TrainState(params, opt_state, s.step + 1), loss

        return jax.lax.scan(body, state, batches)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def make_eval_step(t5_cfg: T5Config, mel_cfg: LogMelConfig):
    """-> jitted (params, batch) -> loss (deterministic)."""

    def eval_step(params, batch: Batch) -> jax.Array:
        return _loss_fn(params, batch, None, t5_cfg, mel_cfg, True)

    return jax.jit(eval_step)


def init_train_state(
    params, optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def pad_labels(labels_batch, ignore_index: int = -100):
    """Host-side: list of 1-D int arrays -> (B, L) int32 padded with
    ignore_index (mirrors PAD->-100 at reference transformer.py:30)."""
    import numpy as np

    max_len = max(len(x) for x in labels_batch)
    out = np.full((len(labels_batch), max_len), ignore_index, dtype=np.int32)
    for i, x in enumerate(labels_batch):
        out[i, : len(x)] = x
    return out

"""Adafactor with exact HF-`transformers` semantics, as an optax transform.

The reference trains with `Adafactor(self.parameters(), warmup_init=True)` +
`AdafactorSchedule` (reference music2midi/model.py:27-30), i.e. HF defaults:
relative-step learning rate min(1e-6 * step, 1/sqrt(step)), parameter-scale
multiplication max(1e-3, RMS(param)), factored second moments for any
parameter with ndim >= 2 (optax's stock adafactor only factors dims >= 128,
so e.g. the (32, 8) relative-bias tables would differ), beta2_t = 1 -
step^-0.8, update clipped by RMS/clip_threshold.  Implemented from the
published Adafactor algorithm (Shazeer & Stern 2018) with HF's exact
defaults; parity-tested against torch in tests/test_adafactor.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class _FactoredState(NamedTuple):
    row: jax.Array  # (..., rows)
    col: jax.Array  # (..., cols)


class AdafactorHFState(NamedTuple):
    step: jax.Array  # scalar int32
    moments: object  # pytree: _FactoredState or full exp_avg_sq per leaf


def _rms(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.mean(jnp.square(x)))


def adafactor_hf(
    learning_rate: Optional[float] = None,
    eps1: float = 1e-30,
    eps2: float = 1e-3,
    clip_threshold: float = 1.0,
    decay_rate: float = -0.8,
    weight_decay: float = 0.0,
    scale_parameter: bool = True,
    relative_step: bool = True,
    warmup_init: bool = True,
) -> optax.GradientTransformation:
    """HF-default Adafactor (lr=None => relative step).

    `learning_rate` set => fixed lr (relative_step off), matching HF's
    validation that lr and relative_step are mutually exclusive.
    """
    if learning_rate is not None:
        relative_step = False

    def init_fn(params):
        def leaf_init(p):
            if p.ndim >= 2:
                return _FactoredState(
                    row=jnp.zeros(p.shape[:-1], jnp.float32),
                    col=jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32),
                )
            return jnp.zeros_like(p, dtype=jnp.float32)

        return AdafactorHFState(
            step=jnp.zeros((), jnp.int32),
            moments=jax.tree.map(leaf_init, params),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("adafactor_hf requires params")
        step = state.step + 1
        step_f = step.astype(jnp.float32)
        beta2t = 1.0 - jnp.power(step_f, decay_rate)
        if relative_step:
            min_step = (
                1e-6 * step_f if warmup_init else jnp.float32(1e-2)
            )
            rel_step_sz = jnp.minimum(min_step, jax.lax.rsqrt(step_f))
        else:
            rel_step_sz = jnp.float32(learning_rate)

        def leaf_update(g, m, p):
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            if scale_parameter:
                lr = jnp.maximum(eps2, _rms(p32)) * rel_step_sz
            else:
                lr = rel_step_sz
            sq = jnp.square(g) + eps1
            if g.ndim >= 2:
                new_row = beta2t * m.row + (1 - beta2t) * jnp.mean(sq, axis=-1)
                new_col = beta2t * m.col + (1 - beta2t) * jnp.mean(sq, axis=-2)
                # approx rsqrt(v): normalize rows by their mean
                r_factor = jax.lax.rsqrt(
                    new_row / jnp.mean(new_row, axis=-1, keepdims=True)
                )[..., None]
                c_factor = jax.lax.rsqrt(new_col)[..., None, :]
                upd = r_factor * c_factor * g
                new_m = _FactoredState(row=new_row, col=new_col)
            else:
                new_v = beta2t * m + (1 - beta2t) * sq
                upd = jax.lax.rsqrt(new_v) * g
                new_m = new_v
            upd = upd / jnp.maximum(1.0, _rms(upd) / clip_threshold)
            upd = upd * lr
            if weight_decay:
                upd = upd + weight_decay * lr * p32
            return (-upd).astype(p.dtype), new_m

        is_leaf = lambda x: isinstance(x, _FactoredState)  # noqa: E731
        flat_g, treedef = jax.tree.flatten(grads)
        flat_m = treedef.flatten_up_to(state.moments)
        flat_p = treedef.flatten_up_to(params)
        out = [
            leaf_update(g, m, p)
            for g, m, p in zip(flat_g, flat_m, flat_p)
        ]
        updates = treedef.unflatten([u for u, _ in out])
        new_moments = treedef.unflatten([m for _, m in out])
        return updates, AdafactorHFState(step=step, moments=new_moments)

    return optax.GradientTransformation(init_fn, update_fn)


def adafactor_lr_at(step: int, warmup_init: bool = True) -> float:
    """The relative-step lr (AdafactorSchedule.get_lr equivalent, for
    logging; the real scaling includes per-parameter RMS)."""
    if step <= 0:
        return 0.0
    min_step = 1e-6 * step if warmup_init else 1e-2
    return min(min_step, step ** -0.5)

"""Device-side (TPU) batch detokenizer: event tokens -> note arrays.

The reference detokenizes on host with a serial per-token state machine
(reference music2midi/tokenizer.py:169-200 and the numba kernel at
:242-267), which serializes whole-song inference on the CPU.  This module
re-expresses that state machine exactly as data-parallel scans so the
decode batch never leaves the device (the north-star requirement):

  1. running state (current time index / onset-offset mode / pending pitch)
     becomes "last set value at or before i" associative scans, with time
     tokens acting as segment resets;
  2. note emission points are computed positionally: a pitch token emits at
     itself when a marker was already seen in its segment; otherwise the
     LAST pending pitch of the segment emits at the segment's FIRST marker
     (this is the only way the sequential machine can emit at a marker);
  3. onset/offset pairing is a length-L `lax.scan` in token order where an
     offset event closes EVERY still-open note of its pitch with a strictly
     earlier time index — the reference's fancy-indexing quirk
     (tokenizer.py:256-265) — "first matching offset in token order wins".

Semantics parity is enforced against the host tokenizer in
tests/test_detokenize.py over adversarial random token streams.

Output is fixed-shape: slot i of (B, L, 4) holds the note whose ONSET was
emitted at token position i (velocity 80), with a validity mask — ragged
results are trimmed on host (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..tokenizer import BOS, EOS, OFFSET, ONSET, PAD  # noqa: F401

PITCH_OFFSET = 5
TIME_OFFSET = 133
DEFAULT_VELOCITY = 80


def _last_set_scan(vals: jax.Array, is_set: jax.Array) -> jax.Array:
    """Per row: v[i] = last vals[j] with is_set[j], j <= i; -1 if none."""

    def op(a, b):
        av, as_ = a
        bv, bs = b
        return jnp.where(bs, bv, av), as_ | bs

    v, s = jax.lax.associative_scan(op, (vals, is_set), axis=1)
    return jnp.where(s, v, -1)


def _shift_right(x: jax.Array, fill) -> jax.Array:
    return jnp.concatenate(
        [jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1
    )


@functools.partial(jax.jit, static_argnames=())
def detokenize(
    tokens: jax.Array,  # (B, L) int32
    start_idx: jax.Array,  # (B,) int32 — time offset per sequence (chunks)
) -> Tuple[jax.Array, jax.Array]:
    """-> (notes (B, L, 4) float32 [onset_idx, offset_idx, pitch, vel],
           valid (B, L) bool).

    Time columns are in 50 ms *steps* (int-valued floats); the host converts
    to seconds.  Note order within a row (by slot index) equals the
    reference's append order.
    """
    tokens = tokens.astype(jnp.int32)
    B, L = tokens.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    # --- validity: strictly before the first EOS -------------------------
    eos_mask = tokens == EOS
    has_eos = jnp.any(eos_mask, axis=1, keepdims=True)
    first_eos = jnp.argmax(eos_mask, axis=1).astype(jnp.int32)[:, None]
    valid = jnp.where(has_eos, pos < first_eos, True)

    # --- classification ---------------------------------------------------
    is_time = valid & (tokens >= TIME_OFFSET)
    is_pitch = valid & (tokens >= PITCH_OFFSET) & (tokens < TIME_OFFSET)
    is_on_m = valid & (tokens == ONSET)
    is_off_m = valid & (tokens == OFFSET)
    is_marker = is_on_m | is_off_m

    # --- running state scans ----------------------------------------------
    time_val = start_idx[:, None] + tokens - TIME_OFFSET
    cur_time = _last_set_scan(jnp.where(is_time, time_val, -1), is_time)
    on_val = jnp.where(is_on_m, 1, jnp.where(is_off_m, 0, -1))
    cur_on = _last_set_scan(on_val, is_marker | is_time)

    pend_val = jnp.where(is_pitch, tokens - PITCH_OFFSET, -1)
    incl_pending = _last_set_scan(pend_val, is_pitch | is_time | is_marker)
    excl_pending = _shift_right(incl_pending, -1)

    marker_flag = jnp.where(is_marker, 1, 0)
    incl_marker = _last_set_scan(marker_flag, is_marker | is_time)
    excl_marker = _shift_right(incl_marker, -1)
    first_marker_of_seg = is_marker & (excl_marker != 1)

    # --- emission points ---------------------------------------------------
    emit_pitch = is_pitch & (cur_time >= 0) & (cur_on >= 0)
    emit_marker = first_marker_of_seg & (excl_pending >= 0) & (cur_time >= 0)
    e_emit = emit_pitch | emit_marker
    e_pitch = jnp.where(
        emit_pitch, tokens - PITCH_OFFSET,
        jnp.where(emit_marker, excl_pending, -1),
    )
    e_on = jnp.where(emit_pitch, cur_on, jnp.where(is_on_m, 1, 0))
    e_time = cur_time

    # --- onset/offset pairing scan (token order) ---------------------------
    open_slot = e_emit & (e_on == 1)
    off_event = e_emit & (e_on == 0)

    def body(offsets, j):
        # event j (an offset) closes all open notes of its pitch with
        # strictly earlier time, opened at an earlier slot, still open
        oj = off_event[:, j][:, None]
        pj = e_pitch[:, j][:, None]
        tj = e_time[:, j][:, None]
        mask = (
            oj
            & open_slot
            & (pos < j)
            & (e_pitch == pj)
            & (e_time < tj)
            & (offsets == -1)
        )
        return jnp.where(mask, tj, offsets), None

    offsets0 = jnp.full((B, L), -1, dtype=jnp.int32)
    offsets, _ = jax.lax.scan(body, offsets0, jnp.arange(L))

    note_valid = open_slot & (offsets != -1)
    notes = jnp.stack(
        [
            e_time.astype(jnp.float32),
            offsets.astype(jnp.float32),
            e_pitch.astype(jnp.float32),
            jnp.full((B, L), float(DEFAULT_VELOCITY), jnp.float32),
        ],
        axis=-1,
    )
    return notes, note_valid


def detokenize_to_host(
    tokens,
    start_idx,
    time_step: float = 0.05,
    cutoff_time=None,
):
    """Device detokenize + host trim/convert: -> list of (N_i, 4) float64
    note arrays in seconds, one per row — drop-in for
    MidiTokenizer.decode(mode='batched'/'sequential' per-chunk)."""
    import numpy as np

    notes, valid = detokenize(
        jnp.asarray(tokens, dtype=jnp.int32),
        jnp.asarray(start_idx, dtype=jnp.int32),
    )
    notes = np.asarray(jax.device_get(notes)).astype(np.float64)
    valid = np.asarray(jax.device_get(valid))
    out = []
    for b in range(notes.shape[0]):
        row = notes[b][valid[b]]
        row[:, :2] *= time_step
        if cutoff_time is not None:
            row = row[row[:, 0] < cutoff_time]
            row[:, 1] = np.minimum(row[:, 1], cutoff_time)
        out.append(row)
    return out

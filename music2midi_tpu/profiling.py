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

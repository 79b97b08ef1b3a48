"""Dynamic request batcher: coalescing, correctness, error isolation."""

import threading
import time

import numpy as np
import pytest

from music2midi_tpu.serve.batcher import DynamicBatcher


@pytest.fixture(scope="module")
def engine():
    from music2midi_tpu.infer import Music2MIDI

    return Music2MIDI.from_random(seed=0, decode_max_length=16)


def _notes(m):
    return [(n.start, n.end, n.pitch) for i in m.instruments
            for n in i.notes]


def test_concurrent_requests_match_individual(engine):
    rng = np.random.default_rng(0)
    songs = [
        (rng.normal(size=int(4 * 16000)) * 0.2).astype(np.float32)
        for _ in range(3)
    ]
    individual = [engine.generate(audio_y=s) for s in songs]

    batcher = DynamicBatcher(engine, max_wait_ms=200.0)
    try:
        futures = [batcher.submit(waveform=s) for s in songs]
        results = [f.result(timeout=120) for f in futures]
    finally:
        batcher.close()
    for a, b in zip(individual, results):
        assert _notes(a) == _notes(b)


def test_requests_coalesce_into_one_batch(engine):
    calls = []
    orig = engine.generate_batch

    def spy(waveforms, cond_indices=None, **kw):
        calls.append(len(waveforms))
        return orig(waveforms, cond_indices=cond_indices, **kw)

    engine.generate_batch = spy
    batcher = DynamicBatcher(engine, max_wait_ms=300.0)
    try:
        rng = np.random.default_rng(1)
        songs = [
            (rng.normal(size=int(3.5 * 16000)) * 0.2).astype(np.float32)
            for _ in range(3)
        ]
        # submit from separate threads "simultaneously"
        futs = []
        lock = threading.Barrier(3)

        def go(s):
            lock.wait()
            futs.append(batcher.submit(waveform=s))

        threads = [threading.Thread(target=go, args=(s,)) for s in songs]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for f in list(futs):
            f.result(timeout=120)
        assert calls and max(calls) >= 2, calls  # coalesced
    finally:
        batcher.close()
        engine.generate_batch = orig


def test_cancelled_request_does_not_kill_dispatcher(engine):
    """A client cancelling a pending future must not crash the
    dispatcher thread or poison batch-mates."""
    batcher = DynamicBatcher(engine, max_wait_ms=400.0)
    try:
        rng = np.random.default_rng(3)
        doomed = batcher.submit(
            waveform=(rng.normal(size=16000) * 0.2).astype(np.float32)
        )
        # cancel before the dispatcher claims it (it waits max_wait_ms
        # for stragglers after the first request arrives)
        cancelled = doomed.cancel()
        survivor = batcher.submit(
            waveform=(rng.normal(size=16000) * 0.2).astype(np.float32)
        )
        assert survivor.result(timeout=120) is not None
        if cancelled:
            assert doomed.cancelled()
    finally:
        batcher.close()


def test_bad_request_does_not_kill_good_ones(engine):
    batcher = DynamicBatcher(engine, max_wait_ms=200.0)
    try:
        rng = np.random.default_rng(2)
        good = batcher.submit(
            waveform=(rng.normal(size=16000) * 0.2).astype(np.float32)
        )
        bad = batcher.submit(audio_path="/nonexistent/file.wav")
        with pytest.raises(Exception):
            bad.result(timeout=120)
        # a bad decode fails ONLY its own request; batch-mates succeed
        assert good.result(timeout=120) is not None
        later = batcher.submit(
            waveform=(rng.normal(size=16000) * 0.2).astype(np.float32)
        )
        assert later.result(timeout=120) is not None
    finally:
        batcher.close()
    with pytest.raises(RuntimeError):
        batcher.submit(waveform=np.zeros(16000, np.float32))

"""Device detokenizer == host tokenizer state machine, adversarially."""

import numpy as np
import pytest

from music2midi_tpu.ops.detokenize import detokenize_to_host
from music2midi_tpu.tokenizer import BOS, EOS, OFFSET, ONSET, PAD, MidiTokenizer


@pytest.fixture(scope="module")
def tok():
    return MidiTokenizer()


def T(t):
    return 133 + t


def P(p):
    return 5 + p


def _pad_batch(seqs):
    L = max(len(s) for s in seqs)
    out = np.zeros((len(seqs), L), dtype=np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


def _assert_matches_host(tok, seqs, start_idx=None):
    if start_idx is None:
        start_idx = [0] * len(seqs)
    batch = _pad_batch(seqs)
    dev = detokenize_to_host(batch, np.asarray(start_idx), tok.time_step)
    for i, s in enumerate(seqs):
        host = tok._decode(np.asarray(s), start_idx=start_idx[i])
        np.testing.assert_allclose(
            dev[i], host, atol=1e-9,
            err_msg=f"row {i}: tokens={list(s)}",
        )


def test_simple_cases(tok):
    cases = [
        [T(2), ONSET, P(60), T(4), OFFSET, P(60), EOS],
        [T(0), ONSET, P(60), P(64), T(2), OFFSET, P(60), P(64), EOS],
        [EOS],
        [BOS, PAD, T(0), ONSET, P(60), T(2), OFFSET, P(60), EOS, T(4),
         ONSET, P(70)],
    ]
    _assert_matches_host(tok, cases)


def test_quirk_cases(tok):
    cases = [
        # offset closes all open matching notes
        [T(0), ONSET, P(60), T(1), ONSET, P(60), T(3), OFFSET, P(60), EOS],
        # same-index onset+offset never closes
        [T(5), ONSET, P(60), OFFSET, P(60), EOS],
        # invalid token >= 333 acts as big time index
        [T(0), ONSET, P(60), 333, OFFSET, P(60), EOS],
        # pending pitch emitted at first marker of segment
        [T(0), ONSET, P(60), T(2), P(62), ONSET, T(4), OFFSET, P(60), P(62),
         EOS],
        # pitch before any time token: suppressed, then reset
        [ONSET, P(60), T(2), OFFSET, P(60), T(3), ONSET, P(61), T(5),
         OFFSET, P(61), EOS],
        # marker with no pending pitch, then pitch emits at itself
        [T(0), OFFSET, ONSET, P(60), T(3), OFFSET, P(60), EOS],
        # multiple pendings: only last survives to first marker
        [T(0), P(50), P(51), P(52), ONSET, T(4), OFFSET, P(52), EOS],
        # time going backwards
        [T(10), ONSET, P(60), T(2), OFFSET, P(60), T(20), OFFSET, P(60),
         EOS],
        # offset before matching onset exists
        [T(5), OFFSET, P(60), T(6), ONSET, P(60), T(8), OFFSET, P(60), EOS],
    ]
    _assert_matches_host(tok, cases)


def test_start_idx_offsets(tok):
    seqs = [
        [T(0), ONSET, P(60), T(2), OFFSET, P(60), EOS],
        [T(0), ONSET, P(64), T(2), OFFSET, P(64), EOS],
    ]
    _assert_matches_host(tok, seqs, start_idx=[0, 60])


def test_random_streams_match_host(tok):
    """Adversarial fuzz: uniform random tokens over the whole vocab."""
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 400, size=rng.integers(5, 120)).astype(np.int32)
            for _ in range(64)]
    _assert_matches_host(tok, seqs)


def test_random_grammatical_streams(tok):
    """Structured random streams (valid grammar) — denser note output."""
    rng = np.random.default_rng(1)
    seqs = []
    for _ in range(32):
        toks = []
        t = 0
        while t < 190 and len(toks) < 200:
            toks.append(T(min(t, 199)))
            if rng.random() < 0.8:
                toks.append(ONSET)
                for p in rng.integers(40, 90, size=rng.integers(1, 4)):
                    toks.append(P(int(p)))
            if rng.random() < 0.8:
                toks.append(OFFSET)
                for p in rng.integers(40, 90, size=rng.integers(1, 4)):
                    toks.append(P(int(p)))
            t += int(rng.integers(1, 8))
        toks.append(EOS)
        seqs.append(toks)
    _assert_matches_host(tok, seqs)
    # sanity: these streams really produce notes
    batch = _pad_batch(seqs)
    dev = detokenize_to_host(batch, np.zeros(len(seqs), np.int32),
                             tok.time_step)
    assert sum(len(d) for d in dev) > 100


def test_encode_roundtrip_through_device(tok):
    """notes -> host encode -> device decode == original (quantized)."""
    rng = np.random.default_rng(2)
    notes = []
    used = set()
    for _ in range(30):
        on = int(rng.integers(0, 150))
        p = int(rng.integers(30, 100))
        if (on, p) in used:
            continue
        used.add((on, p))
        notes.append([on * 0.05, (on + int(rng.integers(1, 20))) * 0.05,
                      p, 80])
    notes = np.array(sorted(notes))
    toks = tok.encode(notes)
    dev = detokenize_to_host(toks[None].astype(np.int32),
                             np.zeros(1, np.int32), tok.time_step)[0]
    host = tok.decode([toks])[0]
    np.testing.assert_allclose(dev, host, atol=1e-9)

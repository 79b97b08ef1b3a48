"""Alignment pipeline tests: chroma features, DTW, end-to-end warp
recovery on synthetic audio."""

import numpy as np
import pytest

from music2midi_tpu.data.align import (
    align_features,
    chroma_features,
    compute_optimal_chroma_shift,
    dtw_path,
    make_path_strictly_monotonic,
    multiscale_dtw,
    _cost_matrix,
)
from music2midi_tpu.data.midi_tools import simple_adjust_times, transpose_midi
from music2midi_tpu.utils import numpy_to_midi

SR = 22050


def _tone_sequence(pitches, dur=0.5, sr=SR):
    out = []
    for p in pitches:
        f = 440.0 * 2 ** ((p - 69) / 12)
        t = np.arange(int(dur * sr)) / sr
        seg = np.sin(2 * np.pi * f * t) * np.hanning(len(t)) ** 0.2
        out.append(seg)
    return np.concatenate(out).astype(np.float32)


def test_chroma_identifies_pitch_class():
    y = _tone_sequence([60], dur=1.0)  # C4 -> chroma class 0
    c = chroma_features(y, SR, feature_rate=10)
    assert c.shape[0] == 12
    assert np.argmax(c.mean(axis=1)) == 0


def test_optimal_chroma_shift():
    a = chroma_features(_tone_sequence([60, 64, 67] * 3), SR, 10)
    b = chroma_features(_tone_sequence([63, 67, 70] * 3), SR, 10)
    # b is a transposed up by 3 semitones -> rolling b by -3... shift
    # semantics: roll(b, shift) == a means shift = -3 % 12 = 9
    shift = compute_optimal_chroma_shift(a, b, rate=1)
    assert shift == 9


def test_dtw_identity():
    rng = np.random.default_rng(3)
    f = rng.random((12, 24))  # distinct columns: diagonal uniquely optimal
    f = f / np.maximum(np.linalg.norm(f, axis=0), 1e-9)
    path = dtw_path(_cost_matrix(f, f))
    np.testing.assert_array_equal(path[0], path[1])


def test_dtw_shifted_sequence():
    # b is a delayed by 3 frames: the path should track the shift
    rng = np.random.default_rng(0)
    a = rng.random((12, 30))
    a = a / np.linalg.norm(a, axis=0)
    b = np.concatenate([a[:, :1]] * 3 + [a], axis=1)
    path = dtw_path(_cost_matrix(a, b))
    # end-to-end alignment reached
    assert path[0, -1] == 29 and path[1, -1] == 32
    mono = make_path_strictly_monotonic(path)
    assert (np.diff(mono[0]) > 0).all() and (np.diff(mono[1]) > 0).all()


def test_multiscale_matches_full_dtw_cost():
    rng = np.random.default_rng(1)
    a = rng.random((24, 300))
    a = a / np.linalg.norm(a, axis=0)
    idx = np.clip((np.arange(330) / 1.1).astype(int), 0, 299)
    b = a[:, idx]
    path = multiscale_dtw(a, b, coarse_factor=10, band_radius=30)
    assert path[0, -1] == 299 and path[1, -1] == 329
    # warp ratio along the path is ~1.1
    mono = make_path_strictly_monotonic(path)
    ratio = np.polyfit(mono[0], mono[1], 1)[0]
    assert 1.0 < ratio < 1.25


def test_end_to_end_warp_recovery():
    """Synthesize MIDI audio, stretch it 10%, check align_features recovers
    the stretch factor."""
    from music2midi_tpu.dsp import time_stretch

    # random pitches: an arithmetic circle-of-fifths walk is degenerate
    # (transpose-by-7 == one-note time shift, which DTW absorbs)
    rng = np.random.default_rng(4)
    pitches = rng.integers(50, 80, size=16)
    notes = np.array(
        [[i * 0.5, i * 0.5 + 0.45, int(p), 90]
         for i, p in enumerate(pitches)]
    )
    midi = numpy_to_midi(notes)
    midi_audio = midi.synthesize(fs=SR)
    song_audio = time_stretch(
        midi_audio.astype(np.float64), 1 / 1.1
    ).astype(np.float32)  # 10% slower
    wp, shift = align_features(song_audio, midi_audio, SR, feature_rate=50)
    assert shift == 0
    assert wp.shape[0] == 2 and wp.shape[1] > 50
    slope = np.polyfit(wp[1], wp[0], 1)[0]  # song time per midi time
    assert 1.04 < slope < 1.16, slope


def test_simple_adjust_times():
    notes = np.array([[0.0, 1.0, 60, 80], [1.0, 2.0, 64, 80]])
    midi = numpy_to_midi(notes)
    # warp: time t -> 2t
    out = simple_adjust_times(midi, np.array([0.0, 2.0]),
                              np.array([0.0, 4.0]))
    got = sorted((n.start, n.end) for n in out.instruments[0].notes)
    np.testing.assert_allclose(got, [(0.0, 2.0), (2.0, 4.0)])


def test_transpose_midi():
    midi = numpy_to_midi(np.array([[0.0, 1.0, 60, 80]]))
    transpose_midi(midi, -3)
    assert midi.instruments[0].notes[0].pitch == 57


# --------------------------------------------------------------------- #
# native DTW kernel parity + realistic warps (round-2)                   #
# --------------------------------------------------------------------- #


def _require_native():
    from music2midi_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    return native


def test_native_dtw_matches_python_full():
    native = _require_native()
    rng = np.random.default_rng(0)
    a = rng.random((24, 120))
    a /= np.linalg.norm(a, axis=0)
    idx = np.clip((np.arange(132) / 1.1).astype(int), 0, 119)
    b = a[:, idx] + 0.01 * rng.random((24, 132))
    b /= np.linalg.norm(b, axis=0)
    # python path on the float32-rounded features the kernel sees
    a32 = a.astype(np.float32).astype(np.float64)
    b32 = b.astype(np.float32).astype(np.float64)
    p_py = dtw_path(_cost_matrix(a32, b32))
    p_nat = native.dtw_band(a, b)
    np.testing.assert_array_equal(p_py, p_nat)


def test_native_dtw_matches_python_banded():
    native = _require_native()
    rng = np.random.default_rng(1)
    a = rng.random((24, 100))
    a /= np.linalg.norm(a, axis=0)
    b = rng.random((24, 110))
    b /= np.linalg.norm(b, axis=0)
    n, m = 100, 110
    anchor = np.arange(n) * m / n
    lo = np.maximum(0, (anchor - 12).astype(np.int64))
    hi = np.minimum(m, (anchor + 12).astype(np.int64) + 1)
    lo[0] = 0
    hi[-1] = m
    mask = np.zeros((n, m), bool)
    for i in range(n):
        mask[i, lo[i]:hi[i]] = True
    a32 = a.astype(np.float32).astype(np.float64)
    b32 = b.astype(np.float32).astype(np.float64)
    p_py = dtw_path(_cost_matrix(a32, b32), mask)
    p_nat = native.dtw_band(a, b, lo, hi)
    np.testing.assert_array_equal(p_py, p_nat)


def _piecewise_warp(times, knots_midi, knots_song):
    return np.interp(times, knots_midi, knots_song)


def _warped_midi_pair(rng, n_notes=80, transpose=0):
    """(midi, song_midi, warp knots): song = midi with a piecewise-linear
    tempo warp (1.25x slower then 0.85x faster) and optional key shift."""
    pitches = rng.integers(48, 84, n_notes)
    notes = np.array(
        [[i * 0.5, i * 0.5 + 0.45, int(p), 90]
         for i, p in enumerate(pitches)]
    )
    dur = n_notes * 0.5
    knots_midi = np.array([0.0, dur / 2, dur])
    knots_song = np.array([0.0, dur / 2 * 1.25, dur / 2 * 1.25 + dur / 2 * 0.85])
    warped = notes.copy()
    warped[:, 0] = _piecewise_warp(notes[:, 0], knots_midi, knots_song)
    warped[:, 1] = _piecewise_warp(notes[:, 1], knots_midi, knots_song)
    warped[:, 2] = np.clip(warped[:, 2] + transpose, 0, 127)
    return notes, warped, (knots_midi, knots_song)


def test_piecewise_tempo_warp_recovery():
    """Tempo varies mid-song (1.25x then 0.85x): the recovered warp path
    must track the piecewise-linear warp, not just a global slope."""
    rng = np.random.default_rng(11)
    notes, warped, (km, ks) = _warped_midi_pair(rng)
    midi_audio = numpy_to_midi(notes).synthesize(fs=SR)
    song_audio = numpy_to_midi(warped).synthesize(fs=SR).astype(np.float32)
    wp, shift = align_features(song_audio, midi_audio, SR, feature_rate=50)
    assert shift == 0
    expected_song_t = _piecewise_warp(wp[1], km, ks)
    err = np.abs(wp[0] - expected_song_t)
    assert np.median(err) < 0.15, float(np.median(err))
    # both halves individually tracked (a global-slope fit would fail one)
    first = wp[1] < km[1] * 0.8
    second = wp[1] > km[1] * 1.2
    assert np.median(err[first]) < 0.2 and np.median(err[second]) < 0.2


def test_keyshift_plus_warp_plus_noise():
    """Combined key shift (+4), piecewise tempo warp, and additive noise."""
    rng = np.random.default_rng(12)
    notes, warped, (km, ks) = _warped_midi_pair(rng, transpose=4)
    midi_audio = numpy_to_midi(notes).synthesize(fs=SR)
    song_audio = numpy_to_midi(warped).synthesize(fs=SR).astype(np.float32)
    song_audio = song_audio + 0.01 * rng.normal(
        size=len(song_audio)
    ).astype(np.float32)
    wp, shift = align_features(song_audio, midi_audio, SR, feature_rate=50)
    assert shift == 4
    err = np.abs(wp[0] - _piecewise_warp(wp[1], km, ks))
    assert np.median(err) < 0.2, float(np.median(err))


def test_three_minute_alignment_is_seconds_not_minutes():
    """The round-1 pure-Python DTW took minutes on a 3-minute song; the
    native banded kernel + blocked features must keep it in seconds."""
    import time

    _require_native()
    rng = np.random.default_rng(13)
    notes = np.array(
        [[i * 0.5, i * 0.5 + 0.45, int(p), 90]
         for i, p in enumerate(rng.integers(48, 84, 360))]
    )
    midi_audio = numpy_to_midi(notes).synthesize(fs=SR)
    idx = np.clip(
        (np.arange(int(len(midi_audio) * 1.08)) / 1.08).astype(int),
        0, len(midi_audio) - 1,
    )
    song_audio = midi_audio[idx].astype(np.float32)  # crude 8% slowdown
    t0 = time.perf_counter()
    wp, _ = align_features(song_audio, midi_audio, SR, feature_rate=50)
    elapsed = time.perf_counter() - t0
    assert elapsed < 30.0, f"alignment took {elapsed:.1f}s"
    slope = np.polyfit(wp[1], wp[0], 1)[0]
    assert 1.05 < slope < 1.11, slope

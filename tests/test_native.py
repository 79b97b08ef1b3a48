"""Native C++ DSP library parity vs the numpy/scipy reference paths."""

import numpy as np
import pytest

from music2midi_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_pitch_shift_matches_numpy():
    from music2midi_tpu.dsp import pitch_shift

    sr = 16000
    rng = np.random.default_rng(0)
    y = (np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
         + 0.1 * rng.normal(size=sr)).astype(np.float32)
    for steps in (-6, -1, 2, 5):
        a = pitch_shift(y, sr, steps, prefer_native=False)
        b = native.pitch_shift(y, sr, steps)
        assert len(a) == len(b) == sr
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_resample_matches_scipy():
    from scipy.signal import resample_poly

    rng = np.random.default_rng(1)
    x = rng.normal(size=12345).astype(np.float32)
    for up, down in [(160, 441), (2, 3), (3, 2), (441, 160)]:
        a = resample_poly(
            x, up, down, window=("kaiser", 14.769656459379492)
        ).astype(np.float32)
        b = native.resample(x, up, down)
        n = min(len(a), len(b))
        assert abs(len(a) - len(b)) <= 1
        np.testing.assert_allclose(a[:n], b[:n], atol=1e-5)


def test_fix_invalid_offsets_semantics():
    # reference data/midi_to_numpy.py:12-26: offset clamped to the next
    # same-pitch onset (strictly later; ties don't clamp each other)
    notes = np.array(
        [
            [0.0, 5.0, 60, 80],
            [1.0, 5.0, 60, 80],
            [1.0, 6.0, 60, 90],
            [2.0, 9.0, 60, 80],
            [0.5, 9.0, 62, 80],
        ]
    )
    fixed = native.fix_invalid_offsets(notes.copy())
    np.testing.assert_allclose(fixed[:, 1], [1.0, 2.0, 2.0, 9.0, 9.0])

    # matches a direct O(n^2) transcription of the reference semantics
    rng = np.random.default_rng(2)
    n = 200
    arr = np.stack(
        [
            rng.uniform(0, 30, n),
            rng.uniform(0, 35, n),
            rng.integers(60, 64, n).astype(float),
            np.full(n, 80.0),
        ],
        axis=1,
    )
    want = arr.copy()
    for pitch in np.unique(want[:, 2]):
        idx = want[:, 2] == pitch
        tmp = want[idx]
        for i in range(len(tmp)):
            for j in range(len(tmp)):
                if tmp[i, 0] < tmp[j, 0]:
                    tmp[i, 1] = min(tmp[i, 1], tmp[j, 0])
        want[idx] = tmp
    got = native.fix_invalid_offsets(arr.copy())
    np.testing.assert_allclose(got, want)


def test_dsp_dispatches_to_native():
    from music2midi_tpu.dsp import pitch_shift

    y = np.sin(2 * np.pi * 440 * np.arange(8000) / 16000).astype(np.float32)
    a = pitch_shift(y, 16000, 2)  # native preferred
    b = native.pitch_shift(y, 16000, 2)
    np.testing.assert_array_equal(a, b)

"""Chroma-accuracy metric tests on canned MIDI pairs (SURVEY.md §4)."""

import numpy as np
import pytest

from music2midi_tpu.evaluation import (
    evaluate_batch,
    extract_midi_melody,
    get_highest_pitches_from_piano_roll,
    melody_chroma_accuracy,
    midi_to_hz,
    raw_chroma_accuracy,
)
from music2midi_tpu.utils import numpy_to_midi


def test_midi_to_hz():
    assert midi_to_hz(np.array([69]))[0] == pytest.approx(440.0)
    assert midi_to_hz(np.array([60]))[0] == pytest.approx(261.6256, rel=1e-4)


def test_highest_pitch_extraction():
    roll = np.zeros((128, 5))
    roll[60, 0] = 80
    roll[64, 0] = 80  # chord: highest wins
    roll[50, 2] = 80
    out = get_highest_pitches_from_piano_roll(roll)
    np.testing.assert_array_equal(out, [64, 0, 50, 0, 0])


def test_identical_midi_scores_one():
    notes = np.array([[0.0, 0.5, 60, 80], [0.5, 1.0, 64, 80]])
    midi = numpy_to_midi(notes)
    score = evaluate_batch([midi], [numpy_to_midi(notes)])
    assert score == pytest.approx(1.0)


def test_octave_shift_still_scores_one():
    # chroma accuracy folds octaves
    a = numpy_to_midi(np.array([[0.0, 1.0, 60, 80]]))
    b = numpy_to_midi(np.array([[0.0, 1.0, 72, 80]]))
    assert evaluate_batch([a], [b]) == pytest.approx(1.0)


def test_pitch_bends_change_score():
    """Bends reach the evaluation roll (reference evaluation.py:29-35 via
    pretty_midi): a bend-carrying target scores differently vs a plain one."""
    from music2midi_tpu.midi import TimedEvent

    notes = np.array([[0.0, 1.0, 60, 80]])
    plain = numpy_to_midi(notes)
    bent = numpy_to_midi(notes)
    bent.instruments[0].pitch_bends.append(TimedEvent(0.5, 4096))
    same = evaluate_batch([plain], [numpy_to_midi(notes)])
    moved = evaluate_batch([bent], [numpy_to_midi(notes)])
    assert same == pytest.approx(1.0)
    # second half of the note is shifted to pitch 61 -> ~half the frames stop
    # matching
    assert moved == pytest.approx(0.51, abs=0.02)


def test_semitone_shift_scores_near_zero():
    a = numpy_to_midi(np.array([[0.0, 1.0, 60, 80]]))
    b = numpy_to_midi(np.array([[0.0, 1.0, 61, 80]]))
    # 99/100 frames mismatch by a semitone; the final frame is zero in BOTH
    # rolls (pretty_midi's times integration leaves the last column zero)
    # and pitch 0 is "voiced" under mir_eval's freq>0 rule, so it matches.
    assert evaluate_batch([a], [b]) == pytest.approx(0.01)


def test_half_overlap():
    # output covers only the first half of the target's note
    a = numpy_to_midi(np.array([[0.0, 2.0, 60, 80]]))
    b = numpy_to_midi(np.array([[0.0, 1.0, 60, 80]]))
    score = evaluate_batch([a], [b])
    # frames 0..99: match; frames 100..199: target voiced (60) vs output 0
    # -> chroma distance from pitch 60 to pitch 0 is a multiple of 12
    # semitones (60 = 5 octaves exactly) so folded distance is 0 -> matches!
    # This octave-fold quirk is inherited from the metric definition.
    assert score == pytest.approx(1.0)


def test_half_overlap_non_octave_pitch():
    a = numpy_to_midi(np.array([[0.0, 2.0, 62, 80]]))
    b = numpy_to_midi(np.array([[0.0, 1.0, 62, 80]]))
    score = evaluate_batch([a], [b])
    assert score == pytest.approx(0.5, abs=0.02)


def test_raw_chroma_only_counts_ref_voiced():
    ref_v = np.array([True, True, False, False])
    cents = np.array([100.0, 100.0, 100.0, 100.0])
    est = np.array([100.0, 1300.0, 0.0, 50.0])  # match, octave match, -, -
    assert raw_chroma_accuracy(ref_v, cents, est > 0, est) == 1.0


def test_melody_extraction_lengths_match():
    a = numpy_to_midi(np.array([[0.0, 1.0, 60, 80]]))
    b = numpy_to_midi(np.array([[0.0, 3.0, 64, 80]]))
    t, o = extract_midi_melody(a, b)
    assert len(t) == len(o) == 300


def test_batch_concatenation():
    x = numpy_to_midi(np.array([[0.0, 1.0, 60, 80]]))
    y = numpy_to_midi(np.array([[0.0, 1.0, 61, 80]]))
    # song1 perfect, song2 wrong -> pooled score 0.5
    score = evaluate_batch([x, x], [x, y])
    assert score == pytest.approx(0.5, abs=0.02)

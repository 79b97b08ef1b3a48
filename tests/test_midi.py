"""MIDI container + SMF read/write round-trip tests."""

import numpy as np

from music2midi_tpu.midi import Instrument, MidiFile, Note
from music2midi_tpu.utils import midi_to_numpy_notes, numpy_to_midi


def test_numpy_to_midi_basic():
    notes = np.array(
        [
            [0.0, 0.5, 60, 80],
            [0.5, 1.0, 64, 90],
            [1.0, 1.0, 67, 70],  # invalid: end == start -> removed
        ]
    )
    midi = numpy_to_midi(notes)
    assert len(midi.instruments) == 1
    assert len(midi.instruments[0].notes) == 2
    assert midi.get_end_time() == 1.0


def test_smf_roundtrip(tmp_path):
    notes = np.array(
        [
            [0.00, 0.50, 60, 80],
            [0.25, 0.75, 64, 90],
            [0.50, 2.00, 48, 100],
        ]
    )
    midi = numpy_to_midi(notes)
    path = tmp_path / "test.mid"
    midi.write(path)
    back = MidiFile(path)
    got = midi_to_numpy_notes(back)
    want = midi_to_numpy_notes(midi)
    # at resolution 384, tempo 120: 1 tick = 60/(120*384) s ≈ 1.3 ms
    np.testing.assert_allclose(got[:, :2], want[:, :2], atol=2e-3)
    np.testing.assert_array_equal(got[:, 2:], want[:, 2:])


def test_smf_roundtrip_random(tmp_path):
    rng = np.random.default_rng(7)
    n = 200
    onsets = np.sort(rng.uniform(0, 60, n))
    durations = rng.uniform(0.05, 3.0, n)
    pitches = rng.integers(21, 109, n)
    velocities = rng.integers(1, 128, n)
    notes = np.stack(
        [onsets, onsets + durations, pitches.astype(float),
         velocities.astype(float)], axis=1
    )
    # overlapping same-pitch notes merge under note-off pairing (that is the
    # pretty_midi-compatible behavior) — keep the round trip exact by
    # dropping overlaps
    keep, last_end = [], {}
    for i, (s, e, p, v) in enumerate(notes):
        if s > last_end.get(p, -1.0):
            keep.append(i)
            last_end[p] = e
    notes = notes[keep]
    midi = numpy_to_midi(notes)
    path = tmp_path / "rand.mid"
    midi.write(path)
    back = MidiFile(path)
    got = midi_to_numpy_notes(back)
    want = midi_to_numpy_notes(midi)
    assert got.shape == want.shape
    np.testing.assert_allclose(got[:, :2], want[:, :2], atol=2e-3)


def test_same_pitch_overlap_note_off_closes_all(tmp_path):
    """pretty_midi pairing semantics: a note-off closes every open note of
    that pitch started at an earlier tick."""
    midi = MidiFile(resolution=384, initial_tempo=120.0)
    inst = Instrument(program=0)
    # two overlapping same-pitch notes ending at the same off event after
    # write -> read both get the same end time
    inst.notes = [Note(0.0, 1.0, 60, 80), Note(0.5, 1.0, 60, 80)]
    midi.instruments.append(inst)
    path = tmp_path / "overlap.mid"
    midi.write(path)
    back = MidiFile(path)
    got = sorted(back.instruments[0].notes, key=lambda n: n.start)
    # the off at t=1.0 closes both opens; the second off is a no-op
    assert len(got) == 2
    assert abs(got[0].end - 1.0) < 2e-3 and abs(got[1].end - 1.0) < 2e-3


def test_piano_roll():
    notes = np.array([[0.0, 0.5, 60, 80], [0.25, 0.75, 64, 90]])
    midi = numpy_to_midi(notes)
    roll = midi.get_piano_roll(fs=100)
    assert roll.shape == (128, 75)
    assert (roll[60, :50] == 80).all()
    assert (roll[60, 50:] == 0).all()
    assert (roll[64, 25:75] == 90).all()


def test_piano_roll_with_times():
    notes = np.array([[0.0, 0.5, 60, 80]])
    midi = numpy_to_midi(notes)
    end = midi.get_end_time()
    times = np.arange(0, end, 0.01)
    roll = midi.get_piano_roll(fs=100, times=times)
    assert roll.shape == (128, len(times))
    # pretty_midi integrates over [times[n], times[n+1]) pairs only, so the
    # final column is always zero
    assert (roll[60, :49] == 80).all()
    assert (roll[:, 49] == 0).all()


def test_piano_roll_pitch_bend_whole_semitone():
    """+4096 bend units = exactly +1 semitone at the 2-semitone full range:
    the roll content shifts up one pitch row for the bent region."""
    from music2midi_tpu.midi import TimedEvent

    notes = np.array([[0.0, 1.0, 60, 80]])
    midi = numpy_to_midi(notes)
    midi.instruments[0].pitch_bends.append(TimedEvent(0.5, 4096))
    roll = midi.get_piano_roll(fs=100)
    assert roll.shape == (128, 100)
    assert (roll[60, :50] == 80).all()
    assert (roll[60, 50:] == 0).all()
    assert (roll[61, 50:] == 80).all()
    assert (roll[61, :50] == 0).all()


def test_piano_roll_pitch_bend_fractional():
    """+2048 units = +0.5 semitone: velocity is linearly split between the
    original row and the row above (pretty_midi's interpolation)."""
    from music2midi_tpu.midi import TimedEvent

    notes = np.array([[0.0, 1.0, 60, 80]])
    midi = numpy_to_midi(notes)
    midi.instruments[0].pitch_bends.append(TimedEvent(0.0, 2048))
    roll = midi.get_piano_roll(fs=100)
    assert np.allclose(roll[60, :100], 40.0)
    assert np.allclose(roll[61, :100], 40.0)
    assert (roll[62] == 0).all()


def test_piano_roll_negative_bend():
    from music2midi_tpu.midi import TimedEvent

    notes = np.array([[0.0, 1.0, 60, 80]])
    midi = numpy_to_midi(notes)
    midi.instruments[0].pitch_bends.append(TimedEvent(0.0, -4096))
    roll = midi.get_piano_roll(fs=100)
    assert (roll[59, :100] == 80).all()
    assert (roll[60] == 0).all()


def test_piano_roll_sustain_pedal():
    """CC64 >= 64 holds the running per-pitch max until release, like
    pretty_midi's default pedal_threshold=64."""
    from music2midi_tpu.midi import TimedEvent

    notes = np.array([[0.0, 0.5, 60, 80]])
    midi = numpy_to_midi(notes)
    midi.instruments[0].control_changes.append(TimedEvent(0.25, 100, 64))
    midi.instruments[0].control_changes.append(TimedEvent(0.9, 0, 64))
    roll = midi.get_piano_roll(fs=100)
    assert roll.shape == (128, 90)
    assert (roll[60, :90] == 80).all()
    # pedal off: nothing held
    roll_off = midi.get_piano_roll(fs=100, pedal_threshold=None)
    assert (roll_off[60, :50] == 80).all()
    assert (roll_off[60, 50:] == 0).all()


def test_tempo_change_parse(tmp_path):
    """Hand-build an SMF with a mid-file tempo change and check tick->sec."""
    import struct

    def varint(v):
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        return bytes(reversed(out))

    res = 480
    # track: tempo 120 at tick 0, tempo 60 at tick 480;
    # note on at tick 0, off at tick 960
    body = b"".join(
        [
            varint(0), bytes([0xFF, 0x51, 0x03]), (500000).to_bytes(3, "big"),
            varint(0), bytes([0x90, 60, 100]),
            varint(480), bytes([0xFF, 0x51, 0x03]),
            (1000000).to_bytes(3, "big"),
            varint(480), bytes([0x80, 60, 64]),
            varint(0), bytes([0xFF, 0x2F, 0x00]),
        ]
    )
    data = (
        b"MThd" + struct.pack(">IHHH", 6, 0, 1, res)
        + b"MTrk" + struct.pack(">I", len(body)) + body
    )
    path = tmp_path / "tempo.mid"
    path.write_bytes(data)
    midi = MidiFile(path)
    note = midi.instruments[0].notes[0]
    # first 480 ticks at 120bpm = 0.5s, next 480 at 60bpm = 1.0s
    assert abs(note.start - 0.0) < 1e-9
    assert abs(note.end - 1.5) < 1e-9


def test_get_beats():
    midi = numpy_to_midi(np.array([[0.0, 2.0, 60, 80]]))
    beats = midi.get_beats()
    # 120 bpm -> beats every 0.5s from 0 through 2.0
    np.testing.assert_allclose(beats, [0.0, 0.5, 1.0, 1.5, 2.0])


def test_synthesize():
    midi = numpy_to_midi(np.array([[0.0, 0.5, 69, 100]]))  # A4 = 440 Hz
    y = midi.synthesize(fs=8000)
    assert len(y) >= 4000
    # dominant frequency should be ~440Hz
    spec = np.abs(np.fft.rfft(y[:4000]))
    freq = np.fft.rfftfreq(4000, 1 / 8000)
    assert abs(freq[np.argmax(spec)] - 440) < 10

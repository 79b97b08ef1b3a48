"""Tokenizer contract tests.

Golden values derived by hand from the reference semantics
(reference music2midi/tokenizer.py:18-267); see SURVEY.md §4 for the seams.
Vocab: PAD=0 BOS=1 EOS=2 ONSET=3 OFFSET=4, pitch p -> 5+p, time t -> 133+t.
"""

import numpy as np
import pytest

from music2midi_tpu.tokenizer import BOS, EOS, OFFSET, ONSET, PAD, MidiTokenizer


@pytest.fixture(scope="module")
def tok():
    return MidiTokenizer()


def T(t):
    return 133 + t


def P(p):
    return 5 + p


def test_vocab_layout(tok):
    assert tok.pitch_token_offset == 5
    assert tok.time_token_offset == 133
    assert tok.num_time_tokens == 200
    assert tok.time_step == 0.05


def test_empty_notes(tok):
    assert tok.encode(np.zeros((0, 4))).tolist() == [EOS]


def test_single_note(tok):
    # C4 at 0.10s..0.20s -> time_2 ONSET p60, time_4 OFFSET p60, EOS
    notes = np.array([[0.10, 0.20, 60, 80]])
    expected = [T(2), ONSET, P(60), T(4), OFFSET, P(60), EOS]
    assert tok.encode(notes).tolist() == expected


def test_onset_offset_same_time_index(tok):
    # two notes: one offsets exactly when the other onsets
    notes = np.array([[0.0, 0.1, 60, 80], [0.1, 0.2, 62, 80]])
    expected = [
        T(0), ONSET, P(60),
        T(2), ONSET, P(62), OFFSET, P(60),
        T(4), OFFSET, P(62),
        EOS,
    ]
    assert tok.encode(notes).tolist() == expected


def test_half_up_rounding(tok):
    # 0.125s / 0.05 = 2.5 -> rounds UP to 3 (reference uses
    # rint(nextafter(x, x+1)), not banker's rounding)
    notes = np.array([[0.125, 0.30, 60, 80]])
    assert tok.encode(notes).tolist()[0] == T(3)
    # 0.075/0.05 = 1.5 -> 2
    notes = np.array([[0.075, 0.30, 60, 80]])
    assert tok.encode(notes).tolist()[0] == T(2)


def test_min_note_length_one_step(tok):
    # zero-length note: offset clamped to onset + 0.05s before quantization
    notes = np.array([[0.10, 0.10, 60, 80]])
    expected = [T(2), ONSET, P(60), T(3), OFFSET, P(60), EOS]
    assert tok.encode(notes).tolist() == expected


def test_time_clip_at_199(tok):
    # onset beyond the 10s vocab is clipped to index 199; offset too
    notes = np.array([[12.0, 13.0, 60, 80]])
    expected = [T(199), ONSET, P(60), OFFSET, P(60), EOS]
    assert tok.encode(notes).tolist() == expected


def test_cutoff_time_encode(tok):
    notes = np.array([[0.0, 0.1, 60, 80], [5.0, 5.5, 62, 80]])
    toks = tok.encode(notes, cutoff_time=1.0).tolist()
    assert P(62) not in toks
    assert toks[-1] == EOS


def test_batch_padding(tok):
    batch = tok(
        [np.array([[0.0, 0.1, 60, 80]]), np.zeros((0, 4))]
    )
    assert batch.shape[0] == 2
    assert batch.dtype == np.int64
    assert batch[1, 0] == EOS
    assert (batch[1, 1:] == PAD).all()


def test_roundtrip_simple(tok):
    notes = np.array(
        [
            [0.00, 0.50, 60, 80],
            [0.25, 0.75, 64, 80],
            [1.00, 2.00, 67, 80],
        ]
    )
    toks = tok.encode(notes)
    dec = tok.decode([toks], mode="batched")[0]
    # round trip is exact for quantized, <=10s inputs; velocity forced to 80
    np.testing.assert_allclose(dec[:, :2], notes[:, :2], atol=1e-9)
    np.testing.assert_array_equal(dec[:, 2], notes[:, 2])
    np.testing.assert_array_equal(dec[:, 3], 80)


def test_roundtrip_random_quantized(tok):
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = rng.integers(1, 60)
        onsets = rng.integers(0, 150, size=n) * 0.05
        durations = rng.integers(1, 40, size=n) * 0.05
        offsets = np.minimum(onsets + durations, 9.95)
        pitches = rng.integers(21, 109, size=n)
        # avoid overlapping same-pitch notes (undefined round trip order)
        notes = np.stack(
            [onsets, offsets, pitches.astype(float), np.full(n, 80.0)], axis=1
        )
        _, unique_idx = np.unique(notes[:, [0, 2]], axis=0, return_index=True)
        notes = notes[sorted(unique_idx)]
        toks = tok.encode(notes)
        dec = tok.decode([toks], mode="batched")[0]
        # decoded set of (onset, pitch) must match; offsets may merge when
        # same-pitch notes overlap
        got = set(map(tuple, np.round(dec[:, [0, 2]], 6)))
        want = set(map(tuple, np.round(notes[:, [0, 2]], 6)))
        assert got == want


def test_decode_drops_open_notes(tok):
    toks = [T(0), ONSET, P(60), EOS]
    dec = tok.decode([np.array(toks)])[0]
    assert dec.shape == (0, 4)


def test_decode_offset_closes_all_open_matching(tok):
    # reference quirk: one OFFSET closes every open note of that pitch with
    # strictly earlier onset (tokenizer.py:256-265)
    toks = [T(0), ONSET, P(60), T(1), ONSET, P(60), T(3), OFFSET, P(60), EOS]
    dec = tok.decode([np.array(toks)])[0]
    assert dec.shape[0] == 2
    np.testing.assert_allclose(sorted(dec[:, 0]), [0.0, 0.05])
    np.testing.assert_allclose(dec[:, 1], [0.15, 0.15])


def test_decode_offset_needs_strictly_earlier_onset(tok):
    # onset and offset at the same time index -> note never closed -> dropped
    toks = [T(5), ONSET, P(60), OFFSET, P(60), EOS]
    dec = tok.decode([np.array(toks)])[0]
    assert dec.shape[0] == 0


def test_decode_stops_at_eos_skips_pad_bos(tok):
    toks = [BOS, PAD, T(0), ONSET, P(60), T(2), OFFSET, P(60), EOS, T(4),
            ONSET, P(70)]
    dec = tok.decode([np.array(toks)])[0]
    assert dec.shape[0] == 1
    assert dec[0, 2] == 60


def test_decode_invalid_token_acts_as_time(tok):
    # tokens in [333, 400) decode as time indices >= 200
    # (reference treats any token >= 133 as time, tokenizer.py:187-189)
    toks = [T(0), ONSET, P(60), 333, OFFSET, P(60), EOS]
    dec = tok.decode([np.array(toks)])[0]
    assert dec.shape[0] == 1
    np.testing.assert_allclose(dec[0, 1], 200 * 0.05)


def test_decode_pitch_carries_across_markers(tok):
    # pitch token without complete state is retained until consumed
    # ([time ONSET p time2 p2 ONSET] emits p2 at time2 on the ONSET marker)
    toks = [T(0), ONSET, P(60), T(2), P(62), ONSET, T(4), OFFSET, P(60),
            P(62), EOS]
    dec = tok.decode([np.array(toks)])[0]
    assert {(r[0], r[2]) for r in dec} == {(0.0, 60.0), (0.1, 62.0)}


def test_sequential_mode_stitching(tok):
    # two 3-second chunks: second chunk's times shifted by 60 steps = 3s
    chunk0 = np.array([T(0), ONSET, P(60), T(2), OFFSET, P(60), EOS])
    chunk1 = np.array([T(0), ONSET, P(64), T(2), OFFSET, P(64), EOS])
    notes = tok.decode([chunk0, chunk1], mode="sequential",
                       duration_per_batch=3.0)
    np.testing.assert_allclose(notes[:, 0], [0.0, 3.0])
    np.testing.assert_allclose(notes[:, 1], [0.1, 3.1])


def test_sequential_mode_no_carry_across_chunks(tok):
    # an open note at the end of chunk 0 is dropped, not closed by chunk 1
    chunk0 = np.array([T(0), ONSET, P(60), EOS])
    chunk1 = np.array([T(2), OFFSET, P(60), EOS])
    notes = tok.decode([chunk0, chunk1], mode="sequential",
                       duration_per_batch=3.0)
    assert notes.shape[0] == 0


def test_sequential_requires_duration(tok):
    with pytest.raises(ValueError):
        tok.decode([np.array([EOS])], mode="sequential")


def test_decode_cutoff(tok):
    toks = [T(0), ONSET, P(60), T(40), OFFSET, P(60), T(50), ONSET, P(62),
            T(60), OFFSET, P(62), EOS]
    dec = tok.decode([np.array(toks)], cutoff_time=1.0)[0]
    # note at 2.5s dropped; first note's offset truncated to 1.0
    assert dec.shape[0] == 1
    np.testing.assert_allclose(dec[0], [0.0, 1.0, 60.0, 80.0])


def test_to_string(tok):
    assert tok.to_string([PAD, BOS, EOS, ONSET, OFFSET, P(60), T(0)]) == [
        "PAD", "BOS", "EOS", "ONSET", "OFFSET", "note_60", "time_0"
    ]

"""The pinned serving pitch-calibration gate, as a library.

One fixture, one verdict, three consumers: the CLI promotion gate
(``tools/calibration_check.py``), the fast-suite test
(``tests/test_calibration_gate.py``), and the chain promote step
(``tools/chain_lib.sh::promote_record``).  The r4 regression shipped
because the gate lived only in a slow-marked test; factoring it here is
what makes it mechanically unskippable (VERDICT r4 "next round" #3).

The fixture is a sparse A4 figure rendered by the corpus synth at
22050 Hz and pushed through the TRUE serving path
(``Music2MIDI.from_npz`` -> ``generate``'s 16 kHz resample — the same
contract as the reference's /root/reference/music2midi/model.py:84).
It catches two historical failure classes:

* a broken resample/mel frame (everything transposed ~5.5 semitones,
  22050/16000 — the r1 "+5 semitone" scare), and
* the r4 noise-floor regression: mixed-domain fine-tunes that return
  ZERO notes on digitally clean audio (no noise floor drives log-mel to
  the 1e-6 clamp, an input those fine-tunes never saw).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def render_fixture() -> tuple[np.ndarray, int]:
    """The pinned A4 figure: four 1.5 s notes on a 3 s grid, corpus synth,
    22050 Hz, float32 — identical to
    tests/test_transcribe_real_recording.py::test_serving_pitch_calibration."""
    from music2midi_tpu.utils import numpy_to_midi

    notes = np.array(
        [[k * 3.0, k * 3.0 + 1.5, 69, 90] for k in range(4)], np.float64
    )
    wav = numpy_to_midi(notes).synthesize(fs=22050).astype(np.float32)
    return wav, 22050


def check_midi(mf) -> tuple[bool, str]:
    """Apply the pinned assertions to a generated MidiFile."""
    got = mf.instruments[0].notes if mf.instruments else []
    a4 = [n for n in got if n.pitch == 69]
    onset_bins = {int(round(n.start / 3.0)) for n in a4}
    shifted = sum(1 for n in got if n.pitch in (74, 75))
    ok = (len(got) > 0 and len(a4) >= 3 and len(onset_bins) >= 3
          and shifted <= len(a4) // 2)
    detail = (f"notes={len(got)} a4={len(a4)} onset_bins={len(onset_bins)} "
              f"shifted={shifted} pitches={sorted({n.pitch for n in got})}")
    return ok, detail


def check_checkpoint(ckpt: str | Path, **overrides) -> tuple[bool, str]:
    """Run the gate on one npz checkpoint through the full serving path.

    Writes the fixture to a temp wav so ``generate(audio_path=...)``
    exercises the same decode+resample branch evaluate.py and the webui
    use.  CPU-safe: caller is responsible for pinning jax to CPU first
    (the CLI and the test conftest both do).  ``overrides`` set engine
    attributes before generating (e.g. ``input_dither=0.0,
    mel_noise_floor=0.003`` to gate a non-default serving normalization
    — PERFORMANCE.md r5clamp).
    """
    import tempfile

    from music2midi_tpu.audio import write_wav
    from music2midi_tpu.infer import Music2MIDI

    wav, sr = render_fixture()
    with tempfile.TemporaryDirectory() as td:
        path = str(Path(td) / "a4_22050.wav")
        write_wav(path, wav, sr)
        engine = Music2MIDI.from_npz(str(ckpt))
        for name, value in overrides.items():
            assert hasattr(engine, name), name
            setattr(engine, name, value)
        mf = engine.generate(audio_path=path)
    return check_midi(mf)

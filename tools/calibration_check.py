#!/usr/bin/env python
"""Serving pitch-calibration gate as a CLI: can this checkpoint transcribe
the pinned sparse in-domain figure at all, at the right pitch?

Same fixture and assertions as
tests/test_transcribe_real_recording.py::test_serving_pitch_calibration
(an A4 figure rendered by the corpus synth at 22050 Hz, loaded through
``generate``'s true-16 kHz resample — the reference's own serving path,
/root/reference/music2midi/model.py:84).  The r4mix/r4piano fine-tunes
exposed why this must be a promotion gate and not only a test: a model
can GAIN mean corpus chroma (dense multi-voice songs) while silently
losing the ability to transcribe sparse solo audio — both 4k-step
mixed-domain fine-tunes return ZERO notes on this figure while their
r4s400 ancestor returns 40.

Usage:
    python tools/calibration_check.py CKPT.npz [CKPT.npz ...]

Prints one line per checkpoint: ``PASS``/``FAIL`` with note evidence;
exits 0 iff every checkpoint passes.  CPU-only (never touches the TPU),
safe to run while a TPU holder is live.
"""
from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def check(ckpt: str, wav_path: str) -> tuple[bool, str]:
    from music2midi_tpu.infer import Music2MIDI

    mf = Music2MIDI.from_npz(ckpt).generate(audio_path=wav_path)
    got = mf.instruments[0].notes if mf.instruments else []
    a4 = [n for n in got if n.pitch == 69]
    onset_bins = {int(round(n.start / 3.0)) for n in a4}
    shifted = sum(1 for n in got if n.pitch in (74, 75))
    ok = (len(got) > 0 and len(a4) >= 3 and len(onset_bins) >= 3
          and shifted <= len(a4) // 2)
    detail = (f"notes={len(got)} a4={len(a4)} onset_bins={len(onset_bins)} "
              f"shifted={shifted} pitches={sorted({n.pitch for n in got})}")
    return ok, detail


def main() -> int:
    from music2midi_tpu.audio import write_wav
    from music2midi_tpu.utils import numpy_to_midi

    ckpts = sys.argv[1:]
    if not ckpts:
        print(__doc__)
        return 2
    notes = np.array(
        [[k * 3.0, k * 3.0 + 1.5, 69, 90] for k in range(4)], np.float64
    )
    wav = numpy_to_midi(notes).synthesize(fs=22050).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        path = str(Path(td) / "a4_22050.wav")
        write_wav(path, wav, 22050)
        all_ok = True
        for ckpt in ckpts:
            ok, detail = check(ckpt, path)
            print(f"{'PASS' if ok else 'FAIL'} {ckpt}: {detail}")
            all_ok &= ok
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

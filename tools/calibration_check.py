#!/usr/bin/env python
"""Serving pitch-calibration gate as a CLI: can this checkpoint transcribe
the pinned sparse in-domain figure at all, at the right pitch?

Thin CLI over ``music2midi_tpu.calibration`` — the same fixture and
assertions as tests/test_calibration_gate.py and
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
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    from music2midi_tpu.calibration import check_checkpoint

    ckpts = sys.argv[1:]
    if not ckpts:
        print(__doc__)
        return 2
    all_ok = True
    for ckpt in ckpts:
        ok, detail = check_checkpoint(ckpt)
        print(f"{'PASS' if ok else 'FAIL'} {ckpt}: {detail}")
        all_ok &= ok
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

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
    import argparse

    from music2midi_tpu.calibration import check_checkpoint

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpts", nargs="+")
    ap.add_argument(
        "--dither", type=float, default=None,
        help="override Music2MIDI.input_dither for the gate run")
    ap.add_argument(
        "--mel_floor", type=float, default=None,
        help="override Music2MIDI.mel_noise_floor (r5clamp) for the "
             "gate run")
    args = ap.parse_args()
    overrides = {}
    if args.dither is not None:
        overrides["input_dither"] = args.dither
    if args.mel_floor is not None:
        overrides["mel_noise_floor"] = args.mel_floor
    all_ok = True
    for ckpt in args.ckpts:
        ok, detail = check_checkpoint(ckpt, **overrides)
        print(f"{'PASS' if ok else 'FAIL'} {ckpt}: {detail}")
        all_ok &= ok
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Map the density x floor OOD boundary (PERFORMANCE.md r5bare diagnosis).

The r5bare fine-tune trained on floor-free but DENSE songs and still
emitted zero notes on the sparse clean calibration fixture; hypothesis:
the OOD axis is note coverage (duty cycle) x background floor, not
floor alone.  This probe renders the calibration figure (A4 on a 3 s
grid, corpus synth, 22050 Hz — music2midi_tpu/calibration.py) at duty
cycles {1.0, 0.75, 0.5, 0.25} x background {digital silence, 0.003 RMS
white noise} and transcribes each cell through the TRUE serving path
(from_npz -> generate, bare defaults) for each given checkpoint.

Prints one table row per (checkpoint, duty, floor): n_notes and n_A4.
CPU-only diagnostic — no gate, nothing pinned.

Usage:
    python tools/probe_density.py CKPT.npz [CKPT.npz ...]
"""
from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

DUTIES = (1.0, 0.75, 0.5, 0.25)
FLOORS = (0.0, 0.003)


def render(duty: float, floor: float) -> tuple[np.ndarray, int]:
    from music2midi_tpu.utils import numpy_to_midi

    sr = 22050
    notes = np.array(
        [[k * 3.0, k * 3.0 + 3.0 * duty, 69, 90] for k in range(4)],
        np.float64,
    )
    wav = numpy_to_midi(notes).synthesize(fs=sr).astype(np.float32)
    if floor > 0.0:
        rng = np.random.default_rng(0)
        wav = wav + floor * rng.standard_normal(len(wav)).astype(np.float32)
    return wav, sr


def main() -> None:
    from music2midi_tpu.audio import write_wav
    from music2midi_tpu.infer import Music2MIDI

    ckpts = sys.argv[1:]
    if not ckpts:
        ckpts = ["checkpoints/model_of_record.npz"]
    print(f"{'checkpoint':42s} {'duty':>5s} {'floor':>6s} "
          f"{'notes':>6s} {'A4':>4s}")
    for ckpt in ckpts:
        engine = Music2MIDI.from_npz(ckpt)
        name = Path(ckpt).name
        for duty in DUTIES:
            for floor in FLOORS:
                wav, sr = render(duty, floor)
                with tempfile.TemporaryDirectory() as td:
                    path = str(Path(td) / "probe.wav")
                    write_wav(path, wav, sr)
                    mf = engine.generate(audio_path=path)
                got = mf.instruments[0].notes if mf.instruments else []
                a4 = sum(1 for n in got if n.pitch == 69)
                print(f"{name:42s} {duty:5.2f} {floor:6.3f} "
                      f"{len(got):6d} {a4:4d}", flush=True)


if __name__ == "__main__":
    main()

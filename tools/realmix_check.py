#!/usr/bin/env python
"""Real-recording transfer probe as a CLI: how well does a checkpoint
transcribe a REAL produced mix?

Same fixture and metrics as
tests/test_transcribe_real_recording.py::test_model_of_record_transcribes_real_recording
(pygame's examples/data/house_lo.wav — a real house loop with drums,
bass and chords, tiled to ~21 s), the honest quality frontier now that
in-domain chroma is ~0.90 (VERDICT r4 missing #3 / next #5).  For each
checkpoint it prints:

    n_notes  — structural floor (>= 30 in the pinned test)
    overlap  — |top-3 duration-weighted note pitch classes  ∩
                audio's top-4 framewise chroma classes|  (pinned >= 1;
                the r4 record measures 1 — the tracked gap)
    top_notes / audio_top4 — the histograms themselves

Usage:
    python tools/realmix_check.py CKPT.npz [CKPT.npz ...]

Exit 0 iff every checkpoint clears the pinned floors (n_notes >= 30 and
overlap >= 1).  CPU-only, safe while a TPU holder is live.  Reference
contract: generate() on arbitrary real serving audio
(/root/reference/music2midi/model.py:84).
"""
from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def real_loop() -> tuple[np.ndarray, int] | None:
    try:
        import pygame  # noqa: F401
    except Exception:
        return None
    p = Path(pygame.__file__).parent / "examples" / "data" / "house_lo.wav"
    if not p.exists():
        return None
    from music2midi_tpu.audio import load

    y, sr = load(p, sr=16000)
    return np.tile(y, 3), sr  # ~21 s: two full decode chunks


def check(ckpt: str, y: np.ndarray, sr: int) -> tuple[bool, str]:
    from music2midi_tpu.data.align import chroma_features
    from music2midi_tpu.infer import Music2MIDI

    mf = Music2MIDI.from_npz(ckpt).generate(audio_y=y, sr=sr)
    notes = mf.instruments[0].notes if mf.instruments else []
    weights = Counter()
    for n in notes:
        weights[n.pitch % 12] += n.end - n.start
    top_notes = {pc for pc, _ in weights.most_common(3)}
    chroma = chroma_features(y, sr)  # (12, T)
    frame_hist = np.bincount(np.argmax(chroma, axis=0), minlength=12)
    top_audio = set(np.argsort(frame_hist)[-4:].tolist())
    overlap = len(top_notes & top_audio)
    ok = len(notes) >= 30 and overlap >= 1
    detail = (f"n_notes={len(notes)} overlap={overlap} "
              f"top_notes={sorted(top_notes)} audio_top4={sorted(top_audio)}")
    return ok, detail


def main() -> int:
    ckpts = sys.argv[1:]
    if not ckpts:
        print(__doc__)
        return 2
    fixture = real_loop()
    if fixture is None:
        print("SKIP: pygame example audio not installed")
        return 0
    y, sr = fixture
    all_ok = True
    for ckpt in ckpts:
        ok, detail = check(ckpt, y, sr)
        print(f"{'PASS' if ok else 'FAIL'} {ckpt}: {detail}")
        all_ok &= ok
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

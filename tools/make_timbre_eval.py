#!/usr/bin/env python
"""Timbre-generalization eval corpus: re-render one split of a synthesized
corpus with the realistic-piano voice, reusing labels/metadata/split verbatim.

Why this is sound: a synthetic corpus's performance MIDI is a pure
function of (seed, song index, duration) — `compose_song` + `warp_notes`
in data/synthesize_corpus.py — and `render_piano` changes WHAT the notes
sound like, never WHEN.  The `midi_numpy/` labels were produced by
aligning the source corpus's clean render; identical note timing means
they remain exactly valid for the re-rendered audio.  A zero-shot
`evaluate.py` run on the output dir therefore measures pure TIMBRE
generalization, per-song paired against the source-corpus scores (same
compositions, same labels, same split ids).

Before rendering, the seed derivation is verified: the first split song
is re-rendered through the source profile's exact clean path and must be
byte-identical to the source corpus's wav (catches a wrong --seed or
--duration immediately instead of silently scoring mismatched audio).

Usage (the r4 timbre probe):

    python tools/make_timbre_eval.py /root/runs/corpus400 \
        /root/runs/corpus400piano
    python evaluate.py /root/runs/corpus400piano --name r4timbre-zeroshot
"""
import argparse
import os
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "data"))

from music2midi_tpu.audio import write_wav  # noqa: E402

from synthesize_corpus import (  # noqa: E402
    compose_song, render_piano, warp_notes,
)


def _song_index(pid: str) -> int:
    if not pid.startswith("synth"):
        raise ValueError(
            f"id {pid!r} is not a synthesize_corpus id (synthNNN) — this "
            "tool only re-renders corpora built by data/synthesize_corpus.py"
        )
    return int(pid[len("synth"):])


def _link(src: Path, dst: Path) -> None:
    if not src.exists():
        raise FileNotFoundError(src)
    target = src.resolve()
    if dst.is_symlink():
        if Path(os.readlink(dst)) == target:
            return
        dst.unlink()
    elif dst.exists():
        raise FileExistsError(f"{dst} exists and is not a symlink")
    os.symlink(target, dst)


def _clean_render(performed, i: int, args) -> np.ndarray:
    """The source corpus's exact clean-profile audio path (render + noise
    draw order and dtypes as in synthesize_corpus.main), for byte-identity
    verification against the source wav."""
    rng = np.random.default_rng([args.seed, i])
    y = performed.synthesize(fs=args.sample_rate).astype(np.float32)
    if args.noise > 0:
        y = y + rng.normal(0.0, args.noise, len(y)).astype(np.float32)
    peak = float(np.abs(y).max())
    if peak > 0:
        y *= 0.8 / peak
    return y


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src", type=Path, help="prepared clean-profile corpus")
    ap.add_argument("dst", type=Path)
    ap.add_argument("--split", default="test",
                    choices=["test", "val", "train"])
    # must match the source corpus's synthesize_corpus invocation
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--duration", type=float, default=40.0)
    ap.add_argument("--sample_rate", type=int, default=22050)
    ap.add_argument("--noise", type=float, default=0.003)
    ap.add_argument("--no_verify", action="store_true",
                    help="skip the byte-identity check of the seed "
                         "derivation against the source corpus")
    args = ap.parse_args()

    split = np.load(args.src / "dataset_split.npz", allow_pickle=True)
    ids = [str(p) for p in split[f"{args.split}_id"]]
    if not ids:
        raise SystemExit(f"{args.split} split of {args.src} is empty")

    for sub in ("audio", "midi_numpy", "metadata"):
        (args.dst / sub).mkdir(parents=True, exist_ok=True)
    shutil.copy2(args.src / "dataset_split.npz",
                 args.dst / "dataset_split.npz")

    verified = args.no_verify
    for pid in ids:
        i = _song_index(pid)
        for sub, ext in (("midi_numpy", ".npy"), ("metadata", ".yaml")):
            _link(args.src / sub / f"{pid}{ext}",
                  args.dst / sub / f"{pid}{ext}")
        wav_path = args.dst / "audio" / f"{pid}.wav"
        if wav_path.exists():
            print(f"{pid}: exists, skipped")
            continue
        song_seed = args.seed * 1000 + i
        score = compose_song(song_seed, args.duration)
        performed = warp_notes(score, song_seed, max_dev=0.05)
        if not verified:
            got = _clean_render(performed, i, args)
            tmp = args.dst / "audio" / f".verify_{pid}.wav"
            write_wav(tmp, got, args.sample_rate)
            same = (tmp.read_bytes()
                    == (args.src / "audio" / f"{pid}.wav").read_bytes())
            tmp.unlink()
            if not same:
                raise SystemExit(
                    f"seed-derivation check FAILED on {pid}: the re-derived "
                    "clean render differs from the source wav — wrong "
                    "--seed/--duration/--noise/--sample_rate for this corpus?"
                )
            print(f"{pid}: seed derivation verified (byte-identical clean "
                  "render)")
            verified = True
        rng = np.random.default_rng([args.seed, i, 88])
        y = render_piano(performed, args.sample_rate, rng)
        if args.noise > 0:
            y = y + rng.normal(0.0, args.noise, len(y)).astype(np.float32)
        peak = float(np.abs(y).max())
        if peak > 0:
            y *= 0.8 / peak
        write_wav(wav_path, y, args.sample_rate)
        print(f"{pid}: piano render, {len(y) / args.sample_rate:.1f}s")
    print(f"{args.dst}: {len(ids)} {args.split} songs re-rendered "
          "(labels/metadata/split symlinked from the source)")


if __name__ == "__main__":
    main()

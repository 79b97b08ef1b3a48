"""Prep stage 0 (offline alternative): synthesize a self-contained corpus.

The reference's data source is YouTube piano covers
(/root/reference/data/download_youtube.py) — unusable in an offline
environment and unusable in CI.  This stage generates a fully synthetic but
*musically structured* corpus in the exact layout stage 1 expects
(/root/reference/dataset.md:1-22): for each song

    audio/{id}.wav      the "cover recording": the composition rendered at
                        22050 Hz through the additive synth, under a random
                        piecewise tempo warp (+-5%) and optional noise —
                        so align_audio_midi has real work to do
    midi/{id}.mid       the unaligned 2-track score (melody + accompaniment,
                        passing generate_split's 2-track filter)
    metadata/{id}.yaml  {piano: {id, genre, difficulty}} as the downloader
                        writes (/root/reference/data/download_youtube.py:69)

Compositions are seeded and tonal (diatonic progression, chord-tone melody,
root-fifth bass) so that melody chroma accuracy on a model trained on this
corpus is a meaningful signal rather than noise.

After this stage, run the REAL chain unchanged:

    python data/align_audio_midi.py DATA_DIR
    python data/midi_to_numpy.py   DATA_DIR
    python data/compute_metrics.py DATA_DIR
    python data/generate_split.py  DATA_DIR
    python train.py DATA_DIR ...
    python evaluate.py DATA_DIR --ckpt ...
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import numpy as np
import yaml

from music2midi_tpu.audio import write_wav
from music2midi_tpu.config import resolve_config
from music2midi_tpu.midi import Instrument, MidiFile, Note

MAJOR = np.array([0, 2, 4, 5, 7, 9, 11])
# diatonic triads on scale degrees used by the progression pool
PROGRESSIONS = [
    [0, 4, 5, 3],   # I  V  vi IV
    [0, 3, 4, 4],   # I  IV V  V
    [5, 3, 0, 4],   # vi IV I  V
    [0, 5, 3, 4],   # I  vi IV V
]


def _triad(root_degree: int, key_root: int, octave: int) -> list:
    """Pitches of the diatonic triad on `root_degree` of the major key."""
    out = []
    for step in (0, 2, 4):
        d = root_degree + step
        out.append(key_root + 12 * (octave + d // 7) + int(MAJOR[d % 7]))
    return out


def compose_song(seed: int, duration: float) -> MidiFile:
    """One seeded 2-track composition: melody (chord tones + passing notes,
    2-4 notes/s) over block-chord accompaniment with a root-fifth bass."""
    rng = np.random.default_rng(seed)
    key_root = int(rng.integers(0, 12))
    prog = PROGRESSIONS[int(rng.integers(len(PROGRESSIONS)))]
    bar = float(rng.choice([1.6, 2.0, 2.4]))  # 100-150 bpm, 4/4
    n_bars = int(np.ceil(duration / bar))

    melody = Instrument(program=0, name="melody")
    accomp = Instrument(program=0, name="accompaniment")

    for b in range(n_bars):
        t0 = b * bar
        degree = prog[b % len(prog)]
        chord = _triad(degree, key_root, octave=5)
        # accompaniment: block chord each half bar + root-fifth bass
        for half in (0.0, 0.5):
            s = t0 + half * bar
            for p in _triad(degree, key_root, octave=4):
                accomp.notes.append(
                    Note(start=s, end=s + 0.45 * bar, pitch=p,
                         velocity=int(rng.integers(55, 75)))
                )
        bass_root = key_root + 36 + int(MAJOR[degree % 7])
        accomp.notes.append(Note(start=t0, end=t0 + 0.5 * bar,
                                 pitch=bass_root,
                                 velocity=int(rng.integers(70, 90))))
        accomp.notes.append(Note(start=t0 + 0.5 * bar, end=t0 + bar,
                                 pitch=bass_root + 7,
                                 velocity=int(rng.integers(60, 80))))
        # melody: one note per beat-ish slot, chord tone or diatonic
        # neighbour, held 60-95% of the slot
        slots = int(rng.integers(2, 5))
        for k in range(slots):
            s = t0 + k * bar / slots
            if rng.random() < 0.7:
                p = int(rng.choice(chord))
            else:
                p = key_root + 60 + int(MAJOR[int(rng.integers(7))])
            melody.notes.append(
                Note(start=s, end=s + bar / slots * rng.uniform(0.6, 0.95),
                     pitch=p + 12, velocity=int(rng.integers(75, 105)))
            )

    midi = MidiFile()
    midi.instruments = [melody, accomp]
    return midi


def warp_notes(midi: MidiFile, seed: int, max_dev: float = 0.05) -> MidiFile:
    """Piecewise-linear tempo warp: a smooth random time map with local
    rate in [1-max_dev, 1+max_dev] — the 'human performance' the aligner
    must recover (cf. the real covers the reference aligns,
    /root/reference/data/align_audio_midi.py:251-310)."""
    rng = np.random.default_rng(seed ^ 0x5EED)
    end = midi.get_end_time() + 1.0
    knots_t = np.linspace(0.0, end, max(3, int(end / 8.0) + 2))
    rates = rng.uniform(1.0 - max_dev, 1.0 + max_dev, len(knots_t) - 1)
    knots_w = np.concatenate([[0.0], np.cumsum(np.diff(knots_t) * rates)])

    def warp(t):
        return np.interp(t, knots_t, knots_w)

    out = MidiFile()
    for inst in midi.instruments:
        w = Instrument(program=inst.program, is_drum=inst.is_drum,
                       name=inst.name)
        for n in inst.notes:
            s, e = float(warp(n.start)), float(warp(n.end))
            if e > s:
                w.notes.append(Note(start=s, end=e, pitch=n.pitch,
                                    velocity=n.velocity))
        out.instruments.append(w)
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", type=str)
    parser.add_argument("--songs", type=int, default=20)
    parser.add_argument("--duration", type=float, default=40.0,
                        help="approx seconds per song")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--noise", type=float, default=0.003,
                        help="additive noise RMS in the rendered audio")
    parser.add_argument("--sample_rate", type=int, default=22050)
    args = parser.parse_args()

    cfg = resolve_config(args.config)
    genres = list(cfg.conditioning.genre)
    difficulties = list(cfg.conditioning.difficulty)

    data_dir = Path(args.data_dir)
    for sub in ("audio", "midi", "metadata"):
        (data_dir / sub).mkdir(parents=True, exist_ok=True)

    for i in range(args.songs):
        pid = f"synth{i:03d}"
        wav_path = data_dir / "audio" / f"{pid}.wav"
        if wav_path.exists():  # skip-if-exists, like every prep stage
            print(f"{pid}: exists, skipped")
            continue
        # per-song rng (noise, genre, difficulty): a shared stream would
        # advance differently when songs are skipped, so a resumed run
        # would label/noise song i differently than a fresh run
        rng = np.random.default_rng([args.seed, i])
        song_seed = args.seed * 1000 + i
        score = compose_song(song_seed, args.duration)
        score.write(data_dir / "midi" / f"{pid}.mid")
        performed = warp_notes(score, song_seed)
        y = performed.synthesize(fs=args.sample_rate).astype(np.float32)
        if args.noise > 0:
            y = y + rng.normal(0.0, args.noise, len(y)).astype(np.float32)
        peak = float(np.abs(y).max())
        if peak > 0:
            y *= 0.8 / peak
        write_wav(wav_path, y, args.sample_rate)
        with open(data_dir / "metadata" / f"{pid}.yaml", "w") as f:
            yaml.safe_dump(
                {"piano": {
                    "id": pid,
                    "genre": genres[int(rng.integers(len(genres)))],
                    "difficulty": difficulties[
                        int(rng.integers(len(difficulties)))],
                }}, f)
        print(f"{pid}: {len(score.instruments[0].notes)} melody notes, "
              f"{score.get_end_time():.1f}s")
    print(f"synthesized {args.songs} songs -> {data_dir}")


if __name__ == "__main__":
    main()

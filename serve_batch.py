"""Offline batch conversion CLI — `python serve_batch.py OUT_DIR SONG...`.

Converts many songs to MIDI in one process using the multi-song
throughput path (Music2MIDI.generate_batch: all songs' chunks stream
through full-width device batches).  The per-song webui/demo flows cover
interactive use; this is the bulk-serving entry point.

    python serve_batch.py covers/ songs/*.wav --ckpt runs/x/ckpt \
        --genre pop --difficulty intermediate
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir", type=str)
    parser.add_argument("songs", nargs="+", type=str)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument(
        "--config", type=str, default=None,
        help="config path (default: ./config.yaml if present, else the"
             " packaged default)")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--genre", type=str, default=None)
    parser.add_argument("--difficulty", type=str, default=None)
    args = parser.parse_args()

    from evaluate import load_engine

    engine = load_engine(args.ckpt, args.config, args.dtype)
    names = {}
    if args.genre:
        names["genre"] = args.genre
    if args.difficulty:
        names["difficulty"] = args.difficulty
    cond = engine.cond_index_from_names(**names) if names else None

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = [Path(song) for song in args.songs]
    t0 = time.perf_counter()
    # audio_paths mode: WAV decode/resample prefetches on threads and
    # overlaps device compute of earlier songs
    midis = engine.generate_batch(
        cond_indices=[cond] * len(paths), audio_paths=paths
    )
    elapsed = time.perf_counter() - t0
    total_notes = 0
    for path, midi in zip(paths, midis):
        out = out_dir / (path.stem + ".mid")
        midi.write(out)
        n = sum(len(i.notes) for i in midi.instruments)
        total_notes += n
        print(f"{out} ({n} notes)")
    print(json.dumps({
        "songs": len(paths),
        "seconds": round(elapsed, 2),
        "songs_per_min": round(len(paths) / (elapsed / 60), 1),
        "notes": total_notes,
    }))


if __name__ == "__main__":
    main()

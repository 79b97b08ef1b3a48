"""Checkpoint averaging CLI — write the mean of N checkpoints as an
inference export.

    python tools/average_checkpoints.py OUT_DIR SRC [SRC ...] [--weights ...]

Each SRC is anything `restore_params` accepts: a `save_params` export
(SRC/params), a training checkpoint root (latest step_N taken), or a
specific step_N dir.  The output is a `save_params` export loadable by
`evaluate.py --ckpt OUT_DIR` / `Music2MIDI.from_checkpoint`.

The reference has no equivalent (its Lightning run keeps a single
.ckpt, reference train.py:36-44); averaging is the standard T5-family
post-training quality lever and `train.py`'s keep=3 pruning plus
`ckpt_best` leave the natural inputs on disk after every run.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(
        description="average N checkpoints into one inference export"
    )
    parser.add_argument("out_dir", type=str)
    parser.add_argument("sources", nargs="+", type=str)
    parser.add_argument(
        "--weights", nargs="+", type=float, default=None,
        help="per-source weights (default: uniform); normalized to sum 1",
    )
    args = parser.parse_args()

    from music2midi_tpu.train.checkpoint import average_params, save_params

    params, config = average_params(args.sources, args.weights)
    save_params(Path(args.out_dir), params, config)
    print(f"averaged {len(args.sources)} checkpoints -> {args.out_dir}")


if __name__ == "__main__":
    main()

"""Export (optionally averaging) checkpoints into one .npz artifact.

    python tools/export_npz.py OUT.npz SRC [SRC ...] [--dtype bfloat16]
                               [--weights ...]

Each SRC is anything `restore_params` accepts (a `save_params` export,
a training ckpt root / step_N dir, or another .npz). With multiple
sources the params are averaged (`average_params`) first. The output is
the repo's single-file checkpoint-of-record format: loadable by
`Music2MIDI.from_npz`, `evaluate.py --ckpt OUT.npz`, `bench.py --ckpt`,
and auto-detected by `bench.py` at `checkpoints/model_of_record.npz`.

The reference's equivalent artifact is its released Lightning
checkpoint (`epoch=799-step=119200.ckpt`, /root/reference/demo.ipynb
cell-0); this repo commits a ~30 MB bf16 npz instead.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(
        description="export (averaged) checkpoints to a single .npz"
    )
    parser.add_argument("out", type=str, help="output .npz path")
    parser.add_argument("sources", nargs="+", type=str)
    parser.add_argument(
        "--dtype", type=str, default="bfloat16",
        choices=["bfloat16", "float16", "float32"],
        help="storage dtype for float weights (default bfloat16 — the "
             "serving dtype; quality-neutral, see PERFORMANCE.md)",
    )
    parser.add_argument(
        "--weights", nargs="+", type=float, default=None,
        help="per-source averaging weights (default uniform)",
    )
    args = parser.parse_args()

    from music2midi_tpu.train.checkpoint import (
        average_params, restore_params, save_params_npz,
    )

    if len(args.sources) == 1 and args.weights is None:
        params, config = restore_params(args.sources[0])
    else:
        params, config = average_params(args.sources, args.weights)
    save_params_npz(args.out, params, config, dtype=args.dtype)
    size_mb = Path(args.out).stat().st_size / 1e6
    print(
        f"exported {len(args.sources)} source(s) -> {args.out} "
        f"({size_mb:.1f} MB, {args.dtype})"
    )


if __name__ == "__main__":
    main()

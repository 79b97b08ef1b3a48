"""Training-curve plot from a train.py log.jsonl.

    python tools/plot_training.py RUN_DIR [RUN_DIR ...] [--out curves.png]

Reads each RUN_DIR/log.jsonl (the JSONL stream train.py writes — the
wandb-independent logging surface, reference train.py:36-39 uses wandb
only) and renders train/val loss vs step, with best-val checkpoints
marked.  Multiple runs overlay for corpus/step-scaling comparisons.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def read_log(run_dir: Path):
    """-> dict with train (step, loss), val (step, loss), best (step, loss)
    arrays from RUN_DIR/log.jsonl (tolerates partial/garbled lines from a
    killed run)."""
    train, val, best = [], [], []
    log = run_dir / "log.jsonl"
    if not log.exists():
        raise FileNotFoundError(f"{log} not found")
    for line in log.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        step = rec.get("step")
        if step is None:
            continue
        if "train/loss" in rec:
            train.append((step, rec["train/loss"]))
        if "val/loss" in rec:
            val.append((step, rec["val/loss"]))
            if rec.get("val/is_best"):
                best.append((step, rec["val/loss"]))
    return {"train": train, "val": val, "best": best}


def plot_runs(run_dirs, out_path: Path, log_scale: bool = True) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 5))
    colors = plt.rcParams["axes.prop_cycle"].by_key()["color"]
    for i, run_dir in enumerate(run_dirs):
        run_dir = Path(run_dir)
        curves = read_log(run_dir)
        c = colors[i % len(colors)]
        if curves["train"]:
            s, l = zip(*curves["train"])
            ax.plot(s, l, color=c, lw=1.2,
                    label=f"{run_dir.name} train")
        if curves["val"]:
            s, l = zip(*curves["val"])
            ax.plot(s, l, color=c, lw=1.2, ls="--",
                    label=f"{run_dir.name} val")
        if curves["best"]:
            s, l = zip(*curves["best"])
            ax.scatter(s, l, color=c, marker="v", s=28, zorder=3,
                       label=f"{run_dir.name} best ckpt")
    if log_scale:
        ax.set_yscale("log")
    ax.set_xlabel("optimizer step")
    ax.set_ylabel("loss")
    ax.grid(True, alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def main() -> None:
    parser = argparse.ArgumentParser(
        description="plot train/val loss curves from train.py log.jsonl"
    )
    parser.add_argument("run_dirs", nargs="+", type=str)
    parser.add_argument("--out", type=str, default="curves.png")
    parser.add_argument("--linear", action="store_true",
                        help="linear y axis (default: log)")
    args = parser.parse_args()
    plot_runs(args.run_dirs, Path(args.out), log_scale=not args.linear)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

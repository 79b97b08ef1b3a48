"""Summarize and compare evaluate.py score CSVs.

`evaluate.py` writes `score-{name}.csv` with one melody-chroma-accuracy
row per song (same schema as the reference's
/root/reference/evaluate.py:49-52). This tool prints the mean with a
bootstrap CI for each file and — when given exactly two files — the
per-song deltas on the songs they share. Per-song comparison is the
validated method for cross-run conclusions here (synthesized corpora
share compositions by seed, data/synthesize_corpus.py:175; the r3xl
augmentation regression was caught this way, PERFORMANCE.md).

    python tools/score_summary.py score-a.csv [score-b.csv ...]
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path

import numpy as np


def read_scores(path: Path) -> dict[str, float]:
    with open(path) as f:
        return {r["piano_id"]: float(r["score"]) for r in csv.DictReader(f)}


def bootstrap_ci(x: np.ndarray, n: int = 10000, seed: int = 0):
    rng = np.random.default_rng(seed)
    means = rng.choice(x, size=(n, len(x)), replace=True).mean(axis=1)
    return float(np.percentile(means, 2.5)), float(np.percentile(means, 97.5))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("csvs", nargs="+", type=Path)
    ap.add_argument("--top", type=int, default=5,
                    help="per-song deltas to list each way (2-file mode)")
    args = ap.parse_args()

    tables = [read_scores(p) for p in args.csvs]
    for p, t in zip(args.csvs, tables):
        x = np.array(list(t.values()))
        lo, hi = bootstrap_ci(x)
        print(f"{p.name}: n={len(x)} mean={x.mean():.4f} "
              f"ci95=[{lo:.4f}, {hi:.4f}] min={x.min():.4f} max={x.max():.4f}")

    if len(tables) == 2:
        a, b = tables
        shared = sorted(set(a) & set(b))
        if not shared:
            print("no shared songs")
            return
        d = np.array([b[s] - a[s] for s in shared])
        lo, hi = bootstrap_ci(d)
        name_a, name_b = (p.name for p in args.csvs)
        print(f"\nper-song delta ({name_b} - {name_a}) on {len(shared)} "
              f"shared songs: mean={d.mean():+.4f} ci95=[{lo:+.4f}, {hi:+.4f}] "
              f"improved={int((d > 0).sum())} regressed={int((d < 0).sum())}")
        order = np.argsort(d)
        for i in order[: args.top]:
            print(f"  worst {shared[i]}: {a[shared[i]]:.4f} -> "
                  f"{b[shared[i]]:.4f} ({d[i]:+.4f})")
        for i in order[::-1][: args.top]:
            print(f"  best  {shared[i]}: {a[shared[i]]:.4f} -> "
                  f"{b[shared[i]]:.4f} ({d[i]:+.4f})")


if __name__ == "__main__":
    main()

"""Prep stage 5: filter songs by quality thresholds, write the 80/10/10
train/val/test split.

Reference: data/generate_split.py — keep songs with opt_chroma_shift == 0
and exactly 2 MIDI tracks, filter by config.dataset.filter_threshold, split
with random_state=42, save dataset_split.npz.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import argparse
from pathlib import Path

import numpy as np
import pandas as pd
import yaml
from sklearn.model_selection import train_test_split

from music2midi_tpu.config import load_config


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", type=str)
    parser.add_argument("--config", type=str, default="config.yaml")
    args = parser.parse_args()
    data_dir = Path(args.data_dir)
    config = load_config(args.config)
    threshold = config.dataset.filter_threshold

    metas = []
    for meta_path in sorted(data_dir.glob("metadata/*.yaml")):
        with open(meta_path) as f:
            meta = yaml.safe_load(f)
        if meta.get("youtube") is None:
            continue
        metrics = meta.get("metrics", {})
        if metrics.get("opt_chroma_shift") != 0:
            continue
        if meta["piano"].get("num_tracks") != 2:
            continue
        metas.append(meta)
    if not metas:
        raise SystemExit("no songs pass the pre-filters")

    metric_keys = list(metas[0]["metrics"].keys())
    df = pd.DataFrame(
        [[m["piano"]["id"]] + [m["metrics"][k] for k in metric_keys]
         for m in metas],
        columns=["piano_id"] + metric_keys,
    )
    df = df[
        (df["wp_std"] < threshold["wp_std"])
        & (df["max_beat_fluctuation"] < threshold["max_beat_fluctuation"])
        & (df["max_note_density"] < threshold["max_note_density"])
        & (df["time_diff_ratio"] < threshold["time_diff_ratio"])
    ]
    ids = df["piano_id"].to_numpy()
    if len(ids) < 3:
        raise SystemExit(
            f"only {len(ids)} songs pass the filters; need >= 3 to split"
        )
    train_ids, rest = train_test_split(ids, test_size=0.2, random_state=42)
    if len(rest) >= 2:
        val_ids, test_ids = train_test_split(rest, test_size=0.5,
                                             random_state=42)
    else:  # tiny dataset: reuse the remainder for both val and test
        val_ids = test_ids = rest
    np.savez(
        data_dir / "dataset_split.npz",
        train_id=train_ids, val_id=val_ids, test_id=test_ids,
    )
    print(
        f"split {len(ids)} songs -> train {len(train_ids)} / "
        f"val {len(val_ids)} / test {len(test_ids)}"
    )


if __name__ == "__main__":
    main()

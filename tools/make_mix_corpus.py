#!/usr/bin/env python
"""Symlink-merge two prepared corpora into one training corpus.

Training consumes only `audio/{id}.wav`, `midi_numpy/{id}.npy`,
`metadata/{id}.yaml`, and `dataset_split.npz` (train.py:162-164,
data/dataset.py:100-109), so a mixed-domain corpus is just symlinks +
a joint split file — no audio is copied or re-synthesized.  Songs from
the second corpus get an id prefix (default "hard_") because the
synthetic corpora share composition ids by seed
(data/synthesize_corpus.py).

Only the second corpus's TRAIN and VAL songs are linked: its test
split stays untouched in its own directory so cross-corpus evaluation
(`evaluate.py <orig_dir> --ckpt ...`) scores the exact same song set
as every other run.  The joint split is train = A.train + prefixed
B.train, val = A.val + prefixed B.val, test = A.test (unused — always
evaluate against the original directories).

Used for the r4mix chain (tools/r4mix_chain.sh):

    python tools/make_mix_corpus.py /root/runs/corpus400 \
        /root/runs/corpus200h /root/runs/corpus_mix --prefix hard_
"""
import argparse
import os
from pathlib import Path

import numpy as np

EXT = {"audio": ".wav", "midi_numpy": ".npy", "metadata": ".yaml"}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("corpus_a", type=Path, help="base corpus (kept verbatim)")
    ap.add_argument("corpus_b", type=Path, help="corpus to mix in (prefixed)")
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--prefix", default="hard_",
                    help="id prefix for corpus_b songs (default: hard_)")
    args = ap.parse_args()

    for sub in EXT:
        (args.out_dir / sub).mkdir(parents=True, exist_ok=True)

    split_a = np.load(args.corpus_a / "dataset_split.npz", allow_pickle=True)
    split_b = np.load(args.corpus_b / "dataset_split.npz", allow_pickle=True)

    def link(src: Path, dst: Path) -> None:
        if not src.exists():
            raise FileNotFoundError(src)
        # resolve: a CWD-relative corpus argument would otherwise be
        # stored verbatim in the link and break once read from out_dir
        target = src.resolve()
        if dst.is_symlink():
            if Path(os.readlink(dst)) == target:
                return
            dst.unlink()  # stale link from an earlier merge: repair it
        elif dst.exists():
            raise FileExistsError(f"{dst} exists and is not a symlink")
        os.symlink(target, dst)

    for sub, ext in EXT.items():
        for f in sorted((args.corpus_a / sub).glob(f"*{ext}")):
            link(f, args.out_dir / sub / f.name)
    b_ids = list(split_b["train_id"]) + list(split_b["val_id"])
    for pid in b_ids:
        for sub, ext in EXT.items():
            link(args.corpus_b / sub / f"{pid}{ext}",
                 args.out_dir / sub / f"{args.prefix}{pid}{ext}")

    train_id = np.array(
        list(split_a["train_id"])
        + [f"{args.prefix}{p}" for p in split_b["train_id"]])
    val_id = np.array(
        list(split_a["val_id"])
        + [f"{args.prefix}{p}" for p in split_b["val_id"]])
    np.savez(args.out_dir / "dataset_split.npz", train_id=train_id,
             val_id=val_id, test_id=split_a["test_id"])
    print(f"{args.out_dir}: train={len(train_id)} val={len(val_id)} "
          f"(test stays in the source dirs)")


if __name__ == "__main__":
    main()

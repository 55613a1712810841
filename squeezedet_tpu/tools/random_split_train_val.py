"""Randomly split KITTI trainval.txt into train.txt/val.txt 50/50
(reference data/random_split_train_val.py)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def split(image_set_dir: str, trainval_file: str = "trainval.txt",
          train_file: str = "train.txt", val_file: str = "val.txt",
          seed: int | None = None) -> None:
    with open(os.path.join(image_set_dir, trainval_file)) as f:
        lines = [line.strip() for line in f if line.strip()]
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(lines))
    half = len(lines) // 2
    with open(os.path.join(image_set_dir, train_file), "w") as f:
        f.write("\n".join(lines[i] for i in sorted(idx[:half])) + "\n")
    with open(os.path.join(image_set_dir, val_file), "w") as f:
        f.write("\n".join(lines[i] for i in sorted(idx[half:])) + "\n")
    print("Wrote {} train / {} val indices".format(half,
                                                   len(lines) - half))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("image_set_dir",
                   help="KITTI ImageSets dir containing trainval.txt")
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args(argv)
    split(args.image_set_dir, seed=args.seed)


if __name__ == "__main__":
    main()

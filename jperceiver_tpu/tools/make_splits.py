"""Generate split file lists + ground-truth pose files from dataset trees.

The reference SHIPS its split lists (`mono/datasets/splits/<split>/
{train,val}_files.txt`) and KITTI GT poses (`mono/datasets/gt_pose/
00..12.txt`) inside the repo; those are derivatives of the public datasets,
so here they are regenerated from the dataset tree instead:

  # KITTI odometry road split (reference `splits/odometry`)
  python -m jperceiver_tpu.tools.make_splits odometry \
      --data /data/kitti/odometry/dataset/sequences \
      --train_seqs 00 01 02 ... --val_seqs 09 10 --out splits/

  # KITTI 3D-object vehicle split (reference `splits/3Dobject`)
  python -m jperceiver_tpu.tools.make_splits object \
      --data /data/kitti/object --out splits/ --val_fraction 0.1

  # GT poses for the odometry toolkit (reference `gt_pose/*.txt`): the
  # KITTI odometry devkit's poses/ dir is ALREADY the expected format.
  python -m jperceiver_tpu.tools.make_splits gt_pose \
      --data /data/kitti/odometry/dataset/poses --out gt_pose/
"""

from __future__ import annotations

import argparse
import os
import shutil

from ..data.splits import scan_object_split, scan_odometry_split


def _write(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    print(f"{path}: {len(lines)} lines")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["odometry", "object", "gt_pose"])
    p.add_argument("--data", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--train_seqs", nargs="*",
                   default=[f"{i:02d}" for i in range(9)])
    p.add_argument("--val_seqs", nargs="*", default=["09", "10"])
    p.add_argument("--val_fraction", type=float, default=0.1)
    args = p.parse_args(argv)

    if args.kind == "odometry":
        train = scan_odometry_split(args.data, args.train_seqs)
        val = scan_odometry_split(args.data, args.val_seqs)
        _write(os.path.join(args.out, "odometry", "train_files.txt"), train)
        _write(os.path.join(args.out, "odometry", "val_files.txt"), val)
    elif args.kind == "object":
        lines = scan_object_split(args.data)
        n_val = max(1, int(len(lines) * args.val_fraction)) if lines else 0
        _write(os.path.join(args.out, "3Dobject", "train_files.txt"),
               lines[:-n_val] if n_val else lines)
        _write(os.path.join(args.out, "3Dobject", "val_files.txt"),
               lines[-n_val:] if n_val else [])
    else:  # gt_pose: KITTI odometry poses/NN.txt are already the format
        os.makedirs(args.out, exist_ok=True)
        n = 0
        for f in sorted(os.listdir(args.data)):
            if f.endswith(".txt"):
                shutil.copyfile(os.path.join(args.data, f),
                                os.path.join(args.out, f))
                n += 1
        print(f"{args.out}: copied {n} pose files")


if __name__ == "__main__":
    main()

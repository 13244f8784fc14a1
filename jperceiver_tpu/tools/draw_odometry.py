"""Visual-odometry evaluation: pose net over a sequence -> KITTI benchmark.

Parity with `scripts/draw_odometry.py:20-105`: run the pose head over
consecutive frame pairs, chain into a global trajectory
(`global_pose @= inv(T)`), save KITTI-format poses, run the odometry
toolkit (scale-aligned t_rel / r_rel) and plot the trajectory.

  python -m jperceiver_tpu.tools.draw_odometry --config cfg.py \
      --checkpoint work_dir --sequence 09 --gt_dir <gt_pose dir> --out out/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--sequence", default="09")
    p.add_argument("--gt_dir", default=None,
                   help="dir with <seq>.txt GT poses; defaults to the "
                        "packaged data/artifacts/gt_pose (KITTI 00-12)")
    p.add_argument("--out", required=True)
    p.add_argument("--epoch", type=int, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..data.kitti import pil_open_rgb
    from ..data.transforms import resize_image, to_array
    from ..engine import (build_optimizer, create_train_state,
                          enable_compile_cache)
    from ..engine.checkpoint import load_weights
    from ..evaluation.kitti_odometry import KittiOdomEval
    from ..evaluation.trajectory import save_kitti_poses
    from ..models import build_model

    enable_compile_cache()

    cfg = Config.fromfile(args.config)
    model = build_model(cfg.model)
    h, w = cfg.model.height, cfg.model.width

    seq_dir = os.path.join(cfg.data.in_path, args.sequence, "image_2")
    frames = sorted(
        f for f in os.listdir(seq_dir) if f.endswith((".png", ".jpg"))
    )

    # Init params with a dummy batch, then load trained weights.
    from ..data import synthetic_batch

    dummy = {k: jnp.asarray(v) for k, v in
             synthetic_batch(1, h, w, h // 4).items()}
    tx, _ = build_optimizer(cfg, 1000)
    state = create_train_state(model, tx, dummy, jax.random.key(0))
    state = load_weights(args.checkpoint, state, epoch=args.epoch)

    @jax.jit
    def pose_step(state, img_a, img_b):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            img_a, img_b, method=model.pose_between,
        )

    def load(f):
        img = pil_open_rgb(os.path.join(seq_dir, f))
        return to_array(resize_image(img, h, w))[None]

    os.makedirs(args.out, exist_ok=True)
    global_pose = np.eye(4)
    rows = [global_pose.copy()]
    prev = load(frames[0])
    for f in frames[1:]:
        cur = load(f)
        T = np.asarray(pose_step(state, jnp.asarray(prev), jnp.asarray(cur)))[0]
        global_pose = global_pose @ np.linalg.inv(T)
        rows.append(global_pose.copy())
        prev = cur

    pred_path = os.path.join(args.out, f"{args.sequence}.txt")
    save_kitti_poses(pred_path, np.asarray(rows))
    print(f"saved {len(rows)} poses -> {pred_path}")

    if args.gt_dir is None:
        from ..data.splits import default_gt_pose_dir

        args.gt_dir = default_gt_pose_dir()
    if args.gt_dir:
        ev = KittiOdomEval(args.gt_dir, args.out, align_scale=True)
        res = ev.eval_sequence(args.sequence)
        print(
            f"seq {args.sequence}: t_rel {res['t_rel_percent']:.2f}% "
            f"r_rel {res['r_rel_deg_per_100m']:.3f} deg/100m "
            f"({res['n_segments']} segments)"
        )
        ev.plot_trajectory(
            args.sequence, os.path.join(args.out, f"{args.sequence}.png")
        )
        return res


if __name__ == "__main__":
    main()

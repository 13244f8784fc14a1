"""Streaming video inference demo: depth | layouts | odometry composite.

Parity with `scripts/eval_kitti_video.py:229-379` /
`eval_argo_both_video.py:209-346`: loop over an image directory, run the
full model on consecutive frame pairs, colorize disparity (magma), argmax
the two BEV layouts, accumulate the trajectory, and write a composite
panel video. One dual-branch model covers both the KITTI two-checkpoint
flow and the Argo single-model flow.

  python -m jperceiver_tpu.tools.video_demo --config cfg.py \
      --checkpoint work_dir --images <dir> --out demo.avi
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def colorize_disp(disp: np.ndarray) -> np.ndarray:
    """(h, w) disparity -> (h, w, 3) uint8 magma-like colormap via cv2."""
    import cv2

    d = disp / (np.percentile(disp, 95) + 1e-8)
    d = np.clip(d, 0, 1)
    return cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_MAGMA)


def layout_to_rgb(mask: np.ndarray, color=(0, 120, 255)) -> np.ndarray:
    out = np.full((*mask.shape, 3), 255, np.uint8)
    out[mask > 0] = color
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--checkpointB", default=None,
                   help="optional second checkpoint whose VEHICLE branch "
                        "replaces topviewB (the reference KITTI demo runs a "
                        "road model + a separate vehicle model, "
                        "eval_kitti_video.py:234-244)")
    p.add_argument("--images", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--fps", type=float, default=10.0)
    p.add_argument("--max_frames", type=int, default=None)
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..data import synthetic_batch
    from ..data.kitti import pil_open_rgb
    from ..data.transforms import resize_image, to_array
    from ..engine import (build_optimizer, create_train_state,
                          enable_compile_cache)
    from ..engine.checkpoint import load_weights
    from ..models import build_model

    enable_compile_cache()

    cfg = Config.fromfile(args.config)
    model = build_model(cfg.model)
    h, w = cfg.model.height, cfg.model.width

    dummy = {k: jnp.asarray(v) for k, v in synthetic_batch(1, h, w, h // 4).items()}
    tx, _ = build_optimizer(cfg, 1000)
    state = create_train_state(model, tx, dummy, jax.random.key(0))
    state = load_weights(args.checkpoint, state)
    state_b = None
    if args.checkpointB:
        state_b = load_weights(args.checkpointB,
                               create_train_state(model, tx, dummy,
                                                  jax.random.key(0)))

    @jax.jit
    def predict(state, prev_img, cur_img):
        """2-frame streaming forward (`eval_kitti_video.py:58-85`)."""
        batch = dict(dummy)
        batch["color_aug"] = jnp.stack([cur_img, prev_img, cur_img], axis=1)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, with_pose=False,
        )
        T = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            prev_img, cur_img, method=model.pose_between,
        )
        return out["disp/0"], out["topview"], out["topviewB"], T

    frames = sorted(
        f for f in os.listdir(args.images) if f.endswith((".png", ".jpg"))
    )
    if args.max_frames:
        frames = frames[: args.max_frames]

    def load(f):
        return to_array(resize_image(pil_open_rgb(os.path.join(args.images, f)), h, w))[None]

    panel_h = 256
    writer = None
    traj = [np.eye(4)]
    prev = load(frames[0])
    for f in frames[1:]:
        cur = load(f)
        disp, top, topB, T = predict(state, jnp.asarray(prev), jnp.asarray(cur))
        if state_b is not None:  # vehicle branch from the second model
            _, _, topB, _ = predict(state_b, jnp.asarray(prev), jnp.asarray(cur))
        traj.append(traj[-1] @ np.linalg.inv(np.asarray(T)[0]))
        prev = cur

        rgb = (np.asarray(cur)[0] * 255).astype(np.uint8)[:, :, ::-1]
        d = colorize_disp(np.asarray(disp)[0, :, :, 0])
        road = layout_to_rgb(np.argmax(np.asarray(top)[0], -1))
        veh = layout_to_rgb(np.argmax(np.asarray(topB)[0], -1), color=(255, 60, 0))

        def rs(img):
            return cv2.resize(img, (int(panel_h * img.shape[1] / img.shape[0]), panel_h))

        xs = np.asarray([t[0, 3] for t in traj])
        zs = np.asarray([t[2, 3] for t in traj])
        plot = np.full((panel_h, panel_h, 3), 255, np.uint8)
        if len(xs) > 1:
            span = max(xs.max() - xs.min(), zs.max() - zs.min(), 1e-3)
            px = ((xs - xs.min()) / span * (panel_h - 20) + 10).astype(int)
            pz = (panel_h - 10 - (zs - zs.min()) / span * (panel_h - 20)).astype(int)
            for i in range(1, len(px)):
                cv2.line(plot, (px[i - 1], pz[i - 1]), (px[i], pz[i]), (200, 0, 0), 2)

        panel = np.concatenate([rs(rgb), rs(d), rs(road), rs(veh), plot], axis=1)
        if writer is None:
            fourcc = cv2.VideoWriter_fourcc(*"MJPG")
            writer = cv2.VideoWriter(args.out, fourcc, args.fps,
                                     (panel.shape[1], panel.shape[0]))
        writer.write(panel)

    if writer is not None:
        writer.release()
    print(f"wrote {len(frames) - 1} frames -> {args.out}")


if __name__ == "__main__":
    main()

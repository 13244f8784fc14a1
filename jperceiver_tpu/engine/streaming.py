"""Streaming video inference as a single compiled `lax.scan`.

The reference's long-video path is a Python loop carrying `prev_img`
(`scripts/eval_kitti_video.py:266-361`) — one forward dispatch per frame.
SURVEY §5 notes the honest TPU equivalent: a `lax.scan` over the frame
axis with the accumulated global pose as carry, so a whole clip becomes
ONE XLA program (chunk by chunk for memory).

Outputs per frame: disparity, road/vehicle layouts, the frame-to-frame
transform, and the chained global pose (`global @= inv(T)`,
`draw_odometry.py:62-77` convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import se3_inverse


def make_streaming_fn(model, chunk: int = 8):
    """Returns jitted `run(variables, frames, init_pose) -> dict`.

    frames: (T, H, W, 3) with T % chunk == 0 handled by the caller
    (pad/trim). The scan carries (prev_frame, global_pose).
    """

    def step(variables, carry, frame):
        prev, gpose = carry
        cur = frame[None]
        batch = {"color_aug": jnp.stack([cur, prev, cur], axis=1)}
        out = model.apply(variables, batch, train=False, with_pose=False)
        T = model.apply(variables, prev, cur, method=model.pose_between)[0]
        # closed-form rigid inverse: linalg.inv lowers to a general
        # LU solve, disproportionately slow inside a scan on TPU
        gpose = gpose @ se3_inverse(T[None])[0]
        y = {
            "disp": out["disp/0"][0],
            "topview": out["topview"][0],
            "topviewB": out["topviewB"][0],
            "cam_T_cam": T,
            "global_pose": gpose,
        }
        return (cur, gpose), y

    @jax.jit
    def run(variables, frames, init_prev, init_pose):
        def body(carry, frame):
            return step(variables, carry, frame)

        (_, final_pose), ys = jax.lax.scan(body, (init_prev, init_pose), frames)
        ys["final_pose"] = final_pose
        return ys

    def runner(variables, frames, init_pose=None):
        t = frames.shape[0]
        init_pose = (
            jnp.eye(4, dtype=jnp.float32) if init_pose is None else init_pose
        )
        outs = []
        prev = frames[0][None]
        pose = init_pose
        for start in range(1, t, chunk):
            seg = frames[start : start + chunk]
            ys = run(variables, seg, prev, pose)
            pose = ys.pop("final_pose")
            outs.append(ys)
            prev = seg[-1][None]
        return {
            k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
        }

    return runner

"""lax.scan streaming inference == sequential per-frame inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jperceiver_tpu.data import synthetic_batch
from jperceiver_tpu.engine.streaming import make_streaming_fn
from jperceiver_tpu.models import JPerceiver


def test_streaming_matches_sequential():
    H = W = 128
    model = JPerceiver(height=H, width=W, occ_map_size=32)
    base = {k: jnp.asarray(v) for k, v in synthetic_batch(1, H, W, 32).items()}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        base, train=True,
    )
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 1, (5, H, W, 3)).astype(np.float32)
    )

    runner = make_streaming_fn(model, chunk=2)
    ys = runner(variables, frames)
    assert ys["disp"].shape == (4, H // 2, W // 2, 1)
    assert ys["topview"].shape == (4, 32, 32, 2)
    assert ys["global_pose"].shape == (4, 4, 4)

    # Sequential reference
    gpose = np.eye(4)
    for i in range(1, 5):
        prev = frames[i - 1][None]
        cur = frames[i][None]
        batch = {"color_aug": jnp.stack([cur, prev, cur], axis=1)}
        out = model.apply(variables, batch, train=False, with_pose=False)
        T = np.asarray(
            model.apply(variables, prev, cur, method=model.pose_between)
        )[0]
        gpose = gpose @ np.linalg.inv(T)
        np.testing.assert_allclose(
            np.asarray(ys["disp"][i - 1]), np.asarray(out["disp/0"][0]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ys["cam_T_cam"][i - 1]), T, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ys["global_pose"][i - 1]), gpose, atol=1e-4
        )

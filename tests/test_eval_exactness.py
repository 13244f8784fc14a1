"""Eval exactness: every dataset sample is counted exactly once.

The val loader pads the tail batch with wrap-around duplicates
(`data/loader.py`); the eval hook must mask those out of the meters
(VERDICT round-1 weakness 7). A stubbed eval step keeps this fast — the
counting/masking logic is what's under test, not the network.
"""

import numpy as np

import jax.numpy as jnp

from jperceiver_tpu.data.loader import DataLoader
from jperceiver_tpu.engine.eval_hook import EvalHook


class TinyDataset:
    """7 samples (not divisible by batch 3) with per-sample layout labels."""

    def __init__(self, n=7, s=16):
        self.n = n
        self.s = s

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        s = self.s
        bev = np.zeros((s, s), np.float32)
        bev[: 2 + i, :] = 1.0  # per-sample distinct road mask
        return {
            "color": np.full((1, 2 * s, 2 * s, 3), i / 10, np.float32),
            "bev_static": bev,
            "bev_dynamic": np.zeros((s, s), np.float32),
        }


def test_padded_tail_masked_out_of_meters():
    ds = TinyDataset()
    loader = DataLoader(ds, batch_size=3, shuffle=False, num_workers=1,
                        drop_last=False)

    hook = EvalHook.__new__(EvalHook)
    hook.loader = loader
    hook.cfg = {"type": "static"}
    hook.with_depth = False
    hook.with_layout = True
    hook.max_batches = None

    def stub_step(state, batch):
        b, _, h, w, _ = batch["color"].shape
        s = h // 2
        # predict everything road -> per-sample IoU depends on the GT mask
        topview = jnp.stack(
            [jnp.zeros((b, s, s)), jnp.ones((b, s, s))], axis=-1)
        return {
            "disp/0": jnp.full((b, s, s, 1), 0.5),
            "topview": topview,
            "topviewB": topview,
        }

    hook.eval_step = stub_step
    summary = hook(state=None, epoch=0)

    assert summary["n_eval_samples"] == len(ds)

    # The mean road IoU over exactly the 7 true samples: prediction is
    # all-road, GT row-count varies per sample -> IoU_1 = (2+i)/16.
    expected = np.mean([(2 + i) / 16 for i in range(7)])
    np.testing.assert_allclose(summary["road_iou"], expected, rtol=1e-6)

    # If padding leaked into the meters, the duplicate of sample 0 (the
    # wrap-around) would drag the mean: assert against that specific bias.
    leaked = np.mean([(2 + i) / 16 for i in list(range(7)) + [0, 0]])
    assert abs(summary["road_iou"] - leaked) > 1e-4


def test_absent_branch_outputs_skipped():
    """Under `skip_inactive_branch` a static-type model emits no
    `topviewB`; the hook must still score the road branch and simply omit
    vehicle meters (engine/eval_hook.py \"may be absent\" path)."""
    ds = TinyDataset()
    loader = DataLoader(ds, batch_size=3, shuffle=False, num_workers=1,
                        drop_last=False)

    hook = EvalHook.__new__(EvalHook)
    hook.loader = loader
    hook.cfg = {"type": "static", "skip_inactive_branch": True}
    hook.with_depth = False
    hook.with_layout = True
    hook.max_batches = None

    def stub_step(state, batch):
        b, _, h, w, _ = batch["color"].shape
        s = h // 2
        topview = jnp.stack(
            [jnp.zeros((b, s, s)), jnp.ones((b, s, s))], axis=-1)
        return {"disp/0": jnp.full((b, s, s, 1), 0.5), "topview": topview}

    hook.eval_step = stub_step
    summary = hook(state=None, epoch=0)

    assert summary["n_eval_samples"] == len(ds)
    expected = np.mean([(2 + i) / 16 for i in range(7)])
    np.testing.assert_allclose(summary["road_iou"], expected, rtol=1e-6)
    assert "vehicle_iou" not in summary and "vehicle_map" not in summary

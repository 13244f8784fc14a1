"""SimulatedDataset: loader-pluggable simulated scenes (data/simulated.py).

Covers the acceptance-run data path: per-scene rendering matches the
batched renderer, the `get_dataset` factory dispatch, gt_depth plumbing
for the eval hook, and the DataLoader collate over rendered samples.
"""

import numpy as np

from jperceiver_tpu.config import Config
from jperceiver_tpu.data import DataLoader, get_dataset
from jperceiver_tpu.data.simulated import (
    SimulatedDataset, render_scene, simulated_batch)


def test_render_scene_matches_batched():
    batch, gt = simulated_batch(batch=2, height=64, width=64, seed=3)
    s0, g0 = render_scene(3 * 97 + 0, 64, 64)
    s1, g1 = render_scene(3 * 97 + 1, 64, 64)
    for k in batch:
        np.testing.assert_array_equal(batch[k][0], s0[k])
        np.testing.assert_array_equal(batch[k][1], s1[k])
    np.testing.assert_array_equal(gt["depth"][0], g0["depth"])
    np.testing.assert_array_equal(gt["T_fwd"][1], g1["T_fwd"])


def test_dataset_shapes_and_gt():
    ds = SimulatedDataset(n_scenes=3, height=64, width=64, seed=1,
                          with_gt=True)
    assert len(ds) == 3
    s = ds[0]
    assert s["color"].shape == (3, 64, 64, 3)
    assert s["bev_static"].shape == (16, 16)
    assert s["bev_static_sdf"].shape == (16, 16, 1)
    assert s["gt_depth"].shape == (64, 64)
    assert np.isfinite(s["gt_depth"]).all() and (s["gt_depth"] > 0).all()
    # cache returns a shallow copy (same arrays, fresh dict: a consumer
    # popping keys must not corrupt the cache); distinct scenes differ
    s2 = ds[0]
    assert s2 is not s and s2["color"] is s["color"]
    assert not np.array_equal(ds[1]["color"], s["color"])


def test_get_dataset_dispatch_and_loader():
    data_cfg = Config.fromdict(dict(
        name="simulated", type="static", split="odometry",
        height=64, width=64, n_scenes=4))
    train = get_dataset(data_cfg, training=True)
    val = get_dataset(data_cfg, training=False)
    assert isinstance(train, SimulatedDataset)
    assert "gt_depth" not in train[0]          # train batches feed the jit
    assert "gt_depth" in val[0]                # eval hook pops it
    # disjoint seeds -> different scenes
    assert not np.array_equal(train[0]["color"], val[0]["color"])

    loader = DataLoader(val, batch_size=2, shuffle=False, num_workers=2,
                        drop_last=False)
    b = next(iter(loader))
    assert b["color"].shape == (2, 3, 64, 64, 3)
    assert b["gt_depth"].shape == (2, 64, 64)
    assert b["_valid"].all()

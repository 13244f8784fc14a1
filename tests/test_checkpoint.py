"""Torch weight import parity + Orbax save/restore round-trip."""

import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from jperceiver_tpu.engine.checkpoint import (
    import_torch_resnet,
    save_checkpoint,
    restore_checkpoint,
)


def _rand_sd(rng):
    """Random torchvision-style resnet18 state_dict (shapes only matter)."""
    sd = {}

    def conv(name, o, i, k):
        # He-ish scaling keeps activations O(1) through 8 blocks so fp32
        # accumulation noise stays within tight tolerances.
        std = (2.0 / (i * k * k)) ** 0.5
        sd[f"{name}.weight"] = torch.from_numpy(
            rng.standard_normal((o, i, k, k)).astype(np.float32) * std
        )

    def bn(name, c):
        sd[f"{name}.weight"] = torch.from_numpy(rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[f"{name}.bias"] = torch.from_numpy(rng.standard_normal(c).astype(np.float32) * 0.1)
        sd[f"{name}.running_mean"] = torch.from_numpy(rng.standard_normal(c).astype(np.float32) * 0.1)
        sd[f"{name}.running_var"] = torch.from_numpy(rng.uniform(0.5, 1.5, c).astype(np.float32))

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for layer, (cin, cout) in chans.items():
        for b in range(2):
            pfx = f"layer{layer}.{b}"
            c_in = cin if b == 0 else cout
            stride_block = layer > 1 and b == 0
            conv(f"{pfx}.conv1", cout, c_in, 3)
            bn(f"{pfx}.bn1", cout)
            conv(f"{pfx}.conv2", cout, cout, 3)
            bn(f"{pfx}.bn2", cout)
            if stride_block:
                conv(f"{pfx}.downsample.0", cout, c_in, 1)
                bn(f"{pfx}.downsample.1", cout)
    return sd


def _torch_bn(x, sd, name):
    return F.batch_norm(
        x, sd[f"{name}.running_mean"], sd[f"{name}.running_var"],
        sd[f"{name}.weight"], sd[f"{name}.bias"], training=False, eps=1e-5,
    )


def _torch_stem(x, sd):
    y = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    return F.relu(_torch_bn(y, sd, "bn1"))


def _torch_basic_block(x, sd, pfx, stride):
    y = F.conv2d(x, sd[f"{pfx}.conv1.weight"], stride=stride, padding=1)
    y = F.relu(_torch_bn(y, sd, f"{pfx}.bn1"))
    y = F.conv2d(y, sd[f"{pfx}.conv2.weight"], padding=1)
    y = _torch_bn(y, sd, f"{pfx}.bn2")
    if f"{pfx}.downsample.0.weight" in sd:
        idn = F.conv2d(x, sd[f"{pfx}.downsample.0.weight"], stride=stride)
        idn = _torch_bn(idn, sd, f"{pfx}.downsample.1")
    else:
        idn = x
    return F.relu(y + idn)


def test_torch_import_full_pyramid_parity(rng):
    """Imported weights reproduce the torch forward through all stages."""
    from jperceiver_tpu.models.resnet import ResNet

    sd = _rand_sd(rng)
    params, stats = import_torch_resnet(sd, depth=18)

    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    with torch.no_grad():
        y = _torch_stem(xt, sd)
        feats_t = [y]
        y = F.max_pool2d(y, 3, 2, 1)
        for layer in (1, 2, 3, 4):
            for b in range(2):
                stride = 2 if (layer > 1 and b == 0) else 1
                y = _torch_basic_block(y, sd, f"layer{layer}.{b}", stride)
            feats_t.append(y)

    model = ResNet(18)
    feats_j = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    assert len(feats_j) == 5
    for fj, ft in zip(feats_j, feats_t):
        ref = ft.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(fj), ref,
            rtol=1e-4, atol=1e-4 * max(1.0, np.abs(ref).max()),
        )


def test_pose_conv1_tiling(rng):
    sd = _rand_sd(rng)
    params, _ = import_torch_resnet(sd, depth=18, num_input_images=2)
    k = params["conv1"]["kernel"]
    assert k.shape == (7, 7, 6, 64)
    np.testing.assert_allclose(k[:, :, :3], k[:, :, 3:], atol=0)
    # Tiled halves carry half the weight each.
    np.testing.assert_allclose(
        k[:, :, :3] * 2,
        np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)),
        rtol=1e-6,
    )


def test_orbax_roundtrip(tmp_path):
    from jperceiver_tpu.config import Config
    from jperceiver_tpu.data import synthetic_batch
    from jperceiver_tpu.engine import build_optimizer, create_train_state
    from jperceiver_tpu.models import JPerceiver

    cfg = Config.fromdict(dict(
        optimizer=dict(type="Adam", lr=1e-4, weight_decay=0),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(policy="step", warmup=None, step=[50]),
    ))
    model = JPerceiver(height=128, width=128, occ_map_size=32)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(1, 128, 128, 32).items()}
    tx, _ = build_optimizer(cfg, 100)
    state = create_train_state(model, tx, batch, jax.random.key(0))

    work = str(tmp_path / "run")
    save_checkpoint(work, state, epoch=1)

    # Perturb, then restore.
    zeroed = state.replace(
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params)
    )
    restored, epoch = restore_checkpoint(work, zeroed)
    assert epoch == 1
    orig = jax.tree_util.tree_leaves(state.params)
    back = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_finetune_nonstrict_partial_load(tmp_path):
    """strict=False transfers intersecting weights, keeps init elsewhere

    (torch load_state_dict(strict=False) semantics, `train.py:85-88`)."""
    from jperceiver_tpu.config import Config
    from jperceiver_tpu.data import synthetic_batch
    from jperceiver_tpu.engine import build_optimizer, create_train_state
    from jperceiver_tpu.engine.checkpoint import load_weights
    from jperceiver_tpu.models import JPerceiver

    cfg = Config.fromdict(dict(
        optimizer=dict(type="Adam", lr=1e-4, weight_decay=0),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(policy="step", warmup=None, step=[50]),
    ))
    tx, _ = build_optimizer(cfg, 100)

    mA = JPerceiver(height=128, width=128, occ_map_size=32)
    bA = {k: jnp.asarray(v) for k, v in synthetic_batch(1, 128, 128, 32).items()}
    sA = create_train_state(mA, tx, bA, jax.random.key(0))
    work = str(tmp_path / "ft")
    save_checkpoint(work, sA, 1)

    # Different occ_map_size -> CVP fc shapes differ; encoders match.
    mB = JPerceiver(height=256, width=256, occ_map_size=64)
    bB = {k: jnp.asarray(v) for k, v in synthetic_batch(1, 256, 256, 64).items()}
    sB = create_train_state(mB, tx, bB, jax.random.key(1))
    sB2 = load_weights(work, sB, strict=False)

    a = np.asarray(sA.params["depth_encoder"]["encoder"]["conv1"]["kernel"])
    b = np.asarray(sB2.params["depth_encoder"]["encoder"]["conv1"]["kernel"])
    np.testing.assert_array_equal(a, b)
    kept = np.asarray(sB2.params["cvp"]["transform_module"]["fc1"]["kernel"])
    init = np.asarray(sB.params["cvp"]["transform_module"]["fc1"]["kernel"])
    np.testing.assert_array_equal(kept, init)


def test_apply_pretrained_encoders(tmp_path):
    """Config-driven ImageNet trunk init (`cfg_kitti_baseline.py:9-10`)."""
    import optax
    import torch

    import jax
    import jax.numpy as jnp

    from jperceiver_tpu.engine.checkpoint import apply_pretrained_encoders
    from jperceiver_tpu.engine.train_state import create_train_state
    from jperceiver_tpu.models import JPerceiver

    sys.path.insert(0, "/root/repo/tests")
    from ref_torch import load_ref

    torch.manual_seed(3)
    resnet = load_ref("resnet")
    net = resnet.ResNet(resnet.BasicBlock, [2, 2, 2, 2])
    path = str(tmp_path / "resnet18.pth")
    torch.save(net.state_dict(), path)

    model = JPerceiver(height=128, width=128, occ_map_size=32)
    batch = {
        "color_aug": jnp.zeros((1, 3, 128, 128, 3), jnp.float32),
    }
    state = create_train_state(model, optax.adam(1e-4), batch, jax.random.key(0))
    before = np.asarray(state.params["depth_encoder"]["encoder"]["conv1"]["kernel"])

    cfg = dict(depth_num_layers=18, pose_num_layers=18,
               depth_pretrained_path=path, pose_pretrained_path=path)
    state = apply_pretrained_encoders(state, cfg)

    w_ref = net.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    got_d = np.asarray(state.params["depth_encoder"]["encoder"]["conv1"]["kernel"])
    got_l = np.asarray(
        state.params["layout_encoder"]["resnet_encoder"]["conv1"]["kernel"])
    got_p = np.asarray(state.params["pose_encoder"]["encoder"]["conv1"]["kernel"])
    assert not np.allclose(got_d, before)
    np.testing.assert_allclose(got_d, w_ref, atol=1e-7)
    np.testing.assert_allclose(got_l, w_ref, atol=1e-7)  # layout defaults to depth path
    # pose conv1: 2x tiled / 2 (`pose_encoder.py:47`)
    np.testing.assert_allclose(got_p, np.concatenate([w_ref] * 2, axis=2) / 2, atol=1e-7)
    # BN running stats imported too
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["depth_encoder"]["encoder"]["bn1"]["mean"]),
        net.state_dict()["bn1.running_mean"].numpy(), atol=1e-7)

"""Model shape & smoke tests (tiny resolutions, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jperceiver_tpu.models import (
    JPerceiver,
    DepthEncoder,
    DepthDecoder,
    PoseEncoder,
    PoseDecoder,
    LayoutEncoder,
    LayoutDecoder,
    CycledViewProjection,
    CrossViewTransformer,
)
from jperceiver_tpu.data import synthetic_batch


def test_resnet18_pyramid_shapes():
    enc = DepthEncoder(18)
    x = jnp.zeros((1, 64, 128, 3))
    vars_ = enc.init(jax.random.key(0), x)
    feats = enc.apply(vars_, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 32, 64, 64),
        (1, 16, 32, 64),
        (1, 8, 16, 128),
        (1, 4, 8, 256),
        (1, 2, 4, 512),
    ]


def test_resnet50_channels():
    enc = DepthEncoder(50)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = enc.init(jax.random.key(0), x)
    feats = enc.apply(vars_, x)
    assert [f.shape[-1] for f in feats] == [64, 256, 512, 1024, 2048]


def test_depth_decoder_scales():
    enc, dec = DepthEncoder(18), DepthDecoder()
    x = jnp.zeros((1, 64, 128, 3))
    ev = enc.init(jax.random.key(0), x)
    feats = enc.apply(ev, x)
    dv = dec.init(jax.random.key(1), feats)
    out = dec.apply(dv, feats)
    assert out["disp/0"].shape == (1, 32, 64, 1)
    assert out["disp/1"].shape == (1, 16, 32, 1)
    assert out["disp/2"].shape == (1, 8, 16, 1)
    assert out["disp/3"].shape == (1, 4, 8, 1)
    d = np.asarray(out["disp/0"])
    assert (d >= 0).all() and (d <= 1).all()


def test_pose_net():
    enc, dec = PoseEncoder(18, 2), PoseDecoder()
    x = jnp.zeros((2, 64, 64, 6))
    ev = enc.init(jax.random.key(0), x)
    feats = enc.apply(ev, x)
    dv = dec.init(jax.random.key(1), feats)
    aa, t = dec.apply(dv, feats)
    assert aa.shape == (2, 3) and t.shape == (2, 3)
    # The 0.01 scaling keeps initial poses near identity.
    assert np.abs(np.asarray(aa)).max() < 0.5


def test_layout_stack():
    # The layout encoder reduces by 128x (`layout_model.py:99`): 512 -> 4.
    img = jnp.zeros((1, 512, 512, 3))
    enc = LayoutEncoder(18)
    ev = enc.init(jax.random.key(0), img)
    feat = enc.apply(ev, img)
    assert feat.shape == (1, 4, 4, 128)

    cvp = CycledViewProjection(4)
    cv = cvp.init(jax.random.key(1), feat)
    transform, retransform = cvp.apply(cv, feat)
    assert transform.shape == feat.shape and retransform.shape == feat.shape

    depth_feat = jnp.zeros((1, 16, 16, 512))
    cct = CrossViewTransformer(128)
    cc = cct.init(jax.random.key(2), feat, transform, retransform, depth_feat)
    fused, score, attn = cct.apply(cc, feat, transform, retransform, depth_feat)
    assert fused.shape == feat.shape
    assert score.shape == (1, 4, 4, 1)

    dec = LayoutDecoder(2)
    dv = dec.init(jax.random.key(3), fused)
    top = dec.apply(dv, fused)
    assert top.shape == (1, 128, 128, 2)  # 4 * 2^5


def test_jperceiver_forward_contract():
    """Full model emits the reference output-key contract (`net.py:68-82`)."""
    model = JPerceiver(height=128, width=128, occ_map_size=32)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(1, 128, 128, 32).items()}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=True,
    )
    out = model.apply(
        variables, batch, train=True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )[0]

    for s in range(4):
        assert f"disp/{s}" in out
    assert out["topview"].shape == (1, 32, 32, 2)
    assert out["transform_topview"].shape == (1, 32, 32, 2)
    assert out["topviewB"].shape == (1, 32, 32, 2)
    assert out["cam_T_cam/-1"].shape == (1, 4, 4)
    assert out["cam_T_cam/1"].shape == (1, 4, 4)
    # Poses start near identity.
    T = np.asarray(out["cam_T_cam/1"])
    np.testing.assert_allclose(T[0], np.eye(4), atol=0.2)


def test_stem_conv_matches_plain_conv():
    """StemConv (space-to-depth 7x7/s2) == nn.Conv(7,7,s2,pad3) bitwise-ish."""
    import flax.linen as nn
    import numpy as np

    from jperceiver_tpu.models.resnet import StemConv

    rng = np.random.default_rng(7)
    for h, w, c in [(32, 48, 3), (64, 64, 6)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
        stem = StemConv(64)
        v = stem.init(jax.random.key(0), x)
        ref = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False)
        y1 = stem.apply(v, x)
        y2 = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        assert y1.shape == y2.shape
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)

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


def test_branch_skip_matches_dual_branch():
    """branches="road" drops the vehicle forward AND its params while the
    road outputs stay bit-identical (Flax path-folded init RNG makes shared
    modules' params independent of the other branch's presence)."""
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(1, 128, 128, 32).items()}
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}

    outs = {}
    for branches in ("both", "road"):
        model = JPerceiver(height=128, width=128, occ_map_size=32,
                           branches=branches)
        variables = model.init(rngs, batch, train=True)
        if branches == "road":
            assert "cvp_b" not in variables["params"]
            assert "layout_decoder_b" not in variables["params"]
        else:
            assert "cvp_b" in variables["params"]
        outs[branches] = model.apply(
            variables, batch, train=True,
            rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"],
        )[0]

    assert "topviewB" not in outs["road"]
    assert "topviewB" in outs["both"]
    for key in ("topview", "transform_topview", "disp/0", "cam_T_cam/1"):
        np.testing.assert_array_equal(
            np.asarray(outs["both"][key]), np.asarray(outs["road"][key]))

    # from_config derivation of the knob
    from jperceiver_tpu.config import Config

    cfg = Config.fromdict(dict(type="static", skip_inactive_branch=True,
                               height=128, width=128, occ_map_size=32))
    assert JPerceiver.from_config(cfg).branches == "road"
    cfg2 = Config.fromdict(dict(type="dynamic", skip_inactive_branch=True))
    assert JPerceiver.from_config(cfg2).branches == "vehicle"
    cfg3 = Config.fromdict(dict(type="Argo_both", skip_inactive_branch=True))
    assert JPerceiver.from_config(cfg3).branches == "both"
    # Round-4 default flip: single-branch types skip the inactive branch
    # unless skip_inactive_branch=False explicitly restores both.
    cfg4 = Config.fromdict(dict(type="static"))
    assert JPerceiver.from_config(cfg4).branches == "road"
    cfg5 = Config.fromdict(dict(type="static", skip_inactive_branch=False))
    assert JPerceiver.from_config(cfg5).branches == "both"


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


def test_per_replica_batchnorm_groups():
    """Grouped BN == per-shard DDP semantics: each batch block normalized
    by its own moments; groups=1 identical to flax nn.BatchNorm."""
    import flax.linen as nn

    from jperceiver_tpu.models.common import BatchNorm, per_replica_bn

    rng = np.random.default_rng(3)
    # two batch halves with very different statistics
    x = np.concatenate(
        [rng.standard_normal((2, 4, 4, 8)),
         5.0 + 3.0 * rng.standard_normal((2, 4, 4, 8))]).astype(np.float32)
    x = jnp.asarray(x)

    bn = BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v = bn.init(jax.random.key(0), x)
    assert set(v["params"]) == {"scale", "bias"}
    assert set(v["batch_stats"]) == {"mean", "var"}

    # groups=1: bit-identical to the stock flax BatchNorm
    y1, m1 = bn.apply(v, x, mutable=["batch_stats"])
    yr, mr = ref.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(yr))
    np.testing.assert_array_equal(
        np.asarray(m1["batch_stats"]["mean"]), np.asarray(mr["batch_stats"]["mean"]))

    # groups=2: per-half moments -> each half's output is zero-mean/unit-var,
    # and the result DIFFERS from the synced (global) normalization.
    with per_replica_bn(2):
        y2, m2 = bn.apply(v, x, mutable=["batch_stats"])
    y2 = np.asarray(y2)
    assert np.abs(y2 - np.asarray(y1)).max() > 0.1
    for half in (y2[:2], y2[2:]):
        np.testing.assert_allclose(half.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
        np.testing.assert_allclose(half.std(axis=(0, 1, 2)), 1.0, atol=1e-3)
    # running stats: across-group average of per-group moments
    xf = np.asarray(x, np.float64)
    mus = np.stack([xf[:2].mean(axis=(0, 1, 2)), xf[2:].mean(axis=(0, 1, 2))])
    np.testing.assert_allclose(
        np.asarray(m2["batch_stats"]["mean"]), 0.1 * mus.mean(0), rtol=1e-4)

    # eval mode ignores grouping entirely
    bn_eval = BatchNorm(use_running_average=True)
    with per_replica_bn(2):
        ye = bn_eval.apply(v, x)
    ye2 = nn.BatchNorm(use_running_average=True).apply(v, x)
    np.testing.assert_array_equal(np.asarray(ye), np.asarray(ye2))


def test_selective_remat_modes():
    """remat in {False, "enc", "dec", "all", True} builds the same param
    tree and identical forward outputs (remat changes only the backward
    schedule); bad modes are rejected at setup."""
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(1, 128, 128, 32).items()}
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}

    ref_vars = None
    ref_out = None
    for mode in (False, "enc", "dec", True, "all"):
        model = JPerceiver(height=128, width=128, occ_map_size=32, remat=mode)
        v = model.init(rngs, batch, train=False)
        out = model.apply(v, batch, train=False)
        if ref_vars is None:
            ref_vars, ref_out = v, out
            continue
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(ref_vars)
        np.testing.assert_array_equal(
            np.asarray(out["disp/0"]), np.asarray(ref_out["disp/0"]))
        np.testing.assert_array_equal(
            np.asarray(out["topview"]), np.asarray(ref_out["topview"]))

    with pytest.raises(ValueError, match="remat"):
        JPerceiver(height=128, width=128, occ_map_size=32,
                   remat="warp").init(rngs, batch, train=False)


def test_share_stem_outputs_identical():
    """share_stem builds the stem tap-stack once for both encoders; every
    output must stay BIT-identical (same construction, shared operand) and
    the param tree must not change."""
    from jperceiver_tpu.models.common import share_stem_scope

    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(1, 128, 128, 32).items()}
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    model = JPerceiver(height=128, width=128, occ_map_size=32)
    variables = model.init(rngs, batch, train=True)

    outs = {}
    for shared in (False, True):
        with share_stem_scope(shared):
            outs[shared] = model.apply(
                variables, batch, train=True,
                rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"],
            )[0]
    assert set(outs[True]) == set(outs[False])
    for key, v in outs[False].items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(outs[True][key]))

    # the full gradient tree is bit-identical too (autodiff sums the two
    # stem cotangents before ONE inverse space-to-depth — same linear map)
    def gradfn(shared):
        def loss(params):
            with share_stem_scope(shared):
                out, _ = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    batch, train=True, rngs={"dropout": jax.random.key(2)},
                    mutable=["batch_stats"])
            return jnp.sum(out["disp/0"] ** 2) + jnp.sum(out["topview"] ** 2)
        return jax.grad(loss)(variables["params"])

    g0, g1 = gradfn(False), gradfn(True)
    gd = g0["depth_encoder"]["encoder"]["conv1"]["kernel"]
    assert float(jnp.max(jnp.abs(gd))) > 0, "stem got no gradient at all"
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g0, g1)

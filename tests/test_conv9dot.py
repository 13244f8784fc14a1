"""Parity: nine-shifted-matmul conv lowering vs lax.conv (ops/conv9dot.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jperceiver_tpu.ops.conv9dot import conv3x3_dots


def _ref_conv(x, w, b, mode, stride=1):
    pad = [(1, 1), (1, 1)] if mode == "same" else [(0, 0), (0, 0)]
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


@pytest.mark.parametrize("mode", ["same", "valid"])
@pytest.mark.parametrize("c,o", [(3, 64), (64, 64), (256, 1)])
def test_forward_parity_fp32(mode, c, o):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 12, 14, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, c, o)).astype(np.float32) / c)
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    got = conv3x3_dots(x, w, b, mode=mode)
    want = _ref_conv(x, w, b, mode)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 32, 48)).astype(np.float32) / 32)
    b = jnp.zeros((48,), jnp.float32)
    got = conv3x3_dots(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       b.astype(jnp.bfloat16))
    want = _ref_conv(x, w, b, "same")
    # per-tap bf16 rounding + fp32 carry: within a few bf16 ulps
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.03, atol=0.03)


@pytest.mark.parametrize("mode", ["same", "valid"])
def test_grad_parity(mode):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 10, 11, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32) / 8)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))

    def loss(f):
        return lambda x, w, b: jnp.sum(jnp.sin(f(x, w, b)))

    g_got = jax.grad(loss(lambda *a: conv3x3_dots(*a, mode=mode)),
                     argnums=(0, 1, 2))(x, w, b)
    g_want = jax.grad(loss(lambda x, w, b: _ref_conv(x, w, b, mode)),
                      argnums=(0, 1, 2))(x, w, b)
    for got, want in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode,h,w_", [("same", 12, 14), ("same", 13, 15),
                                       ("valid", 12, 14), ("valid", 13, 15)])
def test_stride2_forward_parity(mode, h, w_):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, h, w_, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 24)).astype(np.float32) / 16)
    b = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))
    got = conv3x3_dots(x, w, b, mode=mode, stride=2)
    want = _ref_conv(x, w, b, mode, stride=2)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_stride2_grad_parity():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 10, 12, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32) / 8)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))

    def loss(f):
        return lambda x, w, b: jnp.sum(jnp.sin(f(x, w, b)))

    g_got = jax.grad(loss(lambda *a: conv3x3_dots(*a, stride=2)),
                     argnums=(0, 1, 2))(x, w, b)
    g_want = jax.grad(loss(lambda x, w, b: _ref_conv(x, w, b, "same", 2)),
                      argnums=(0, 1, 2))(x, w, b)
    for got, want in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_conv3x3_module_scope():
    """Conv3x3 routes through the dots path under conv_dots_scope with the
    identical param tree and matching outputs."""
    from jperceiver_tpu.models.common import Conv3x3, conv_dots_scope

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 12)).astype(np.float32))
    m = Conv3x3(24)
    v = m.init(jax.random.key(0), x)
    base = m.apply(v, x)
    with conv_dots_scope(True):
        v2 = m.init(jax.random.key(0), x)
        dots = m.apply(v, x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    np.testing.assert_allclose(np.asarray(dots), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
    # stride-2 instances route through the dots path too (same params,
    # same output as XLA's strided conv)
    ms = Conv3x3(24, strides=2)
    vs = ms.init(jax.random.key(0), x)
    base_s = ms.apply(vs, x)
    with conv_dots_scope(True):
        ys = ms.apply(vs, x)
    assert ys.shape == (1, 4, 4, 24)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(base_s),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode,stride", [("same", 1), ("same", 2),
                                         ("valid", 1), ("valid", 2)])
def test_tapcat_forward_parity(mode, stride):
    from jperceiver_tpu.ops.conv9dot import conv3x3_tapcat

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 12, 14, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 24)).astype(np.float32) / 16)
    b = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))
    got = conv3x3_tapcat(x, w, b, mode=mode, stride=stride)
    want = _ref_conv(x, w, b, mode, stride=stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_tapcat_grad_parity():
    from jperceiver_tpu.ops.conv9dot import conv3x3_tapcat

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 10, 11, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32) / 8)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))

    def loss(f):
        return lambda x, w, b: jnp.sum(jnp.sin(f(x, w, b)))

    g_got = jax.grad(loss(conv3x3_tapcat), argnums=(0, 1, 2))(x, w, b)
    g_want = jax.grad(loss(lambda x, w, b: _ref_conv(x, w, b, "same")),
                      argnums=(0, 1, 2))(x, w, b)
    for got, want in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_tapcat_module_routing():
    """conv_dots_scope(tapcat_max_ch=N) routes C_in<=N through the
    all-taps form with identical params and outputs."""
    from jperceiver_tpu.models.common import Conv3x3, conv_dots_scope

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 12)).astype(np.float32))
    m = Conv3x3(24)
    v = m.init(jax.random.key(0), x)
    base = m.apply(v, x)
    with conv_dots_scope(True, tapcat_max_ch=16):
        got = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


# --- fused nearest-up2 + 3x3 conv ("fold_upconv") ---------------------------


def _ref_upconv(x, w, b, pad):
    from jperceiver_tpu.ops.padding import reflect_pad
    from jperceiver_tpu.ops.sampling import upsample2x_nearest

    up = upsample2x_nearest(x)
    if pad == "reflect":
        return _ref_conv(reflect_pad(up), w, b, "valid")
    return _ref_conv(up, w, b, "same")


@pytest.mark.parametrize("pad", ["reflect", "zero"])
@pytest.mark.parametrize("c,o", [(6, 4), (16, 16)])
def test_upconv_forward_parity(pad, c, o):
    from jperceiver_tpu.ops.conv9dot import upconv3x3_dots

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(2, 5, 7, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, c, o)).astype(np.float32) / c)
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    got = upconv3x3_dots(x, w, b, pad=pad)
    want = _ref_upconv(x, w, b, pad)
    assert got.shape == want.shape == (2, 10, 14, o)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad", ["reflect", "zero"])
def test_upconv_grad_parity(pad):
    from jperceiver_tpu.ops.conv9dot import upconv3x3_dots

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 6, 5, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 4)).astype(np.float32) / 8)
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    def loss(f):
        return lambda x, w, b: jnp.sum(jnp.sin(f(x, w, b)))

    g_got = jax.grad(loss(lambda x, w, b: upconv3x3_dots(x, w, b, pad=pad)),
                     argnums=(0, 1, 2))(x, w, b)
    g_want = jax.grad(loss(lambda x, w, b: _ref_upconv(x, w, b, pad)),
                      argnums=(0, 1, 2))(x, w, b)
    for got, want in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_updisp_parity():
    from jperceiver_tpu.ops.conv9dot import updisp3x3

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(2, 6, 9, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 1)).astype(np.float32) / 16)
    b = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))
    got = updisp3x3(x, w, b)
    want = _ref_upconv(x, w, b, "reflect")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    g_got = jax.grad(lambda x: jnp.sum(jnp.sin(updisp3x3(x, w, b))))(x)
    g_want = jax.grad(
        lambda x: jnp.sum(jnp.sin(_ref_upconv(x, w, b, "reflect"))))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-4)


def test_fold_upconv_depth_decoder_parity():
    """cfg.fold_upconv reproduces the depth decoder (same params) to fp32
    reassociation tolerance: disp heads AND the iconv pre-up parts fold."""
    from jperceiver_tpu.models.common import fold_upconv_scope
    from jperceiver_tpu.models.depth_net import DepthDecoder

    rng = np.random.default_rng(13)
    feats = [
        jnp.asarray(rng.normal(size=(1, 32 // 2 ** i, 32 // 2 ** i, c))
                    .astype(np.float32))
        for i, c in enumerate([64, 64, 128, 256, 512])
    ]
    dec = DepthDecoder(bottleneck=32)
    v = dec.init(jax.random.key(0), feats)
    base = dec.apply(v, feats)
    with fold_upconv_scope(True):
        got = dec.apply(v, feats)
    assert base.keys() == got.keys()
    for k in base:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(base[k]),
                                   rtol=1e-4, atol=1e-5), k


def test_fold_upconv_layout_decoder_parity():
    from jperceiver_tpu.models.common import fold_upconv_scope
    from jperceiver_tpu.models.layout_net import LayoutDecoder

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 128)).astype(np.float32))
    dec = LayoutDecoder()
    v = dec.init(jax.random.key(0), x, train=False)
    base = dec.apply(v, x, train=False)
    with fold_upconv_scope(True):
        got = dec.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fold_upconv_full_model_parity():
    """The whole flagship model under fold_upconv matches the default
    path (identical params; disp + topview heads)."""
    from jperceiver_tpu.data import synthetic_batch
    from jperceiver_tpu.models import JPerceiver
    from jperceiver_tpu.models.common import fold_upconv_scope

    h = w = 128
    model = JPerceiver(height=h, width=w, occ_map_size=h // 4)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(1, h, w, h // 4).items()}
    v = model.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, batch, train=False)
    base = model.apply(v, batch, train=False)
    with fold_upconv_scope(True):
        got = model.apply(v, batch, train=False)
    for k in ("disp/0", "disp/3", "topview", "topviewB"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(base[k]), rtol=1e-4, atol=1e-4)

"""CCT / CVP semantic goldens vs torch-functional mirrors.

The CCT block has two easy-to-mistranslate quirks
(`CrossViewTransformer.py:45-92`):
  1. hard attention: max/argmax over KEY positions per front position,
  2. the depth mix `attn @ V` — an (h,w)x(h,w) spatial matmul broadcast
     over channels (not a standard attention contraction).
These tests rebuild both in plain torch ops and compare.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from jperceiver_tpu.models import CrossViewTransformer, CycledViewProjection


def _conv1x1(x, w, b):
    return F.conv2d(x, w, b)


def test_cct_matches_torch_mirror(rng):
    h = w = 4
    c = 128
    front = rng.standard_normal((2, h, w, c)).astype(np.float32)
    cross = rng.standard_normal((2, h, w, c)).astype(np.float32)
    hat = rng.standard_normal((2, h, w, c)).astype(np.float32)
    depth = rng.standard_normal((2, 4 * h, 4 * w, 512)).astype(np.float32)

    cct = CrossViewTransformer(c)
    variables = cct.init(
        jax.random.key(0),
        jnp.asarray(front), jnp.asarray(cross), jnp.asarray(hat),
        jnp.asarray(depth),
    )
    out, score, attn = cct.apply(
        variables, jnp.asarray(front), jnp.asarray(cross), jnp.asarray(hat),
        jnp.asarray(depth),
    )

    # ---- torch mirror using the SAME weights --------------------------------
    p = variables["params"]

    def W(name):  # flax HWIO -> torch OIHW
        k = np.asarray(p[name]["kernel"])
        return torch.from_numpy(np.transpose(k, (3, 2, 0, 1)))

    def B(name):
        return torch.from_numpy(np.asarray(p[name]["bias"]))

    def t(x):  # NHWC -> NCHW torch
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    ft, ct, ht = t(front), t(cross), t(hat)

    # depth tail: two reflect-pad convs + 2x2 pools
    dk1 = np.asarray(p["conv1"]["conv"]["kernel"])
    dk2 = np.asarray(p["conv2"]["conv"]["kernel"])
    db1 = torch.from_numpy(np.asarray(p["conv1"]["conv"]["bias"]))
    db2 = torch.from_numpy(np.asarray(p["conv2"]["conv"]["bias"]))
    dt_ = t(depth)
    d1 = F.conv2d(F.pad(dt_, (1, 1, 1, 1), mode="reflect"),
                  torch.from_numpy(np.transpose(dk1, (3, 2, 0, 1))), db1)
    d1 = F.max_pool2d(d1, 2)
    d2 = F.conv2d(F.pad(d1, (1, 1, 1, 1), mode="reflect"),
                  torch.from_numpy(np.transpose(dk2, (3, 2, 0, 1))), db2)
    d2 = F.max_pool2d(d2, 2)

    b = 2
    n = h * w
    q = _conv1x1(ct, W("query_conv"), B("query_conv")).reshape(b, -1, n)
    k = _conv1x1(ft, W("key_conv"), B("key_conv")).reshape(b, -1, n)
    v = _conv1x1(ht, W("value_conv"), B("value_conv")).reshape(b, -1, n)
    energy = torch.bmm(k.permute(0, 2, 1), q)       # (B, N, N)
    s, arg = energy.max(dim=1)                      # over key positions
    T = torch.gather(v, 2, arg.unsqueeze(1).expand(-1, c, -1)).reshape(b, c, h, w)
    S = s.reshape(b, 1, h, w)
    fused = F.conv2d(torch.cat([ft, T], 1), W("f_conv"), B("f_conv"), padding=1)
    out_t = ft + fused * S

    qd = _conv1x1(ct, W("query_conv_depth"), B("query_conv_depth")).reshape(b, -1, n)
    kd = _conv1x1(ft, W("key_conv_depth"), B("key_conv_depth")).reshape(b, -1, n)
    vd = _conv1x1(d2, W("value_conv_depth"), B("value_conv_depth"))
    attn_t = torch.bmm(kd.permute(0, 2, 1), qd).max(dim=1)[0].reshape(b, 1, h, w)
    x_depth = attn_t @ vd                           # the broadcast matmul quirk
    out_t = out_t + x_depth

    np.testing.assert_allclose(
        np.asarray(out), out_t.detach().numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(score)[..., 0], S.detach().numpy()[:, 0], rtol=1e-4, atol=1e-5
    )


def test_cvp_matches_torch_mirror(rng):
    d, c = 4, 16
    x = rng.standard_normal((2, d, d, c)).astype(np.float32)
    cvp = CycledViewProjection(d)
    variables = cvp.init(jax.random.key(0), jnp.asarray(x))
    transform, retransform = cvp.apply(variables, jnp.asarray(x))

    p = variables["params"]

    def run_tm(xt, mod):
        w1 = torch.from_numpy(np.asarray(p[mod]["fc1"]["kernel"]))
        b1 = torch.from_numpy(np.asarray(p[mod]["fc1"]["bias"]))
        w2 = torch.from_numpy(np.asarray(p[mod]["fc2"]["kernel"]))
        b2 = torch.from_numpy(np.asarray(p[mod]["fc2"]["bias"]))
        y = xt.reshape(2, c, d * d)
        y = F.relu(y @ w1 + b1)
        y = F.relu(y @ w2 + b2)
        return y.reshape(2, c, d, d)

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    tf = run_tm(xt, "transform_module")
    rtf = run_tm(tf, "retransform_module")
    np.testing.assert_allclose(
        np.asarray(transform), tf.numpy().transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(retransform), rtf.numpy().transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5
    )

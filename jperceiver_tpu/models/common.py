"""Shared conv blocks for the decoder heads."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


from ..ops.padding import reflect_pad  # noqa: F401 (re-export, legacy path)

# --- per-replica BatchNorm ---------------------------------------------------
#
# The reference trains per-replica BN: DDP wraps plain nn.BatchNorm2d, so
# each GPU normalizes over its OWN per-GPU batch (`mono/apis/trainer.py:167`
# — no SyncBatchNorm conversion anywhere). Under pjit our default BN
# reduces over the GLOBAL sharded batch (XLA inserts the cross-chip
# collectives), a documented deviation (DESIGN.md #4). `per_replica_bn(G)`
# reproduces the reference semantics: batch statistics are computed per
# contiguous batch block of size B/G. When G equals the data-mesh size and
# the batch axis is sharded over it, each block IS one chip's shard, so
# the moments are computed locally with no collective at all — both a
# parity knob and an ICI-traffic saving.
#
# The group count is read at TRACE time (set it around `model.apply`, as
# `engine/trainer.py::make_train_step` does from `cfg.bn_groups`); it is
# not a traced value, so changing it requires re-jitting.

_BN_GROUPS: int = 1


class per_replica_bn:
    """Context manager: BatchNorm below computes per-group batch stats."""

    def __init__(self, groups: int):
        self.groups = max(int(groups), 1)

    def __enter__(self):
        global _BN_GROUPS
        self._prev, _BN_GROUPS = _BN_GROUPS, self.groups
        return self

    def __exit__(self, *exc):
        global _BN_GROUPS
        _BN_GROUPS = self._prev
        return False


def bn_group_count() -> int:
    return _BN_GROUPS


class BatchNorm(nn.BatchNorm):
    """`nn.BatchNorm` + optional per-replica (grouped) batch statistics.

    Drop-in: identical param/stat tree ("scale"/"bias" params,
    "mean"/"var" batch_stats). With `per_replica_bn(G)` active and
    use_running_average=False, moments are computed per contiguous batch
    block of size B/G (fp32 fast-variance formula, matching flax); the
    running stats are updated with the across-group average — the
    deterministic analog of DDP's per-replica running stats (the reference
    checkpoints rank 0's copy; ours is the group mean, documented).
    """

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        groups = bn_group_count()
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        if groups == 1 or ura:
            return super().__call__(x, use_running_average=use_running_average)
        if x.shape[0] % groups:
            raise ValueError(
                f"per_replica_bn({groups}): batch {x.shape[0]} not divisible"
            )
        assert self.use_scale and self.use_bias, "grouped path assumes affine BN"
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), self.param_dtype)
        bias = self.param("bias", self.bias_init, (c,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        xr = x.reshape(groups, x.shape[0] // groups, *x.shape[1:])
        xf = xr.astype(jnp.float32)
        red = tuple(range(1, xr.ndim - 1))  # per-group batch+spatial axes
        mu = jnp.mean(xf, red)              # (G, C)
        mu2 = jnp.mean(xf * xf, red)
        var = jnp.maximum(mu2 - mu * mu, 0.0)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * jnp.mean(mu, 0)
            ra_var.value = m * ra_var.value + (1.0 - m) * jnp.mean(var, 0)
        bshape = (groups,) + (1,) * (xr.ndim - 2) + (c,)
        y = (xf - mu.reshape(bshape)) * jax.lax.rsqrt(
            var.reshape(bshape) + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        out_dtype = self.dtype or x.dtype
        return y.reshape(x.shape).astype(out_dtype)


# --- Pallas-switchable 3x3 conv ----------------------------------------------
#
# XLA's conv lowering on this platform runs shallow-channel 3x3s at
# 1/10th-1/20th of matmul throughput; `ops/pallas/conv3x3.py` rebuilds the
# conv as nine shifted MXU dots. Like the BN group count, the switch is a
# TRACE-TIME flag (set around `model.apply` — the train step, bench and
# eval step do this from `cfg.use_pallas_conv`); changing it re-jits.

_PALLAS_CONV: bool = False
_PALLAS_CONV_FORCE: bool = False  # tests: take the kernel path on CPU too
# Round-5 DEEP-channel Pallas conv gate (`cfg.use_pallas_conv_deep`):
# routes the bandwidth-bound C>=128 nine-dot sites (decoder bottleneck
# 256s, trunk layer2/3) through the VMEM-tap-resident kernel. None = AUTO
# (currently OFF everywhere — flips to TPU-on only on a whole-step win,
# per the Pallas-conv landing rule in DESIGN.md).
_PALLAS_CONV_DEEP: bool | None = None
_PALLAS_CONV_DEEP_FORCE: bool = False  # tests: kernel path on CPU interpret
# Nine-shifted-matmul lowering for stride-1 3x3s (ops/conv9dot.py).
# None = AUTO: on for the TPU backend (measured +6% whole-step over XLA's
# conv lowering at the flagship config), off elsewhere (CPU goldens run
# XLA's exact conv). `conv_dots_scope`/cfg.conv3x3_dots override.
_CONV_DOTS: bool | None = None
_CONV_DOTS_MAX_CH: int | None = None  # optional cap: C_in>cap keeps XLA conv
# When set, dots-active convs with C_in <= this use the ONE-matmul
# all-taps form (`conv3x3_tapcat`: K=9C dense contraction) instead of
# nine K=C dots — denser MXU work in the shallow-channel regime.
_CONV_TAPCAT_MAX_CH: int | None = None
# Fold nearest-up2 into the following 3x3 conv (`ops/conv9dot.py::
# upconv3x3_dots`): 2.25x fewer conv FLOPs on the up->conv edges and no
# (2H, 2W, C) upsample materialization. Trace-time knob like the others.
# None = AUTO: on for the TPU backend (whole-step measured round 4:
# 9.94 vs 9.38 f/s alone, 10.65 f/s combined with uint8 warp taps at the
# flagship 1024^2 config), off elsewhere (CPU goldens take XLA's
# upsample+conv). The transform is numerically exact either way
# (tests/test_conv9dot.py fold_upconv parity suite).
_FOLD_UPCONV: bool | None = None


class PreUp:
    """Marker: this activation is PRE-upsample; the consuming conv folds
    the x2-nearest upsample into its own taps (`upconv3x3_dots`)."""

    __slots__ = ("x",)

    def __init__(self, x):
        self.x = x


class fold_upconv_scope:
    """Trace-time switch (`cfg.fold_upconv`): decoders hand `PreUp`
    activations to their up->conv edges instead of materializing the
    nearest-up2 tensor. `enabled=None` restores AUTO (on for TPU)."""

    def __init__(self, enabled: bool | None = True):
        self.enabled = enabled

    def __enter__(self):
        global _FOLD_UPCONV
        self._prev, _FOLD_UPCONV = _FOLD_UPCONV, self.enabled
        return self

    def __exit__(self, *exc):
        global _FOLD_UPCONV
        _FOLD_UPCONV = self._prev
        return False


def fold_upconv_active() -> bool:
    if _FOLD_UPCONV is None:
        import jax

        return jax.default_backend() == "tpu"
    return _FOLD_UPCONV


# Share ONE stem tap-stack between the depth and layout encoders (both
# stem the same normalized frame — `resnet.py::stem_tap_stack`). None =
# AUTO (on for TPU). Whole-step NEUTRAL: an alternating A/B
# (`queue_r5e.jsonl`) showed XLA's simplifier already merges the two
# stem backward chains at full scale (DESIGN.md round-5 postmortem);
# kept on for the marginally smaller traced graph, with outputs
# identical either way (`tests/test_models.py::
# test_share_stem_outputs_identical`). Off elsewhere so CPU goldens
# keep the per-encoder construction.
_SHARE_STEM: bool | None = None


class share_stem_scope:
    """Trace-time switch (`cfg.share_stem`): build the space-to-depth
    stem operand once in `JPerceiver.__call__` and hand it to both the
    depth and layout encoders. `enabled=None` restores AUTO."""

    def __init__(self, enabled: bool | None = True):
        self.enabled = enabled

    def __enter__(self):
        global _SHARE_STEM
        self._prev, _SHARE_STEM = _SHARE_STEM, self.enabled
        return self

    def __exit__(self, *exc):
        global _SHARE_STEM
        _SHARE_STEM = self._prev
        return False


def share_stem_active() -> bool:
    if _SHARE_STEM is None:
        import jax

        return jax.default_backend() == "tpu"
    return _SHARE_STEM


def _dots_active(c_in: int) -> bool:
    import jax

    on = (jax.default_backend() == "tpu") if _CONV_DOTS is None else _CONV_DOTS
    if on and _CONV_DOTS_MAX_CH is not None:
        return c_in <= _CONV_DOTS_MAX_CH
    return on


def _dots_fn(c_in: int):
    """The active dots lowering for this channel depth (None = XLA conv)."""
    if not _dots_active(c_in):
        return None
    if _CONV_TAPCAT_MAX_CH is not None and c_in <= _CONV_TAPCAT_MAX_CH:
        from ..ops.conv9dot import conv3x3_tapcat

        return conv3x3_tapcat
    from ..ops.conv9dot import conv3x3_dots

    return conv3x3_dots


class pallas_conv_scope:
    """Context manager enabling the Pallas conv path for eligible shapes."""

    def __init__(self, enabled: bool = True, force: bool = False):
        self.enabled, self.force = enabled, force

    def __enter__(self):
        global _PALLAS_CONV, _PALLAS_CONV_FORCE
        self._prev = (_PALLAS_CONV, _PALLAS_CONV_FORCE)
        _PALLAS_CONV, _PALLAS_CONV_FORCE = self.enabled, self.force
        return self

    def __exit__(self, *exc):
        global _PALLAS_CONV, _PALLAS_CONV_FORCE
        _PALLAS_CONV, _PALLAS_CONV_FORCE = self._prev
        return False


class conv_dots_scope:
    """Trace-time switch (`cfg.conv3x3_dots`): route stride-1 `Conv3x3`
    instances through `ops/conv9dot.py` — nine shifted MXU matmuls
    instead of XLA's conv lowering (see that module's rationale).

    `enabled=None` restores AUTO (TPU default); `max_ch` keeps XLA's conv
    for instances with C_in above the cap."""

    def __init__(self, enabled: bool | None = True,
                 max_ch: int | None = None,
                 tapcat_max_ch: int | None = None):
        self.enabled, self.max_ch = enabled, max_ch
        self.tapcat_max_ch = tapcat_max_ch

    def __enter__(self):
        global _CONV_DOTS, _CONV_DOTS_MAX_CH, _CONV_TAPCAT_MAX_CH
        self._prev = (_CONV_DOTS, _CONV_DOTS_MAX_CH, _CONV_TAPCAT_MAX_CH)
        _CONV_DOTS, _CONV_DOTS_MAX_CH = self.enabled, self.max_ch
        _CONV_TAPCAT_MAX_CH = self.tapcat_max_ch
        return self

    def __exit__(self, *exc):
        global _CONV_DOTS, _CONV_DOTS_MAX_CH, _CONV_TAPCAT_MAX_CH
        _CONV_DOTS, _CONV_DOTS_MAX_CH, _CONV_TAPCAT_MAX_CH = self._prev
        return False


def _pallas_conv_eligible(c_in, c_out, h, w) -> bool:
    from ..ops.pallas.conv3x3 import use_pallas_conv

    if not _PALLAS_CONV:
        return False
    if _PALLAS_CONV_FORCE:
        return h >= 4 and w >= 4
    return use_pallas_conv(c_in, c_out, h, w)


class pallas_conv_deep_scope:
    """Trace-time switch (`cfg.use_pallas_conv_deep`): route the deep
    (C>=128) stride-1 3x3 sites through the Pallas tap-resident kernel
    instead of the nine-dot XLA lowering. `enabled=None` restores AUTO."""

    def __init__(self, enabled: bool | None = True, force: bool = False):
        self.enabled, self.force = enabled, force

    def __enter__(self):
        global _PALLAS_CONV_DEEP, _PALLAS_CONV_DEEP_FORCE
        self._prev = (_PALLAS_CONV_DEEP, _PALLAS_CONV_DEEP_FORCE)
        _PALLAS_CONV_DEEP, _PALLAS_CONV_DEEP_FORCE = self.enabled, self.force
        return self

    def __exit__(self, *exc):
        global _PALLAS_CONV_DEEP, _PALLAS_CONV_DEEP_FORCE
        _PALLAS_CONV_DEEP, _PALLAS_CONV_DEEP_FORCE = self._prev
        return False


def _pallas_deep_eligible(c_in, c_out, h, w) -> bool:
    enabled = False if _PALLAS_CONV_DEEP is None else _PALLAS_CONV_DEEP
    if _PALLAS_CONV_DEEP_FORCE:
        return h >= 4 and w >= 4 and c_in >= 8 and c_out >= 8
    if not enabled:
        return False
    from ..ops.pallas.conv3x3 import use_pallas_conv_deep

    return use_pallas_conv_deep(c_in, c_out, h, w)


class Conv3x3(nn.Module):
    """3x3 stride-s conv, parameter-identical to `nn.Conv` (same
    "kernel"/"bias" names, lecun_normal init, fp32 params), that routes
    stride-1 instances through the Pallas kernel when the scope is active
    and the shape is in the kernel's win regime.

    `mode`: "same" (zero pad 1) or "valid" (input pre-padded by the
    caller, e.g. reflect_pad).
    """

    features: int
    strides: int = 1
    use_bias: bool = True
    mode: str = "same"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pre_up = isinstance(x, PreUp)
        if pre_up:
            x = x.x
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c, self.features), jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
        else:
            bias = jnp.zeros((self.features,), jnp.float32)
        if pre_up:
            # Fused nearest-up2 + conv (identical params): SAME mode means
            # zero pad on the (virtual) up grid, stride must be 1.
            assert self.strides == 1 and self.mode == "same"
            from ..ops.conv9dot import upconv3x3_dots

            return upconv3x3_dots(
                x.astype(self.dtype), kernel,
                bias.astype(self.dtype) if self.use_bias else None,
                pad="zero")
        xd = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        if self.mode == "valid":
            h, w = h - 2, w - 2  # pre-padded input; gate on OUTPUT extent
        if self.strides == 1 and _pallas_deep_eligible(c, self.features, h, w):
            from ..ops.pallas.conv3x3 import (pallas_conv3x3,
                                              pallas_conv3x3_valid)

            f = pallas_conv3x3 if self.mode == "same" else pallas_conv3x3_valid
            return f(xd, k, b)
        dots = _dots_fn(c) if self.strides in (1, 2) else None
        if dots is not None:
            return dots(xd, k, b if self.use_bias else None,
                        mode=self.mode, stride=self.strides)
        if self.strides == 1 and _pallas_conv_eligible(
                c, self.features, h, w):
            from ..ops.pallas.conv3x3 import (pallas_conv3x3,
                                              pallas_conv3x3_valid)

            f = pallas_conv3x3 if self.mode == "same" else pallas_conv3x3_valid
            return f(xd, k, b)
        pad = [(1, 1), (1, 1)] if self.mode == "same" else [(0, 0), (0, 0)]
        # No preferred_element_type here: with bf16 operands an f32-typed
        # output makes the conv TRANSPOSE rule mix an f32 cotangent with
        # the bf16 kernel (lax rejects mixed dtypes). nn.Conv semantics —
        # output in compute dtype; TPU convs accumulate fp32 internally.
        y = jax.lax.conv_general_dilated(
            xd, k, (self.strides, self.strides), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b if self.use_bias else y


class ConvReflect3x3(nn.Module):
    """ReflectionPad(1) + 3x3 VALID conv — the reference's `Conv3x3`

    (`layers.py:156-167`), used across depth/layout decoders and CCT.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv3x3(self.features, mode="valid", dtype=self.dtype,
                       name="conv")(reflect_pad(x))


class DispConv(nn.Module):
    """Single-channel 3x3 prediction head, decomposed for the MXU.

    Functionally `ConvReflect3x3(1)` with the identical param tree
    (`conv/kernel` (3,3,C,1) + `conv/bias` (1,)). A C_out=1 3x3 conv is
    hostile to the TPU in every direction (forward drives 1/128 MXU
    columns, the weight-grad conv contracts to a single feature, the
    data-grad conv reads a 1-channel cotangent at 1/128 lane use — 4.1 ms
    fwd+bwd at 512^2 x 256). Reassociating the same linear map as
        z = x_padded @ W.reshape(9, C).T        (one well-shaped matmul)
        y[p] = sum_d z[p + offset_d, d]         (9 shifted scalar adds)
    keeps every op dense; autodiff then yields two thin matmuls and a
    shifted-broadcast backward instead of three degenerate convs.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # param-tree parity with ConvReflect3x3: nested "conv" module scope
        if isinstance(x, PreUp):
            return _DispConvFold(dtype=self.dtype, name="conv")(x.x)
        return _DispConvInner(dtype=self.dtype, name="conv")(reflect_pad(x))


class _DispConvInner(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        b, hp, wp, c = xp.shape
        h, w = hp - 2, wp - 2
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c, 1), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        wc = kernel[..., 0].reshape(9, c).T  # (C, 9), d = ky*3 + kx
        z = jnp.einsum("bhwc,cd->bhwd", xp.astype(self.dtype),
                       wc.astype(self.dtype))
        y = None
        for ky in range(3):
            for kx in range(3):
                t = z[:, ky:ky + h, kx:kx + w, ky * 3 + kx]
                y = t if y is None else y + t
        return y[..., None] + bias.astype(y.dtype)


class _DispConvFold(nn.Module):
    """`_DispConvInner(reflect_pad(up2(x)))` with the upsample folded in
    (`ops/conv9dot.py::updisp3x3`); identical "kernel"/"bias" params."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c, 1), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        from ..ops.conv9dot import updisp3x3

        return updisp3x3(x.astype(self.dtype), kernel, bias)


class ConvReflect3x3Split(nn.Module):
    """`ConvReflect3x3` applied to a channel-concat, without the concat.

    conv(concat(parts), W) == sum_i conv(part_i, W[:, :, off_i:off_i+c_i])
    — identical params (`conv/kernel` over the full concat width + bias),
    but skips materializing the concatenated tensor and keeps each conv's
    input channel count a clean power-of-two (the decoder's 513-channel
    concat pads to 640 lanes on TPU). 1-channel parts (the disp skip)
    contribute via the same matmul+shift decomposition as `DispConv`
    backwards: here a (HW,1)x(1,9)->(HW,9) outer product + shifted adds is
    just the direct conv, cheap at C_in=1, so lax conv is used as-is.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts):
        # params live under a nested "conv" scope for tree parity with
        # ConvReflect3x3 (whose nn.Conv is named "conv")
        return _SplitConvInner(self.features, self.dtype, name="conv")(parts)


class _SplitConvInner(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts):
        cs = [(p.x if isinstance(p, PreUp) else p).shape[-1] for p in parts]
        total = sum(cs)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, total, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = None
        off = 0
        for p, c in zip(parts, cs):
            kp = jax.lax.slice_in_dim(kernel, off, off + c, axis=2)
            if isinstance(p, PreUp):
                # Pre-upsample part: fold the x2-nearest into this part's
                # taps (reflect-on-up == edge-pad on x); output lands at
                # the other parts' (up) resolution.
                from ..ops.conv9dot import upconv3x3_dots

                t = upconv3x3_dots(p.x.astype(self.dtype), kp, None,
                                   pad="reflect")
                y = t if y is None else y + t
                off += c
                continue
            pp = reflect_pad(p).astype(self.dtype)
            if c <= 4:
                # A C_in<=4 3x3 conv runs at <4/128 input-lane utilization
                # (the 1-ch disp skip cost ~3 ms at 256^2); stack the nine
                # shifted taps into 9C channels and contract on the MXU.
                h, w = p.shape[1], p.shape[2]
                taps = [pp[:, ky:ky + h, kx:kx + w, :]
                        for ky in range(3) for kx in range(3)]
                z = jnp.concatenate(taps, axis=-1)  # (B, H, W, 9C)
                wd = kp.reshape(9 * c, self.features)  # (ky,kx,c)-major
                t = jnp.einsum("bhwk,kf->bhwf", z, wd.astype(self.dtype))
            elif _pallas_deep_eligible(c, self.features,
                                       p.shape[1], p.shape[2]):
                # Deep-site Pallas path (round 5): one VMEM-resident strip
                # read serves all nine taps of this 256-ch iconv part.
                from ..ops.pallas.conv3x3 import pallas_conv3x3_valid

                zb = jnp.zeros((self.features,), self.dtype)
                t = pallas_conv3x3_valid(pp, kp.astype(self.dtype), zb)
            elif _dots_active(c):
                # Same nine-dot lowering as Conv3x3's TPU default — the
                # decoder iconv wgrads ran XLA's conv lowering otherwise.
                from ..ops.conv9dot import conv3x3_dots

                t = conv3x3_dots(pp, kp.astype(self.dtype), None,
                                 mode="valid")
            else:
                t = jax.lax.conv_general_dilated(
                    pp, kp.astype(self.dtype),
                    window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = t if y is None else y + t
            off += c
        return y + bias.astype(y.dtype)


class Conv1x1(nn.Module):
    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype, name="conv")(x)


class CRPBlock(nn.Module):
    """Chained residual pooling (`layers.py:184-199`): n stages of

    maxpool(5x5, s1) -> 1x1 conv, summed into the trunk.
    """

    features: int
    n_stages: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas.maxpool import max_pool_5x5_s1

        top = x
        for i in range(self.n_stages):
            # Custom-bwd pool: XLA's select-and-scatter backward is ~20x
            # slower on TPU (see ops/pallas/maxpool.py).
            top = max_pool_5x5_s1(top)
            top = nn.Conv(self.features, (1, 1), use_bias=False,
                          dtype=self.dtype, name=f"pointwise{i + 1}")(top)
            x = top + x
        return x

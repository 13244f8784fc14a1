"""BEV-layout segmentation losses (IoU / Dice / Tversky / Focal / CE / Boundary).

Behavioural parity with the reference loss zoo
(`/root/reference/mono/model/mono_baseline/dice_loss.py:255-372`,
`focal_loss.py:7-92`, `boundary_loss.py:150-192`, selected by
`net.py:554-617`), re-phrased as pure functions on NHWC logits:

* logits: (B, H, W, C) float; labels: (B, H, W) int.
* tp/fp/fn reductions are per-sample, per-class over the spatial axes.
* The boundary loss takes a **precomputed** signed distance field: the
  reference runs scipy's EDT on CPU every step (`boundary_loss.py:180`);
  since the SDF depends only on the labels, we hoist it into the host input
  pipeline (`ops/sdf.py`) and the device-side loss is one masked mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tp_fp_fn(probs: jax.Array, labels: jax.Array, num_classes: int):
    """probs: (B,H,W,C); labels: (B,H,W) -> three (B,C) reductions."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)
    tp = jnp.sum(probs * onehot, axis=(1, 2))
    fp = jnp.sum(probs * (1.0 - onehot), axis=(1, 2))
    fn = jnp.sum((1.0 - probs) * onehot, axis=(1, 2))
    return tp, fp, fn


def soft_iou_loss(logits: jax.Array, labels: jax.Array, smooth: float = 1.0) -> jax.Array:
    """-(soft IoU); perfect prediction -> -1 (`dice_loss.py:293-331`)."""
    probs = jax.nn.softmax(logits, axis=-1)
    tp, fp, fn = _tp_fp_fn(probs, labels, logits.shape[-1])
    iou = (tp + smooth) / (tp + fp + fn + smooth)
    return -jnp.mean(iou)


def soft_dice_loss(logits: jax.Array, labels: jax.Array, smooth: float = 1.0) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    tp, fp, fn = _tp_fp_fn(probs, labels, logits.shape[-1])
    dc = (2.0 * tp + smooth) / (2.0 * tp + fp + fn + smooth)
    return -jnp.mean(dc)


def tversky_loss(
    logits: jax.Array,
    labels: jax.Array,
    alpha: float = 0.3,
    beta: float = 0.7,
    smooth: float = 1.0,
) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    tp, fp, fn = _tp_fp_fn(probs, labels, logits.shape[-1])
    tv = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return -jnp.mean(tv)


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
    balance_index: int = 0,
    smooth: float = 1e-5,
) -> jax.Array:
    """Label-smoothed focal loss on softmax probs (`focal_loss.py:41-97`)."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)
    onehot = jnp.clip(onehot, smooth / (num_classes - 1), 1.0 - smooth)
    pt = jnp.sum(onehot * probs, axis=-1) + smooth
    logpt = jnp.log(pt)

    alpha_vec = jnp.full((num_classes,), 1.0 - alpha, dtype=probs.dtype)
    alpha_vec = alpha_vec.at[balance_index].set(alpha)
    at = alpha_vec[labels]
    return jnp.mean(-at * jnp.power(1.0 - pt, gamma) * logpt)


def weighted_cross_entropy(
    logits: jax.Array, labels: jax.Array, class_weight: jax.Array
) -> jax.Array:
    """torch `nn.CrossEntropyLoss(weight=w)` semantics: weighted-mean NLL."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = class_weight[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def boundary_loss(logits: jax.Array, sdf: jax.Array) -> jax.Array:
    """Foreground-prob x signed-distance mean (`boundary_loss.py:168-192`).

    Args:
      logits: (B, H, W, C); sdf: (B, H, W, C-1) precomputed signed distance
        of the foreground classes' GT masks (positive outside, negative
        inside, zero on the boundary).
    """
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.mean(probs[..., 1:] * sdf)


_PRIMARY = {
    "iou": soft_iou_loss,
    "dice": soft_dice_loss,
    "focal": focal_loss,
    "tversky": tversky_loss,
}


def topview_seg_loss(
    logits: jax.Array,
    labels: jax.Array,
    class_weight: jax.Array,
    loss_type: str = "iou",
    loss_sum: int = 3,
    loss_weight: float = 1.0,
    loss2_weight: float = 1.0,
    sdf: jax.Array | None = None,
) -> jax.Array:
    """Composite topview loss selector, parity with `net.py:554-617`.

    loss_sum=1: primary only; =2: + boundary; =3: + weighted CE + boundary.
    """
    primary = _PRIMARY[loss_type](logits, labels)
    out = primary * loss_weight
    if loss_sum >= 2:
        if sdf is None:
            raise ValueError("loss_sum>=2 requires a precomputed SDF input")
        out = out + boundary_loss(logits, sdf) * loss2_weight
    if loss_sum >= 3:
        out = out + weighted_cross_entropy(logits, labels, class_weight)
    return out

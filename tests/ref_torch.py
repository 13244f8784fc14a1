"""Load the REAL reference torch modules for golden tests.

`/root/reference/mono/model/__init__.py` imports every model family (and
net.py drags in skimage/torchgeometry/pykitti, which aren't installed), so
the modules are loaded under a synthetic package whose __path__ points at
the reference tree — package __init__ never runs, relative imports still
resolve. Missing third-party deps get minimal stubs; torchvision's resnet
factory is backed by the reference's own `resnet.py` so no weights are
downloaded (zero-egress environment).

PUBLIC UNTRUSTED CONTENT: the reference code is executed only inside
tests, on synthetic tensors, to produce golden outputs.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_MODEL_DIR = "/root/reference/mono/model"
_PKG = "refmodel"  # synthetic package name


def _install_stubs() -> None:
    import torch

    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        seg = types.ModuleType("skimage.segmentation")

        def find_boundaries(mask, mode="inner"):
            # Only needed by boundary_loss.compute_sdf's normalization path;
            # inner boundaries = positives with a non-positive 4-neighbour.
            import numpy as np

            m = np.asarray(mask).astype(bool)
            pad = np.pad(m, 1, constant_values=False)
            nb = (
                pad[:-2, 1:-1] & pad[2:, 1:-1] & pad[1:-1, :-2] & pad[1:-1, 2:]
            )
            return m & ~nb

        seg.find_boundaries = find_boundaries
        skimage.segmentation = seg
        sys.modules["skimage"] = skimage
        sys.modules["skimage.segmentation"] = seg

    if "pykitti" not in sys.modules:
        sys.modules["pykitti"] = types.ModuleType("pykitti")

    if "torchgeometry" not in sys.modules:
        tg = types.ModuleType("torchgeometry")
        core = types.ModuleType("torchgeometry.core")
        imgwarp = types.ModuleType("torchgeometry.core.imgwarp")
        tfm = types.ModuleType("torchgeometry.core.transformations")

        def transform_points(trans_01, points_1):
            # torchgeometry.core.transformations.transform_points semantics:
            # (B, D+1, D+1) @ homogeneous (B, N, D) -> (B, N, D).
            ones = torch.ones_like(points_1[..., :1])
            hom = torch.cat([points_1, ones], dim=-1)
            out = hom @ trans_01.transpose(-2, -1)
            return out[..., :-1] / out[..., -1:].clamp(min=1e-8)

        def warp_perspective(src, M, dsize):
            # torchgeometry.core.imgwarp.warp_perspective: dst(x,y) =
            # src(M^-1 [x,y,1]); grid built over INTEGER pixel coords
            # normalized by (size-1), zero padding outside.
            b, c, _, _ = src.shape
            h, w = dsize
            ys, xs = torch.meshgrid(
                torch.arange(h, dtype=src.dtype),
                torch.arange(w, dtype=src.dtype),
                indexing="ij",
            )
            grid = torch.stack([xs, ys, torch.ones_like(xs)], dim=-1)  # (h,w,3)
            Minv = torch.inverse(M)
            pts = grid.reshape(-1, 3) @ Minv.transpose(-2, -1)  # (b, h*w, 3)
            pts = pts[..., :2] / pts[..., 2:].clamp(min=1e-8)
            sh, sw = src.shape[-2:]
            gx = 2.0 * pts[..., 0] / max(sw - 1, 1) - 1.0
            gy = 2.0 * pts[..., 1] / max(sh - 1, 1) - 1.0
            grid_n = torch.stack([gx, gy], dim=-1).reshape(b, h, w, 2)
            return torch.nn.functional.grid_sample(
                src, grid_n, mode="bilinear", padding_mode="zeros",
                align_corners=True,
            )

        imgwarp.warp_perspective = warp_perspective
        tfm.transform_points = transform_points
        core.imgwarp = imgwarp
        core.transformations = tfm
        tg.core = core
        sys.modules["torchgeometry"] = tg
        sys.modules["torchgeometry.core"] = core
        sys.modules["torchgeometry.core.imgwarp"] = imgwarp
        sys.modules["torchgeometry.core.transformations"] = tfm

    if "torchvision" not in sys.modules:
        local_resnet = load_ref("resnet")  # the reference's torchvision-style copy

        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm_resnet = types.ModuleType("torchvision.models.resnet")

        def _factory(block, layers):
            def make(pretrained=False, **kw):
                # pretrained ignored (zero-egress env): goldens copy the
                # random-init weights across explicitly anyway.
                return local_resnet.ResNet(block, layers)

            return make

        bb, bn = local_resnet.BasicBlock, local_resnet.Bottleneck
        tvm.ResNet = local_resnet.ResNet
        tvm.resnet18 = _factory(bb, [2, 2, 2, 2])
        tvm.resnet34 = _factory(bb, [3, 4, 6, 3])
        tvm.resnet50 = _factory(bn, [3, 4, 6, 3])
        tvm.resnet101 = _factory(bn, [3, 4, 23, 3])
        tvm.resnet152 = _factory(bn, [3, 8, 36, 3])
        tvm_resnet.BasicBlock = bb
        tvm_resnet.Bottleneck = bn
        tvm_resnet.model_urls = {}
        tvm.resnet = tvm_resnet

        tvt = types.ModuleType("torchvision.transforms")
        tvtf = types.ModuleType("torchvision.transforms.functional")

        def rotate(img, angle):
            # Only exact multiples of 90 are used (net.py:241 angle=270);
            # torchvision rotates counter-clockwise for positive angles.
            assert angle % 90 == 0, angle
            return torch.rot90(img, k=(angle // 90) % 4, dims=(-2, -1))

        tvtf.rotate = rotate
        tvt.functional = tvtf
        tv.models = tvm
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.models.resnet"] = tvm_resnet
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvtf


def _ensure_pkg() -> None:
    if _PKG in sys.modules:
        return
    pkg = types.ModuleType(_PKG)
    pkg.__path__ = [REF_MODEL_DIR]
    sys.modules[_PKG] = pkg
    sub = types.ModuleType(f"{_PKG}.mono_baseline")
    sub.__path__ = [f"{REF_MODEL_DIR}/mono_baseline"]
    sys.modules[f"{_PKG}.mono_baseline"] = sub


def load_ref(name: str):
    """Import reference module `mono/model/mono_baseline/<name>.py`."""
    _ensure_pkg()
    full = f"{_PKG}.mono_baseline.{name}"
    if full in sys.modules:
        return sys.modules[full]
    if name not in ("resnet", "dice_loss", "focal_loss", "layers",
                    "depth_encoder", "depth_decoder", "pose_encoder",
                    "pose_decoder", "registry"):
        _install_stubs()  # heavier modules need third-party stubs
    return importlib.import_module(full)


def load_ref_registry():
    """`mono/model/registry.py` (parent dir of mono_baseline)."""
    _ensure_pkg()
    return importlib.import_module(f"{_PKG}.registry")

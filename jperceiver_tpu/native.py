"""ctypes bindings for the native host-pipeline core (`native/host_ops.cc`).

Every entry point has a pure-Python fallback so the framework runs without
the compiled library; `HAVE_NATIVE` reports which path is active. Build
with `make -C native` (the Makefile drops `libjperceiver_host.so` next to
the sources).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "native", "libjperceiver_host.so"),
    os.path.join(os.path.dirname(__file__), "libjperceiver_host.so"),
]

_lib = None
for _p in _LIB_PATHS:
    if os.path.isfile(_p):
        try:
            _lib = ctypes.CDLL(os.path.abspath(_p))
            break
        except OSError:
            pass

HAVE_NATIVE = _lib is not None

if _lib is not None:
    _lib.jp_sdf.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
    ]
    _lib.jp_resize_bilinear.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib.jp_velo_project.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
    ]


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def sdf_mask(mask: np.ndarray) -> np.ndarray:
    """Signed distance field of one (H, W) binary mask."""
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    if _lib is not None:
        out = np.empty((h, w), np.float32)
        _lib.jp_sdf(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _f32p(out), h, w
        )
        return out
    # Fallback: scipy path via ops.sdf.
    from .ops.sdf import signed_distance_field

    return signed_distance_field(mask.astype(np.int32), 2)[..., 0]


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """(H, W, C) float32 bilinear resize, half-pixel centers."""
    img = np.ascontiguousarray(img, np.float32)
    sh, sw, c = img.shape
    if _lib is not None:
        out = np.empty((dh, dw, c), np.float32)
        _lib.jp_resize_bilinear(_f32p(img), _f32p(out), sh, sw, c, dh, dw)
        return out
    ys = np.clip((np.arange(dh) + 0.5) * sh / dh - 0.5, 0, sh - 1)
    xs = np.clip((np.arange(dw) + 0.5) * sw / dw - 0.5, 0, sw - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def velo_project(points: np.ndarray, P: np.ndarray, h: int, w: int) -> np.ndarray:
    """(N, 4) velodyne points + 3x4 projection -> (h, w) min-depth map."""
    points = np.ascontiguousarray(points, np.float32)
    P = np.ascontiguousarray(P, np.float64)
    if _lib is not None:
        out = np.empty((h, w), np.float32)
        _lib.jp_velo_project(
            _f32p(points), points.shape[0],
            P.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            _f32p(out), h, w,
        )
        return out
    # Inline numpy fallback mirroring the native kernel.
    pts = points[points[:, 0] >= 0]
    hom = pts.copy()
    hom[:, 3] = 1
    proj = (P @ hom.T).T
    z = proj[:, 2]
    ok = z > 0
    xs = np.round(proj[ok, 0] / z[ok]) - 1
    ys = np.round(proj[ok, 1] / z[ok]) - 1
    zz = z[ok]
    valid = (xs >= 0) & (ys >= 0) & (xs < w) & (ys < h)
    xs, ys, zz = xs[valid].astype(int), ys[valid].astype(int), zz[valid]
    lin = ys * w + xs
    order = np.lexsort((zz, lin))
    lin, zz = lin[order], zz[order]
    first = np.ones(len(lin), bool)
    first[1:] = lin[1:] != lin[:-1]
    out = np.zeros((h, w), np.float32)
    out.flat[lin[first]] = np.maximum(zz[first], 0)
    return out

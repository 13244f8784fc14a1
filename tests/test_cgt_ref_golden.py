"""CGT scale-label goldens vs the REAL reference code (`net.py:212-476`).

Loads the reference `Baseline.get_scale_label_{static,dynamic,both}`
methods through `ref_torch` (torchgeometry/torchvision stubbed — the
~15-line `warp_perspective` stub reproduces torchgeometry's documented
align_corners/zeros semantics; `.cuda()` neutralized for CPU) and runs
them on synthetic calibrated inputs. This supersedes the numpy/cv2 mirror
in `test_cgt.py` as the primary parity check: a shared misreading of the
fliplr/rot270/uint8 quirks between our code and a hand-written mirror
would pass silently there but not here.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from jperceiver_tpu.data import kitti_like_calib
from jperceiver_tpu.losses import cgt_scale_label

from ref_torch import load_ref


@pytest.fixture()
def ref_net():
    import matplotlib

    matplotlib.use("Agg")
    # The reference calls .cuda() on every tensor mid-function; identity on CPU.
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield load_ref("net")
    finally:
        torch.Tensor.cuda = orig
        import matplotlib.pyplot as plt

        plt.close("all")  # net.py allocates a figure per call (`net.py:221`)


def _ref_inputs(bev, K3, Tr, out_hw, batch=2):
    """Tuple-keyed NCHW torch inputs the reference methods expect."""
    h, w = out_hw
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = K3
    inp = {
        ("color", 0, -1): torch.zeros((batch, 3, h, w)),
        ("odometry_K", 0, 0): torch.tensor(K4).expand(batch, 4, 4).clone(),
        ("Tr_cam2_velo", 0, 0): torch.tensor(
            Tr.astype(np.float32)).expand(batch, 4, 4).clone(),
    }
    if bev is not None:
        t = torch.tensor(np.stack(bev).astype(np.float32)).unsqueeze(1)
        inp[("bothS", 0, 0)] = t
        inp[("both_dynamic", 0, 0)] = t
    return inp


class _Opt:
    def __init__(self, occ_map_size, split):
        self.occ_map_size = occ_map_size
        self.split = split

    def __getitem__(self, k):  # get_scale_loss uses self.opt["type"]
        return getattr(self, k)


def _run_pair(ref_net, kind, split, S=64, out_hw=(375, 1242), batch=2):
    K4, Tr = kitti_like_calib()
    K3 = K4[:3, :3]
    rng = np.random.default_rng(hash((kind, split)) & 0xFFFF)
    bevs = []
    for i in range(batch):
        bev = np.zeros((S, S), np.float32)
        r0 = S // 4 + 3 * i
        bev[r0:, S // 3: 2 * S // 3 + 2 * i] = 1.0
        bev[rng.integers(0, S, 40), rng.integers(0, S, 40)] = 1.0
        bevs.append(bev)

    inst = ref_net.Baseline.__new__(ref_net.Baseline)  # methods only, no nets
    opt = _Opt(S, split)
    inputs = _ref_inputs(bevs if kind != "dynamic" else None, K3, Tr,
                         out_hw, batch)
    with torch.no_grad():
        if kind == "static":
            golden = inst.get_scale_label_static(inputs, opt)
        elif kind == "dynamic":
            inputs[("bothS", 0, 0)] = torch.zeros((batch, 1, S, S))
            golden = inst.get_scale_label_dynamic(inputs, opt)
        else:
            golden = inst.get_scale_label_both(inputs, opt)
    golden = golden.squeeze(1).numpy().astype(np.float32)  # (B, H, W)

    ours = np.asarray(
        cgt_scale_label(
            None if kind == "dynamic" else jnp.asarray(np.stack(bevs)),
            jnp.asarray(K3[None].repeat(batch, 0)),
            jnp.asarray(Tr[None].repeat(batch, 0).astype(np.float32)),
            kind=kind,
            split=split,
            occ_map_size=S,
            out_hw=out_hw,
        )
    )[..., 0]
    return golden, ours


@pytest.mark.parametrize("split", ["odometry", "argo"])
@pytest.mark.parametrize("kind", ["static", "dynamic", "both"])
def test_cgt_matches_real_reference(ref_net, kind, split):
    golden, ours = _run_pair(ref_net, kind, split)
    gm = golden > 0
    om = ours > 0
    assert gm.any(), "golden label empty — bad test geometry"
    # Support may differ only on mask boundaries (cv2.fillConvexPoly's line
    # raster vs our analytic half-plane fill; bilinear edge pixels).
    inter = (gm & om).sum()
    union = (gm | om).sum()
    assert inter / union > 0.95, f"{kind}/{split} mask IoU {inter/union:.3f}"
    common = gm & om
    np.testing.assert_allclose(
        ours[common], golden[common], rtol=2e-3, atol=2e-2,
        err_msg=f"{kind}/{split} values diverge on common support")


def test_cgt_batch_elements_differ(ref_net):
    """The per-element BEV layouts must flow through (not just batch 0).

    Uses kind='both' — the static quad mask restricts support to a small
    region where the two synthetic layouts can coincide.
    """
    golden, ours = _run_pair(ref_net, "both", "odometry")
    assert (golden[0] != golden[1]).any()
    assert (ours[0] != ours[1]).any()

"""Full-model PyTorch checkpoint import goldens vs the REAL reference code.

Builds every submodule of the reference `Baseline` (`net.py:34-65`) from
`/root/reference/mono/model/mono_baseline/`, assembles a reference-format
state_dict, imports it with `import_torch_baseline`, and checks:

  1. the imported tree has EXACTLY the structure `JPerceiver.init` produces,
  2. the end-to-end eval forward (disp pyramid, both layout branches, pose)
     matches the torch forward chain of `net.py:68-82,630-689`,
  3. export_torch_baseline round-trips back to the same state_dict.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from jperceiver_tpu.engine.checkpoint import (
    export_torch_baseline,
    import_torch_baseline,
)
from jperceiver_tpu.models import JPerceiver

from ref_torch import load_ref

pytestmark = pytest.mark.slow

H = W = 128
OCC = 32  # occ/32 == H/128 == 1: every weight exercised, smallest compile


@pytest.fixture(scope="module")
def ref_modules():
    torch.manual_seed(0)
    de_mod = load_ref("depth_encoder")
    dd_mod = load_ref("depth_decoder")
    pe_mod = load_ref("pose_encoder")
    pd_mod = load_ref("pose_decoder")
    lm = load_ref("layout_model")
    cvp_mod = load_ref("CycledViewProjection")
    cct_mod = load_ref("CrossViewTransformer")

    num_ch_enc = [64, 64, 128, 256, 512]
    mods = {
        "DepthEncoder": de_mod.DepthEncoder(18, None),
        "DepthDecoder": dd_mod.DepthDecoder(num_ch_enc),
        "PoseEncoder": pe_mod.PoseEncoder(18, None, num_input_images=2),
        "PoseDecoder": pd_mod.PoseDecoder(num_ch_enc),
        "LayoutEncoder": lm.Encoder(18, True),
        "CycledViewProjection": cvp_mod.CycledViewProjection(OCC // 32),
        "CrossViewTransformer": cct_mod.CrossViewTransformer(128),
        "LayoutDecoder": lm.Decoder(num_ch_enc, 2),
        "LayoutTransformDecoder": lm.Decoder(num_ch_enc, 2, "transform_decoder"),
        "CycledViewProjectionB": cvp_mod.CycledViewProjection(OCC // 32),
        "CrossViewTransformerB": cct_mod.CrossViewTransformer(128),
        "LayoutDecoderB": lm.Decoder(num_ch_enc, 2),
        "LayoutTransformDecoderB": lm.Decoder(num_ch_enc, 2, "transform_decoder"),
    }
    for m in mods.values():
        m.eval()
    return mods


@pytest.fixture(scope="module")
def ref_state_dict(ref_modules):
    sd = {}
    for prefix, mod in ref_modules.items():
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    return sd


@pytest.fixture(scope="module")
def flax_model_and_vars(ref_state_dict):
    model = JPerceiver(height=H, width=W, occ_map_size=OCC)
    batch = _flax_batch(np.zeros((1, 3, 3, H, W), np.float32))
    template = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False, with_pose=True,
    )
    params, stats = import_torch_baseline(ref_state_dict, depth=18)
    # Structure check: the import must produce EXACTLY the tree the model
    # expects — any missing/extra/misnamed leaf is a mapping bug.
    t_p = jax.tree_util.tree_structure(template["params"])
    i_p = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, params))
    assert t_p == i_p, f"params tree mismatch:\n{t_p}\nvs\n{i_p}"
    t_s = jax.tree_util.tree_structure(template["batch_stats"])
    i_s = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, stats))
    assert t_s == i_s
    for path, a in jax.tree_util.tree_leaves_with_path(template["params"]):
        b = params
        for p in path:
            b = b[p.key]
        assert a.shape == np.asarray(b).shape, (path, a.shape, np.asarray(b).shape)
    return model, {"params": params, "batch_stats": stats}


def _flax_batch(color_aug_nchw_frames):
    """(B, F, 3, H, W) torch-layout frames -> flax batch dict (NHWC)."""
    arr = np.transpose(color_aug_nchw_frames, (0, 1, 3, 4, 2))
    return {"color_aug": jnp.asarray(arr)}


def test_end_to_end_forward_matches_reference(ref_modules, flax_model_and_vars, rng):
    model, variables = flax_model_and_vars
    frames = rng.uniform(0, 1, (1, 3, 3, H, W)).astype(np.float32)

    # ---- torch forward chain (net.py:68-82,630-689) -----------------------
    with torch.no_grad():
        x0 = torch.from_numpy(frames[:, 0])
        feats = ref_modules["DepthEncoder"](x0)
        disps = ref_modules["DepthDecoder"](feats)
        lay = ref_modules["LayoutEncoder"](x0)
        tf, rtf = ref_modules["CycledViewProjection"](lay)
        fused, _, _ = ref_modules["CrossViewTransformer"](lay, tf, rtf, feats[-1])
        topview = ref_modules["LayoutDecoder"](fused)
        ttopview = ref_modules["LayoutTransformDecoder"](tf)
        tf_b, rtf_b = ref_modules["CycledViewProjectionB"](lay)
        fused_b, _, _ = ref_modules["CrossViewTransformerB"](lay, tf_b, rtf_b, feats[-1])
        topview_b = ref_modules["LayoutDecoderB"](fused_b)
        ttopview_b = ref_modules["LayoutTransformDecoderB"](tf_b)

        pose_feats = {
            i: F.interpolate(torch.from_numpy(frames[:, i]), [192, 640],
                             mode="bilinear", align_corners=False)
            for i in range(3)
        }
        # frame order [0, -1, 1]: index 1 = past (inverted pair), 2 = future
        poses = {}
        for idx, f in ((1, -1), (2, 1)):
            pair = ([pose_feats[idx], pose_feats[0]] if f < 0
                    else [pose_feats[0], pose_feats[idx]])
            enc = ref_modules["PoseEncoder"](torch.cat(pair, 1))
            aa, tr = ref_modules["PoseDecoder"](enc)
            poses[f] = (aa.numpy().reshape(1, 3), tr.numpy().reshape(1, 3))

    # ---- flax forward ------------------------------------------------------
    out = model.apply(_merge_vars(variables), _flax_batch(frames),
                      train=False, with_pose=True)

    def cmp(a, torch_nchw, tol=2e-3):
        b = torch_nchw.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(a), b, rtol=tol, atol=tol)

    for s in range(4):
        cmp(out[f"disp/{s}"], disps[("disp", 0, s)], tol=1e-3)
    cmp(out["topview"], topview)
    cmp(out["transform_topview"], ttopview)
    cmp(out["topviewB"], topview_b)
    cmp(out["transform_topviewB"], ttopview_b)

    # pose parity through transformation_from_parameters (tested separately
    # in test_geometry) — compare the raw decoder outputs via the transform.
    from jperceiver_tpu.ops.geometry import transformation_from_parameters

    for f in (-1, 1):
        aa, tr = poses[f]
        expected = transformation_from_parameters(
            jnp.asarray(aa), jnp.asarray(tr), invert=(f < 0))
        np.testing.assert_allclose(
            np.asarray(out[f"cam_T_cam/{f}"]), np.asarray(expected),
            rtol=1e-4, atol=1e-5,
        )


def _merge_vars(variables):
    return {
        "params": jax.tree_util.tree_map(jnp.asarray, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"]),
    }


def test_export_round_trip(ref_state_dict):
    params, stats = import_torch_baseline(ref_state_dict, depth=18)
    exported = export_torch_baseline(params, stats)
    # res_conv (`CrossViewTransformer.py:36`) and the ResNet classifier
    # heads (`encoder.fc`, unused by the pyramid forward) are dead weights
    # dropped by the import; everything else must round-trip exactly.
    skip = {k for k in ref_state_dict if ".res_conv." in k or ".fc." in k}
    missing = set(ref_state_dict) - set(exported) - skip
    assert not missing, sorted(missing)[:10]
    for k, v in exported.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(
            v, ref_state_dict[k].numpy(), err_msg=k)


def test_export_single_branch(ref_state_dict):
    """Export of a road-only tree (skip_inactive_branch, the round-4
    default for single-branch types): vehicle-branch modules are simply
    absent from the exported dict — no KeyError, everything else intact."""
    params, stats = import_torch_baseline(ref_state_dict, depth=18)
    for tree in (params, stats):
        for k in [k for k in tree if k.endswith("_b")]:
            tree.pop(k)
    exported = export_torch_baseline(params, stats)
    b_prefixes = ("CycledViewProjectionB", "CrossViewTransformerB",
                  "LayoutDecoderB", "LayoutTransformDecoderB")
    assert not [k for k in exported if k.startswith(b_prefixes)]
    assert any(k.startswith("CycledViewProjection.") for k in exported)
    assert any(k.startswith("DepthDecoder.") for k in exported)


def test_load_torch_baseline_file(tmp_path, ref_state_dict):
    """mmcv-style wrapper + DDP 'module.' prefix load path (train.py:83-88)."""
    import optax

    from jperceiver_tpu.engine.train_state import create_train_state

    path = str(tmp_path / "ref.pth")
    torch.save({"state_dict": {f"module.{k}": v for k, v in ref_state_dict.items()},
                "meta": {"epoch": 3}}, path)

    model = JPerceiver(height=H, width=W, occ_map_size=OCC)
    batch = _flax_batch(np.zeros((1, 3, 3, H, W), np.float32))
    state = create_train_state(model, optax.adam(1e-4), batch, jax.random.key(0))

    from jperceiver_tpu.engine.checkpoint import load_torch_baseline_file

    loaded = load_torch_baseline_file(path, state)
    w_ref = ref_state_dict["PoseDecoder.conv3.weight"].numpy()
    w_new = np.asarray(loaded.params["pose_decoder"]["conv3"]["kernel"])
    np.testing.assert_allclose(w_new, w_ref.transpose(2, 3, 1, 0))

"""Checkpointing: Orbax save/resume + PyTorch state-dict import.

Replaces the mmcv Runner checkpoint hook (`checkpoint_config interval=1`,
`trainer.py:186-198`) with Orbax; supports the reference's three load modes:
  resume   — full train state (step/params/batch_stats/opt_state),
  load     — weights only,
  finetune — weights only, non-strict (missing/extra keys tolerated).

`import_torch_resnet` maps a torchvision-style ResNet `state_dict`
(`.pth`, loaded with torch CPU) onto the Flax ResNet tree, enabling
ImageNet-pretrained encoder init like the reference
(`depth_encoder.py:24-26`) and golden-parity tests.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


# ---------------------------------------------------------------------------
# Orbax train-state checkpoints
# ---------------------------------------------------------------------------

def _manager(work_dir: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(os.path.join(work_dir, "checkpoints")),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(work_dir: str, state, epoch: int, max_to_keep: int = 5) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(work_dir, max_to_keep)
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()


def latest_epoch(work_dir: str) -> int | None:
    import orbax.checkpoint as ocp

    path = os.path.join(work_dir, "checkpoints")
    if not os.path.isdir(path):
        return None
    mgr = _manager(work_dir)
    return mgr.latest_step()


def restore_checkpoint(work_dir: str, state, epoch: int | None = None):
    """Returns (state, epoch). Restores the full train state (resume mode)."""
    import orbax.checkpoint as ocp

    mgr = _manager(work_dir)
    epoch = epoch if epoch is not None else mgr.latest_step()
    if epoch is None:
        raise FileNotFoundError(f"no checkpoints under {work_dir}")
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = mgr.restore(epoch, args=ocp.args.StandardRestore(template))
    state = state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return state, epoch


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _merge_matching(current, loaded):
    """Overwrite leaves of `current` present in `loaded` with equal shape.

    Returns (merged, n_loaded, skipped_paths) — torch
    `load_state_dict(strict=False)` semantics (`train.py:85-88`).
    """
    cur = _flatten(current)
    new = _flatten(loaded)
    skipped = []
    merged = dict(cur)
    n = 0
    for path, val in new.items():
        tgt = cur.get(path)
        if tgt is not None and getattr(tgt, "shape", None) == getattr(val, "shape", None):
            merged[path] = val
            n += 1
        else:
            skipped.append("/".join(map(str, path)))

    def unflatten(flat):
        root: dict = {}
        for path, val in flat.items():
            node = root
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = val
        return root

    return unflatten(merged), n, skipped


def load_weights(work_dir_or_path: str, state, epoch: int | None = None,
                 strict: bool = True):
    """Weights-only load.

    strict=True  — `load_from` semantics: the checkpoint must match the
                   model structure exactly.
    strict=False — `finetune` semantics (torch load_state_dict(strict=False),
                   `train.py:85-88`): intersecting leaves with matching
                   shapes are loaded, the rest keep their initialization.
    """
    import orbax.checkpoint as ocp

    mgr = _manager(work_dir_or_path)
    epoch = epoch if epoch is not None else mgr.latest_step()
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    if strict:
        restored = mgr.restore(epoch, args=ocp.args.StandardRestore(template))
        return state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
    raw = mgr.restore(epoch)  # structure-free restore
    params, n_p, skip_p = _merge_matching(template["params"], raw.get("params", {}))
    stats, n_s, skip_s = _merge_matching(
        template["batch_stats"], raw.get("batch_stats", {})
    )
    if skip_p or skip_s:
        import logging

        logging.getLogger("jperceiver_tpu").info(
            "finetune load: %d params + %d stats loaded, %d skipped",
            n_p, n_s, len(skip_p) + len(skip_s),
        )
    return state.replace(params=params, batch_stats=stats)


# ---------------------------------------------------------------------------
# PyTorch -> Flax ResNet import
# ---------------------------------------------------------------------------

def _torch_conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def import_torch_resnet(state_dict: dict, depth: int = 18,
                        num_input_images: int = 1):
    """torchvision ResNet state_dict -> (params, batch_stats) for models.ResNet.

    For the pose encoder (`num_input_images=2`) conv1 weights are tiled and
    scaled like the reference (`pose_encoder.py:47`).
    """
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def as_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = {k: as_np(v) for k, v in state_dict.items()}

    w = sd["conv1.weight"]
    if num_input_images > 1:
        w = np.concatenate([w] * num_input_images, axis=1) / num_input_images
    params["conv1"] = {"kernel": _torch_conv(w)}
    params["bn1"] = {"scale": sd["bn1.weight"], "bias": sd["bn1.bias"]}
    stats["bn1"] = {"mean": sd["bn1.running_mean"], "var": sd["bn1.running_var"]}

    bottleneck = depth > 34
    n_convs = 3 if bottleneck else 2
    for layer in (1, 2, 3, 4):
        b = 0
        while f"layer{layer}.{b}.conv1.weight" in sd:
            pfx = f"layer{layer}.{b}"
            name = f"layer{layer}_{b}"
            p: dict[str, Any] = {}
            s: dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                p[f"conv{ci}"] = {"kernel": _torch_conv(sd[f"{pfx}.conv{ci}.weight"])}
                p[f"bn{ci}"] = {
                    "scale": sd[f"{pfx}.bn{ci}.weight"],
                    "bias": sd[f"{pfx}.bn{ci}.bias"],
                }
                s[f"bn{ci}"] = {
                    "mean": sd[f"{pfx}.bn{ci}.running_mean"],
                    "var": sd[f"{pfx}.bn{ci}.running_var"],
                }
            if f"{pfx}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": _torch_conv(sd[f"{pfx}.downsample.0.weight"])
                }
                p["downsample_bn"] = {
                    "scale": sd[f"{pfx}.downsample.1.weight"],
                    "bias": sd[f"{pfx}.downsample.1.bias"],
                }
                s["downsample_bn"] = {
                    "mean": sd[f"{pfx}.downsample.1.running_mean"],
                    "var": sd[f"{pfx}.downsample.1.running_var"],
                }
            params[name] = p
            stats[name] = s
            b += 1
    return params, stats


def load_torch_resnet_file(path: str, depth: int = 18, num_input_images: int = 1):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_torch_resnet(sd, depth, num_input_images)


# ---------------------------------------------------------------------------
# Full-model PyTorch Baseline checkpoint import / export
# ---------------------------------------------------------------------------
#
# The reference ships single-file `state_dict` checkpoints whose consumers
# slice submodule weights by key prefix (`draw_odometry.py:53-56`). The key
# layout follows `Baseline.__init__` (`net.py:34-65`):
#   DepthEncoder.encoder.*          torchvision-style ResNet
#   DepthDecoder.{reduceN,iconvN,crpN,mergeN,dispN}.*   (`depth_decoder.py:7-44`)
#   PoseEncoder.encoder.*           6-channel conv1 ResNet
#   PoseDecoder.{reduce,conv1..3}.* (`pose_decoder.py:5-14`)
#   LayoutEncoder.{resnet_encoder.encoder,conv1,conv2}.* (`layout_model.py:76-83`)
#   CycledViewProjection[B].{transform,retransform}_module.fc_transform.{0,2}.*
#   CrossViewTransformer[B].{query,key,value}_conv[_depth] / f_conv / res_conv
#       / conv1 / conv2             (`CrossViewTransformer.py:29-43`)
#   Layout[Transform]Decoder[B].decoder.<idx>.*   ModuleList-by-index
#       (`layout_model.py:158`): per level i in 4..0 five entries
#       [upconv_i_0, norm_i_0, relu, upconv_i_1, norm_i_1], then topview=25.

_BASELINE_PREFIX_TO_FLAX = {
    "DepthEncoder": "depth_encoder",
    "DepthDecoder": "depth_decoder",
    "PoseEncoder": "pose_encoder",
    "PoseDecoder": "pose_decoder",
    "LayoutEncoder": "layout_encoder",
    "CycledViewProjection": "cvp",
    "CrossViewTransformer": "cct",
    "LayoutDecoder": "layout_decoder",
    "LayoutTransformDecoder": "layout_transform_decoder",
    "CycledViewProjectionB": "cvp_b",
    "CrossViewTransformerB": "cct_b",
    "LayoutDecoderB": "layout_decoder_b",
    "LayoutTransformDecoderB": "layout_transform_decoder_b",
}


def _decoder_modulelist_name(idx: int) -> str | None:
    """ModuleList index -> flax layout-decoder param name (None = relu)."""
    if idx == 25:
        return "topview"
    level = 4 - idx // 5
    slot = idx % 5
    return {
        0: f"upconv_{level}_0",
        1: f"norm_{level}_0",
        2: None,  # in-place ReLU occupies an index but has no params
        3: f"upconv_{level}_1",
        4: f"norm_{level}_1",
    }[slot]


def _set(tree: dict, path: tuple, leaf) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def _conv_entry(params, stats, flax_path, sd, torch_prefix,
                transpose=True, has_bias=True):
    w = sd[f"{torch_prefix}.weight"]
    _set(params, flax_path + ("kernel",), _torch_conv(w) if transpose else w)
    if has_bias and f"{torch_prefix}.bias" in sd:
        _set(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])


def _bn_entry(params, stats, flax_path, sd, torch_prefix):
    _set(params, flax_path + ("scale",), sd[f"{torch_prefix}.weight"])
    _set(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])
    _set(stats, flax_path + ("mean",), sd[f"{torch_prefix}.running_mean"])
    _set(stats, flax_path + ("var",), sd[f"{torch_prefix}.running_var"])


def import_torch_baseline(state_dict: dict, depth: int = 18):
    """Reference `Baseline` state_dict -> (params, batch_stats) for JPerceiver.

    Returns trees matching `JPerceiver.setup` (`models/jperceiver.py:86-112`);
    unused reference leaves (`res_conv`, `num_batches_tracked`) are skipped.
    """
    def as_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = {k: as_np(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    # --- the three ResNet trunks reuse the torchvision-key mapping --------
    for t_pfx, f_path in (
        ("DepthEncoder.encoder.", ("depth_encoder", "encoder")),
        ("PoseEncoder.encoder.", ("pose_encoder", "encoder")),
        ("LayoutEncoder.resnet_encoder.encoder.",
         ("layout_encoder", "resnet_encoder")),
    ):
        sub = {k[len(t_pfx):]: v for k, v in sd.items() if k.startswith(t_pfx)}
        p, s = import_torch_resnet(sub, depth)
        _set(params, f_path, p)
        _set(stats, f_path, s)

    # --- DepthDecoder ------------------------------------------------------
    dd = ("depth_decoder",)
    for i in (1, 2, 3, 4):
        _conv_entry(params, stats, dd + (f"reduce{i}", "conv"), sd,
                    f"DepthDecoder.reduce{i}.conv", has_bias=False)
        _conv_entry(params, stats, dd + (f"iconv{i}", "conv"), sd,
                    f"DepthDecoder.iconv{i}.conv")
        for s_ in (1, 2, 3, 4):  # crpN.0.{s}_pointwise: Conv1x1 bias=False
            _conv_entry(params, stats, dd + (f"crp{i}", f"pointwise{s_}"), sd,
                        f"DepthDecoder.crp{i}.0.{s_}_pointwise.conv",
                        has_bias=False)
        _conv_entry(params, stats, dd + (f"merge{i}", "conv"), sd,
                    f"DepthDecoder.merge{i}.conv")
        _conv_entry(params, stats, dd + (f"disp{i}", "conv"), sd,
                    f"DepthDecoder.disp{i}.0.conv")

    # --- PoseDecoder ---------------------------------------------------------
    for name in ("reduce", "conv1", "conv2", "conv3"):
        _conv_entry(params, stats, ("pose_decoder", name), sd,
                    f"PoseDecoder.{name}")

    # --- LayoutEncoder reduce head ------------------------------------------
    for name in ("conv1", "conv2"):
        _conv_entry(params, stats, ("layout_encoder", name, "conv"), sd,
                    f"LayoutEncoder.{name}.conv")

    # --- CVP / CCT (both branches) -------------------------------------------
    for t_pfx in ("CycledViewProjection", "CycledViewProjectionB"):
        f_root = (_BASELINE_PREFIX_TO_FLAX[t_pfx],)
        for mod in ("transform_module", "retransform_module"):
            for seq_idx, fc in ((0, "fc1"), (2, "fc2")):
                w = sd[f"{t_pfx}.{mod}.fc_transform.{seq_idx}.weight"]
                _set(params, f_root + (mod, fc, "kernel"), w.T)  # (out,in)->(in,out)
                _set(params, f_root + (mod, fc, "bias"),
                     sd[f"{t_pfx}.{mod}.fc_transform.{seq_idx}.bias"])

    for t_pfx in ("CrossViewTransformer", "CrossViewTransformerB"):
        f_root = (_BASELINE_PREFIX_TO_FLAX[t_pfx],)
        for name in ("query_conv", "key_conv", "value_conv", "f_conv",
                     "query_conv_depth", "key_conv_depth", "value_conv_depth"):
            _conv_entry(params, stats, f_root + (name,), sd, f"{t_pfx}.{name}")
        for name in ("conv1", "conv2"):
            _conv_entry(params, stats, f_root + (name, "conv"), sd,
                        f"{t_pfx}.{name}.conv")
        # res_conv exists in the reference state dict but is dead code
        # (`CrossViewTransformer.py:36`, never used in forward) — dropped.

    # --- the four layout decoders (ModuleList-by-index) ----------------------
    for t_pfx in ("LayoutDecoder", "LayoutTransformDecoder",
                  "LayoutDecoderB", "LayoutTransformDecoderB"):
        f_root = (_BASELINE_PREFIX_TO_FLAX[t_pfx],)
        for idx in range(26):
            name = _decoder_modulelist_name(idx)
            if name is None:
                continue
            if name == "topview":
                _conv_entry(params, stats, f_root + ("topview", "conv"), sd,
                            f"{t_pfx}.decoder.{idx}.conv")
            elif name.startswith("norm"):
                _bn_entry(params, stats, f_root + (name,), sd,
                          f"{t_pfx}.decoder.{idx}")
            else:
                _conv_entry(params, stats, f_root + (name,), sd,
                            f"{t_pfx}.decoder.{idx}")

    return params, stats


def export_torch_baseline(params, batch_stats) -> dict:
    """Inverse of `import_torch_baseline`: flax trees -> reference-keyed
    state_dict (numpy arrays; wrap with torch.tensor to .pth-save)."""
    flat_p = _flatten(params)
    flat_s = _flatten(batch_stats)
    out: dict[str, np.ndarray] = {}

    inv = {v: k for k, v in _BASELINE_PREFIX_TO_FLAX.items()}

    # Single-branch models (skip_inactive_branch, the round-4 default for
    # single-branch types) have no cvp_b/cct_b/... subtrees — export only
    # the modules present; the torch side loads the partial dict with
    # strict=False exactly as it does for the reference's own partial
    # checkpoints.
    roots = {k[0] for k in flat_p if k}

    def present(f_name: str) -> bool:
        return f_name in roots

    def put_conv(t_key, path, has_bias=True, transpose=True):
        w = np.asarray(flat_p[path + ("kernel",)])
        out[f"{t_key}.weight"] = np.transpose(w, (3, 2, 0, 1)) if transpose else w
        if has_bias and path + ("bias",) in flat_p:
            out[f"{t_key}.bias"] = np.asarray(flat_p[path + ("bias",)])

    def put_bn(t_key, path):
        out[f"{t_key}.weight"] = np.asarray(flat_p[path + ("scale",)])
        out[f"{t_key}.bias"] = np.asarray(flat_p[path + ("bias",)])
        out[f"{t_key}.running_mean"] = np.asarray(flat_s[path + ("mean",)])
        out[f"{t_key}.running_var"] = np.asarray(flat_s[path + ("var",)])
        out[f"{t_key}.num_batches_tracked"] = np.zeros((), np.int64)

    # ResNet trunks: flax layerL_B names back to torch layerL.B
    def put_resnet(t_pfx, f_path):
        sub_p = {k[len(f_path):]: v for k, v in flat_p.items()
                 if k[: len(f_path)] == f_path}
        for path in sorted(sub_p):
            mod = path[0]
            if mod == "conv1":
                put_conv(f"{t_pfx}.conv1", f_path + ("conv1",), has_bias=False)
            elif mod == "bn1":
                put_bn(f"{t_pfx}.bn1", f_path + ("bn1",))
            elif mod.startswith("layer") and path[-1] == "kernel":
                layer, blk = mod.split("_")
                inner = path[1]
                t_inner = ("downsample.0" if inner == "downsample_conv"
                           else inner)
                put_conv(f"{t_pfx}.{layer}.{blk}.{t_inner}",
                         f_path + (mod, inner), has_bias=False)
            elif mod.startswith("layer") and path[-1] == "scale":
                layer, blk = mod.split("_")
                inner = path[1]
                t_inner = ("downsample.1" if inner == "downsample_bn"
                           else inner)
                put_bn(f"{t_pfx}.{layer}.{blk}.{t_inner}",
                       f_path + (mod, inner))

    put_resnet("DepthEncoder.encoder", ("depth_encoder", "encoder"))
    put_resnet("PoseEncoder.encoder", ("pose_encoder", "encoder"))
    put_resnet("LayoutEncoder.resnet_encoder.encoder",
               ("layout_encoder", "resnet_encoder"))

    dd = ("depth_decoder",)
    for i in (1, 2, 3, 4):
        put_conv(f"DepthDecoder.reduce{i}.conv", dd + (f"reduce{i}", "conv"),
                 has_bias=False)
        put_conv(f"DepthDecoder.iconv{i}.conv", dd + (f"iconv{i}", "conv"))
        for s_ in (1, 2, 3, 4):
            put_conv(f"DepthDecoder.crp{i}.0.{s_}_pointwise.conv",
                     dd + (f"crp{i}", f"pointwise{s_}"), has_bias=False)
        put_conv(f"DepthDecoder.merge{i}.conv", dd + (f"merge{i}", "conv"))
        put_conv(f"DepthDecoder.disp{i}.0.conv", dd + (f"disp{i}", "conv"))

    for name in ("reduce", "conv1", "conv2", "conv3"):
        put_conv(f"PoseDecoder.{name}", ("pose_decoder", name))
    for name in ("conv1", "conv2"):
        put_conv(f"LayoutEncoder.{name}.conv", ("layout_encoder", name, "conv"))

    for f_name in ("cvp", "cvp_b"):
        if not present(f_name):
            continue
        t_pfx = inv[f_name]
        for mod in ("transform_module", "retransform_module"):
            for seq_idx, fc in ((0, "fc1"), (2, "fc2")):
                out[f"{t_pfx}.{mod}.fc_transform.{seq_idx}.weight"] = (
                    np.asarray(flat_p[(f_name, mod, fc, "kernel")]).T)
                out[f"{t_pfx}.{mod}.fc_transform.{seq_idx}.bias"] = (
                    np.asarray(flat_p[(f_name, mod, fc, "bias")]))

    for f_name in ("cct", "cct_b"):
        if not present(f_name):
            continue
        t_pfx = inv[f_name]
        for name in ("query_conv", "key_conv", "value_conv", "f_conv",
                     "query_conv_depth", "key_conv_depth", "value_conv_depth"):
            put_conv(f"{t_pfx}.{name}", (f_name, name))
        for name in ("conv1", "conv2"):
            put_conv(f"{t_pfx}.{name}.conv", (f_name, name, "conv"))

    for f_name in ("layout_decoder", "layout_transform_decoder",
                   "layout_decoder_b", "layout_transform_decoder_b"):
        if not present(f_name):
            continue
        t_pfx = inv[f_name]
        for idx in range(26):
            name = _decoder_modulelist_name(idx)
            if name is None:
                continue
            if name == "topview":
                put_conv(f"{t_pfx}.decoder.{idx}.conv",
                         (f_name, "topview", "conv"))
            elif name.startswith("norm"):
                put_bn(f"{t_pfx}.decoder.{idx}", (f_name, name))
            else:
                put_conv(f"{t_pfx}.decoder.{idx}", (f_name, name))

    return out


def apply_pretrained_encoders(state, model_cfg):
    """ImageNet-pretrained trunk init from `.pth` files, config-driven.

    Honors the reference's `depth_pretrained_path` / `pose_pretrained_path`
    knobs (`config/cfg_kitti_baseline.py:9-10`, consumed at
    `depth_encoder.py:24-26` / `pose_encoder.py:47`) plus an optional
    `layout_pretrained_path` standing in for torchvision's downloaded
    weights in the layout trunk (`ResnetEncoder.py:69-110`, pretrained=True
    — impossible in a zero-egress environment, so it is a file here too;
    defaults to the depth path).
    """
    depth = int(model_cfg.get("depth_num_layers", 18))
    pose = int(model_cfg.get("pose_num_layers", 18))
    jobs = []
    d_path = model_cfg.get("depth_pretrained_path")
    if d_path:
        jobs.append((d_path, depth, 1, ("depth_encoder", "encoder")))
    p_path = model_cfg.get("pose_pretrained_path")
    if p_path:
        jobs.append((p_path, pose, 2, ("pose_encoder", "encoder")))
    l_path = model_cfg.get("layout_pretrained_path", d_path)
    if l_path:
        jobs.append((l_path, depth, 1, ("layout_encoder", "resnet_encoder")))
    elif jobs:
        # The reference's layout trunk is ALWAYS ImageNet-pretrained
        # (`ResnetEncoder.py:69`, pretrained=True); if only pose weights were
        # given the layout trunk here stays randomly initialized — warn.
        import logging

        logging.getLogger("jperceiver_tpu").warning(
            "pretrained init: layout_pretrained_path resolves to None while "
            "other pretrained paths are set — layout trunk stays random "
            "(reference uses ImageNet weights there)"
        )
    if not jobs:
        return state

    params, stats = state.params, state.batch_stats
    for path, n_layers, n_images, tree_path in jobs:
        p, s = load_torch_resnet_file(path, n_layers, n_images)
        wrap_p: dict = {}
        wrap_s: dict = {}
        _set(wrap_p, tree_path, p)
        _set(wrap_s, tree_path, s)
        params, n_loaded, skipped = _merge_matching(params, wrap_p)
        stats, _, _ = _merge_matching(stats, wrap_s)
        if skipped:
            raise ValueError(
                f"pretrained init from {path}: {len(skipped)} mismatched "
                f"leaves, e.g. {skipped[:3]}"
            )
    return state.replace(params=params, batch_stats=stats)


def load_torch_baseline_file(path: str, state, depth: int = 18):
    """Load a reference-format `.pth` Baseline checkpoint into a train state.

    Accepts raw state_dicts and mmcv-style {'state_dict': ...} wrappers, with
    or without the DDP 'module.' prefix (`draw_odometry.py:49-56`).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    params, stats = import_torch_baseline(sd, depth)
    merged_p, n_p, skip_p = _merge_matching(state.params, params)
    merged_s, n_s, skip_s = _merge_matching(state.batch_stats, stats)
    if skip_p or skip_s:
        import logging

        logging.getLogger("jperceiver_tpu").warning(
            "torch baseline load: %d params + %d stats loaded, %d skipped",
            n_p, n_s, len(skip_p) + len(skip_s),
        )
    return state.replace(params=merged_p, batch_stats=merged_s)

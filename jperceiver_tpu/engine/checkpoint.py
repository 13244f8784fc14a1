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

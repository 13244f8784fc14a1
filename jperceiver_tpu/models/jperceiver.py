"""JPerceiver flagship model: joint depth + pose + dual BEV layout.

TPU-native re-design of the reference `Baseline` network (`net.py:32-82`):

* One forward pass computes depth pyramid, both layout branches and the two
  frame-pair poses; everything is traced once under `jit`.
* The reference calls `predict_layout` twice and throws one result away
  (`net.py:73-74`) — here the layout encoder runs exactly once and its
  features feed both branches (same computation the reference *intended*).
* Loss computation lives in `losses/multitask.py` as a pure function so the
  whole train step (forward + CGT + losses + grad + optimizer) is one XLA
  program.

Batch schema (NHWC, frames stacked on axis 1 in `frame_ids` order):
  color / color_aug : (B, F, H, W, 3)
  K, inv_K          : (B, 4, 4)    input-resolution intrinsics
  odometry_K        : (B, 4, 4)    calibration intrinsics (CGT)
  Tr_cam2_velo      : (B, 4, 4)
  bev_static        : (B, S, S)    road GT   (bothS)
  bev_dynamic       : (B, S, S)    vehicle GT (bothD)
  bev_both          : (B, S, S)    road-minus-vehicle GT (both_dynamic)
  bev_static_sdf / bev_dynamic_sdf : (B, S, S, C-1) precomputed SDFs
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import transformation_from_parameters
from ..ops.sampling import resize_bilinear
from .common import share_stem_active
from .depth_net import DepthDecoder, DepthEncoder
from .resnet import stem_tap_stack
from .layout_net import (
    CrossViewTransformer,
    CycledViewProjection,
    LayoutDecoder,
    LayoutEncoder,
)
from .pose_net import PoseDecoder, PoseEncoder
from .registry import register

POSE_INPUT_HW = (192, 640)  # `net.py:632` resizes pose inputs to this.


@register
class JPerceiver(nn.Module):
    depth_layers: int = 18
    pose_layers: int = 18
    frame_ids: Sequence[int] = (0, -1, 1)
    height: int = 1024
    width: int = 1024
    occ_map_size: int = 256
    num_class: int = 2
    scales: Sequence[int] = (0, 1, 2, 3)
    min_depth: float = 0.1
    max_depth: float = 100.0
    dtype: Any = jnp.float32
    # Gradient checkpointing: recompute encoder/decoder activations in the
    # backward pass instead of keeping them in HBM. Essential at 1024^2 on
    # 16 GB chips (a single decoder activation there is ~0.8 GB).
    # True/"all" remats every trunk; "enc" only the three encoders;
    # "dec" only the depth/layout decoders — selective modes trade less
    # recompute for less memory relief (the B>=2 fitting sweep,
    # `benchmarks/sweep.py`).
    remat: Any = False
    # Which BEV branches to compute: "both" (reference parity — `net.py:75`
    # runs both branches even for single-branch configs, kept alive under
    # jit by their BatchNorm stat updates), "road", or "vehicle". Skipping
    # the inactive branch removes its forward AND its params/stats from the
    # tree (single-branch checkpoints are therefore smaller; torch imports
    # simply skip the absent leaves).
    branches: str = "both"

    @classmethod
    def from_config(cls, cfg):
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            cfg.get("compute_dtype", "float32")
        ]
        return cls(
            dtype=dtype,
            depth_layers=cfg.get("depth_num_layers", 18),
            pose_layers=cfg.get("pose_num_layers", 18),
            frame_ids=tuple(cfg.get("frame_ids", (0, -1, 1))),
            height=cfg.get("height", 1024),
            width=cfg.get("width", 1024),
            occ_map_size=cfg.get("occ_map_size", 256),
            num_class=cfg.get("num_class", 2),
            scales=tuple(cfg.get("scales", (0, 1, 2, 3))),
            min_depth=cfg.get("min_depth", 0.1),
            max_depth=cfg.get("max_depth", 100.0),
            remat=cfg.get("remat", False),
            branches=cls._branches_from_cfg(cfg),
        )

    @staticmethod
    def _branches_from_cfg(cfg) -> str:
        """`skip_inactive_branch` narrows to the branch cfg.type trains.

        DEFAULT True (landed round 4, +1.3% whole-step measured): the
        reference computes both branches even for single-branch configs
        purely as an artifact of its design (`net.py:75`, kept alive by
        `find_unused_parameters=True`) — the inactive branch contributes
        no loss term and receives no gradient, so skipping its forward is
        exactly the class of fix as the collapsed duplicate
        `predict_layout` call. The ONLY divergence is the inactive
        branch's BatchNorm running stats, which the reference never reads
        from that branch (verified output-parity tests:
        tests/test_models.py::test_branch_skip_matches_dual_branch and
        tests/test_losses.py::test_branch_gating_by_model_type). Set
        skip_inactive_branch=False for strict both-branch tracing."""
        if not cfg.get("skip_inactive_branch", True):
            return "both"
        t = cfg.get("type", "static")
        if t in ("static", "static_raw", "Argo_static"):
            return "road"
        if t in ("dynamic", "Argo_dynamic"):
            return "vehicle"
        return "both"  # Argo_both trains both branches

    def setup(self):
        mode = {True: "all", False: ""}.get(self.remat, self.remat) or ""
        if mode not in ("", "all", "enc", "dec"):
            raise ValueError(f"remat must be bool/'all'/'enc'/'dec', got {self.remat!r}")
        enc_on, dec_on = mode in ("all", "enc"), mode in ("all", "dec")
        depth_enc_cls = nn.remat(DepthEncoder, static_argnums=(2,)) if enc_on else DepthEncoder
        pose_enc_cls = nn.remat(PoseEncoder, static_argnums=(2,)) if enc_on else PoseEncoder
        layout_enc_cls = nn.remat(LayoutEncoder, static_argnums=(2,)) if enc_on else LayoutEncoder
        depth_dec_cls = nn.remat(DepthDecoder, static_argnums=(2,)) if dec_on else DepthDecoder
        layout_dec_cls = nn.remat(LayoutDecoder, static_argnums=(2,)) if dec_on else LayoutDecoder
        self._layout_dec_cls = layout_dec_cls
        self.depth_encoder = depth_enc_cls(self.depth_layers, self.dtype)
        self.depth_decoder = depth_dec_cls(dtype=self.dtype)
        self.pose_encoder = pose_enc_cls(self.pose_layers, 2, self.dtype)
        self.pose_decoder = PoseDecoder(self.dtype)
        self.layout_encoder = layout_enc_cls(self.depth_layers, self.dtype)
        cvp_dim = self.occ_map_size // 32
        self.cvp = CycledViewProjection(cvp_dim, self.dtype)
        self.cct = CrossViewTransformer(128, self.dtype)
        layout_dec_cls = self._layout_dec_cls
        self.layout_decoder = layout_dec_cls(self.num_class, self.dtype)
        self.layout_transform_decoder = layout_dec_cls(self.num_class, self.dtype)
        self.cvp_b = CycledViewProjection(cvp_dim, self.dtype)
        self.cct_b = CrossViewTransformer(128, self.dtype)
        self.layout_decoder_b = layout_dec_cls(self.num_class, self.dtype)
        self.layout_transform_decoder_b = layout_dec_cls(self.num_class, self.dtype)

    # -- sub-forwards ------------------------------------------------------

    def _layout_branch(self, enc_feat, depth_feat, cvp, cct, dec, tdec, train):
        transform, retransform = cvp(enc_feat)
        fused, score, attn = cct(enc_feat, transform, retransform, depth_feat)
        return {
            "topview": dec(fused, train),
            "transform_topview": tdec(transform, train),
            "features": fused,
            "retransform_features": retransform,
            "cv_attn": score,
            "cm_attn": attn,
        }

    def predict_poses(self, color_aug, train: bool = False):
        """color_aug: (B, F, H, W, 3) -> {("cam_T_cam", 0, f): (B, 4, 4)}.

        Parity with `net.py:630-642`: frames resized to 192x640, pair order
        (f, 0) for past / (0, f) for future, past transforms inverted.
        """
        ph, pw = POSE_INPUT_HW
        feats = {
            f: resize_bilinear(color_aug[:, i], ph, pw)
            for i, f in enumerate(self.frame_ids)
            if f != "s"
        }
        out = {}
        for f in self.frame_ids[1:]:
            if f == "s":
                continue  # stereo frame: fixed baseline, no pose net (`net.py:634`)
            pair = [feats[f], feats[0]] if f < 0 else [feats[0], feats[f]]
            enc = self.pose_encoder(jnp.concatenate(pair, axis=-1), train)
            axisangle, translation = self.pose_decoder(enc)
            # Pose math in fp32 even under bf16 compute: bf16 axis-angles
            # quantize the warp enough to hurt the photometric loss.
            out[f"cam_T_cam/{f}"] = transformation_from_parameters(
                axisangle.astype(jnp.float32),
                translation.astype(jnp.float32),
                invert=(f < 0),
            )
        return out

    def pose_between(self, img_a, img_b):
        """Standalone 2-frame pose head for odometry/video inference."""
        ph, pw = POSE_INPUT_HW
        pair = jnp.concatenate(
            [resize_bilinear(img_a, ph, pw), resize_bilinear(img_b, ph, pw)], axis=-1
        )
        enc = self.pose_encoder(pair, False)
        axisangle, translation = self.pose_decoder(enc)
        return transformation_from_parameters(axisangle, translation, invert=False)

    # -- main forward ------------------------------------------------------

    def __call__(self, batch, train: bool = False, with_pose: bool | None = None):
        color_aug0 = batch["color_aug"][:, 0]
        # `share_stem` (trace-time, cfg knob): both encoders stem the SAME
        # normalized frame, so the weight-independent space-to-depth tap
        # stack is built once and fed to both, summing the two stem
        # cotangents before one inverse space-to-depth chain. Outputs are
        # bit-identical and the whole step is wall-clock NEUTRAL — XLA's
        # simplifier already merges both the duplicate forward (CSE) and
        # the duplicate backward chains (DESIGN.md round-5 postmortem);
        # kept for the smaller traced graph.
        stem_stack = None
        if share_stem_active():
            stem_stack = stem_tap_stack(
                (color_aug0 - 0.45) / 0.225, self.dtype)
        depth_feats = self.depth_encoder(color_aug0, train, stem_stack)
        outputs = dict(self.depth_decoder(depth_feats, train))

        enc_feat = self.layout_encoder(color_aug0, train, stem_stack)
        if self.branches in ("both", "road"):
            road = self._layout_branch(
                enc_feat, depth_feats[-1], self.cvp, self.cct,
                self.layout_decoder, self.layout_transform_decoder, train,
            )
            outputs.update(road)
        if self.branches in ("both", "vehicle"):
            vehicle = self._layout_branch(
                enc_feat, depth_feats[-1], self.cvp_b, self.cct_b,
                self.layout_decoder_b, self.layout_transform_decoder_b, train,
            )
            outputs.update({f"{k}B": v for k, v in vehicle.items()})

        if with_pose is None:
            with_pose = train
        if with_pose:
            outputs.update(self.predict_poses(batch["color_aug"], train))
        # Output contract: float32 regardless of compute dtype — losses,
        # metrics and geometry all run in full precision.
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
            outputs,
        )

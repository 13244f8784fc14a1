"""Component ablation profile of the flagship train step (1024^2, B=1).

Monkeypatches one subsystem at a time out of the jitted step and measures
the wall-clock delta — the honest way to attribute step time on a platform
where block_until_ready is a no-op. Usage:

  python benchmarks/ablate.py [full no_cgt no_ssim no_warp fwd_bwd_only ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(h=1024, batch_size=1):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from jperceiver_tpu.config import Config
    from jperceiver_tpu.data import synthetic_batch
    from jperceiver_tpu.engine import build_optimizer, create_train_state, make_train_step
    from jperceiver_tpu.models import JPerceiver

    w = h
    occ = 256 if h >= 1024 else h // 4
    cfg = Config.fromdict(
        dict(
            type="static", split="odometry", frame_ids=[0, -1, 1],
            scales=[0, 1, 2, 3], height=h, width=w, occ_map_size=occ,
            num_class=2, min_depth=0.1, max_depth=100.0, automask=True,
            disp_norm=True, smoothness_weight=1e-3, scale_weight=0.1,
            static_weight=5.0, dynamic_weight=15.0, loss_type="iou",
            loss_sum=3, loss_weight=20, loss2_weight=20, loss_weightS=20,
            loss2_weightS=20, cgt_label_hw=(375, 1242),
            optimizer=dict(type="Adam", lr=1e-4, weight_decay=0),
            optimizer_config=dict(grad_clip=dict(max_norm=35, norm_type=2)),
            lr_config=dict(policy="step", warmup=None, step=[50]),
        )
    )
    dtype = jnp.bfloat16 if os.environ.get("JP_ABLATE_BF16") else jnp.float32
    model = JPerceiver(height=h, width=w, occ_map_size=occ, dtype=dtype)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(batch_size, h, w, occ).items()}
    tx, _ = build_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, cfg)
    return step, state, batch


def timeit(step, state, batch, n_iters=10, reps=3):
    import jax

    rng = jax.random.key(1)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = step(state, batch, rng)
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / n_iters)
    return best * 1e3, compile_s


def patched(name):
    """Apply the named ablation; returns an undo callable."""
    import jax.numpy as jnp

    import jperceiver_tpu.losses.multitask as mt
    import jperceiver_tpu.ops.photometric as ph

    undo = []

    if name == "no_cgt":
        orig = mt.cgt_scale_label

        def fake_cgt(bev, k3, tr, **kw):
            b = k3.shape[0]
            return jnp.ones((b, 8, 8, 1), jnp.float32)

        mt.cgt_scale_label = fake_cgt
        undo.append(lambda: setattr(mt, "cgt_scale_label", orig))
    elif name == "no_ssim":
        orig = ph.ssim

        def fake_ssim(x, y):
            return jnp.zeros_like(x)

        ph.ssim = fake_ssim
        undo.append(lambda: setattr(ph, "ssim", orig))
    elif name == "no_warp":
        orig = mt._warped_frames_all

        def fake_warp(outputs, batch, scales, frame_ids, height, width, *a):
            out = {}
            for i, f in enumerate(frame_ids[1:], start=1):
                out[f] = jnp.repeat(batch["color"][:, i][:, None], len(scales), 1)
            return out

        mt._warped_frames_all = fake_warp
        undo.append(lambda: setattr(mt, "_warped_frames_all", orig))
    elif name == "no_photo":
        orig = mt.compute_losses

        def fake_losses(outputs, batch, cfg, rng):
            ld = orig(outputs, batch, cfg, rng)
            return {k: v for k, v in ld.items()
                    if not k.startswith(("min_reconstruct", "smooth"))}

        # cheaper: recompute but drop? that still computes. Instead patch
        # reprojection_loss AND smoothness to trivial.
        mt.compute_losses = orig
        r_orig = mt.reprojection_loss
        s_orig = mt.edge_aware_smoothness
        mt.reprojection_loss = lambda p, t: jnp.mean(
            p - t, axis=-1, keepdims=True)
        mt.edge_aware_smoothness = lambda d, t: jnp.mean(d)
        undo.append(lambda: setattr(mt, "reprojection_loss", r_orig))
        undo.append(lambda: setattr(mt, "edge_aware_smoothness", s_orig))
    elif name == "no_layout":
        import jperceiver_tpu.ops.seg_losses as sl

        orig = mt.topview_seg_loss

        def fake_seg(logits, labels, w, **kw):
            return jnp.mean(logits)

        mt.topview_seg_loss = fake_seg
        undo.append(lambda: setattr(mt, "topview_seg_loss", orig))
    elif name == "no_pose":
        from jperceiver_tpu.models.jperceiver import JPerceiver

        orig = JPerceiver.predict_poses

        def fake_poses(self, color_aug, train=False):
            b = color_aug.shape[0]
            eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
            return {f"cam_T_cam/{f}": eye for f in self.frame_ids[1:] if f != "s"}

        JPerceiver.predict_poses = fake_poses
        undo.append(lambda: setattr(JPerceiver, "predict_poses", orig))
    elif name == "no_layout_fwd":
        # Unlike no_layout (seg-loss stub; branch forward kept alive by its
        # BN-stat outputs), this stubs the branch FORWARD itself.
        from jperceiver_tpu.models.jperceiver import JPerceiver

        orig = JPerceiver._layout_branch

        def fake_branch(self, enc_feat, depth_feat, cvp, cct, dec, tdec, train):
            b = enc_feat.shape[0]
            s = self.occ_map_size
            z = jnp.zeros((b, s, s, self.num_class), jnp.float32)
            f = jnp.zeros_like(enc_feat)
            return {"topview": z, "transform_topview": z, "features": f,
                    "retransform_features": f,
                    "cv_attn": jnp.zeros((b, s // 32, s // 32, 1)),
                    "cm_attn": jnp.zeros((b, s // 32, s // 32, 1))}

        JPerceiver._layout_branch = fake_branch
        undo.append(lambda: setattr(JPerceiver, "_layout_branch", orig))
    elif name == "no_decoder":
        from jperceiver_tpu.models import depth_net

        orig = depth_net.DepthDecoder.__call__

        def fake_dec(self, feats, train=False):
            b = feats[0].shape[0]
            h2, w2 = feats[0].shape[1], feats[0].shape[2]
            mk = lambda hh, ww: jnp.full((b, hh, ww, 1), 0.5, feats[0].dtype)
            return {"disp/0": mk(h2, w2), "disp/1": mk(h2 // 2, w2 // 2),
                    "disp/2": mk(h2 // 4, w2 // 4), "disp/3": mk(h2 // 8, w2 // 8)}

        depth_net.DepthDecoder.__call__ = fake_dec
        undo.append(lambda: setattr(depth_net.DepthDecoder, "__call__", orig))
    elif name == "no_resize":
        orig = mt.resize_bilinear

        def fake_resize(img, h, w):
            m = jnp.mean(img, axis=(1, 2), keepdims=True)
            return jnp.broadcast_to(m, (img.shape[0], h, w, img.shape[-1]))

        mt.resize_bilinear = fake_resize
        undo.append(lambda: setattr(mt, "resize_bilinear", orig))
    elif name == "no_opt":
        import jperceiver_tpu.engine.trainer as tr

        orig = tr.make_train_step

        def make_step_no_opt(model, cfg, donate=True):
            import jax as _jax

            def step(state, batch, rng):
                d_rng, l_rng = _jax.random.split(
                    _jax.random.fold_in(rng, state.step))

                def loss_fn(params):
                    out, mut = model.apply(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch, train=True, rngs={"dropout": d_rng},
                        mutable=["batch_stats"])
                    ld = mt.compute_losses(out, batch, cfg, l_rng)
                    return mt.total_loss(ld), ld

                (loss, ld), grads = _jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                return state, {"loss": loss + 0.0 * tr.optax_global_norm(grads)}

            return _jax.jit(step, donate_argnums=(0,) if donate else ())

        tr.make_train_step = make_step_no_opt
        # build() imports via jperceiver_tpu.engine, patch there too
        import jperceiver_tpu.engine as eng

        eng_orig = eng.make_train_step
        eng.make_train_step = make_step_no_opt
        undo.append(lambda: setattr(tr, "make_train_step", orig))
        undo.append(lambda: setattr(eng, "make_train_step", eng_orig))
    elif name == "stop_grad_warp":
        # identical forward values; kills ONLY the photometric gradient
        # chain through the warp grids (d grid -> depth/pose).
        orig = mt._warped_frames_all

        def sg_warp(outputs, batch, scales, frame_ids, height, width,
                    min_depth, max_depth, tap_dtype=None):
            import jax as _jax

            outputs_sg = {
                k: (_jax.lax.stop_gradient(v) if str(k).startswith("disp")
                    or str(k).startswith("cam_T_cam") else v)
                for k, v in outputs.items()
            }
            return orig(outputs_sg, batch, scales, frame_ids, height, width,
                        min_depth, max_depth, tap_dtype)

        mt._warped_frames_all = sg_warp
        undo.append(lambda: setattr(mt, "_warped_frames_all", orig))
    elif name == "no_encoders":
        # Replace the ResNet trunks (depth + layout encoders) with cheap
        # pooled stand-ins of the right shapes — sizes the encoder convs.
        from jperceiver_tpu.models import resnet as rn

        orig = rn.ResNet.__call__

        def fake_resnet(self, x, train=False):
            import jax.numpy as _jnp

            b, h, w, _ = x.shape
            feats = []
            chans = self.num_ch_enc
            for i, c in enumerate(chans):
                hh, ww = h // (2 ** (i + 1)), w // (2 ** (i + 1))
                pooled = _jnp.mean(
                    x.reshape(b, hh, h // hh, ww, w // ww, x.shape[-1]),
                    axis=(2, 4))
                feats.append(_jnp.broadcast_to(
                    pooled.mean(-1, keepdims=True), (b, hh, ww, c)
                ).astype(self.dtype))
            return feats

        rn.ResNet.__call__ = fake_resnet
        undo.append(lambda: setattr(rn.ResNet, "__call__", orig))
    elif name == "no_bn":
        # BatchNorm -> affine-only (params/stats kept so the step's pytree
        # is unchanged; stats pass and normalize traffic removed) — sizes
        # the cost of train-mode batch statistics across all ~60 BN sites.
        from jperceiver_tpu.models import common as cm

        orig = cm.BatchNorm.__call__

        def fake_bn(self, x, use_running_average=None):
            c = x.shape[-1]
            scale = self.param("scale", self.scale_init, (c,), self.param_dtype)
            bias = self.param("bias", self.bias_init, (c,), self.param_dtype)
            self.variable("batch_stats", "mean",
                          lambda: jnp.zeros((c,), jnp.float32))
            self.variable("batch_stats", "var",
                          lambda: jnp.ones((c,), jnp.float32))
            return x * scale.astype(x.dtype) + bias.astype(x.dtype)

        import flax.linen as fnn
        from flax.linen.module import wrap_method_once

        # Replicate what Module.__init_subclass__ does to methods, so
        # self.param/self.variable work inside the monkeypatched body.
        cm.BatchNorm.__call__ = wrap_method_once(fnn.compact(fake_bn))
        undo.append(lambda: setattr(cm.BatchNorm, "__call__", orig))
    elif name == "no_crp_pool":
        # Replace the 16 CRP 5x5/s1 max-pools with identity — sizes the
        # pooling (fwd + custom equality-mask bwd) inside the decoder.
        from jperceiver_tpu.models import common as cm

        import jperceiver_tpu.ops.pallas.maxpool as mp

        orig = mp.max_pool_5x5_s1

        def fake_pool(x):
            return x

        mp.max_pool_5x5_s1 = fake_pool
        undo.append(lambda: setattr(mp, "max_pool_5x5_s1", orig))
    elif name == "full":
        pass
    else:
        raise ValueError(name)

    def restore():
        for u in undo:
            u()

    return restore


def build_fwd_only(h=1024, batch_size=1):
    """Forward + loss, no grad/optimizer — isolates the backward share."""
    import jax
    import jax.numpy as jnp

    from jperceiver_tpu.losses import compute_losses, total_loss

    _, state, batch = build(h, batch_size)

    from jperceiver_tpu.config import Config
    from jperceiver_tpu.models import JPerceiver

    w = h
    occ = 256 if h >= 1024 else h // 4
    dtype = jnp.bfloat16 if os.environ.get("JP_ABLATE_BF16") else jnp.float32
    model = JPerceiver(height=h, width=w, occ_map_size=occ, dtype=dtype)
    cfg = Config.fromdict(dict(
        type="static", split="odometry", frame_ids=[0, -1, 1],
        scales=[0, 1, 2, 3], height=h, width=w, occ_map_size=occ,
        num_class=2, min_depth=0.1, max_depth=100.0, automask=True,
        disp_norm=True, smoothness_weight=1e-3, scale_weight=0.1,
        static_weight=5.0, dynamic_weight=15.0, loss_type="iou",
        loss_sum=3, loss_weight=20, loss2_weight=20, loss_weightS=20,
        loss2_weightS=20, cgt_label_hw=(375, 1242)))

    @jax.jit
    def fwd(state, batch, rng):
        out, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
        ld = compute_losses(out, batch, cfg, rng)
        return state, {"loss": total_loss(ld)}

    return fwd, state, batch


def main():
    names = sys.argv[1:] or ["full", "no_cgt", "no_ssim", "no_warp", "no_photo"]
    for name in names:
        restore = patched(name) if name != "fwd_only" else (lambda: None)
        try:
            if name == "fwd_only":
                step, state, batch = build_fwd_only()
            else:
                step, state, batch = build()
            ms, compile_s = timeit(step, state, batch)
            print(json.dumps(dict(ablation=name, step_ms=round(ms, 1),
                                  compile_s=round(compile_s, 1))), flush=True)
        except Exception as e:
            print(json.dumps(dict(ablation=name,
                                  error=f"{type(e).__name__}: {str(e)[:160]}")),
                  flush=True)
        finally:
            restore()


if __name__ == "__main__":
    main()

"""Training engine: one jitted SPMD step + the epoch loop.

Replaces the reference's mmcv `Runner` + DDP + `DistOptimizerHook` stack
(`mono/apis/trainer.py:146-235`, `mono/core/utils/dist_utils.py:12-60`)
with the TPU-native design: the ENTIRE per-iteration computation — forward,
CGT label synthesis, all losses, backward, gradient clip, Adam update — is
one `jit`-compiled XLA program, sharded data-parallel over the mesh.
Gradient averaging across chips is emitted by sharded autodiff as `psum`
over ICI (no manual bucketed allreduce).
"""

from __future__ import annotations

import time
from typing import Callable, Iterable

import jax
import jax.numpy as jnp

from ..losses.multitask import compute_losses, total_loss
from ..parallel.mesh import make_mesh


def make_train_step(model, cfg, donate: bool = True,
                    out_shardings=None) -> Callable:
    """Returns jitted `step(state, batch, rng) -> (state, metrics)`.

    `out_shardings` (optional) pins the output placement — pass
    `(zero1_state_shardings(mesh, state), NamedSharding(mesh, P()))` to
    keep ZeRO-1-sharded optimizer moments sharded across steps (see
    `parallel/mesh.py::zero1_state_shardings`).
    """

    # Per-replica BN parity knob (`cfg.bn_groups`, default 1 = global-batch
    # stats): the reference trains per-replica BN under DDP
    # (`trainer.py:167`); set bn_groups to the data-mesh size to reproduce
    # those semantics (and drop the BN-stat collectives from the step).
    bn_groups = int(cfg.get("bn_groups", 1)) if hasattr(cfg, "get") else 1
    # Pallas conv path for shallow-channel 3x3s (`cfg.use_pallas_conv`).
    use_pconv = bool(cfg.get("use_pallas_conv", False)) if hasattr(cfg, "get") else False
    # Deep-channel (C>=128) Pallas conv gate (`cfg.use_pallas_conv_deep`,
    # None = AUTO; see models/common.py::pallas_conv_deep_scope).
    pconv_deep = cfg.get("use_pallas_conv_deep", None) if hasattr(cfg, "get") else None
    # Nine-shifted-matmul conv lowering (`cfg.conv3x3_dots`, ops/conv9dot.py).
    # Default None = AUTO (on for the TPU backend, measured +6% whole-step).
    use_dots = cfg.get("conv3x3_dots", None) if hasattr(cfg, "get") else None
    dots_max_ch = cfg.get("conv3x3_dots_max_ch", None) if hasattr(cfg, "get") else None
    # All-taps ONE-matmul form for shallow convs (C_in <= this): see
    # ops/conv9dot.py::conv3x3_tapcat.
    tapcat_max_ch = cfg.get("conv3x3_tapcat_max_ch", None) if hasattr(cfg, "get") else None
    # Fold nearest-up2 into the consuming convs (ops/conv9dot.py).
    # Default None = AUTO (on for TPU; round-4 measured 10.65 f/s combined
    # with uint8 taps vs 9.38 base at the flagship config).
    fold_up = cfg.get("fold_upconv", None) if hasattr(cfg, "get") else None
    # Share one stem tap-stack between the depth/layout encoders
    # (`cfg.share_stem`, models/common.py::share_stem_scope).
    share_stem = cfg.get("share_stem", None) if hasattr(cfg, "get") else None

    def step(state, batch, rng):
        from ..models.common import (conv_dots_scope, fold_upconv_scope,
                                     pallas_conv_deep_scope,
                                     pallas_conv_scope, per_replica_bn,
                                     share_stem_scope)

        dropout_rng, loss_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            with per_replica_bn(bn_groups), pallas_conv_scope(use_pconv), \
                    pallas_conv_deep_scope(pconv_deep), \
                    conv_dots_scope(use_dots, dots_max_ch, tapcat_max_ch), \
                    fold_upconv_scope(fold_up), share_stem_scope(share_stem):
                outputs, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch,
                    train=True,
                    rngs={"dropout": dropout_rng},
                    mutable=["batch_stats"],
                )
            loss_dict = compute_losses(outputs, batch, cfg, loss_rng)
            return total_loss(loss_dict), (loss_dict, mutated["batch_stats"])

        (loss, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        metrics = dict(loss_dict)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   out_shardings=out_shardings)


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(model, cfg=None) -> Callable:
    """Jitted inference step: outputs only (no losses), eval-mode BN."""
    use_pconv = bool(cfg.get("use_pallas_conv", False)) if (
        cfg is not None and hasattr(cfg, "get")) else False
    pconv_deep = cfg.get("use_pallas_conv_deep", None) if (
        cfg is not None and hasattr(cfg, "get")) else None
    use_dots = cfg.get("conv3x3_dots", None) if (
        cfg is not None and hasattr(cfg, "get")) else None
    dots_max_ch = cfg.get("conv3x3_dots_max_ch", None) if (
        cfg is not None and hasattr(cfg, "get")) else None
    tapcat_max_ch = cfg.get("conv3x3_tapcat_max_ch", None) if (
        cfg is not None and hasattr(cfg, "get")) else None
    fold_up = cfg.get("fold_upconv", None) if (
        cfg is not None and hasattr(cfg, "get")) else None
    share_stem = cfg.get("share_stem", None) if (
        cfg is not None and hasattr(cfg, "get")) else None

    def step(state, batch):
        from ..models.common import (conv_dots_scope, fold_upconv_scope,
                                     pallas_conv_deep_scope,
                                     pallas_conv_scope, share_stem_scope)

        with pallas_conv_scope(use_pconv), \
                pallas_conv_deep_scope(pconv_deep), \
                conv_dots_scope(use_dots, dots_max_ch, tapcat_max_ch), \
                fold_upconv_scope(fold_up), share_stem_scope(share_stem):
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch,
                train=False,
                with_pose=True,
            )

    return jax.jit(step)


class Trainer:
    """Epoch-driven training loop with hooks.

    Mirrors the responsibilities of `train_mono` + mmcv Runner
    (`trainer.py:146-199`): optimizer/lr policy, per-interval logging,
    per-epoch checkpointing and evaluation — minus the wrapper classes.
    """

    def __init__(
        self,
        model,
        cfg,
        train_loader: Iterable,
        steps_per_epoch: int,
        mesh=None,
        eval_hook: Callable | None = None,
        checkpoint_fn: Callable | None = None,
        log_fn: Callable | None = None,
        log_interval: int = 50,
        profile_dir: str | None = None,
    ):
        self.model = model
        self.cfg = cfg
        self.train_loader = train_loader
        self.steps_per_epoch = steps_per_epoch
        self.mesh = mesh if mesh is not None else make_mesh()
        self.eval_hook = eval_hook
        self.checkpoint_fn = checkpoint_fn
        self.log_fn = log_fn or (lambda payload: None)
        self.log_interval = log_interval
        # Tracing/profiling: the reference has none beyond ad-hoc tick
        # counters (`eval_hooks.py:142-146`); here a jax.profiler trace of
        # steps 10..14 of the first epoch lands in profile_dir when set.
        self.profile_dir = profile_dir
        self.train_step = make_train_step(model, cfg)

    def _shard(self, batch):
        from ..parallel import shard_batch

        return shard_batch(self.mesh, batch)

    def _prefetch(self, it, n_steps: int):
        """Overlap host decode + H2D transfer with device compute.

        One background thread keeps up to 2 already-device-put batches
        ready; jax dispatch is async so the train step launches while the
        next batch is being decoded/transferred (replaces the reference's
        synchronous `.cuda()` hop in `batch_processor`, `trainer.py:20-27`).
        """
        import queue as _q
        import threading

        out: _q.Queue = _q.Queue(maxsize=2)
        error: list[BaseException] = []

        def producer():
            try:
                for _ in range(n_steps):
                    try:
                        out.put(self._shard(next(it)))
                    except StopIteration:
                        break
            except BaseException as e:  # surface loader errors, don't hang
                error.append(e)
            finally:
                out.put(None)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = out.get()
            if item is None:
                if error:
                    raise error[0]
                return
            yield item

    def fit_resilient(self, state, total_epochs: int, work_dir: str,
                      rng=None, start_epoch: int = 0, max_restarts: int = 3):
        """fit() with crash recovery — a capability the reference lacks
        (SURVEY §5: recovery is manual --resume_from only).

        On a device/runtime failure (e.g. "TPU worker process crashed"),
        restores the latest checkpoint from `work_dir` and resumes from
        that epoch, up to `max_restarts` times.

        Catches the whole infrastructure-failure family — RuntimeError
        (JaxRuntimeError/XlaRuntimeError subclass it, and a killed TPU
        worker surfaces as a plain RuntimeError from the runtime layer)
        and OSError (gRPC/socket failures from a dead peer or coordinator)
        — but deliberately NOT programming errors (TypeError, ValueError,
        KeyError): restarting those would loop max_restarts times and then
        re-raise anyway, burning checkpoint restores on a determinate bug.
        """
        from .checkpoint import restore_checkpoint

        # Orbax restores arrays onto the default device only; on a mesh
        # the resumed step would then mix a device-0 state with sharded
        # batches (jit rejects the placement). Capture the live state's
        # shardings up front and re-place every restored leaf. (Flat
        # lists, not tree_map: a None "sharding" leaf would be read as an
        # empty subtree and break structure matching.)
        from jax.sharding import NamedSharding, PartitionSpec, SingleDeviceSharding

        def _target(s):
            # A live single-device leaf (e.g. the uncommitted `step`
            # scalar) must come back mesh-REPLICATED: Orbax restores it
            # COMMITTED to device 0, which jit rejects next to sharded
            # batches; the uncommitted original was silently replicable.
            if isinstance(s, SingleDeviceSharding):
                return NamedSharding(self.mesh, PartitionSpec())
            return s

        live_leaves, _ = jax.tree_util.tree_flatten(state)
        shardings = [_target(getattr(x, "sharding", None))
                     for x in live_leaves]

        def replace_like(restored):
            leaves, treedef = jax.tree_util.tree_flatten(restored)
            # strict: a restored tree whose leaf count drifted from the
            # live template (e.g. a checkpoint saved under a different
            # skip_inactive_branch setting) must fail loudly, not get
            # silently truncated shardings.
            return jax.tree_util.tree_unflatten(treedef, [
                jax.device_put(x, s) if s is not None else x
                for x, s in zip(leaves, shardings, strict=True)])

        restarts = 0
        while True:
            try:
                return self.fit(state, total_epochs, rng=rng,
                                start_epoch=start_epoch)
            except (RuntimeError, OSError) as e:
                restarts += 1
                if restarts > max_restarts:
                    raise
                self.log_fn({"mode": "restart", "error": str(e)[:200],
                             "attempt": restarts})
                try:
                    state, epoch = restore_checkpoint(work_dir, state)
                    state = replace_like(state)
                    start_epoch = epoch
                except FileNotFoundError:
                    start_epoch = 0  # no checkpoint yet: restart from scratch

    def fit(self, state, total_epochs: int, rng=None, start_epoch: int = 0):
        rng = rng if rng is not None else jax.random.key(0)
        for epoch in range(start_epoch, total_epochs):
            t_epoch = time.time()
            # Epoch-seeded reshuffle (the reference's DistSamplerSeedHook,
            # `trainer.py:181-190`): explicit so resumed runs (`fit_resilient`)
            # see the same per-epoch order as an uninterrupted run.
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(epoch)
            batches = self._prefetch(iter(self.train_loader), self.steps_per_epoch)
            for i, batch in enumerate(batches):
                if self.profile_dir and epoch == start_epoch and i == 10:
                    jax.profiler.start_trace(self.profile_dir)
                state, metrics = self.train_step(state, batch, rng)
                if self.profile_dir and epoch == start_epoch and i == 14:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                if (i + 1) % self.log_interval == 0:
                    payload = {
                        "mode": "train",
                        "epoch": epoch + 1,
                        "iter": i + 1,
                        **{str(k): float(v) for k, v in metrics.items()},
                    }
                    self.log_fn(payload)
            if self.checkpoint_fn is not None:
                self.checkpoint_fn(state, epoch + 1)
            if self.eval_hook is not None:
                eval_metrics = self.eval_hook(state, epoch + 1)
                if eval_metrics:
                    self.log_fn({"mode": "val", "epoch": epoch + 1, **eval_metrics})
            self.log_fn(
                {"mode": "epoch_time", "epoch": epoch + 1,
                 "seconds": time.time() - t_epoch}
            )
        return state

"""Multi-device END-TO-END epoch test (VERDICT r3 item 8).

Exercises the full production composition on the 8-device CPU mesh —
DataLoader (epoch-seeded shuffle, device sharding via Trainer._shard),
`Trainer.fit` over real epochs, `EvalHook` with its every-sample-exactly-
once guarantee, and Orbax checkpointing — TOGETHER, where the round-3
suite only covered the pieces separately. Also proves `fit_resilient`
recovers from the runtime-error class a killed TPU worker actually raises
(plain RuntimeError from the runtime layer, not only JaxRuntimeError).

Reference semantics being matched: mmcv Runner epoch loop + hooks
(`mono/apis/trainer.py:146-235`) combined with `DistEvalMonoHook`
(`mono/core/evaluation/eval_hooks.py:116-262`).
"""

import numpy as np
import pytest

import jax

from jperceiver_tpu.config import Config
from jperceiver_tpu.data.loader import DataLoader
from jperceiver_tpu.data.simulated import SimulatedDataset
from jperceiver_tpu.engine import build_optimizer, create_train_state
from jperceiver_tpu.engine.checkpoint import restore_checkpoint, save_checkpoint
from jperceiver_tpu.engine.eval_hook import EvalHook
from jperceiver_tpu.engine.trainer import Trainer
from jperceiver_tpu.models import JPerceiver
from jperceiver_tpu.parallel import make_mesh

pytestmark = pytest.mark.slow

H = W = 128
OCC = 32
N_TRAIN = 16
N_VAL = 6
BATCH = 8  # one sample per device on the 8-device mesh


def e2e_cfg():
    # Mirrors tests/test_train.py::tiny_cfg so the XLA compile cache is
    # shared across the suite (full-model CPU compiles cost minutes).
    return Config.fromdict(
        dict(
            type="static", split="odometry", frame_ids=[0, -1, 1],
            scales=[0, 1, 2, 3], height=H, width=W, occ_map_size=OCC,
            num_class=2, min_depth=0.1, max_depth=100.0, automask=True,
            disp_norm=True, smoothness_weight=1e-3, scale_weight=0.1,
            static_weight=5.0, dynamic_weight=15.0, loss_type="iou",
            loss_sum=1, loss_weight=1.0, loss2_weight=1.0,
            cgt_label_hw=(188, 621),
            optimizer=dict(type="Adam", lr=1e-4, weight_decay=0),
            optimizer_config=dict(grad_clip=dict(max_norm=35, norm_type=2)),
            lr_config=dict(policy="step", warmup=None, step=[50]),
        )
    )


class RecordingLoader:
    """Wraps a DataLoader; records per-sample color means per epoch so the
    test can assert the shuffle actually reshuffles across epochs."""

    def __init__(self, inner):
        self.inner = inner
        self.epochs: list[list[np.ndarray]] = []

    def set_epoch(self, epoch):
        self.inner.set_epoch(epoch)
        self.epochs.append([])

    def __len__(self):
        return len(self.inner)

    def __iter__(self):
        for b in self.inner:
            self.epochs[-1].append(
                np.asarray(b["color"]).mean(axis=(1, 2, 3, 4)))
            yield b


def build_pieces(tmp_path):
    cfg = e2e_cfg()
    model = JPerceiver(height=H, width=W, occ_map_size=OCC)
    mesh = make_mesh()
    train_ds = SimulatedDataset(n_scenes=N_TRAIN, height=H, width=W, seed=0)
    val_ds = SimulatedDataset(n_scenes=N_VAL, height=H, width=W, seed=7,
                              with_gt=True)
    train_loader = RecordingLoader(DataLoader(
        train_ds, batch_size=BATCH, shuffle=True, num_workers=2,
        drop_last=True))
    val_loader = DataLoader(val_ds, batch_size=BATCH, shuffle=False,
                            num_workers=2, drop_last=False)
    logs: list[dict] = []
    trainer = Trainer(
        model, cfg, train_loader, steps_per_epoch=len(train_loader),
        mesh=mesh,
        eval_hook=EvalHook(model, val_loader, cfg),
        checkpoint_fn=lambda state, epoch: save_checkpoint(
            str(tmp_path), state, epoch),
        log_fn=logs.append, log_interval=1,
    )
    sample = trainer._shard(next(iter(train_loader.inner)))
    tx, _ = build_optimizer(cfg, steps_per_epoch=len(train_loader))
    state = create_train_state(model, tx, sample, jax.random.key(0))
    return trainer, state, train_loader, logs


def test_fit_epochs_eval_checkpoint_8dev(tmp_path):
    assert len(jax.devices()) == 8
    trainer, state, train_loader, logs = build_pieces(tmp_path)

    final = trainer.fit(state, total_epochs=2)
    assert int(final.step) == 2 * len(train_loader)

    # Loader sharding: each global batch carried BATCH distinct samples
    # (one per device slot), and the epoch-seeded shuffle produced a
    # different sample order in epoch 2 than epoch 1.
    assert len(train_loader.epochs) == 2
    first_ep, second_ep = train_loader.epochs
    assert len(first_ep) == len(train_loader)
    for means in first_ep + second_ep:
        assert len(np.unique(np.round(means, 6))) > 1, (
            "all per-device samples identical within a batch")
    assert not all(
        np.allclose(a, b) for a, b in zip(first_ep, second_ep)), (
        "epoch 2 saw the identical batch order as epoch 1 — set_epoch "
        "reshuffle not reaching the loader")

    # EvalHook ran each epoch and evaluated EVERY val sample exactly once
    # (padded-tail masking: 6 samples in a batch-8 loader).
    vals = [l for l in logs if l.get("mode") == "val"]
    assert len(vals) == 2
    for v in vals:
        assert v["n_eval_samples"] == N_VAL
        assert np.isfinite(v["abs_rel"])
        assert "road_iou" in v

    # Checkpoints landed and restore round-trips to the last epoch.
    restored, epoch = restore_checkpoint(str(tmp_path), final)
    assert epoch == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(final.params)[0]))


def test_fit_resilient_recovers_from_runtime_error(tmp_path):
    """A RuntimeError mid-epoch-2 (what a killed worker raises) triggers
    checkpoint restore + resume, finishing all epochs."""
    trainer, state, train_loader, logs = build_pieces(tmp_path)
    steps = len(train_loader)

    orig_step = trainer.train_step
    calls = {"n": 0}

    def flaky_step(st, batch, rng):
        calls["n"] += 1
        if calls["n"] == steps + 1:  # first step of epoch 2
            raise RuntimeError("TPU worker process crashed (simulated)")
        return orig_step(st, batch, rng)

    trainer.train_step = flaky_step
    final = trainer.fit_resilient(state, total_epochs=2,
                                  work_dir=str(tmp_path))

    restarts = [l for l in logs if l.get("mode") == "restart"]
    assert len(restarts) == 1
    assert "crashed" in restarts[0]["error"]
    # Epoch 1 ran once, epoch 2 re-ran from the epoch-1 checkpoint: the
    # restored state carries `steps` optimizer steps + `steps` more.
    assert int(final.step) == 2 * steps
    # One val per completed epoch: the crash hit before epoch-2's eval.
    vals = [l for l in logs if l.get("mode") == "val"]
    assert len(vals) == 2

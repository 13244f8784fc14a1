"""Train CLI — config-driven entry point.

Parity with the reference `train.py:18-106` / `run.py`: one command, a
Python config file, a work dir; resume/load/finetune knobs. Multi-chip is
declarative (mesh + shardings), so there is no `torch.distributed.launch`
equivalent — one process per HOST (not per chip), `jax.distributed`
initializes multi-host when present.

  python -m jperceiver_tpu.tools.train --config cfg.py --work_dir out/
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train JPerceiver-TPU")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--config", help="python config file")
    g.add_argument("--family", help=(
        "named preset family (one of config.families.list_families(), "
        "e.g. odometry_boundary_ce_iou_1024_20 — every reference "
        "cfg_kitti_baseline_* permutation)"))
    p.add_argument("--work_dir", required=True)
    p.add_argument("--resume_from", default=None)
    p.add_argument("--load_from", default=None)
    p.add_argument("--finetune", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize()")
    p.add_argument("--max_steps_per_epoch", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.multihost:
        import jax

        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..data import DataLoader, get_dataset
    from ..engine import (Trainer, build_optimizer, create_train_state,
                          enable_compile_cache)

    enable_compile_cache()
    from ..engine.checkpoint import restore_checkpoint, save_checkpoint, load_weights
    from ..engine.eval_hook import EvalHook
    from ..engine.logger import JsonLogger, get_root_logger
    from ..models import build_model
    from ..parallel import make_mesh

    if args.family:
        from ..config import build_family

        cfg = build_family(args.family)
    else:
        cfg = Config.fromfile(args.config)
    for k in ("resume_from", "load_from", "finetune"):
        v = getattr(args, k)
        if v is not None:
            cfg[k] = v
    if args.seed is not None:
        np.random.seed(args.seed)

    logger = get_root_logger()
    logger.info("devices: %s", jax.devices())

    model_cfg = cfg.model
    # The loss config reads flat fields; merge data-level ones in.
    for key in ("type", "split"):
        if key not in model_cfg and key in cfg.data:
            model_cfg[key] = cfg.data[key]

    model = build_model(model_cfg)
    with_sdf = int(model_cfg.get("loss_sum", 1)) >= 2

    data_cfg = cfg.data
    train_ds = get_dataset(data_cfg, training=True, with_sdf=with_sdf,
                           num_class=model_cfg.get("num_class", 2))
    batch_size = int(cfg.get("imgs_per_gpu", 2)) * jax.local_device_count()
    train_loader = DataLoader(
        train_ds,
        batch_size=batch_size,
        shuffle=True,
        num_workers=int(cfg.get("workers_per_gpu", 4)),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    steps_per_epoch = len(train_loader)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)

    tx, _ = build_optimizer(cfg, steps_per_epoch)
    sample = next(iter(train_loader))
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    state = create_train_state(model, tx, sample, jax.random.key(args.seed or 0))

    if any(model_cfg.get(k) for k in
           ("depth_pretrained_path", "pose_pretrained_path",
            "layout_pretrained_path")):
        from ..engine.checkpoint import apply_pretrained_encoders

        state = apply_pretrained_encoders(state, model_cfg)
        logger.info("initialized encoder trunks from pretrained .pth files")

    start_epoch = 0
    if cfg.get("resume_from"):
        state, start_epoch = restore_checkpoint(cfg.resume_from, state)
        logger.info("resumed from %s at epoch %d", cfg.resume_from, start_epoch)
    elif cfg.get("load_from"):
        state = load_weights(cfg.load_from, state)
    elif cfg.get("finetune"):
        state = load_weights(cfg.finetune, state, strict=False)

    eval_hook = None
    if cfg.get("validate", False):
        val_ds = get_dataset(data_cfg, training=False, with_sdf=with_sdf,
                             num_class=model_cfg.get("num_class", 2))
        val_loader = DataLoader(
            val_ds, batch_size=jax.local_device_count(), shuffle=False,
            num_workers=int(cfg.get("workers_per_gpu", 4)),
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            # Evaluation must see every sample: pad the tail instead of
            # dropping it (pad duplicates bias the mean negligibly).
            drop_last=False,
        )
        eval_hook = EvalHook(model, val_loader, model_cfg)

    ckpt_interval = int(cfg.get("checkpoint_config", {}).get("interval", 1))

    def checkpoint_fn(state, epoch):
        if epoch % ckpt_interval == 0 and jax.process_index() == 0:
            save_checkpoint(args.work_dir, state, epoch)

    trainer = Trainer(
        model,
        model_cfg,
        train_loader,
        steps_per_epoch,
        mesh=make_mesh(),
        eval_hook=eval_hook,
        checkpoint_fn=checkpoint_fn,
        log_fn=JsonLogger(args.work_dir),
        log_interval=int(cfg.get("log_config", {}).get("interval", 50)),
    )
    trainer.fit_resilient(
        state, int(cfg.get("total_epochs", 1)), args.work_dir,
        start_epoch=start_epoch,
    )


if __name__ == "__main__":
    main()

"""Rank-0 JSON-lines training logger.

Parity with the reference's mmcv TextLoggerHook + `<timestamp>.log.json`
(`config/*.py log_config`, `readme.md:92`, `env.py:68-77`): scalar metrics
land both on stdout and in a `.log.json` file in the work dir; only
process 0 writes in multi-host runs.
"""

from __future__ import annotations

import json
import logging
import os
import time


def get_root_logger(log_level=logging.INFO) -> logging.Logger:
    import jax

    logger = logging.getLogger("jperceiver_tpu")
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
        )
        logger.addHandler(h)
    rank = jax.process_index()
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    return logger


class JsonLogger:
    def __init__(self, work_dir: str, stamp: str | None = None):
        import jax

        self.is_main = jax.process_index() == 0
        self.path = None
        if self.is_main:
            os.makedirs(work_dir, exist_ok=True)
            stamp = stamp or time.strftime("%Y%m%d_%H%M%S")
            self.path = os.path.join(work_dir, f"{stamp}.log.json")
        self.logger = get_root_logger()

    def __call__(self, payload: dict) -> None:
        if not self.is_main:
            return
        line = json.dumps(payload, default=float)
        with open(self.path, "a") as f:
            f.write(line + "\n")
        if payload.get("mode") in ("train", "val"):
            keys = [k for k in payload if k not in ("mode", "epoch", "iter")]
            head = ", ".join(f"{k}={payload[k]:.4f}" for k in keys[:6]
                             if isinstance(payload[k], float))
            self.logger.info(
                "%s epoch %s iter %s: %s",
                payload["mode"], payload.get("epoch"), payload.get("iter"), head,
            )

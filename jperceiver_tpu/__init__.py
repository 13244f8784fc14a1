"""jperceiver_tpu — a TPU-native joint depth / pose / BEV-layout perception framework.

Re-implements the capabilities of JPerceiver (ECCV 2022, reference repo
`sunnyHelen/JPerceiver`) as an idiomatic JAX/XLA/Pallas framework:

* `ops`        — geometry & loss primitives (grid sampling, SSIM, SE3, seg losses)
* `models`     — Flax modules (ResNet encoders, depth/pose/layout decoders, CVP, CCT)
* `losses`     — CGT scale-label synthesis and the multi-task loss, all inside XLA
* `data`       — host input pipeline (KITTI / Argoverse / folder datasets)
* `parallel`   — mesh construction & sharding helpers (pjit data parallel)
* `engine`     — train step, optimizer, checkpointing, eval hooks
* `evaluation` — depth metrics, layout mIoU/mAP, KITTI odometry toolkit
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even when a site-level sitecustomize.py imported jax
# and pinned the platform before user code ran (the axon TPU image does
# this): `JAX_PLATFORMS=cpu python -m jperceiver_tpu.tools.train ...` must
# actually run on CPU, not silently grab the TPU out from under another
# process's device claim.
import os as _os

_plat = _os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass
del _os, _plat

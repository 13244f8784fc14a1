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

# lfdtpu — a TPU-native one-stage anchor-free detection framework.
#
# Re-designed from scratch for JAX/XLA/Pallas on TPU, with the capabilities of
# the LFD (A-Light-and-Fast-Detector) reference framework:
#   - LFD / LFDv2 / FCOS anchor-free detectors (multi-scale point assignment)
#   - LFD-ResNet fast/faster/fastest backbone family + mmdet-style ResNet
#   - SimpleNeck / FPN / SimpleFPN necks; LFD / FCOS heads
#   - focal / QFL / DFL / IoU-family / CE / BCE / SmoothL1 / L1 / MSE losses
#   - fully-vectorized on-device target assignment (no CPU loops)
#   - static-shape fused decode + on-device NMS (exact greedy semantics)
#   - pack-based data pipeline (WIDERFACE / COCO / TT100K parsers, scale-aware
#     region samplers, threaded host loader producing fixed-size crops)
#   - hook-driven Executor with jitted train step, data parallelism over a
#     jax.sharding.Mesh, checkpoint/resume, warmup + multistep LR
#   - deployment: f32 / bf16 / int8 jitted end-to-end inference + latency harness
#
# Reference behavior citations use `<file>:<line>` pointing into the upstream
# repo (see SURVEY.md); the implementation here is an independent TPU-first
# design, not a translation.

__version__ = "0.1.0"

from . import ops  # noqa: F401

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


def _enable_persistent_compilation_cache():
    """Point JAX's persistent compilation cache at a writable directory.

    Engine builds on the remote-attached TPU backend cost minutes per
    program; the persistent cache makes every repeat build (same model,
    shape, precision, knobs) a sub-second deserialize instead.  Timed
    sections are unaffected: a cache hit yields the identical executable.

    Resolution order:
      - ``LFD_DISABLE_JAX_CACHE=1`` disables entirely;
      - an already-configured cache dir (``JAX_COMPILATION_CACHE_DIR`` or
        explicit ``jax.config.update``) is respected untouched;
      - ``LFD_JAX_CACHE_DIR`` overrides the location;
      - otherwise ``<checkout root>/.jax_cache`` next to this package.
    """
    import os

    if os.environ.get("LFD_DISABLE_JAX_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        cache = os.environ.get("LFD_JAX_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:  # never block import on cache setup
        pass


_enable_persistent_compilation_cache()

from . import ops  # noqa: F401, E402

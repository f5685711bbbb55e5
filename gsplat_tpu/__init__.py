"""gsplat_tpu — TPU-native 3D Gaussian Splatting framework (JAX/XLA/Pallas).

A from-scratch, TPU-first re-design with the full capability surface of
graphdeco-inria/gaussian-splatting (see SURVEY.md):

- ``gsplat_tpu.core``     — camera/projection math, SH basis, schedules, activations.
- ``gsplat_tpu.ops``      — the differentiable tile rasterizer (Pallas kernels +
                            pure-XLA binning/sort), KNN init, fused SSIM, losses.
- ``gsplat_tpu.models``   — the padded-capacity Gaussian parameter model.
- ``gsplat_tpu.scene``    — COLMAP/Blender readers, cameras, PLY io, Scene assembly.
- ``gsplat_tpu.train``    — jitted train step, adaptive density control, optimizers.
- ``gsplat_tpu.parallel`` — device-mesh sharding: camera DP, tile sharding,
                            primitive-major sharding.
- ``gsplat_tpu.cli``      — train/render/metrics/full_eval entry points.
- ``gsplat_tpu.viewer``   — SIBR-compatible TCP network bridge.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("GSPLAT_PLATFORM"):
    # Pin the JAX backend ("cpu"/"tpu") before anything initializes it.
    # An env hook rather than a CLI flag because site customizations may
    # register accelerator plugins that ignore JAX_PLATFORMS — only
    # jax.config.update ahead of first backend touch reliably wins, and
    # this package is imported before any CLI runs device code.
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["GSPLAT_PLATFORM"])

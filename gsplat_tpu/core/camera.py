"""Device-side camera view: the small pytree of arrays the renderer consumes.

Host-side cameras (with images, masks, depth maps) live in
``gsplat_tpu.scene.cameras``; this module holds only what crosses into jit.
Semantics parity: reference scene/cameras.py:80-89 (precomputed transforms)
and gaussian_renderer/__init__.py:33-50 (raster settings).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core import transforms


@jax.tree_util.register_dataclass
@dataclass
class CameraView:
    """All arrays; image H/W stay static Python ints passed alongside."""
    world_view: jnp.ndarray   # (4,4) x_view = W2V @ x_world (column convention)
    full_proj: jnp.ndarray    # (4,4) = P @ W2V
    camera_center: jnp.ndarray  # (3,)
    tanfovx: jnp.ndarray      # ()
    tanfovy: jnp.ndarray      # ()
    exposure_idx: jnp.ndarray  # () int32; -1 = no per-image exposure

    @staticmethod
    def create(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
               znear: float = 0.01, zfar: float = 100.0,
               trans=np.array([0.0, 0.0, 0.0]), scale: float = 1.0,
               exposure_idx: int = -1) -> "CameraView":
        """From COLMAP-convention R (cam→world rotation), T (world→cam transl.).

        Parity: reference scene/cameras.py:86-89 — zfar=100, znear=0.01,
        world_view/projection composed identically (modulo our column-vector
        storage).
        """
        import math
        w2v = transforms.world_to_view(R, T, trans, scale)
        proj = transforms.projection_matrix(znear, zfar, fovx, fovy)
        full = (proj @ w2v).astype(np.float32)
        cam_center = np.linalg.inv(w2v)[:3, 3].astype(np.float32)
        return CameraView(
            world_view=jnp.asarray(w2v),
            full_proj=jnp.asarray(full),
            camera_center=jnp.asarray(cam_center),
            tanfovx=jnp.asarray(math.tan(fovx * 0.5), jnp.float32),
            tanfovy=jnp.asarray(math.tan(fovy * 0.5), jnp.float32),
            exposure_idx=jnp.asarray(exposure_idx, jnp.int32),
        )

"""Camera & covariance math (pure jnp, autodiff-friendly).

Semantics match the reference implementation (parity targets cited per
function): /root/reference/utils/graphics_utils.py, utils/general_utils.py and
scene/gaussian_model.py. Matrices here use the standard **column-vector
convention** (``x_view = W2V @ x_world``); the reference stores the transposes
(torch row-vector convention, see reference scene/cameras.py:86-88) — the
boundary code (PLY/JSON/viewer protocol) converts explicitly.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=np.array([0.0, 0.0, 0.0]), scale: float = 1.0) -> np.ndarray:
    """4x4 world→view matrix.

    Parity: reference utils/graphics_utils.py:38-49 (getWorld2View2). The
    reference stores COLMAP's R already transposed (camera-to-world rotation),
    so W2V[:3,:3] = R^T, W2V[:3,3] = t; then the camera center is optionally
    shifted/scaled via the C2W round-trip.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(t)
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + np.asarray(translate)) * scale
    C2W[:3, 3] = cam_center
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective projection with z mapped to [0,1], z_sign=+1.

    Parity: reference utils/graphics_utils.py:51-71 (column-vector form, i.e.
    before the reference's ``.transpose(0,1)`` storage).
    """
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    """Parity: reference utils/graphics_utils.py:73-74."""
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    """Parity: reference utils/graphics_utils.py:76-77."""
    return 2 * math.atan(pixels / (2 * focal))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w,x,y,z, unnormalized) → rotation matrices, batched [...,4]→[...,3,3].

    Parity: reference utils/general_utils.py:78-99 (build_rotation).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R · diag(s), batched. Parity: reference utils/general_utils.py:101-110."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]


def covariance_from_scaling_rotation(scaling: jnp.ndarray, scaling_modifier,
                                     rotation: jnp.ndarray) -> jnp.ndarray:
    """3D covariance Σ = L Lᵀ packed as symmetric-6 (xx,xy,xz,yy,yz,zz).

    Parity: reference scene/gaussian_model.py:33-37 + utils/general_utils.py:64-76.
    """
    # Component form of L·Lᵀ with L = R·diag(s): C_ij = Σ_k s_k² R_ik R_jk.
    # Explicit arithmetic keeps it exact f32 on the VPU — a batched (N,3,3)
    # matmul would hit the MXU at bf16 (distorting thin covariances) with
    # heavy lane padding.
    R = quat_to_rotmat(rotation)
    s2 = jnp.square(scaling_modifier * scaling)              # (...,3)

    def c(i, j):
        return (s2[..., 0] * R[..., i, 0] * R[..., j, 0]
                + s2[..., 1] * R[..., i, 1] * R[..., j, 1]
                + s2[..., 2] * R[..., i, 2] * R[..., j, 2])

    return jnp.stack([c(0, 0), c(0, 1), c(0, 2),
                      c(1, 1), c(1, 2), c(2, 2)], axis=-1)


def cov6_to_mat(cov6: jnp.ndarray) -> jnp.ndarray:
    """Unpack symmetric-6 → full 3x3."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1),
    ], axis=-2)


def inverse_sigmoid(x):
    """Parity: reference utils/general_utils.py:18-19."""
    return jnp.log(x / (1 - x))

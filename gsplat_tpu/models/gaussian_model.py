"""The Gaussian scene representation as a static-shape JAX pytree.

Capability parity with the reference's ``GaussianModel``
(/root/reference/scene/gaussian_model.py:30-473), re-designed TPU-first:

- The reference mutates tensor sizes freely during adaptive density control
  (clone/split/prune change N, gaussian_model.py:388-469) — a dynamic-shape
  poison pill for XLA. Here all per-primitive arrays live in **padded
  capacity buffers** with an ``active`` mask; density control is a masked
  write under ``jit`` and the host doubles capacity (one re-jit) only when
  the buffer fills.
- Activations are identical: exp(scale), sigmoid(opacity), normalized quat
  (gaussian_model.py:32-47).
- The SH degree warm-up (oneupSHdegree, :145-147) is a traced int32 so the
  degree bump does not retrigger compilation; coefficients above the active
  degree are masked in the renderer.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core import sh as sh_lib
from gsplat_tpu.core import transforms


@jax.tree_util.register_dataclass
@dataclass
class GaussianParams:
    """Per-primitive parameters, stored pre-activation (reference layout:
    gaussian_model.py:50-66). All arrays have leading dim = capacity; slots
    with ``active == False`` are dead padding."""
    xyz: jnp.ndarray        # (CAP, 3)
    f_dc: jnp.ndarray       # (CAP, 3)            SH DC coefficients
    f_rest: jnp.ndarray     # (CAP, K-1, 3)       higher SH coefficients
    scaling: jnp.ndarray    # (CAP, 3)            log-scale
    rotation: jnp.ndarray   # (CAP, 4)            unnormalized quaternion wxyz
    opacity: jnp.ndarray    # (CAP,)              logit-opacity
    active: jnp.ndarray     # (CAP,) bool
    active_sh_degree: jnp.ndarray  # () int32, warm-up state

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        return int(round((self.f_rest.shape[1] + 1) ** 0.5)) - 1

    # --- activations (parity: gaussian_model.py:102-143) ---
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / jnp.linalg.norm(self.rotation, axis=-1, keepdims=True)

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def get_features(self) -> jnp.ndarray:
        """(CAP, K, 3): DC + rest, coefficient-major like reference
        get_features (gaussian_model.py:115-118)."""
        return jnp.concatenate([self.f_dc[:, None, :], self.f_rest], axis=1)

    def get_covariance(self, scaling_modifier=1.0) -> jnp.ndarray:
        """Symmetric-6 3D covariance (parity: gaussian_model.py:142-143)."""
        return transforms.covariance_from_scaling_rotation(
            self.get_scaling(), scaling_modifier, self.get_rotation())

    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.active.astype(jnp.int32))

    def one_up_sh_degree(self) -> "GaussianParams":
        """Parity: gaussian_model.py:145-147."""
        return dataclasses.replace(
            self,
            active_sh_degree=jnp.minimum(self.active_sh_degree + 1,
                                         self.max_sh_degree))


TRAINABLE_FIELDS = ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity")


def trainables(g: GaussianParams) -> dict:
    """The float leaves that receive gradients (reference param groups,
    gaussian_model.py:183-190)."""
    return {k: getattr(g, k) for k in TRAINABLE_FIELDS}


def with_trainables(g: GaussianParams, t: dict) -> GaussianParams:
    return dataclasses.replace(g, **t)


def empty(capacity: int, max_sh_degree: int) -> GaussianParams:
    K = (max_sh_degree + 1) ** 2
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        f_dc=jnp.zeros((capacity, 3), jnp.float32),
        f_rest=jnp.zeros((capacity, K - 1, 3), jnp.float32),
        scaling=jnp.full((capacity, 3), -10.0, jnp.float32),
        rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (capacity, 1)),
        opacity=jnp.full((capacity,), -10.0, jnp.float32),
        active=jnp.zeros((capacity,), bool),
        active_sh_degree=jnp.zeros((), jnp.int32),
    )


def create_from_pcd(points: np.ndarray, colors: np.ndarray, max_sh_degree: int,
                    capacity: int | None = None) -> GaussianParams:
    """Initialize from SfM points (parity: gaussian_model.py:149-176).

    - colors → SH DC via RGB2SH; higher coefficients zero.
    - initial log-scale = log(sqrt(mean squared distance to 3 NN)) per axis
      (the reference's simple-knn distCUDA2 semantics, clamped at 1e-7).
    - identity quaternion; opacity = inverse_sigmoid(0.1).
    """
    from gsplat_tpu.ops.knn import mean_sq_dist_to_3nn

    n = points.shape[0]
    cap = capacity or n
    assert cap >= n
    K = (max_sh_degree + 1) ** 2

    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.clip(mean_sq_dist_to_3nn(pts), min=1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    g = empty(cap, max_sh_degree)
    g = dataclasses.replace(
        g,
        xyz=g.xyz.at[:n].set(pts),
        f_dc=g.f_dc.at[:n].set(sh_lib.rgb2sh(jnp.asarray(colors, jnp.float32))),
        scaling=g.scaling.at[:n].set(scales),
        opacity=g.opacity.at[:n].set(
            float(transforms.inverse_sigmoid(jnp.asarray(0.1)))),
        active=g.active.at[:n].set(True),
    )
    return g


def pad_to_capacity(g: GaussianParams, new_capacity: int) -> GaussianParams:
    """Grow the padded buffers (host-side capacity event; happens rarely,
    triggers one re-jit)."""
    assert new_capacity >= g.capacity
    extra = new_capacity - g.capacity
    if extra == 0:
        return g
    tail = empty(extra, g.max_sh_degree)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0)
        if a.ndim > 0 else a,
        g, dataclasses.replace(tail, active_sh_degree=g.active_sh_degree))


def compact(g: GaussianParams) -> GaussianParams:
    """Pack active gaussians to the front (host-side; used at save time and
    capacity events so PLY files carry no padding)."""
    order = jnp.argsort(~g.active, stable=True)  # actives first
    def take(a):
        return a[order] if a.ndim > 0 else a
    return GaussianParams(
        xyz=take(g.xyz), f_dc=take(g.f_dc), f_rest=take(g.f_rest),
        scaling=take(g.scaling), rotation=take(g.rotation),
        opacity=take(g.opacity), active=take(g.active),
        active_sh_degree=g.active_sh_degree)

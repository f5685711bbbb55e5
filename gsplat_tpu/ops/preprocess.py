"""Per-Gaussian screen-space preprocessing (pure jnp; autodiff provides the
backward chain that the reference hand-derives in CUDA).

TPU-native re-design of the reference rasterizer's *preprocess* kernel
(diff-gaussian-rasterization forward, reconstructed in SURVEY.md §2.2):
frustum cull → EWA perspective projection of the 3D covariance (Zwicker'02
Jacobian with the 1.3·tan_fov clamp) → +0.3px screen-space dilation →
optional Mip-Splatting antialiasing opacity correction → SH→RGB with clamp →
3σ radius from the 2D eigenvalues. One fused vectorized pass over all N
Gaussians; XLA maps it onto the VPU with no Python-side loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsplat_tpu.core import sh as sh_lib
from gsplat_tpu.core import transforms
from gsplat_tpu.core.camera import CameraView


class Preprocessed(NamedTuple):
    mean2d: jnp.ndarray      # (N, 2) pixel coords (ndc2Pix convention)
    depth: jnp.ndarray       # (N,) view-space z
    conic: jnp.ndarray       # (N, 3) inverse 2D covariance (a, b, c)
    color: jnp.ndarray       # (N, 3) RGB from SH (clamped at 0)
    opacity: jnp.ndarray     # (N,) effective opacity (after AA correction)
    radius: jnp.ndarray      # (N,) float pixel radius; 0 = culled
    invdepth: jnp.ndarray    # (N,) 1/depth
    # Tight per-axis binning extents (pixels): half-widths of the axis-
    # aligned bounding box of the {alpha >= 1/255} level set. Every pixel
    # outside this box satisfies alpha < alpha_min and is zeroed by the
    # compositor's own cut, so binning with these instead of the reference's
    # circumscribed 3σ circle drops only exactly-zero contributions — the
    # image is bit-identical while anisotropic and low-opacity splats touch
    # far fewer tiles (the dominant cost driver is the pair count).
    rx: jnp.ndarray          # (N,) float; 0 = culled
    ry: jnp.ndarray          # (N,)
    # Level-set threshold t = 2·ln(op_eff/alpha_min)+slack: the entry
    # contributes somewhere iff dᵀ·conic·d ≤ t. Lets binning solve the
    # ellipse's exact x-interval PER TILE ROW (per-row culling) instead of
    # covering the whole rx×ry rect. 0 = culled.
    t_cut: jnp.ndarray = None   # (N,)


def ndc2pix(v, size):
    """CUDA ndc2Pix parity: ((v+1)·S − 1)/2 — pixel centers at integers."""
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(xyz: jnp.ndarray,            # (N,3)
               scaling: jnp.ndarray,         # (N,3) activated (exp'd)
               rotation: jnp.ndarray,        # (N,4) activated (normalized)
               opacity: jnp.ndarray,         # (N,) activated (sigmoid'd)
               features: jnp.ndarray,        # (N,K,3) SH coeffs, DC first
               active_sh_degree,             # () int32 (traced)
               cam: CameraView,
               image_width: int, image_height: int,
               *,
               active_mask: jnp.ndarray | None = None,  # (N,) bool
               scaling_modifier: float = 1.0,
               antialiasing: bool = False,
               dilation: float = 0.3,
               alpha_min: float = 1.0 / 255.0,
               cov3d_precomp: jnp.ndarray | None = None,   # (N,6) optional
               colors_precomp: jnp.ndarray | None = None,  # (N,3) optional
               ) -> Preprocessed:
    """Project all Gaussians to screen space.

    Functional parity with the reference CUDA preprocess (call-site contract:
    reference gaussian_renderer/__init__.py:36-110) including its numeric
    constants: z-near cull at 0.2, 1.3·tanfov frustum clamp, 0.3px dilation,
    λ via mid±sqrt(max(0.1, mid²−det)), radius = ceil(3√λmax).
    """
    W, H = image_width, image_height
    fx = W / (2.0 * cam.tanfovx)
    fy = H / (2.0 * cam.tanfovy)
    # The tiny per-Gaussian matrix products below are written as explicit
    # component arithmetic on (N,) columns rather than batched (N,k,k)
    # matmuls: TPU would otherwise run them on the MXU at bf16 (a ~0.4%
    # screen-position error that visibly slows convergence and, via
    # cancellation, NaN hazards) and with massive lane padding (measured
    # ~20 ms at N=200k). Component form is exact f32 on the VPU and fuses.
    HI = jax.lax.Precision.HIGHEST

    def apply44(Mat, v3):
        """rows of (x,y,z,1) @ Matᵀ for a constant 4x4: list of 4 (N,)."""
        x, y, z = v3[:, 0], v3[:, 1], v3[:, 2]
        return [Mat[i, 0] * x + Mat[i, 1] * y + Mat[i, 2] * z + Mat[i, 3]
                for i in range(4)]

    # --- projection ---
    ph = apply44(cam.full_proj, xyz)                         # 4 × (N,)
    p_w = 1.0 / (ph[3] + 1e-7)
    p_proj = jnp.stack([ph[0] * p_w, ph[1] * p_w, ph[2] * p_w], axis=-1)
    pv = apply44(cam.world_view, xyz)                        # 4 × (N,)
    p_view = jnp.stack(pv, axis=-1)
    depth = pv[2]

    mean2d = jnp.stack([ndc2pix(p_proj[:, 0], W),
                        ndc2pix(p_proj[:, 1], H)], axis=-1)

    # --- EWA 2D covariance ---
    if cov3d_precomp is None:
        cov3d = transforms.covariance_from_scaling_rotation(
            scaling, scaling_modifier, rotation)             # (N,6)
    else:
        cov3d = cov3d_precomp
    sxx, sxy, sxz = cov3d[:, 0], cov3d[:, 1], cov3d[:, 2]
    syy, syz, szz = cov3d[:, 3], cov3d[:, 4], cov3d[:, 5]

    tz = depth
    safe_tz = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    txtz = jnp.clip(p_view[:, 0] / safe_tz, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / safe_tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    # M = J @ W, rows m0/m1 as (N,3) component columns:
    #   J = [[fx/tz, 0, -fx·tx/tz²], [0, fy/tz, -fy·ty/tz²]]
    inv_tz = 1.0 / safe_tz
    a0 = fx * inv_tz
    a2x = -fx * tx * inv_tz * inv_tz
    b1 = fy * inv_tz
    b2y = -fy * ty * inv_tz * inv_tz
    Wv = cam.world_view[:3, :3]                              # (3,3) const
    m0 = [a0 * Wv[0, k] + a2x * Wv[2, k] for k in range(3)]
    m1 = [b1 * Wv[1, k] + b2y * Wv[2, k] for k in range(3)]

    def sigma_dot(m):  # Σ @ m for symmetric-6 Σ, m = 3 × (N,)
        return (sxx * m[0] + sxy * m[1] + sxz * m[2],
                sxy * m[0] + syy * m[1] + syz * m[2],
                sxz * m[0] + syz * m[1] + szz * m[2])

    s0 = sigma_dot(m0)
    s1 = sigma_dot(m1)
    c00 = m0[0] * s0[0] + m0[1] * s0[1] + m0[2] * s0[2]
    c01 = m0[0] * s1[0] + m0[1] * s1[1] + m0[2] * s1[2]
    c11 = m1[0] * s1[0] + m1[1] * s1[1] + m1[2] * s1[2]
    det_orig = c00 * c11 - c01 * c01
    c00 = c00 + dilation
    c11 = c11 + dilation
    det = c00 * c11 - c01 * c01

    safe_det = jnp.where(det == 0, 1.0, det)
    inv_det = 1.0 / safe_det
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], -1)

    mid = 0.5 * (c00 + c11)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam, 0.0)))

    # Mip-Splatting EWA antialiasing: convolution-scaling opacity correction
    # (the reference's `antialiasing` raster setting, dr_aa branch).
    if antialiasing:
        h_conv = jnp.sqrt(jnp.maximum(2.5e-5, det_orig / safe_det))
        opacity_eff = opacity * h_conv
    else:
        opacity_eff = opacity

    # Tight binning extents: alpha(d) = op·exp(-½ dᵀ(Σ₂d)⁻¹d) ≥ 1/255
    # ⟺ dᵀ(Σ₂d)⁻¹d ≤ t = 2·ln(255·op); the AABB of that ellipse has
    # half-widths sqrt(t·Σxx), sqrt(t·Σyy) (dilated covariance — the same
    # one the compositor's conic inverts). The final extents are the
    # INTERSECTION with the reference's circumscribed square (±radius): a
    # pixel inside the reference rect but outside this box is provably
    # alpha < 1/255 (exactly zeroed by the compositor), and nothing the
    # reference rect would composite is ever included beyond it — rect
    # semantics match CUDA's exactly while touching far fewer tiles. The
    # +1e-3 slack absorbs log/exp rounding at the level-set boundary.
    # the level is the SAME alpha floor the compositor culls at
    # (cfg.alpha_min) — pairs dropped here are exactly the kernel's zeros
    t_cut = jnp.maximum(
        2.0 * jnp.log(jnp.maximum(opacity_eff, 1e-12) / alpha_min) + 1e-3,
        0.0)
    rx = jnp.minimum(jnp.ceil(jnp.sqrt(t_cut * jnp.maximum(c00, 0.0))),
                     radius)
    ry = jnp.minimum(jnp.ceil(jnp.sqrt(t_cut * jnp.maximum(c11, 0.0))),
                     radius)

    # --- SH → RGB (clamped), degree masked by the warm-up state ---
    if colors_precomp is None:
        dirs = xyz - cam.camera_center[None, :]
        # Double-where normalization: dead padding slots can sit exactly at
        # the camera center, and sqrt's VJP at 0 is inf — 0·inf = NaN would
        # poison the xyz gradient of those rows. Route the zero case through
        # a constant so no derivative touches sqrt(0).
        nz = jnp.sum(dirs * dirs, axis=-1, keepdims=True) > 0
        safe_dirs = jnp.where(nz, dirs, 1.0)
        norm = jnp.linalg.norm(safe_dirs, axis=-1, keepdims=True)
        dirs = jnp.where(nz, safe_dirs / norm, 0.0)
        K = features.shape[1]
        max_deg = int(round(K ** 0.5)) - 1
        basis = sh_lib.sh_basis(max_deg, dirs)               # (N,K)
        k_active = (active_sh_degree + 1) ** 2
        basis = jnp.where(jnp.arange(K)[None, :] < k_active, basis, 0.0)
        color = jnp.einsum("nkc,nk->nc", features, basis,
                           precision=HI) + 0.5
        color = jnp.maximum(color, 0.0)
    else:
        color = colors_precomp

    # --- visibility: z-cull at 0.2, zero/neg determinant cull ---
    visible = (depth > 0.2) & (det > 0)
    if active_mask is not None:
        visible = visible & active_mask
    radius = jnp.where(visible, radius, 0.0)
    tight_visible = visible & (t_cut > 0.0)
    rx = jnp.where(tight_visible, rx, 0.0)
    ry = jnp.where(tight_visible, ry, 0.0)

    invdepth = jnp.where(depth > 0.2, 1.0 / jnp.where(depth == 0, 1.0, depth), 0.0)

    return Preprocessed(mean2d=mean2d, depth=depth, conic=conic, color=color,
                        opacity=opacity_eff, radius=radius, invdepth=invdepth,
                        rx=rx, ry=ry,
                        t_cut=jnp.where(tight_visible, t_cut, 0.0))

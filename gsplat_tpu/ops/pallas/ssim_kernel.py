"""Fused SSIM as a whole-channel-in-VMEM Pallas kernel (fwd + hand VJP).

TPU counterpart of the reference's fused-ssim CUDA submodule (SURVEY.md
§2.2; train.py loss = 0.8·L1 + 0.2·(1−SSIM)). The XLA shift-add form in
ops/ssim.py measures 9.0 ms fwd+bwd at 1080p — fusion-limited: each of
the five separable blur chains re-streams (C,H,W) intermediates through
HBM. Here one grid step per channel holds the zero-padded channel pair
in VMEM (~8.4 MB each at 1080p) and computes every blur as static
shifted-slice FMAs over resident data, so HBM traffic is one read of
the inputs and one write of the outputs (measured 1.3 ms fwd+bwd
at 1080p — see tests/test_core.py oracle tests for exactness).

Backward exploits two training-shape facts (both asserted by the
caller): the second image is the constant ground truth (no gradient),
and the window is symmetric (conv transpose of a blur = the same blur).
With A = 2·mu1·mu2+c1, B = 2·σ12+c2, C = mu1²+mu2²+c1, D = σ1²+σ2²+c2
and per-pixel upstream cotangent g:

  d img1 = blur(t_mu) + 2·x·blur(t_x2) + y·blur(t_xy),  where
  t_mu  = 2·g·[ mu2·(B−A)·CD − mu1·(C·m1 − ...) ]/(CD)² grouped below,
  t_x2  = g·(−A·B/(C·D²))·m1,      m1 = [X2 − mu1² > 0]  (variance clamp)
  t_xy  = g·2·A/(C·D)

(the exact grouping is in `_bwd_kernel`; it is the standard fused-ssim
backward, re-derived for the clamped-variance form of ops/ssim.py).

Reference: /root/reference/utils/loss_utils.py:46-86 (window math);
fused-ssim submodule contract loss_utils.py:89-91.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.ops.ssim import _gaussian_window

_PAD = 5  # window 11, same-padding


def _blur_padded(xp, H, W, w):
    """xp: (H+10, W+10) zero-padded field → (H, W) blurred, exact f32.
    Static shifted slices of VMEM-resident data; vertical then
    horizontal."""
    acc_v = None
    for i in range(11):
        t = w[i] * xp[i:i + H, :]
        acc_v = t if acc_v is None else acc_v + t
    acc = None
    for i in range(11):
        t = w[i] * acc_v[:, i:i + W]
        acc = t if acc is None else acc + t
    return acc


def _pad_hw(x, H, W):
    """(H, W) → (H+10, W+10) zero-padded, inside the kernel (VMEM)."""
    z_r = jnp.zeros((_PAD, W + 2 * _PAD), jnp.float32)
    z_c = jnp.zeros((H, _PAD), jnp.float32)
    mid = jnp.concatenate([z_c, x, z_c], axis=1)
    return jnp.concatenate([z_r, mid, z_r], axis=0)


def _fields(xp, yp, H, W, w):
    mu1 = _blur_padded(xp, H, W, w)
    mu2 = _blur_padded(yp, H, W, w)
    x2b = _blur_padded(xp * xp, H, W, w)
    y2b = _blur_padded(yp * yp, H, W, w)
    xyb = _blur_padded(xp * yp, H, W, w)
    return mu1, mu2, x2b, y2b, xyb


def _abcd(mu1, mu2, x2b, y2b, xyb, c1, c2):
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    s1 = jnp.maximum(x2b - mu1_sq, 0.0)
    s2 = jnp.maximum(y2b - mu2_sq, 0.0)
    s12 = xyb - mu1_mu2
    a = 2.0 * mu1_mu2 + c1
    b = 2.0 * s12 + c2
    c = mu1_sq + mu2_sq + c1
    d = s1 + s2 + c2
    return a, b, c, d, s1, s2


def _fwd_kernel(x_ref, y_ref, map_ref, *, H, W, w, c1, c2):
    xp = _pad_hw(x_ref[0], H, W)
    yp = _pad_hw(y_ref[0], H, W)
    mu1, mu2, x2b, y2b, xyb = _fields(xp, yp, H, W, w)
    a, b, c, d, _, _ = _abcd(mu1, mu2, x2b, y2b, xyb, c1, c2)
    map_ref[0] = (a * b) / (c * d)


def _bwd_kernel(x_ref, y_ref, g_ref, dx_ref, *, H, W, w, c1, c2):
    xp = _pad_hw(x_ref[0], H, W)
    yp = _pad_hw(y_ref[0], H, W)
    mu1, mu2, x2b, y2b, xyb = _fields(xp, yp, H, W, w)
    a, b, c, d, s1, _ = _abcd(mu1, mu2, x2b, y2b, xyb, c1, c2)
    g = g_ref[0]                                        # (H, W) cotangent
    cd = c * d
    inv_cd = 1.0 / cd
    dA = g * b * inv_cd                                 # ∂map/∂A · g
    dB = g * a * inv_cd
    ab_cd = a * b * inv_cd
    dC = -g * ab_cd / c
    dD = -g * ab_cd / d
    m1 = (x2b - mu1 * mu1 > 0.0).astype(jnp.float32)    # variance clamp
    # field-level cotangents (see module docstring):
    #   A = 2 mu1 mu2 + c1        → ∂/∂mu1 = 2 mu2
    #   B = 2 (xyb − mu1 mu2)+c2  → ∂/∂mu1 = −2 mu2, ∂/∂xyb = 2
    #   C = mu1² + mu2² + c1      → ∂/∂mu1 = 2 mu1
    #   D = s1 + s2 + c2, s1 = max(x2b − mu1², 0)
    #                             → ∂/∂mu1 = −2 mu1 m1, ∂/∂x2b = m1
    t_mu = 2.0 * (mu2 * (dA - dB) + mu1 * (dC - dD * m1))
    t_x2 = dD * m1
    t_xy = 2.0 * dB
    bl_mu = _blur_padded(_pad_hw(t_mu, H, W), H, W, w)
    bl_x2 = _blur_padded(_pad_hw(t_x2, H, W), H, W, w)
    bl_xy = _blur_padded(_pad_hw(t_xy, H, W), H, W, w)
    x = x_ref[0]
    y = y_ref[0]
    dx_ref[0] = bl_mu + 2.0 * x * bl_x2 + y * bl_xy


def _call(kernel, n_in, C, H, W, interpret, *args):
    return pl.pallas_call(
        kernel,
        grid=(C,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def ssim_map_fused(img1, img2, static):
    """Per-pixel SSIM map, (C,H,W) f32 inputs; img2 is treated as a
    CONSTANT (no cotangent) — train-loss shape. static: hashable dict
    with window_size/sigma/c1/c2/interpret."""
    return _fwd_impl(img1, img2, static)


def _fwd_impl(img1, img2, static):
    C, H, W = img1.shape
    w = _gaussian_window(static["window_size"], static["sigma"])
    kern = functools.partial(_fwd_kernel, H=H, W=W, w=w,
                             c1=static["c1"], c2=static["c2"])
    return _call(kern, 2, C, H, W, static["interpret"], img1, img2)


def _fused_fwd(img1, img2, static):
    return _fwd_impl(img1, img2, static), (img1, img2)


def _fused_bwd(static, res, g):
    img1, img2 = res
    C, H, W = img1.shape
    w = _gaussian_window(static["window_size"], static["sigma"])
    kern = functools.partial(_bwd_kernel, H=H, W=W, w=w,
                             c1=static["c1"], c2=static["c2"])
    dx = _call(kern, 3, C, H, W, static["interpret"], img1, img2, g)
    return dx, None


ssim_map_fused.defvjp(_fused_fwd, _fused_bwd)


class _Static(dict):
    def __hash__(self):
        return hash(tuple(sorted(self.items())))


def ssim_fused(img1, img2, window_size=11, sigma=1.5, c1=0.01 ** 2,
               c2=0.03 ** 2, interpret=False):
    """Mean SSIM with img2 constant. Drop-in for ops.ssim.ssim on the
    training path (3D (C,H,W) inputs)."""
    static = _Static(window_size=window_size, sigma=sigma, c1=c1, c2=c2,
                     interpret=interpret)
    return jnp.mean(ssim_map_fused(img1, img2, static))

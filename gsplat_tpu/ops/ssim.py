"""SSIM with the reference's exact windowing, as fused XLA convolutions.

Parity targets:
- /root/reference/utils/loss_utils.py:46-86 (reference conv2d SSIM: 11×11
  Gaussian window σ=1.5, C1=0.01², C2=0.03², same-padding, per-channel
  depthwise convolution, mean over all pixels).
- /root/reference submodule fused-ssim (SURVEY.md §2.2): a CUDA
  forward+backward fusion of the same math. On TPU the separable depthwise
  convolution + elementwise chain is fused by XLA into a handful of
  bandwidth-bound passes and autodiff provides the backward — profiling
  shows no Pallas kernel is warranted at these sizes.

Note the reference applies *same* (zero) padding, so window statistics near
borders are biased exactly like the reference — kept for parity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    """1D Gaussian kernel, normalized (reference loss_utils.py:46-49)."""
    import numpy as np
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return tuple(g.tolist())


def _blur(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable depthwise 2D Gaussian blur with same-(zero-)padding.
    x: (..., C, H, W).

    Implemented as shifted weighted adds rather than conv: TPU lowers f32
    convs either to bf16 (whose error makes the downstream variance
    blur(x²) − mu² go below −C2 and flips the SSIM denominator sign → ±inf
    loss, observed on-chip) or, at HIGHEST precision, to a slow multi-pass
    form (~60 ms fwd+bwd at 1080p). Eleven shifted VPU adds per axis are
    exact f32 and fuse.
    """
    w = _gaussian_window(window_size, sigma)
    pad = window_size // 2
    H, W = x.shape[-2:]

    def blur_axis(v, axis, size):
        widths = [(0, 0)] * v.ndim
        widths[axis] = (pad, pad)
        vp = jnp.pad(v, widths)
        acc = None
        for i in range(window_size):
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(i, i + size)
            term = w[i] * vp[tuple(sl)]
            acc = term if acc is None else acc + term
        return acc

    return blur_axis(blur_axis(x, x.ndim - 2, H), x.ndim - 1, W)


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
             sigma: float = 1.5, c1: float = 0.01 ** 2,
             c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Per-pixel SSIM map; inputs (..., C, H, W) in [0,1].

    (Blurring the five window statistics as one stacked tensor was measured
    2x SLOWER on-chip — 15.7 vs 7.5 ms fwd+bwd at 1080p: XLA already fuses
    the five separate blur chains, and the stacked concat materializes a
    (5C,H,W) intermediate that breaks that fusion. Keep them separate.)"""
    mu1 = _blur(img1, window_size, sigma)
    mu2 = _blur(img2, window_size, sigma)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    # True variances are nonnegative; clamp the float-cancellation residue
    # (≲1e-6 in f32) so the denominator can never cross zero. Values stay
    # within float error of the reference's unclamped math.
    sigma1_sq = jnp.maximum(
        _blur(img1 * img1, window_size, sigma) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(
        _blur(img2 * img2, window_size, sigma) - mu2_sq, 0.0)
    sigma12 = _blur(img1 * img2, window_size, sigma) - mu1_mu2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM (reference `ssim`, loss_utils.py:52-63 / fused_ssim call
    contract train.py:122)."""
    return jnp.mean(ssim_map(img1, img2, window_size))


def fast_ssim(img1: jnp.ndarray, img2: jnp.ndarray,
              window_size: int = 11) -> jnp.ndarray:
    """Training-loss SSIM, mirroring the reference's `fast_ssim` backed by
    the fused-ssim CUDA submodule (loss_utils.py:89-91): on TPU a fused
    whole-channel-in-VMEM Pallas kernel (ops/pallas/ssim_kernel.py,
    measured 9.0 → 1.3 ms fwd+bwd at 1080p). Like the CUDA fused kernel
    (train-only contract), ``img2`` is treated as a CONSTANT — gradients
    flow to ``img1`` only. Falls back to the XLA form off-TPU or for
    non-(C,H,W) inputs."""
    if jax.default_backend() == "tpu" and img1.ndim == 3 \
            and img1.dtype == jnp.float32:
        from gsplat_tpu.ops.pallas.ssim_kernel import ssim_fused
        return ssim_fused(img1, img2, window_size=window_size)
    return ssim(img1, jax.lax.stop_gradient(img2), window_size)

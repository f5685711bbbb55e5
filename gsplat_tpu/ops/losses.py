"""Training losses. Parity: /root/reference/utils/loss_utils.py and
utils/image_utils.py."""
from __future__ import annotations

import jax.numpy as jnp

from gsplat_tpu.ops.ssim import fast_ssim, ssim  # re-export


def l1_loss(network_output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Parity: loss_utils.py:40-41."""
    return jnp.abs(network_output - gt).mean()


def l2_loss(network_output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Parity: loss_utils.py:43-44."""
    return ((network_output - gt) ** 2).mean()


def mse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image MSE over flattened pixels (image_utils.py:14-15)."""
    return ((img1 - img2) ** 2).reshape(img1.shape[0], -1).mean(axis=1,
                                                                keepdims=True)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """PSNR = 20·log10(1/√mse) (image_utils.py:17-19). Inputs (B?,C,H,W)."""
    m = mse(img1, img2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(m))

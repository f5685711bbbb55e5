"""LPIPS perceptual metric in pure JAX.

Capability parity with the reference's lpipsPyTorch package
(/root/reference/lpipsPyTorch/, metrics.py:74 uses net_type='vgg'): a VGG16
feature extractor with per-layer unit-normalized differences weighted by the
LPIPS linear calibration. The reference downloads torchvision weights + the
richzhang calibration at runtime (lpipsPyTorch/modules/utils.py:11-30);
this environment is offline, so weights are loaded from a local file:

  - set GSPLAT_LPIPS_WEIGHTS to a .npz containing VGG16-features conv
    kernels/biases (torchvision layout, keys conv{i}_w / conv{i}_b for the
    13 convs) and lin0..lin4 LPIPS weights (keys lin{i});
  - a converter from a torch checkpoint is provided in
    tools/convert_lpips_weights.py.

If the file is missing, lpips_vgg() raises and callers (cli/metrics.py)
report NaN for LPIPS while still producing SSIM/PSNR — the results.json
schema stays intact.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: conv channels per block (torchvision "D" config)
_VGG_CFG = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# LPIPS taps: outputs of relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _load_weights():
    path = os.environ.get("GSPLAT_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "LPIPS weights not found; set GSPLAT_LPIPS_WEIGHTS to the "
            "converted .npz (see tools/convert_lpips_weights.py)")
    data = np.load(path)
    convs = []
    i = 0
    for _, reps in _VGG_CFG:
        for _ in range(reps):
            convs.append((jnp.asarray(data[f"conv{i}_w"]),
                          jnp.asarray(data[f"conv{i}_b"])))
            i += 1
    lins = [jnp.asarray(data[f"lin{j}"]) for j in range(5)]
    return convs, lins


def _vgg_features(x, convs):
    """x: (B,3,H,W), already input-normalized → list of 5 tap activations."""
    taps = []
    i = 0
    h = x
    for b, (_, reps) in enumerate(_VGG_CFG):
        for r in range(reps):
            w, bias = convs[i]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=jax.lax.Precision.HIGHEST) + \
                bias[None, :, None, None]
            h = jax.nn.relu(h)
            i += 1
        taps.append(h)
        if b < len(_VGG_CFG) - 1:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return taps


def lpips_vgg():
    """Returns fn(img1, img2) -> scalar LPIPS; imgs (B,3,H,W) in [0,1]."""
    convs, lins = _load_weights()

    @jax.jit
    def fn(x, y):
        # Input convention parity: the reference's lpipsPyTorch z-scores the
        # [0,1] image DIRECTLY with the richzhang scaling constants — it
        # never applies the original repo's [0,1]→[-1,1] mapping
        # (/root/reference/lpipsPyTorch/modules/networks.py:55-60 z_score on
        # the tensor metrics.py:31-33 feeds straight from PIL). Matching the
        # published 3DGS LPIPS numbers requires reproducing that quirk.
        def norm_in(v):
            return (v - jnp.asarray(_SHIFT)[None, :, None, None]) / \
                jnp.asarray(_SCALE)[None, :, None, None]
        fx = _vgg_features(norm_in(x), convs)
        fy = _vgg_features(norm_in(y), convs)
        total = 0.0
        for tx, ty, lin in zip(fx, fy, lins):
            nx = tx / (jnp.linalg.norm(tx, axis=1, keepdims=True) + 1e-10)
            ny = ty / (jnp.linalg.norm(ty, axis=1, keepdims=True) + 1e-10)
            d = (nx - ny) ** 2
            # lin: (C,) calibration weights; spatial average
            total = total + jnp.mean(
                jnp.sum(d * lin[None, :, None, None], axis=1))
        return total

    return fn

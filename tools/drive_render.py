"""Drive the public render API end-to-end on a synthetic scene."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

import dataclasses
# import the package BEFORE the first backend query: its GSPLAT_PLATFORM
# env hook flips jax_platforms, which is ineffective once a query
# initializes the default (TPU) backend
from gsplat_tpu.config import RasterizerConfig

print("backend:", jax.default_backend(), jax.devices())
from gsplat_tpu.core.camera import CameraView
from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.ops import rasterize

rng = np.random.default_rng(0)
n = 2000
pts = rng.standard_normal((n, 3)).astype(np.float32); pts[:, 2] += 5.0
colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
g = gm.create_from_pcd(pts, colors, max_sh_degree=3, capacity=2048)
cam = CameraView.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7)

W, H = 256, 128
use_pallas = sys.argv[1] == "pallas" if len(sys.argv) > 1 else False
cfg = RasterizerConfig(use_pallas=use_pallas, pairs_per_gaussian=64.0)
out = rasterize.render(g, cam, W, H, bg_color=jnp.zeros(3), cfg=cfg)
img = np.asarray(out.image)
print(f"impl={'pallas' if use_pallas else 'xla'} image shape {img.shape} "
      f"range [{img.min():.4f},{img.max():.4f}] mean {img.mean():.4f}")
print("visible gaussians:", int(np.asarray((out.radii > 0).sum())),
      "pairs:", int(out.num_pairs), "overflow:", int(out.overflow))
assert int(out.overflow) == 0, "pair list truncated — drive must not overflow"
assert img.shape == (3, H, W) and img.max() > 0.05, "blank render!"

# row-cull A/B on the SAME backend/impl: culled pairs are provably below
# the compositor's alpha floor, so the image must match with row culling
# off (the subset property, asserted on real hardware — interpret mode
# cannot exercise the kernels' tail-DMA/revisit contracts). Not bitwise:
# dropping pairs shifts chunk boundaries, so per-chunk partial sums
# reassociate — ≤ ~5e-7 absolute in exact-f32 CPU arithmetic, but up to
# ~5e-5 on the chip where the log-transmittance triangular matmuls run on
# the MXU (measured r4: max abs 4.98e-5 / rel 9.9e-5 — the kernel's
# intrinsic precision, same scale the pallas-vs-xla check below allows).
out_nc = rasterize.render(
    g, cam, W, H, bg_color=jnp.zeros(3),
    cfg=dataclasses.replace(cfg, row_cull=not cfg.row_cull))
tol = dict(rtol=1e-4, atol=2e-4) if jax.default_backend() == "tpu" \
    else dict(rtol=1e-5, atol=2e-6)
np.testing.assert_allclose(img, np.asarray(out_nc.image), **tol)
print(f"row_cull A/B identical (pairs {int(out.num_pairs)} vs "
      f"{int(out_nc.num_pairs)})")

# gradient through the whole pipeline
from gsplat_tpu.models.gaussian_model import trainables, with_trainables
def loss(t_, c=cfg):
    o = rasterize.render(with_trainables(g, t_), cam, W, H, bg_color=jnp.zeros(3), cfg=c, clamp=False)
    return jnp.abs(o.image - 0.5).mean()
t0 = time.time()
grads = jax.grad(loss)(trainables(g))
gx = np.asarray(grads["xyz"])
print(f"grad xyz: max|g|={np.abs(gx).max():.6f} nnz={np.count_nonzero(gx)} t={time.time()-t0:.1f}s")
assert np.isfinite(gx).all() and np.abs(gx).max() > 0

# cross-impl agreement in ONE process: the Pallas compositor (incl. the
# MXU scan gather-VJP) against the pure-XLA oracle on the same inputs.
if use_pallas:
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    out_x = rasterize.render(g, cam, W, H, bg_color=jnp.zeros(3), cfg=cfg_x)
    np.testing.assert_allclose(img, np.asarray(out_x.image),
                               rtol=1e-4, atol=2e-4)
    gx_x = np.asarray(jax.grad(lambda t_: loss(t_, cfg_x))(trainables(g))["xyz"])
    denom = np.abs(gx_x).max()
    assert denom > 0 and np.abs(gx - gx_x).max() <= 0.01 * denom, \
        f"pallas/xla grad mismatch: {np.abs(gx - gx_x).max():.3e} vs {denom:.3e}"
    print("pallas vs xla: image ~1e-4, grads within 1% — OK")

    # strip-grid streaming compositor against the same oracle (the r5
    # kernel form; hardware-only behaviors — fori-loop grid walk, strip
    # DMA, dynamic-slice reads — cannot be exercised in interpret mode)
    cfg_s = dataclasses.replace(cfg, compositor="stream", strip_chunks=16)
    out_s = rasterize.render(g, cam, W, H, bg_color=jnp.zeros(3), cfg=cfg_s)
    np.testing.assert_allclose(np.asarray(out_s.image),
                               np.asarray(out_x.image),
                               rtol=1e-4, atol=2e-4)
    gx_s = np.asarray(jax.grad(lambda t_: loss(t_, cfg_s))(trainables(g))["xyz"])
    assert np.abs(gx_s - gx_x).max() <= 0.01 * denom, \
        f"stream/xla grad mismatch: {np.abs(gx_s - gx_x).max():.3e}"
    print("stream vs xla: image ~1e-4, grads within 1% — OK")
print("OK")

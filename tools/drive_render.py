"""Drive the public render API end-to-end on a synthetic scene."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices())

import dataclasses
from gsplat_tpu.config import RasterizerConfig
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

# gradient through the whole pipeline
from gsplat_tpu.models.gaussian_model import trainables, with_trainables
def loss(t_):
    o = rasterize.render(with_trainables(g, t_), cam, W, H, bg_color=jnp.zeros(3), cfg=cfg, clamp=False)
    return jnp.abs(o.image - 0.5).mean()
t0 = time.time()
grads = jax.grad(loss)(trainables(g))
gx = np.asarray(grads["xyz"])
print(f"grad xyz: max|g|={np.abs(gx).max():.6f} nnz={np.count_nonzero(gx)} t={time.time()-t0:.1f}s")
assert np.isfinite(gx).all() and np.abs(gx).max() > 0
print("OK")

"""Worker process for test_multihost.py — one rank of a REAL 2-process
jax.distributed CPU cluster (2 local devices each → 4 global devices).

Run by the test as:
    JAX_COORDINATOR_ADDRESS=127.0.0.1:<port> JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=<0|1> python tests/multihost_worker.py

Exercises the multi-host contract documented in parallel/mesh.py:
init_distributed() from the env vars, a global data mesh spanning both
processes, one DP train step with the batch sharded so each process feeds
only its local cameras, and host-side control-flow determinism (both ranks
derive the same camera picks from the seeded RNG). Prints one line
    RESULT <loss> <xyz_checksum> <picks>
that the parent compares across ranks (and against a single-process run).
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def build_batch(mesh, n_batch, W, H, seed=0):
    """The GLOBAL camera/image batch, built identically on every rank from
    the seed; each rank hands JAX only its local rows."""
    from gsplat_tpu.core.camera import CameraView
    from gsplat_tpu.parallel.dp import stack_camera_batch

    rng = np.random.default_rng(seed)
    cams = []
    for i in range(n_batch):
        ang = 0.1 * i
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        cams.append(CameraView.create(R=R, T=np.zeros(3), fovx=0.9, fovy=0.7))
    cam_batch = stack_camera_batch(cams)
    gt = rng.uniform(0, 1, (n_batch, 3, H, W)).astype(np.float32)
    ones = np.ones((n_batch, 1, H, W), np.float32)
    zeros = np.zeros((n_batch, 1, H, W), np.float32)

    sh = NamedSharding(mesh, P("data"))

    def dist(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] != n_batch:
            raise ValueError(f"unexpected leaf shape {x.shape}")
        return jax.make_array_from_process_local_data(sh, local_rows(x))

    def local_rows(x):
        per = n_batch // jax.process_count()
        lo = per * jax.process_index()
        return x[lo:lo + per]

    cam_batch = jax.tree_util.tree_map(dist, cam_batch)
    return cam_batch, dist(gt), dist(ones), dist(zeros)


def main():
    from gsplat_tpu.parallel.mesh import init_distributed, make_mesh

    assert init_distributed(), "JAX_COORDINATOR_ADDRESS not set?"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
    from gsplat_tpu.models import gaussian_model as gm
    from gsplat_tpu.parallel import dp
    from gsplat_tpu.train import trainer

    W, H = 128, 64
    n = 200
    rng = np.random.default_rng(7)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    colors = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    g = gm.create_from_pcd(pts, colors, max_sh_degree=1, capacity=n)
    import dataclasses
    g = dataclasses.replace(
        g, opacity=g.opacity.at[:].set(1.0),
        active_sh_degree=jnp.asarray(1, jnp.int32))

    mesh = make_mesh()          # ("data", 4) over both processes
    opt = OptimizationConfig()
    rcfg = RasterizerConfig(tile_h=8, tile_w=128, chunk=16, use_pallas=False,
                            pairs_per_gaussian=24.0)
    step_fn = dp.make_dp_train_step(
        mesh, image_width=W, image_height=H, opt=opt, rcfg=rcfg,
        spatial_lr_scale=1.0)

    state = trainer.init_state(g, n_images=4)
    cam_batch, gt, ones, zeros = build_batch(mesh, 4, W, H)
    bg = jnp.zeros(3, jnp.float32)

    new_state, aux = step_fn(state, cam_batch, gt, ones, zeros, zeros, bg)

    # Host control-flow determinism: the training loop's camera picks come
    # from a seeded epoch shuffle (train/loop.py) — both ranks must agree.
    picks = list(np.random.default_rng(1234).permutation(4)[:4])

    loss = float(jax.device_get(aux.loss))
    checksum = float(jax.device_get(
        jnp.sum(jnp.abs(new_state.gaussians.xyz))))
    print(f"RESULT {loss:.8f} {checksum:.8f} {picks}", flush=True)


if __name__ == "__main__":
    main()

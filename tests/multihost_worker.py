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


def build_scene(W=128, H=64, n=200):
    """Deterministic scene, built identically on every rank."""
    import dataclasses
    from gsplat_tpu.models import gaussian_model as gm
    rng = np.random.default_rng(7)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    colors = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    g = gm.create_from_pcd(pts, colors, max_sh_degree=1, capacity=n)
    return dataclasses.replace(
        g, opacity=g.opacity.at[:].set(1.0),
        active_sh_degree=jnp.asarray(1, jnp.int32))


def scene_cfg():
    from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
    return (OptimizationConfig(),
            RasterizerConfig(tile_h=8, tile_w=128, chunk=16,
                             use_pallas=False, pairs_per_gaussian=24.0))


def run_sharded_step(mesh, W=128, H=64):
    """One gaussian-sharded-storage train step with the RING transient —
    params/moments row-sharded over the prim axis (spanning both processes
    in the 2-process run, so the ring ppermute crosses the process
    boundary: the actual >HBM multi-host deployment shape). Returns
    (loss, xyz checksum) as floats; used by both the worker ranks and the
    single-process topology-invariance check."""
    from gsplat_tpu.parallel import sharded
    from gsplat_tpu.train import trainer
    from gsplat_tpu.core.camera import CameraView

    g = build_scene(W, H)
    opt, rcfg = scene_cfg()
    state = sharded.shard_state(trainer.init_state(g, 1), mesh)
    step_fn = sharded.make_sharded_train_step(
        mesh, image_width=W, image_height=H, opt=opt, rcfg=rcfg,
        spatial_lr_scale=1.0, transient="ring")

    rng = np.random.default_rng(0)
    gt = jax.device_put(
        rng.uniform(0, 1, (3, H, W)).astype(np.float32),
        NamedSharding(mesh, P()))
    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)
    cam = CameraView.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7)
    bg = jnp.zeros(3, jnp.float32)
    new_state, aux = step_fn(state, cam, gt, ones, zeros, zeros, bg)
    loss = float(jax.device_get(aux.loss))
    checksum = float(jax.device_get(jax.jit(
        lambda x: jnp.sum(jnp.abs(x)),
        out_shardings=NamedSharding(mesh, P()))(new_state.gaussians.xyz)))
    return loss, checksum


def main():
    from gsplat_tpu.parallel.mesh import init_distributed, make_mesh

    mode = sys.argv[1] if len(sys.argv) > 1 else "dp"

    assert init_distributed(), "JAX_COORDINATOR_ADDRESS not set?"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    from gsplat_tpu.parallel import dp
    from gsplat_tpu.train import trainer

    if mode == "sharded":
        mesh = make_mesh((("prim", 4),))
        loss, checksum = run_sharded_step(mesh)
        picks = list(np.random.default_rng(1234).permutation(4)[:4])
        print(f"RESULT {loss:.8f} {checksum:.8f} {picks}", flush=True)
        return

    W, H = 128, 64
    g = build_scene(W, H)

    mesh = make_mesh()          # ("data", 4) over both processes
    opt, rcfg = scene_cfg()
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

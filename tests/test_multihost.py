"""Multi-host execution test: a REAL 2-process jax.distributed CPU cluster
running one DP train step (SURVEY.md §2.3 comm-backend row; closes the
round-2 "wired but never executed with >1 process" gap).

Spawns two worker processes (tests/multihost_worker.py) joined through a
coordinator on localhost, each owning 2 of the 4 global devices, then
asserts: both ranks complete, agree bit-for-bit on the psum'd loss, the
post-update parameter checksum, and the host-side camera-pick sequence —
and that the result matches the SAME global step run single-process on a
4-device mesh (process-topology invariance).
"""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_step_agrees_and_matches_single_process():
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in range(2):
        env = dict(env_base,
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
                   JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache_mh")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-3000:]}"

    results = []
    for out in outs:
        m = re.search(r"RESULT ([-\d.]+) ([-\d.]+) (\[.*\])", out)
        assert m, f"no RESULT line in:\n{out[-3000:]}"
        results.append((float(m.group(1)), float(m.group(2)), m.group(3)))

    # both ranks replicate the update → identical loss/params/picks
    assert results[0] == results[1], results

    # process-topology invariance: same global step, single process,
    # 4-device mesh (this pytest process has 8 virtual devices)
    import jax
    import jax.numpy as jnp
    from gsplat_tpu.parallel.mesh import make_mesh
    from tests import multihost_worker as mw

    mesh = make_mesh(devices=jax.devices()[:4])

    # monkey-free reuse: replicate the worker's scene/step inline
    import dataclasses
    from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
    from gsplat_tpu.models import gaussian_model as gm
    from gsplat_tpu.parallel import dp
    from gsplat_tpu.train import trainer

    W, H, n = 128, 64, 200
    rng = np.random.default_rng(7)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    colors = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    g = gm.create_from_pcd(pts, colors, max_sh_degree=1, capacity=n)
    g = dataclasses.replace(
        g, opacity=g.opacity.at[:].set(1.0),
        active_sh_degree=jnp.asarray(1, jnp.int32))
    opt = OptimizationConfig()
    rcfg = RasterizerConfig(tile_h=8, tile_w=128, chunk=16, use_pallas=False,
                            pairs_per_gaussian=24.0)
    step_fn = dp.make_dp_train_step(
        mesh, image_width=W, image_height=H, opt=opt, rcfg=rcfg,
        spatial_lr_scale=1.0)
    state = trainer.init_state(g, n_images=4)
    cam_batch, gt, ones, zeros = mw.build_batch(mesh, 4, W, H)
    bg = jnp.zeros(3, jnp.float32)
    new_state, aux = step_fn(state, cam_batch, gt, ones, zeros, zeros, bg)

    loss = float(jax.device_get(aux.loss))
    checksum = float(jax.device_get(
        jnp.sum(jnp.abs(new_state.gaussians.xyz))))
    np.testing.assert_allclose(loss, results[0][0], rtol=1e-5)
    np.testing.assert_allclose(checksum, results[0][1], rtol=1e-5)


def _spawn_workers(mode):
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in range(2):
        env = dict(env_base,
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
                   JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache_mh")
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "multihost_worker.py"), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-3000:]}"
    results = []
    for out in outs:
        m = re.search(r"RESULT ([-\d.]+) ([-\d.]+)", out)
        assert m, f"no RESULT line in:\n{out[-3000:]}"
        results.append((float(m.group(1)), float(m.group(2))))
    return results


def test_two_process_sharded_storage_ring_matches_single_process():
    """Gaussian-sharded storage with the RING transient across a REAL
    process boundary: the prim-axis ppermute stream crosses the 2-process
    DCN-style link — the actual >HBM multi-host deployment shape (VERDICT
    r3 next-step #8). Both ranks must agree, and match the same step run
    single-process on a 4-device mesh."""
    results = _spawn_workers("sharded")
    assert results[0] == results[1], results

    import jax
    from gsplat_tpu.parallel.mesh import make_mesh
    from tests import multihost_worker as mw

    mesh = make_mesh((("prim", 4),), devices=jax.devices()[:4])
    loss_1, checksum_1 = mw.run_sharded_step(mesh)
    np.testing.assert_allclose(results[0][0], loss_1, rtol=1e-5)
    np.testing.assert_allclose(results[0][1], checksum_1, rtol=1e-4)

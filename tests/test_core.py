"""Unit tests for core math vs the reference's pure-Python formulas
(SURVEY.md §4a: SH eval, projection matrices, LR schedule, covariance)."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.core import sh, transforms, schedules
from tests.conftest import REFERENCE_DIR, has_reference

reference = pytest.mark.skipif(not has_reference(),
                               reason="reference checkout not available")


def _ref_modules():
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from utils import sh_utils, graphics_utils, general_utils
    return sh_utils, graphics_utils, general_utils


@reference
@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_eval_sh_matches_reference(deg, rng):
    sh_utils, _, _ = _ref_modules()
    import torch
    n, K = 64, (deg + 1) ** 2
    coeffs = rng.standard_normal((n, 3, K)).astype(np.float32)
    dirs = rng.standard_normal((n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    want = sh_utils.eval_sh(deg, torch.from_numpy(coeffs),
                            torch.from_numpy(dirs)).numpy()
    got = np.asarray(sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@reference
def test_world_to_view_matches_reference(rng):
    _, graphics_utils, _ = _ref_modules()
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    R = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q)))
    t = rng.standard_normal(3)
    want = graphics_utils.getWorld2View2(R, t, np.array([0.1, -0.2, 0.3]), 1.7)
    got = transforms.world_to_view(R, t, np.array([0.1, -0.2, 0.3]), 1.7)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@reference
def test_projection_matrix_matches_reference():
    _, graphics_utils, _ = _ref_modules()
    want = graphics_utils.getProjectionMatrix(0.01, 100.0, 1.2, 0.9).numpy()
    got = transforms.projection_matrix(0.01, 100.0, 1.2, 0.9)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@reference
def test_expon_lr_matches_reference():
    _, _, general_utils = _ref_modules()
    for kwargs in [dict(lr_init=1e-2, lr_final=1e-4, max_steps=1000),
                   dict(lr_init=1e-2, lr_final=1e-4, lr_delay_steps=100,
                        lr_delay_mult=0.01, max_steps=1000),
                   dict(lr_init=0.0, lr_final=0.0, max_steps=10)]:
        ref_fn = general_utils.get_expon_lr_func(**kwargs)
        for step in [0, 1, 50, 100, 500, 999, 1000, 2000]:
            want = ref_fn(step)
            got = float(schedules.expon_lr(step, **kwargs))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-9)


def test_covariance_matches_scipy_oracle(rng):
    """Σ = R·diag(s²)·Rᵀ against scipy's independent quaternion→rotation
    (the reference's torch helper hardcodes device="cuda" and cannot run
    here; scipy is a stronger independent oracle anyway)."""
    from scipy.spatial.transform import Rotation
    n = 24
    s = np.exp(rng.standard_normal((n, 3)).astype(np.float32) * 0.3)
    q = rng.standard_normal((n, 4)).astype(np.float32)  # (w,x,y,z), unnorm
    cov6 = transforms.covariance_from_scaling_rotation(
        jnp.asarray(s), 1.0, jnp.asarray(q))
    C = np.asarray(transforms.cov6_to_mat(cov6))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    R = Rotation.from_quat(qn[:, [1, 2, 3, 0]]).as_matrix()  # xyzw order
    want = np.einsum("nij,nj,nkj->nik", R, s.astype(np.float64) ** 2, R)
    np.testing.assert_allclose(C, want, rtol=1e-4, atol=1e-6)


def test_covariance_psd_and_symmetric(rng):
    n = 32
    s = np.exp(rng.standard_normal((n, 3)).astype(np.float32) * 0.3)
    q = rng.standard_normal((n, 4)).astype(np.float32)
    cov6 = transforms.covariance_from_scaling_rotation(
        jnp.asarray(s), 1.0, jnp.asarray(q))
    C = np.asarray(transforms.cov6_to_mat(cov6))
    np.testing.assert_allclose(C, np.swapaxes(C, -1, -2), atol=1e-6)
    eig = np.linalg.eigvalsh(C)
    assert (eig > -1e-5).all()
    # det(Σ) == (∏ s_i)^2 — rotation preserves determinant
    np.testing.assert_allclose(np.linalg.det(C), (s.prod(-1)) ** 2,
                               rtol=2e-2)


def test_quat_to_rotmat_orthonormal(rng):
    q = rng.standard_normal((16, 4)).astype(np.float32)
    R = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q)))
    eye = np.eye(3)[None].repeat(16, 0)
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)


def test_sh_dc_only_is_constant(rng):
    coeffs = rng.standard_normal((8, 3, 1)).astype(np.float32)
    dirs = rng.standard_normal((8, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = np.asarray(sh.eval_sh(0, jnp.asarray(coeffs), jnp.asarray(dirs)))
    np.testing.assert_allclose(out, coeffs[:, :, 0] * sh.C0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sh.sh2rgb(sh.rgb2sh(jnp.asarray(0.25)))), 0.25, rtol=1e-6)


def test_knn_matches_bruteforce(rng):
    from gsplat_tpu.ops.knn import mean_sq_dist_to_3nn
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    got = np.asarray(mean_sq_dist_to_3nn(jnp.asarray(pts)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

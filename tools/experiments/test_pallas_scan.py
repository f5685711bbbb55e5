"""Pallas prefix-sum kernels vs jnp.cumsum (interpret mode on CPU):
exact for int32 (including wraparound — the binning contract), bit-ordered
left-to-right accumulation for f32, padding/odd sizes, segment resets."""
import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture
def rng():
    return np.random.default_rng(0)

import importlib.util as _ilu
import os as _os
_spec = _ilu.spec_from_file_location(
    "pallas_scan", _os.path.join(_os.path.dirname(__file__), "pallas_scan.py"))
_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
cumsum_flat, cumsum_rows = _mod.cumsum_flat, _mod.cumsum_rows


@pytest.mark.parametrize("m", [512 * 128, 1000, 300_000 + 17])
def test_cumsum_flat_i32(rng, m):
    x = jnp.asarray(rng.integers(-2 ** 30, 2 ** 30, m).astype(np.int32))
    got = cumsum_flat(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.cumsum(x)))


def test_cumsum_flat_f32(rng):
    x = jnp.asarray(rng.standard_normal(100_000).astype(np.float32))
    got = cumsum_flat(x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.cumsum(x)),
                               rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("m,w", [(4096, 16), (5000, 16), (2048, 8)])
def test_cumsum_rows(rng, m, w):
    x = jnp.asarray(rng.standard_normal((m, w)).astype(np.float32))
    got = cumsum_rows(x, block=1024, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.cumsum(x, axis=0)),
                               rtol=1e-5, atol=1e-3)
    xi = jnp.asarray(rng.integers(-2 ** 20, 2 ** 20, (m, w)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(cumsum_rows(xi, block=1024, interpret=True)),
        np.asarray(jnp.cumsum(xi, axis=0)))


def test_cumsum_rows_segment_reset(rng):
    """reset_every restarts the scan: independent per-segment cumsums."""
    seg, nseg, w = 2048, 4, 16
    x = jnp.asarray(rng.standard_normal((seg * nseg, w)).astype(np.float32))
    got = cumsum_rows(x, block=1024, reset_every=2, interpret=True)
    want = np.concatenate([np.cumsum(np.asarray(x)[i * seg:(i + 1) * seg],
                                     axis=0) for i in range(nseg)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-3)

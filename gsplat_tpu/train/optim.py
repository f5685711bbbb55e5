"""Adam with per-group scheduled LRs and visibility-sparse semantics.

TPU-native equivalents of the reference's optimizers:
- torch.optim.Adam with six param groups at distinct LRs, eps=1e-15
  (reference gaussian_model.py:183-199). Here a single functional Adam
  whose per-leaf LR is computed inside the jitted step (the xyz LR follows
  the expon schedule per step, gaussian_model.py:213-223).
- SparseGaussianAdam (reference train.py:181-182): updates only Gaussians
  visible in the current view. On TPU a masked dense update keeps shapes
  static: the mask zeroes the moment updates *and* the parameter delta for
  invisible rows — identical semantics to the CUDA row-skip, since Adam's
  state only changes where grads are applied.
- The exposure Adam (default torch hyperparams lr from schedule,
  gaussian_model.py:201,208-211).

Opacity-reset moment zeroing (gaussian_model.py:258-261,316-329) and
densification moment surgery are handled in train/densify.py by directly
zeroing rows of mu/nu — required reference behavior.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class AdamState:
    mu: dict     # first moments, same structure as params
    nu: dict     # second moments
    count: jnp.ndarray  # () int32 — steps taken


def init(params: dict) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(mu=zeros,
                     nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def apply_updates(params: dict, grads: dict, state: AdamState,
                  lrs: Dict[str, jnp.ndarray], *,
                  b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15,
                  visibility_mask: Optional[jnp.ndarray] = None):
    """One Adam step. lrs maps leaf name → scalar LR (traced OK).

    With visibility_mask (N,) bool (sparse-adam semantics), rows with
    mask=False keep params AND moments unchanged; bias correction uses the
    global step count, like the reference CUDA SparseGaussianAdam which
    keeps a single global step.
    """
    count = state.count + 1
    b1c = 1.0 - b1 ** count.astype(jnp.float32)
    b2c = 1.0 - b2 ** count.astype(jnp.float32)

    new_params, new_mu, new_nu = {}, {}, {}
    for k in params:
        g = grads[k]
        mu = state.mu[k] * b1 + g * (1 - b1)
        nu = state.nu[k] * b2 + (g * g) * (1 - b2)
        update = lrs[k] * (mu / b1c) / (jnp.sqrt(nu / b2c) + eps)
        if visibility_mask is not None:
            vis = visibility_mask.reshape(
                (-1,) + (1,) * (g.ndim - 1)).astype(g.dtype)
            mu = state.mu[k] * (1 - vis) + mu * vis
            nu = state.nu[k] * (1 - vis) + nu * vis
            update = update * vis
        new_params[k] = params[k] - update
        new_mu[k] = mu
        new_nu[k] = nu
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)
